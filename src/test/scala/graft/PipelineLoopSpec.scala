package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Pipeline, TextFilters}

/** The daily-ingest LOOP end-to-end: the b17 pipeline composition (quality
  * filter → standing-table exact dedup → standing-band near-dup →
  * decontaminate → budget mix → interleave → pack) run for TWO consecutive
  * batches with the kept set FOLDED into the standing tables between them
  * (`writeFingerprintTable(append = true)` + `writeBandTable(append =
  * true)`). Each stage has its own spec/oracle; this pins the composition
  * a production adopter actually runs — in particular that day 2 drops
  * exact copies AND near-duplicates of documents day 1 admitted, which
  * only holds if the append paths fold day-1 state correctly.
  */
class PipelineLoopSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val rules = TextFilters.Rules(minWords = 5, maxWords = 1000,
    minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.3,
    minStopwordHits = 1)

  private def loopConfig(bandTable: String, fpTable: String) =
    Pipeline.Config(
      textCol = "text", idCol = "doc_id",
      rules = Some(rules),
      fingerprintTable = Some(fpTable),
      bandTable = Some(bandTable),
      nearDup = Pipeline.NearDup(threshold = 0.7, numHashes = 32,
        bands = 8, shingleSize = 3, maxBucket = 1000),
      mix = Some(Pipeline.Mix(
        budgets = (0 until 4).map(i => s"s$i" -> 100000L).toMap,
        src = concat(lit("s"), pmod(col("doc_id"), lit(4L))),
        toks = length(col("text")).cast("long"),
        weights = Map("s0" -> 2.0), defaultWeight = 1.0,
        maxTokensPerBin = 4096, nShards = 8)),
      numBuckets = 8)

  /** One daily run THROUGH THE PUBLIC API (the same ops/Pipeline entry
    * point the b17 bench times): pipeline over `batch`, then
    * [[Pipeline.fold]] the kept set into the standing tables. Returns
    * the kept ids.
    */
  private def day(batch: DataFrame, corpus: DataFrame, bandTable: String,
      fpTable: String, eval: DataFrame): Set[Long] = {
    import spark.implicits._
    val cfg = loopConfig(bandTable, fpTable)
    val res = Pipeline.run(batch, cfg, corpus = Some(corpus),
      eval = Some(eval), countStages = true)
    assert(res.stageCounts.map(_._1) ==
      Seq("quality", "exact_dedup", "near_dup", "decontaminate",
        "budget_mix", "pack"),
      s"unexpected stage sequence: ${res.stageCounts}")
    val kept = res.kept.select("doc_id").as[Long].collect().toSet
    // fold the admitted docs (with their text) into the standing state
    Pipeline.fold(
      batch.join(res.kept.select("doc_id"), Seq("doc_id"), "left_semi"), cfg)
    kept
  }

  test("two-day loop: day 2 drops exact and near copies of day-1 admissions") {
    import spark.implicits._
    def doc(i: Long, tag: String) =
      (i, s"the corpus $tag document number $i with plenty of ordinary " +
        s"words about part ${i * 7} and supplier ${i % 13} here")
    val corpus = (1L to 300L).map(doc(_, "standing")).toDF("doc_id", "text")
      .localCheckpoint(true)
    val eval = Seq(
      "the held out benchmark sentence that must never appear " +
        "in admitted training data because it is the eval set")
      .toDF("text").localCheckpoint(true)
    Dedup.writeBandTable(corpus, "text", "doc_id", "graft_loop_bands",
      numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 8)
    Dedup.writeFingerprintTable(corpus, "text", "graft_loop_fp", numBuckets = 8)
    try {
      // day 1: corpus dups (drop), a low-quality doc (drop), contaminated
      // doc (drop), fresh docs 1001-1040 (keep)
      val fresh1 = (1001L to 1040L).map(doc(_, "dayone")).toDF("doc_id", "text")
      val batch1 = fresh1
        .unionAll(corpus.where(col("doc_id") <= 5)
          .select((col("doc_id") + 5000).as("doc_id"), col("text")))
        .unionAll(Seq((6001L, "1 2 3"),
          (6002L, "the held out benchmark sentence that must never appear " +
            "in admitted training data because it is the eval set padded"))
          .toDF("doc_id", "text"))
      val kept1 = day(batch1, corpus, "graft_loop_bands", "graft_loop_fp", eval)
      assert(kept1 == (1001L to 1040L).toSet,
        s"day 1 must admit exactly the fresh docs, got $kept1")

      // day 2: exact copies of day-1 admissions (drop — proves the
      // fingerprint fold), near copies with an appended tail (drop —
      // proves the band fold), fresh docs 2001-2030 (keep)
      val day1Corpus = corpus.unionAll(
        batch1.join(kept1.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"))
        .localCheckpoint(true)
      val fresh2 = (2001L to 2030L).map(doc(_, "daytwo")).toDF("doc_id", "text")
      val batch2 = fresh2
        .unionAll(fresh1.where(col("doc_id") <= 1010L)
          .select((col("doc_id") + 7000).as("doc_id"), col("text")))
        .unionAll(fresh1.where(col("doc_id") > 1030L)
          .select((col("doc_id") + 8000).as("doc_id"),
            concat(col("text"), lit(" tail")).as("text")))
      val kept2 = day(batch2, day1Corpus, "graft_loop_bands", "graft_loop_fp", eval)
      assert(kept2 == (2001L to 2030L).toSet,
        s"day 2 must drop every copy/near-copy of day-1 admissions, got $kept2")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_loop_bands")
      spark.sql("DROP TABLE IF EXISTS graft_loop_fp")
    }
  }

  test("scrub + redact stages: junk lines canonicalize before dedup, PII leaves only the output, folds replay the scrub") {
    import spark.implicits._
    val content = "the ordinary corpus document number one with plenty " +
      "of words about parts and suppliers here."
    val contact = "contact us at alice@example.com for more details."
    def withJunk(junk: Seq[String]) =
      (Seq(content) ++ junk ++ Seq(contact)).mkString("\n")
    val seed = Seq((1L, "the standing seed document with plenty of " +
      "ordinary words about nothing in particular here."))
      .toDF("doc_id", "text")
    Dedup.writeFingerprintTable(seed, "text", "graft_sr_fp", numBuckets = 4)
    val cfg = Pipeline.Config(
      scrub = Some(Pipeline.Scrub()),
      rules = Some(rules),
      fingerprintTable = Some("graft_sr_fp"),
      redactPii = true, numBuckets = 4)
    try {
      // day 1: a junky doc (junk lines scrub away, email redacts in the
      // OUTPUT only) and a doc that is ONLY junk (scrubs to empty →
      // quality drops it)
      val batch1 = Seq(
        (10L, withJunk(Seq("click here javascript tracking pixel", "buy now"))),
        (11L, "click here javascript tracking pixel\nbuy now"))
        .toDF("doc_id", "text")
      val res1 = Pipeline.run(batch1, cfg)
      assert(res1.kept.select("doc_id").as[Long].collect().toSet == Set(10L))
      val kept1Text = res1.kept.select("text").as[String].collect()(0)
      assert(kept1Text ==
        content + "\n" + contact.replace("alice@example.com", "[EMAIL]"),
        s"kept text must be scrubbed AND redacted, got: $kept1Text")
      Pipeline.fold(
        batch1.join(res1.kept.select("doc_id"), Seq("doc_id"), "left_semi"),
        cfg)

      // day 2: the SAME content under DIFFERENT junk must be an exact
      // duplicate of day 1's admission — which only holds if (a) the
      // scrub canonicalizes before fingerprinting and (b) fold
      // re-applied the scrub to the original admitted text (folding the
      // unscrubbed text would fingerprint the junk too and admit this)
      val batch2 = Seq(
        (20L, withJunk(Seq("lorem ipsum boilerplate footer", "subscribe"))),
        (21L, "a genuinely fresh day two report with plenty of other " +
          "ordinary words about different things entirely here."))
        .toDF("doc_id", "text")
      val res2 = Pipeline.run(batch2, cfg)
      assert(res2.kept.select("doc_id").as[Long].collect().toSet == Set(21L),
        "day 2 must drop the re-junked copy of day 1's admission")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sr_fp")
  }

  test("withinBatchNearDup collapses same-batch near-twins the standing probe deliberately passes") {
    import spark.implicits._
    val batch = Seq(
      (1L, "the first fresh document with plenty of ordinary words about " +
        "parts and suppliers and the usual corpus phrasing here"),
      (2L, "the first fresh document with plenty of ordinary words about " +
        "parts and suppliers and the usual corpus phrasing here tail"), // near-twin of 1
      (3L, "a completely different report that have nothing shared with " +
        "the other two beyond the required stopwords of the filter"))
      .toDF("doc_id", "text")
    def kept(flag: Boolean): Set[Long] =
      Pipeline.run(batch, Pipeline.Config(
          rules = Some(rules), withinBatchNearDup = flag,
          nearDup = Pipeline.NearDup(threshold = 0.7, numHashes = 32,
            bands = 8, shingleSize = 3, maxBucket = 1000)))
        .kept.select("doc_id").as[Long].collect().toSet
    assert(kept(false) == Set(1L, 2L, 3L), "no standing table, flag off: all pass")
    assert(kept(true) == Set(1L, 3L), "flag on: the near-twin collapses to its min id")
  }

  test("streaming store graduates into the daily loop: day 2 runs against the graduated band table, day 3 against its folds") {
    import spark.implicits._
    // the last seam between the two standing-band representations: a
    // corpus accumulated by streamingNearDup's micro-batch store is
    // GRADUATED (graduateNearDupStore) into the bucketed band table the
    // batch pipeline probes, the fingerprint table is built from the
    // store's admitted docs, and from then on the SAME Pipeline.run /
    // Pipeline.fold loop as the two-day test continues the ingestion —
    // day 2 drops copies and near-copies of STREAMED admissions through
    // the graduated tables, day 3 drops copies of day-2 admissions
    // through Pipeline.fold's appends ON the graduated table.
    def doc(i: Long, tag: String) =
      (i, s"the corpus $tag document number $i with plenty of ordinary " +
        s"words about part ${i * 7} and supplier ${i % 13} here")
    val work = java.nio.file.Files.createTempDirectory("graft_sgl").toString
    val store = s"$work/corpus"
    // stream two micro-batches through the store path with the BATCH
    // pipeline's band config (32/8/3 — the graduated table carries the
    // config, and the probe guard would refuse a mismatch)
    def stream(rows: Seq[(Long, String)], id: Long): Unit =
      graft.streaming.StreamingFlatten.nearDupBatch(
        rows.toDF("doc_id", "text"), id, "text", "doc_id", store,
        0.7, 32, 8, 3, 10000)
    stream((1L to 200L).map(doc(_, "standing")), 0)
    stream((201L to 260L).map(doc(_, "streamed")) :+
      (5001L, doc(5L, "standing")._2), 1) // near-verbatim of doc 5 → store drops it
    val storeDocs = spark.read.parquet(store).select("doc_id", "text")
      .localCheckpoint(true)
    assert(storeDocs.count() == 260L, "stream path must have dropped 5001")
    val (nh, bd, ss) = graft.streaming.StreamingFlatten.graduateNearDupStore(
      spark, store, "text", "doc_id", "graft_sgl_bands", numBuckets = 8)
    assert((nh, bd, ss) == ((32, 8, 3)))
    Dedup.writeFingerprintTable(storeDocs, "text", "graft_sgl_fp", numBuckets = 8)
    val eval = Seq("the held out benchmark sentence that must never appear " +
      "in admitted training data").toDF("text").localCheckpoint(true)
    try {
      // day 2 (first BATCH day): exact copy of a streamed doc (drop —
      // fingerprint table built from the store), near copy with a tail
      // (drop — graduated band table), fresh docs (keep)
      val fresh2 = (2001L to 2030L).map(doc(_, "daytwo")).toDF("doc_id", "text")
      val batch2 = fresh2
        .unionAll(storeDocs.where(col("doc_id").between(201L, 205L))
          .select((col("doc_id") + 7000).as("doc_id"), col("text")))
        .unionAll(storeDocs.where(col("doc_id").between(101L, 105L))
          .select((col("doc_id") + 8000).as("doc_id"),
            concat(col("text"), lit(" tail")).as("text")))
      val kept2 = day(batch2, storeDocs, "graft_sgl_bands", "graft_sgl_fp", eval)
      assert(kept2 == (2001L to 2030L).toSet,
        s"day 2 must drop every copy/near-copy of streamed admissions, got $kept2")
      // day 3: copies/near-copies of day-2 admissions must drop through
      // the folds Pipeline.fold appended to the GRADUATED table
      val day2Corpus = storeDocs.unionAll(
        batch2.join(kept2.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi"))
        .localCheckpoint(true)
      val fresh3 = (3001L to 3020L).map(doc(_, "daythree")).toDF("doc_id", "text")
      val batch3 = fresh3
        .unionAll(fresh2.where(col("doc_id") <= 2010L)
          .select((col("doc_id") + 9000).as("doc_id"), col("text")))
        .unionAll(fresh2.where(col("doc_id") > 2025L)
          .select((col("doc_id") + 11000).as("doc_id"),
            concat(col("text"), lit(" tail")).as("text")))
      val kept3 = day(batch3, day2Corpus, "graft_sgl_bands", "graft_sgl_fp", eval)
      assert(kept3 == (3001L to 3020L).toSet,
        s"day 3 must drop every copy/near-copy of day-2 admissions, got $kept3")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sgl_bands")
      spark.sql("DROP TABLE IF EXISTS graft_sgl_fp")
    }
  }

  test("stage 2c: LM perplexity filter keeps the low-entropy docs and drops its score columns") {
    import spark.implicits._
    // spec-pinned, not SQL-oracled: cross_entropy's last ulp is
    // engine-specific (the x60 oracle lesson) — the ground truth here
    // is the PUBLIC scorer itself, so the stage is pinned to apply
    // exactly lmScore's decision within one engine
    val trusted = (1 to 40)
      .map(i => s"the quick brown fox jumps over the lazy dog number $i")
      .toDF("text")
    val (uni, bi) = graft.ops.TextAnalysis.bigramModel(trusted, "text",
      vocabSize = 100, maxBigrams = 500)
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "zzq qxj vvk wwy kjq pzx mmv nnb ccd rrf"),
      // 1 token: lmScore hardwires cross_entropy = 0.0 (unscorable),
      // which would pass any positive cut — minTokens must drop it
      (3L, "zzqx")
    ).toDF("doc_id", "text")
    val ce = graft.ops.TextAnalysis.lmScore(batch, "text", "doc_id", uni, bi)
      .select("doc_id", "cross_entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ce(1L) < ce(2L), s"familiar text must score lower entropy: $ce")
    assert(ce(3L) == 0.0)
    val res = Pipeline.run(batch, Pipeline.Config(rules = None,
      lmFilter = Some(Pipeline.LmFilter(uni, bi,
        maxCrossEntropy = (ce(1L) + ce(2L)) / 2))), countStages = true)
    assert(res.kept.columns.toSeq == Seq("doc_id", "text"),
      "score columns must not leak past the stage")
    assert(res.kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
    assert(res.stageCounts == Seq("lm_filter" -> 1L))
    assert(res.ownsKept)
    // minTokens = 0 keeps the unscorable doc deliberately
    val keep0 = Pipeline.run(batch, Pipeline.Config(rules = None,
      lmFilter = Some(Pipeline.LmFilter(uni, bi,
        maxCrossEntropy = (ce(1L) + ce(2L)) / 2, minTokens = 0))))
    assert(keep0.kept.select("doc_id").as[Long].collect().toSeq.sorted ==
      Seq(1L, 3L))
  }
}
