package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Decontaminate, Dedup, Packing, Sampling, TextFilters}

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

  /** One daily run: pipeline over `batch`, then fold the kept set into the
    * standing tables. Returns the kept ids.
    */
  private def day(batch: DataFrame, corpus: DataFrame, bandTable: String,
      fpTable: String, eval: DataFrame): Set[Long] = {
    import spark.implicits._
    var df = batch
    df = TextFilters(df, "text", rules).localCheckpoint(true)
    df = Dedup.dedupIncrementBucketed(fpTable, df, "text", "doc_id")
      .localCheckpoint(true)
    df = Dedup.nearDupIncrementIndexed(spark.table(bandTable), corpus, df,
      "text", "doc_id", threshold = 0.7, numHashes = 32, bands = 8,
      shingleSize = 3, maxBucket = 1000).localCheckpoint(true)
    df = Decontaminate.decontaminateBloom(df, "text", "doc_id", eval, "text")
      .localCheckpoint(true)
    val budgets = (0 until 4).map(i => s"s$i" -> 100000L).toMap
    df = Sampling.tokenBudgetMix(
      df.withColumn("src", concat(lit("s"), pmod(col("doc_id"), lit(4L))))
        .withColumn("toks", length(col("text")).cast("long")),
      "doc_id", "toks", "src", budgets).localCheckpoint(true)
    df = Sampling.interleaveSources(df, "doc_id", "src", Map("s0" -> 2.0),
      defaultWeight = 1.0)
    val packed = Packing.packByTokenBudget(df, "doc_id", "toks",
      maxTokensPerBin = 4096, nShards = 8)
    val kept = packed.select("doc_id").as[Long].collect().toSet
    // fold the admitted docs into the standing state for the next day
    val keptDocs = batch.join(packed.select("doc_id"), Seq("doc_id"), "left_semi")
    Dedup.writeFingerprintTable(keptDocs, "text", fpTable, numBuckets = 8,
      append = true)
    Dedup.writeBandTable(keptDocs, "text", "doc_id", bandTable,
      numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 8,
      append = true)
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
}
