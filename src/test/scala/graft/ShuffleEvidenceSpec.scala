package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** MEASURED shuffle-volume evidence for the dedup scale claims: SCALE.md
  * says exact dedup moves fingerprints, never documents — this spec reads
  * the actual `shuffle bytes written` metrics off the executed plan and
  * asserts the total is a small fraction of the text volume. A regression
  * that drags the payload through an exchange (e.g. reverting the
  * dropped-ids anti-join to a keep-ids semi-join) fails this spec by an
  * order of magnitude, not a flaky margin.
  */
class ShuffleEvidenceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Sum of "shuffle bytes written" over every exchange in the executed
    * (adaptive) plan. Accumulator-backed metrics are final once the
    * triggering action returns.
    */
  private def shuffleBytesWritten(df: DataFrame): Long = {
    // collect(), not a write: a write runs its OWN QueryExecution, and
    // the metrics on df.queryExecution would stay untouched (zero)
    df.collect()
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    def sum(p: SparkPlan): Long = {
      val self = p match {
        case s: ShuffleExchangeLike =>
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
        case _ => 0L
      }
      self + unwrap(p).map(sum).sum
    }
    sum(df.queryExecution.executedPlan)
  }

  test("the stateless QC pipeline fuses into a single exchange-free scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.ops.{Redact, TextAnalysis, TextFilters}
    // the whole per-document QC family composed the way a real pipeline
    // stacks it — rule filter, PII redaction, C4 line scrub, lang-ID,
    // quality, token counts, repetition, fingerprint, charset QC — must
    // plan as ONE scan + projections/filters: zero exchanges, zero
    // bytes shuffled. At 100 TB this whole stage is a pass over the
    // data; any op that smuggled in a groupBy/window would show here.
    val dir = java.nio.file.Files.createTempDirectory("qcfuse").toString
    (1 to 500).map(i =>
      (i.toLong, s"the quick brown fox $i jumps over the lazy dog " +
        "with vigor and purpose and then naps quietly all afternoon"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val piped = TextFilters(spark.read.parquet(dir), "text")
      .withColumn("clean", Redact.redact(col("text")))
      .withColumn("scrubbed", TextFilters.scrubLines(col("text")))
      .withColumn("lang", TextAnalysis.langId(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col("text")))
      .withColumn("dup3", TextAnalysis.dupNgramRatio(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withColumn("chars", TextAnalysis.charClassCounts(col("text")))
    assert(shuffleBytesWritten(piped) == 0L,
      "stateless QC pipeline must not shuffle")
    def hasExchange(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeLike => true
      case a: AdaptiveSparkPlanExec => hasExchange(a.executedPlan)
      case q: QueryStageExec => hasExchange(q.plan)
      case other => other.children.exists(hasExchange)
    }
    assert(!hasExchange(piped.queryExecution.executedPlan),
      s"found an exchange in:\n${piped.queryExecution.executedPlan}")
  }

  test("sharedWindowFlags shuffles window keys, not text: 10x longer tokens, flat shuffle") {
    import spark.implicits._
    // same token STRUCTURE (2000 docs x 60 tokens), token length 4 vs 40
    // (~9x the text bytes). The shuffle carries 16-byte md5 window keys, so
    // it is a function of token COUNT, not text size — if a regression
    // ships window strings through the explode again, the long corpus's
    // shuffle grows ~8x and the flatness assert fails by a mile.
    def corpus(tokLen: Int) = (1 to 2000).map { i =>
      val toks = (1 to 60).map(j => s"d${i}t$j".padTo(tokLen, 'x'))
      (i.toLong, toks.mkString(" "))
    }
    val short = corpus(8)
    val long  = corpus(40)
    def run(docs: Seq[(Long, String)]): Long = {
      val out = graft.ops.Dedup.sharedWindowFlags(docs.toDF("doc_id", "text"),
        "text", "doc_id", n = 10)
      val bytes = shuffleBytesWritten(out)
      assert(out.count() == 2000)
      bytes
    }
    val shortBytes = run(short)
    val longBytes  = run(long)
    val longText = long.map(_._2.length.toLong).sum
    info(f"short-token shuffle $shortBytes%d B, long-token shuffle $longBytes%d B, " +
      f"long text $longText%d B (${100.0 * longBytes / longText}%.1f%% of text)")
    assert(longBytes < (shortBytes * 1.5).toLong,
      f"window shuffle grew with text bytes ($shortBytes -> $longBytes) — " +
        "window STRINGS are reaching the exchange instead of md5 keys")
  }

  test("dedupIncrement shuffles corpus fingerprints, not the corpus payload") {
    import spark.implicits._
    val existing = (1 to 3000).map(i => (i.toLong, s"corpus body $i " * 150)) // ~1.8 KB
    val incoming = ((1 to 150).map(i => (10000L + i, s"corpus body $i " * 150)) ++
      (1 to 150).map(i => (20000L + i, s"fresh daily text $i " * 150)))
    val out = graft.ops.Dedup.dedupIncrement(
      existing.toDF("doc_id", "text"), incoming.toDF("doc_id", "text"),
      "text", "doc_id")
    val shuffled = shuffleBytesWritten(out)
    val textBytes = (existing ++ incoming).map(_._2.length.toLong).sum
    assert(out.count() == 150) // only the fresh half survives
    info(f"shuffled $shuffled%d B vs $textBytes%d B total text " +
      f"(${100.0 * shuffled / textBytes}%.1f%%)")
    assert(shuffled < textBytes / 10,
      f"incremental dedup shuffled $shuffled B vs $textBytes B text — " +
        "a payload is leaking into an exchange")
  }

  test("dedupIncrementBucketed: standing table keeps even fingerprints out of the exchange") {
    import spark.implicits._
    val existing = (1 to 3000).map(i => (i.toLong, s"corpus body $i " * 150))
    val incoming = ((1 to 150).map(i => (10000L + i, s"corpus body $i " * 150)) ++
      (1 to 150).map(i => (20000L + i, s"fresh daily text $i " * 150)))
    graft.ops.Dedup.writeFingerprintTable(
      existing.toDF("doc_id", "text"), "text", "graft_sev_fp", 8)
    try {
      val out = graft.ops.Dedup.dedupIncrementBucketed(
        "graft_sev_fp", incoming.toDF("doc_id", "text"), "text", "doc_id")
      val shuffled = shuffleBytesWritten(out)
      val corpusText = existing.map(_._2.length.toLong).sum
      val batchText = incoming.map(_._2.length.toLong).sum
      assert(out.count() == 150)
      info(f"shuffled $shuffled%d B vs corpus $corpusText%d B / batch $batchText%d B")
      // the corpus-side scan is bucketed in place — the per-batch shuffle
      // is bounded by the BATCH, not the corpus
      assert(shuffled < batchText,
        f"bucketed incremental dedup shuffled $shuffled B (batch text $batchText B) — " +
          "the standing layout is not keeping the corpus out of the exchange")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sev_fp")
  }

  test("nearDupIncrement ships band keys and candidate shingles, not the corpus text") {
    import spark.implicits._
    // ~2 KB unique docs; 15 planted copies + 15 disjoint fresh incoming.
    // Shuffle = banded corpus/batch frames (bands x ~28 B per doc) plus
    // candidate-bounded verify shingles — the 2 KB payloads move only via
    // broadcast semi-joins, never through an exchange.
    val existing = (1 to 2000).map { i =>
      (i.toLong, (1 to 300).map(j => s"w$i-$j").mkString(" ")) // ~2 KB
    }
    val incoming = (existing.take(15).map { case (i, t) => (10000L + i, t) } ++
      (1 to 15).map(i => (20000L + i, (1 to 300).map(j => s"f$i-$j").mkString(" "))))
    val out = graft.ops.Dedup.nearDupIncrement(
      existing.toDF("doc_id", "text"), incoming.toDF("doc_id", "text"),
      "text", "doc_id", threshold = 0.9, numHashes = 32, bands = 4)
    val shuffled = shuffleBytesWritten(out)
    val textBytes = (existing ++ incoming).map(_._2.length.toLong).sum
    assert(out.count() == 15) // copies dropped, fresh kept
    info(f"shuffled $shuffled%d B vs $textBytes%d B text " +
      f"(${100.0 * shuffled / textBytes}%.1f%%)")
    assert(shuffled < textBytes / 3,
      f"nearDupIncrement shuffled $shuffled B vs $textBytes B text — " +
        "the payload (not band keys) is reaching an exchange")
  }

  test("bruteForceTopK shuffles bounded top-k state, never the scored frame") {
    // SCALE.md: the query set broadcasts, the corpus is scanned once, and
    // only ~k rows per (query, partition) reach the exchange — the
    // |corpus|×|queries| scored frame never shuffles. 20k × 64-dim corpus
    // vectors are ~5 MB; the scored frame against 8 queries would be ~4 MB
    // more. The measured shuffle must stay orders of magnitude below the
    // vector volume — a regression to a row_number window (which moves
    // every scored row) fails this by >100×.
    import org.apache.spark.sql.functions._
    val n = 20000
    // no repartition (partitions = 0): a corpus-side exchange would
    // pollute the measured shuffle bytes
    val emb = graft.tools.SyntheticVectors.df(spark, n)
    val out = graft.ops.Similarity.bruteForceTopK(
      emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 10)
    val shuffled = shuffleBytesWritten(out)
    val vecBytes = n.toLong * 64 * 4
    assert(out.count() == 80)
    info(f"shuffled $shuffled%d B vs $vecBytes%d B of corpus vectors " +
      f"(${100.0 * shuffled / vecBytes}%.1f%%)")
    assert(shuffled < vecBytes / 10,
      f"bruteForceTopK shuffled $shuffled B vs $vecBytes B of vectors — " +
        "the scored frame (not bounded top-k state) is reaching an exchange")
  }

  test("lshTopK: corpus vectors stream past a small probe set, never through an exchange") {
    // SCALE.md: the corpus is bucketed in place and probing is an
    // equi-join on the bucket key — with a broadcastable probe set the
    // corpus side must stream (broadcast join), so measured shuffle stays
    // far below the corpus vector volume. A regression that plans the
    // bucket join as a two-sided shuffle moves all ~5 MB of vectors and
    // fails by an order of magnitude.
    import org.apache.spark.sql.functions._
    val n = 20000
    val emb = graft.tools.SyntheticVectors.df(spark, n) // no repartition, see above
    val out = graft.ops.Similarity.lshTopK(
      emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 10)
    val shuffled = shuffleBytesWritten(out)
    val vecBytes = n.toLong * 64 * 4
    assert(out.count() > 0)
    info(f"shuffled $shuffled%d B vs $vecBytes%d B of corpus vectors " +
      f"(${100.0 * shuffled / vecBytes}%.1f%%)")
    assert(shuffled < vecBytes / 10,
      f"lshTopK shuffled $shuffled B vs $vecBytes B of vectors — " +
        "the corpus side of the bucket join is reaching an exchange")
  }

  test("lmScore is a zero-shuffle scan against the broadcast standing model") {
    import spark.implicits._
    val docs = (1 to 2000).map(i => (i.toLong, s"alpha beta gamma doc $i body " * 40))
      .toDF("doc_id", "text")
    val (uni, bi) = graft.ops.TextAnalysis.bigramModel(docs, "text",
      vocabSize = 100, maxBigrams = 1000)
    // model build shuffles (two aggregations) — that is its documented
    // once-per-release cost. SCORING must not: one scan through the
    // compiled kernel, model lookups in broadcast maps, no exchange.
    val out = graft.ops.TextAnalysis.lmScore(docs, "text", "doc_id", uni, bi)
    val shuffled = shuffleBytesWritten(out)
    assert(out.count() == 2000)
    assert(shuffled == 0,
      s"lmScore shuffled $shuffled bytes — the scoring scan grew an exchange")
  }

  test("scrubSpans ships positions and 16-char gram keys, not document text") {
    import spark.implicits._
    // ~1% of docs embed a benchmark 8-gram inside ~2.4 KB of body text:
    // the realistic sparse-contamination shape. The exchanges carry
    // (id, window-pos, md5-16) postings and the matched-starts lists —
    // the document text itself stays out of every shuffle (the final
    // payload join broadcasts the tiny hits side under AQE).
    val leak = (1 to 8).map(i => s"leak$i").mkString(" ")
    val docs = (1 to 3000).map { i =>
      val body = s"doc body token $i " * 150 // ~2.5 KB
      (i.toLong, if (i % 100 == 0) s"$body $leak" else body)
    }
    val df = docs.toDF("doc_id", "text")
    val textBytes = docs.map(_._2.length.toLong).sum
    val bench = Seq(s"context before $leak context after").toDF("text")
    val out = graft.ops.Decontaminate.scrubSpans(df, "text", "doc_id",
      bench, "text", n = 8)
    val shuffled = shuffleBytesWritten(out)
    assert(out.where($"n_spans_removed" > 0).count() == 30) // the planted 1%
    assert(shuffled < textBytes / 10,
      f"scrubSpans shuffled $shuffled bytes vs $textBytes text bytes " +
        f"(${100.0 * shuffled / textBytes}%.1f%%) — the payload is leaking into an exchange")
  }

  test("exactDedup shuffles fingerprints, not documents (measured bytes)") {
    import spark.implicits._
    // ~2 KB docs, ~10% exact duplicates — the realistic corpus shape the
    // "~2% of the text volume shuffles" claim is about
    val docs = (1 to 4000).map { i =>
      val body = s"doc body $i " * 150 // ~1.8 KB
      (i.toLong, if (i % 10 == 0) s"doc body ${i - 1} " * 150 else body)
    }
    val df = docs.toDF("doc_id", "text")
    val textBytes = docs.map(_._2.length.toLong).sum
    val out = graft.ops.Dedup.exactDedup(df, "text", "doc_id")
    val shuffled = shuffleBytesWritten(out)
    assert(out.count() >= 3500) // sanity: dedup actually ran
    assert(shuffled > 0, "expected the fingerprint aggregation to shuffle something")
    assert(shuffled < textBytes / 10,
      f"exact dedup shuffled $shuffled bytes vs $textBytes text bytes " +
        f"(${100.0 * shuffled / textBytes}%.1f%%) — the payload is leaking into an exchange")
  }
}
