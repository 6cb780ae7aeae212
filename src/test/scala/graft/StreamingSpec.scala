package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.model.FlattenOptions
import graft.streaming.StreamingFlatten
import java.nio.file.Files

/** Structured Streaming ingest: NDJSON files → flattened parquet tables,
  * driven synchronously with Trigger.AvailableNow. */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("streaming flatten appends each micro-batch with batch-prefixed links") {
    val in = Files.createTempDirectory("graft_stream_in").toString
    val out = Files.createTempDirectory("graft_stream_out").toString

    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("kids", ArrayType(StructType(Seq(StructField("n", LongType)))))))

    Files.writeString(java.nio.file.Paths.get(s"$in/batch0.jl"),
      """{"id": 1, "kids": [{"n": 10}, {"n": 11}]}
        |{"id": 2, "kids": [{"n": 20}]}""".stripMargin)

    val q1 = StreamingFlatten.start(spark, in, out, schema, FlattenOptions())
    q1.awaitTermination()

    val main1 = spark.read.parquet(s"$out/main")
    val kids1 = spark.read.parquet(s"$out/kids")
    assert(main1.count() == 2)
    assert(kids1.count() == 3)

    // second batch arrives → appended, links unique via batch prefix
    Files.writeString(java.nio.file.Paths.get(s"$in/batch1.jl"),
      """{"id": 3, "kids": [{"n": 30}]}""")
    val q2 = StreamingFlatten.start(spark, in, out, schema, FlattenOptions())
    q2.awaitTermination()

    val main2 = spark.read.parquet(s"$out/main")
    assert(main2.count() == 3)
    val links = main2.select("_link").collect().map(_.getString(0))
    assert(links.distinct.length == 3)
    val kidRow = spark.read.parquet(s"$out/kids")
      .where(col("n") === 30).collect()(0)
    assert(kidRow.getAs[String]("_link_main").startsWith("1."))
  }

  test("sessionization: gap-based sessions via flatMapGroupsWithState") {
    import spark.implicits._
    import graft.streaming.StreamingFlatten.{Event, sessionize}
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val events = Seq(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0),   // session 1 (gap 10m)
      Event(1L, ts(40), 3.0),                          // session 2
      Event(2L, ts(0), 5.0))                           // user 2, one session
      .toDS()
    val sessions = sessionize(events, gapMs = 10 * 60 * 1000L)
      .collect().sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.length == 3)
    assert(sessions(0).n_events == 2 && sessions(0).total_value == 3.0)
    assert(sessions(0).end.getTime - sessions(0).start.getTime == 5 * 60000L)
    assert(sessions(1).n_events == 1 && sessions(1).total_value == 3.0)
    assert(sessions(2).user_id == 2L && sessions(2).n_events == 1)
  }

  test("streaming dedup drops within-watermark duplicate texts across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamingFlatten.streamingDedup(
      in.toDF().toDF("doc_id", "ts", "text"), "text", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      in.addData((1L, ts(0), "alpha doc"), (2L, ts(1), "beta doc"),
        (3L, ts(2), "alpha  doc")) // whitespace-normalized dup of 1
      q.processAllAvailable()
      in.addData((4L, ts(3), "beta doc"), (5L, ts(4), "gamma doc")) // 4 dups 2 cross-batch
      q.processAllAvailable()
      val ids = spark.table("sdedup").select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("streaming near-dup: later batches drop near-copies of the accumulated corpus, fresh docs survive") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("snd").toString
    val base = "the quick brown fox jumps over the lazy dog and runs home"
    val other = "completely different material about spark streaming state stores"
    val in = MemoryStream[(Long, String)]
    val q = StreamingFlatten.streamingNearDup(
      in.toDF().toDF("doc_id", "text"), "text", "doc_id",
      s"$work/corpus", s"$work/ckpt",
      threshold = 0.8, numHashes = 32, bands = 16)
    try {
      in.addData((1L, base), (2L, other))
      q.processAllAvailable()
      in.addData(
        (11L, base),                         // verbatim → drops
        // 12 tokens + 2-token tail: shingle Jaccard 10/12 ≈ 0.83 ≥ 0.8,
        // and 16×2-row bands make the candidate certain in practice
        (12L, base + " appended tail"),
        (13L, "zzq1 wwk1 ppj1 totally disjoint"))     // fresh → survives
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$work/corpus")
        .select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 2L, 13L), ids)
      // the corpus stays readable mid-stream with its batch partition
      val batches = spark.read.parquet(s"$work/corpus")
        .select("batch").distinct().as[Int].collect().toSet
      assert(batches == Set(0, 1), batches)
    } finally q.stop()
  }

  test("streaming near-dup batch replay: re-running a batch id overwrites, never duplicates or self-dedups") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sndr").toString
    val corpus = s"$work/corpus"
    val base = "the quick brown fox jumps over the lazy dog and runs home"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      StreamingFlatten.nearDupBatch(rows.toDF("doc_id", "text"), id,
        "text", "doc_id", corpus, 0.8, 32, 16, 3, 10000)
    def ids() = spark.read.parquet(corpus).select("doc_id").as[Long].collect().toSeq
    val b0 = Seq((1L, base), (2L, "unrelated material about state stores"))
    run(b0, 0)
    run(b0, 0) // replay of the FIRST batch: overwrite, no dup rows
    assert(ids().sorted == Seq(1L, 2L))
    val b1 = Seq((11L, base), (13L, "zzq9 wwk9 ppj9 fully disjoint"))
    run(b1, 1)
    assert(ids().sorted == Seq(1L, 2L, 13L))
    run(b1, 1) // replay after a simulated failure: same corpus, and the
               // batch deduped against the OTHERS, not its own write
    assert(ids().sorted == Seq(1L, 2L, 13L))
  }

  test("streaming cosine dedup batch replay: overwrite-own-partition, dedup-against-others (vector twin)") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("scdr").toString
    val corpus = s"$work/corpus"
    val v1 = Array.tabulate(16)(j => ((j * 37 + 5) % 13 - 6).toFloat)
    val v2 = Array.tabulate(16)(j => ((j * 11 + 2) % 7 - 3).toFloat)
    def run(rows: Seq[(Long, Array[Float])], id: Long): Unit =
      StreamingFlatten.cosineDedupBatch(rows.toDF("vec_id", "embedding"), id,
        "embedding", "vec_id", corpus, 0.95, 8, 1)
    def ids() = spark.read.parquet(corpus).select("vec_id").as[Long].collect().toSeq
    val b0 = Seq((1L, v1), (2L, v2))
    run(b0, 0)
    run(b0, 0) // replay of the FIRST batch: overwrite, no dup rows
    assert(ids().sorted == Seq(1L, 2L))
    // batch 1: a scaled copy of v1 (cosine 1.0 → drops) + a fresh
    // negated v2 (cosine −1 to v2, small to v1 → survives)
    val b1 = Seq((11L, v1.map(_ * 1.001f)), (13L, v2.map(x => -x)))
    run(b1, 1)
    assert(ids().sorted == Seq(1L, 2L, 13L))
    run(b1, 1) // replay: same corpus, deduped against the OTHERS only
    assert(ids().sorted == Seq(1L, 2L, 13L))
  }

  test("streaming dedup stores written BEFORE the signature layout still dedup (legacy re-sign path)") {
    import spark.implicits._
    // vector twin: batch 0 landed by an older build — (vec_id, embedding)
    // only, no bucket/nbits columns. A new-build batch must still drop
    // its near-dups (the legacy half re-signs; nothing silently passes)
    val vwork = java.nio.file.Files.createTempDirectory("scdl").toString
    val vcorpus = s"$vwork/corpus"
    val v1 = Array.tabulate(16)(j => ((j * 37 + 5) % 13 - 6).toFloat)
    val v2 = Array.tabulate(16)(j => ((j * 11 + 2) % 7 - 3).toFloat)
    Seq((1L, v1), (2L, v2)).toDF("vec_id", "embedding")
      .write.parquet(s"$vcorpus/batch=0")
    StreamingFlatten.cosineDedupBatch(
      Seq((11L, v1.map(_ * 1.001f)), (13L, v2.map(x => -x)))
        .toDF("vec_id", "embedding"),
      1L, "embedding", "vec_id", vcorpus, 0.95, 8, 1)
    val vids = spark.read.parquet(vcorpus).select("vec_id").as[Long].collect().toSeq
    assert(vids.sorted == Seq(1L, 2L, 13L), s"legacy vector store: $vids")
    // text twin: batch 0 without the bh/band-config columns
    val twork = java.nio.file.Files.createTempDirectory("sndl").toString
    val tcorpus = s"$twork/corpus"
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((1L, base), (2L, "completely different words here nothing shared at all"))
      .toDF("doc_id", "text").write.parquet(s"$tcorpus/batch=0")
    StreamingFlatten.nearDupBatch(
      Seq((11L, base), (13L, "fresh unrelated daily report with novel vocabulary"))
        .toDF("doc_id", "text"),
      1L, "text", "doc_id", tcorpus, 0.7, 32, 8, 3, 10000)
    val tids = spark.read.parquet(tcorpus).select("doc_id").as[Long].collect().toSeq
    assert(tids.sorted == Seq(1L, 2L, 13L), s"legacy text store: $tids")
  }

  test("store compaction: resignCosineStore / rebandStore migrate a store to a new dial; a mismatched restart fails fast until then") {
    import spark.implicits._
    // vector store written at 8 bits; a stream restarted at 12 must
    // fail fast (wrong bucket space), succeed after compaction, and
    // still drop the planted near-dup
    val vwork = java.nio.file.Files.createTempDirectory("scrs").toString
    val vcorpus = s"$vwork/corpus"
    val v1 = Array.tabulate(16)(j => ((j * 37 + 5) % 13 - 6).toFloat)
    val v2 = Array.tabulate(16)(j => ((j * 11 + 2) % 7 - 3).toFloat)
    def vbatch(rows: Seq[(Long, Array[Float])], id: Long, bits: Int): Unit =
      StreamingFlatten.cosineDedupBatch(rows.toDF("vec_id", "embedding"), id,
        "embedding", "vec_id", vcorpus, 0.95, bits, 1)
    vbatch(Seq((1L, v1), (2L, v2)), 0, 8)
    val ve = intercept[Exception] {
      vbatch(Seq((11L, v1.map(_ * 1.001f))), 1, 12)
    }
    assert(ve.getMessage != null && ve.getMessage.contains("nBits"),
      s"expected the width guard, got: $ve")
    assert(StreamingFlatten.resignCosineStore(spark, vcorpus,
      "embedding", "vec_id", 12) == 1)
    vbatch(Seq((11L, v1.map(_ * 1.001f)), (13L, v2.map(x => -x))), 1, 12)
    val vids = spark.read.parquet(vcorpus).select("vec_id").as[Long].collect().toSeq
    assert(vids.sorted == Seq(1L, 2L, 13L), s"post-compaction store: $vids")
    val widths = spark.read.parquet(vcorpus).select("nbits")
      .distinct().as[Int].collect().toSeq
    assert(widths == Seq(12), s"store widths after compaction: $widths")

    // text store banded at (32, 8, 3); a restart at (64, 16, 3) must
    // fail fast, then dedup correctly after re-banding
    val twork = java.nio.file.Files.createTempDirectory("srbs").toString
    val tcorpus = s"$twork/corpus"
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    def tbatch(rows: Seq[(Long, String)], id: Long, nh: Int, bd: Int): Unit =
      StreamingFlatten.nearDupBatch(rows.toDF("doc_id", "text"), id,
        "text", "doc_id", tcorpus, 0.7, nh, bd, 3, 10000)
    tbatch(Seq((1L, base),
      (2L, "completely different words here nothing shared at all")), 0, 32, 8)
    val te = intercept[Exception] { tbatch(Seq((11L, base)), 1, 64, 16) }
    assert(te.getMessage != null && te.getMessage.contains("band table"),
      s"expected the band-config guard, got: $te")
    assert(StreamingFlatten.rebandStore(spark, tcorpus,
      "text", "doc_id", 64, 16, 3) == 1)
    tbatch(Seq((11L, base),
      (13L, "fresh unrelated daily report with novel vocabulary")), 1, 64, 16)
    val tids = spark.read.parquet(tcorpus).select("doc_id").as[Long].collect().toSeq
    assert(tids.sorted == Seq(1L, 2L, 13L), s"post-reband store: $tids")
    val cfgs = spark.read.parquet(tcorpus)
      .select("numhashes", "bands").distinct().as[(Int, Int)].collect().toSeq
    assert(cfgs == Seq((64, 16)), s"store configs after reband: $cfgs")
  }

  test("store graduation: graduateNearDupStore writes the bucketed band table, probes match the store path, and append continues the loop") {
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("sndg").toString
    val corpus = s"$work/corpus"
    val base = "the quick brown fox jumps over the lazy dog and runs home"
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      StreamingFlatten.nearDupBatch(rows.toDF("doc_id", "text"), id,
        "text", "doc_id", corpus, 0.8, 32, 16, 3, 10000)
    run(Seq((1L, base), (2L, "unrelated material about state stores")), 0)
    run(Seq((3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")), 1)
    val (nh, bd, ss) = StreamingFlatten.graduateNearDupStore(
      spark, corpus, "text", "doc_id", "grad_bands", numBuckets = 4)
    assert((nh, bd, ss) == ((32, 16, 3)))
    val storeTexts = spark.read.parquet(corpus).select("doc_id", "text")
    val batch = Seq(
      (11L, base),                            // verbatim → drops
      (12L, base + " appended tail"),         // J 10/12 ≈ .83 ≥ .8 → drops
      (13L, "zzq5 wwk5 ppj5 totally disjoint") // fresh → survives
    ).toDF("doc_id", "text")
    // the graduated table and the store's own posexplode index keep the
    // IDENTICAL set (same band arrays, two layouts)
    val storeIdx = spark.read.parquet(corpus).where(col("bh").isNotNull)
      .select(col("doc_id").as("id"),
        posexplode(col("bh")).as(Seq("band", "bandHash")))
    val keptStore = graft.ops.Dedup.nearDupIncrementIndexed(storeIdx,
      storeTexts, batch, "text", "doc_id", 0.8, 32, 16, 3, 10000)
      .select("doc_id").as[Long].collect().toSet
    val keptTable = graft.ops.Dedup.nearDupIncrementIndexed(
      spark.table("grad_bands"), storeTexts, batch, "text", "doc_id",
      0.8, 32, 16, 3, 10000)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTable == keptStore && keptStore == Set(13L),
      s"store path kept $keptStore, table path kept $keptTable")
    // the post-graduation ingest loop: fold the kept batch into the
    // table (append) and the corpus text side, then a later batch's
    // near-copy of the newly-kept doc must drop via the APPENDED rows
    val kept = batch.where(col("doc_id") === 13L)
    graft.ops.Dedup.writeBandTable(kept, "text", "doc_id", "grad_bands",
      32, 16, 3, numBuckets = 4, append = true)
    val texts2 = storeTexts.unionAll(kept)
    val kept2 = graft.ops.Dedup.nearDupIncrementIndexed(
      spark.table("grad_bands"), texts2,
      Seq((21L, "zzq5 wwk5 ppj5 totally disjoint"),  // copy of 13 → drops
        (22L, "novel vocabulary entirely absent before")).toDF("doc_id", "text"),
      "text", "doc_id", 0.8, 32, 16, 3, 10000)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(22L), s"post-append probe kept $kept2")
    // refusal paths: a store with no signature layout has no recorded
    // config; a hand-mixed-config store would write a table that never
    // collides — both must throw, not write
    val legacyDir = java.nio.file.Files.createTempDirectory("sndg_l").toString
    Seq((1L, base)).toDF("doc_id", "text").write.parquet(s"$legacyDir/c/batch=0")
    intercept[IllegalArgumentException] {
      StreamingFlatten.graduateNearDupStore(
        spark, s"$legacyDir/c", "text", "doc_id", "grad_bands_l")
    }
    spark.read.parquet(s"$corpus/batch=1")
      .withColumn("numhashes", lit(64))
      .write.mode("overwrite").parquet(s"$corpus/batch=9")
    intercept[IllegalArgumentException] {
      StreamingFlatten.graduateNearDupStore(
        spark, corpus, "text", "doc_id", "grad_bands_m")
    }
  }

  test("stateless QC family runs unchanged on a stream: per-batch output equals the batch run") {
    // the pipeline claim beyond the stateful dedup ops: quality scoring,
    // charset QC, PII redaction, and standing-model LM scoring are all
    // stateless projections, so the SAME code runs on readStream frames
    // with no streaming-specific path — asserted by appending two
    // micro-batches and comparing against one batch run over the union
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.{Redact, TextAnalysis}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val modelCorpus = Seq(
      (100L, "alpha beta gamma alpha beta"),
      (101L, "beta gamma delta beta gamma"),
      (102L, "gamma delta alpha gamma delta")).toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.bigramModel(modelCorpus, "text", 20, 50)
    val (uc, bc) = (uni.localCheckpoint(true), bi.localCheckpoint(true))
    def qc(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      TextAnalysis.lmScore(df, "text", "doc_id", uc, bc)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          col("n_known_bigrams"), round(col("cross_entropy"), 6).as("h"),
          TextAnalysis.qualityScore(col("text")).as("q"),
          TextAnalysis.charClassCounts(col("text")).as("cc"),
          Redact.redact(col("text")).as("clean"))
    val batches = Seq(
      Seq((1L, "alpha beta gamma says hi to a@b.com"),
        (2L, "delta gamma beta and 10.1.1.1 talked")),
      Seq((3L, "unrelated words entirely here"),
        (4L, "alpha beta alpha beta alpha beta")))
    val in = MemoryStream[(Long, String)]
    val q = qc(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sqc").outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("sqc").collect().map(_.toSeq).toSet
      val batch = qc(batches.flatten.toDF("doc_id", "text")).collect()
        .map(_.toSeq).toSet
      assert(streamed == batch)
      assert(streamed.size == 4)
    } finally q.stop()
  }

  test("stream-stream interval join: watermarked state join over MemoryStream sides") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)

    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val views = MemoryStream[(Long, java.sql.Timestamp, String)]
    clicks.addData((1L, ts(10), "c1"), (1L, ts(100), "c2"), (2L, ts(10), "c3"))
    views.addData((1L, ts(12), "v1"), (1L, ts(300), "v2"), (3L, ts(10), "v3"))

    val joined = StreamingFlatten.intervalJoin(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      views.toDF().toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "ts", joinWindow = "15 minutes")
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("event_id", "r_event_id").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      // only (c1, v1) is same-user within ±15m; c2/v2 are 200m apart,
      // c3/v3 are different users
      assert(rows == Set(("c1", "v1")))
    } finally q.stop()
  }

  test("windowed aggregation with watermark over a rate-like stream") {
    import spark.implicits._
    val events = Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:20:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 3.0))
      .toDF("ts_s", "event_type", "value")
      .select(col("ts_s").cast(TimestampType).as("ts"), col("event_type"), col("value"))
    val agg = StreamingFlatten.windowedCounts(events, "ts", "event_type")
      .select(col("window.start").cast(StringType).as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()
    assert(agg.length == 2)
    assert(agg(0).getLong(2) == 2) // two clicks in hour 0
  }

  test("streamingPipeline: quality + decontaminate + store dedup per micro-batch, replay-idempotent, graduates") {
    import spark.implicits._
    val work = Files.createTempDirectory("spipe").toString
    val corpus = s"$work/corpus"; val out = s"$work/out"
    val rules = Some(graft.ops.TextFilters.Rules(minWords = 5,
      maxWords = 1000, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
      minAlphaWordRatio = 0.3, minStopwordHits = 1))
    val eval = Some(Seq("the held out benchmark sentence that must never " +
      "appear in any admitted training data").toDF("text"))
    def doc(i: Long) = (i, s"the ordinary document number $i with plenty " +
      s"of words about part ${i * 7} and supplier ${i % 13} here")
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      StreamingFlatten.pipelineBatch(rows.toDF("doc_id", "text"), id,
        "text", "doc_id", corpus, out, rules, eval,
        0.7, 32, 8, 3, 10000, 13)
    def admitted(id: Long): Set[Long] =
      spark.read.parquet(s"$out/batch=$id").select("doc_id").as[Long]
        .collect().toSet

    // batch 0: two fresh docs, a WITHIN-batch exact dup (higher id of
    // doc 1's text), a quality reject
    run(Seq(doc(1L), doc(2L), (91L, doc(1L)._2), (92L, "1 2 3")), 0)
    assert(admitted(0) == Set(1L, 2L), admitted(0))

    // batch 1: exact copy of a batch-0 admission, near copy with a
    // tail, a contaminated doc, a fresh doc
    val b1 = Seq(
      (101L, doc(1L)._2),                       // exact vs store → drop
      (102L, doc(2L)._2 + " tail"),             // near vs store → drop
      (103L, "the held out benchmark sentence that must never appear " +
        "in any admitted training data plus padding"), // decontaminate → drop
      doc(110L))                                 // fresh → keep
    run(b1, 1)
    assert(admitted(1) == Set(110L), admitted(1))
    // replay of batch 1 (failure recovery): identical admissions, store
    // does not double-count its own partial write
    run(b1, 1)
    assert(admitted(1) == Set(110L), "replay must reproduce admissions")
    val store = spark.read.parquet(corpus)
    assert(store.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 110L))
    assert(store.columns.contains("fp") && store.columns.contains("bh"))

    // batch 2: copy of a batch-1 admission drops via the store loop
    run(Seq((201L, doc(110L)._2), doc(220L)), 2)
    assert(admitted(2) == Set(220L), admitted(2))

    // the pipeline store graduates to the batch pipeline's band table
    // (schema superset of streamingNearDup's store)
    val (nh, bd, ss) = StreamingFlatten.graduateNearDupStore(
      spark, corpus, "text", "doc_id", "spipe_grad", numBuckets = 4)
    assert((nh, bd, ss) == ((32, 8, 3)))
    spark.sql("DROP TABLE IF EXISTS spipe_grad")
  }

  test("streamingPipeline classifier: model-rejected docs never reach the store or the output") {
    import spark.implicits._
    val work = Files.createTempDirectory("spipe_cl").toString
    val corpus = s"$work/corpus"; val out = s"$work/out"
    val labeled = Seq(
      ("helpful prose about parts and suppliers", true),
      ("clear writing with useful words", true),
      ("spam casino jackpot", false),
      ("casino spam offers", false)).toDF("text", "is_pos")
    val m = graft.ops.Classify.nbTrain(labeled, "text", "is_pos",
      vocabSize = 100)
    // materialized weights frame — the streamingPipeline contract (an
    // unmaterialized one would re-run training every micro-batch)
    val mm = m.copy(weights = m.weights.localCheckpoint(true))
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      StreamingFlatten.pipelineBatch(rows.toDF("doc_id", "text"), id,
        "text", "doc_id", corpus, out, None, None,
        0.7, 32, 8, 3, 10000, 13, classifier = Some(mm))
    run(Seq(
      (1L, "helpful prose and clear words here"),
      (2L, "spam casino jackpot spam casino")), 0)
    assert(spark.read.parquet(s"$out/batch=0").select("doc_id").as[Long]
      .collect().toSet == Set(1L))
    // the rejected doc was judged BEFORE admission: absent from the
    // store too, so it can never shadow a future legitimate twin
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("streamingPipeline lm filter: high-entropy docs are cut before admission (stage 2c twin)") {
    import spark.implicits._
    val work = Files.createTempDirectory("spipe_lm").toString
    val corpus = s"$work/corpus"; val out = s"$work/out"
    val trusted = (1 to 40)
      .map(i => s"the quick brown fox jumps over the lazy dog number $i")
      .toDF("text")
    val (uni, bi) = graft.ops.TextAnalysis.bigramModel(trusted, "text",
      vocabSize = 100, maxBigrams = 500)
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "zzq qxj vvk wwy kjq pzx mmv nnb ccd rrf"),
      (3L, "zzqx") // unscorable 1-token junk: minTokens must drop it
    ).toDF("doc_id", "text")
    // cut from the public scorer itself (the PipelineLoopSpec 2c pin)
    val ce = graft.ops.TextAnalysis.lmScore(batch, "text", "doc_id", uni, bi)
      .select("doc_id", "cross_entropy").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    StreamingFlatten.pipelineBatch(batch, 0L, "text", "doc_id", corpus, out,
      None, None, 0.7, 32, 8, 3, 10000, 13,
      lmFilter = Some(graft.ops.Pipeline.LmFilter(uni, bi,
        maxCrossEntropy = (ce(1L) + ce(2L)) / 2)))
    assert(spark.read.parquet(s"$out/batch=0").select("doc_id").as[Long]
      .collect().toSet == Set(1L))
    assert(spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("streamingPipeline scrub + redact: store holds the canonical unredacted form, output redacts, re-junked copies drop") {
    import spark.implicits._
    val work = Files.createTempDirectory("spipe_sr").toString
    val corpus = s"$work/corpus"; val out = s"$work/out"
    val content = "the ordinary streamed document with plenty of words " +
      "about parts and suppliers in this sentence here."
    val contact = "contact us at alice@example.com for more details."
    val rules = Some(graft.ops.TextFilters.Rules(minWords = 5,
      maxWords = 1000, minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
      minAlphaWordRatio = 0.3, minStopwordHits = 1))
    def run(rows: Seq[(Long, String)], id: Long): Unit =
      StreamingFlatten.pipelineBatch(rows.toDF("doc_id", "text"), id,
        "text", "doc_id", corpus, out, rules, None,
        0.7, 32, 8, 3, 10000, 13, None,
        scrub = Some(graft.ops.Pipeline.Scrub()), redactPii = true)

    // batch 0: a junky doc (junk scrubs away, PII stays in the STORE,
    // redacts in the OUTPUT) and a junk-only doc (quality-dropped)
    run(Seq(
      (1L, content + "\nclick here javascript tracking pixel\n" + contact),
      (2L, "no terminal punctuation here\nbuy now")), 0)
    val store0 = spark.read.parquet(s"$corpus/batch=0")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(store0.keySet == Set(1L))
    assert(store0(1L) == content + "\n" + contact,
      s"store must hold the scrubbed UNREDACTED form, got: ${store0(1L)}")
    val out0 = spark.read.parquet(s"$out/batch=0")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out0(1L) ==
      content + "\n" + contact.replace("alice@example.com", "[EMAIL]"),
      s"output must be redacted, got: ${out0(1L)}")

    // batch 1: the SAME content under DIFFERENT junk is an exact dup of
    // batch 0's admission (scrub canonicalizes before the stored-fp
    // anti-join); a fresh doc survives
    val freshText = "a genuinely fresh streamed report with plenty of " +
      "other ordinary words about different things entirely here."
    run(Seq(
      (10L, "lorem ipsum boilerplate footer\n" + content + "\n" + contact),
      (11L, freshText)), 1)
    val out1 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id").as[Long].collect().toSet
    assert(out1 == Set(11L),
      s"re-junked copy must drop against the canonical store, got $out1")
  }
}
