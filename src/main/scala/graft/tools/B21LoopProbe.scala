package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Closed-loop streaming→batch promotion at BENCH scale (r20, VERDICT
  * item 4): the lifecycle seams are all specced small (StreamingSpec
  * graduation roundtrip, PipelineLoopSpec day-2/3 through a graduated
  * store) but nothing exercised the full sequence on ONE 600k-doc
  * standing corpus. This probe runs, at sf0.1:
  *
  *   1. stream-ingest  — `StreamingFlatten.pipelineBatch` micro-batch 1
  *                       against the seeded store (exact copies drop,
  *                       tailed fresh docs admit to `batch=1`)
  *   2. agreement      — the SAME batch probed through the store's
  *                       posexploded `bh` arrays and through the
  *                       graduated bucketed band table must admit the
  *                       IDENTICAL id set (the two standing-band
  *                       representations agree at scale, not just in
  *                       StreamingSpec's 60-row roundtrip)
  *   3. graduate       — `graduateNearDupStore` + a fingerprint table
  *                       from the store docs (the promotion cost itself,
  *                       timed once — a once-per-promotion cost)
  *   4. batch-fold day — `ops/Pipeline.run` over a daily batch carrying
  *                       exact copies of the STREAMED admissions (must
  *                       drop through the promoted fingerprint table),
  *                       then `Pipeline.fold` + a store append of the
  *                       admitted docs (the batch day's admissions must
  *                       be visible to BOTH representations)
  *   5. stream-resume  — `pipelineBatch` micro-batch 3 carrying exact
  *                       copies of the BATCH-day admissions (must drop
  *                       against the store the append extended)
  *
  * Every leg asserts its drop/keep contract on exact copies (the
  * unambiguous class); near-dup keeps whatever the dials keep — the
  * probe measures cost and pins CONTINUITY, the per-operator semantics
  * have their own oracles. Corpus synthesis replicates Bench's b17/b21
  * rows (the B21Probe convention).
  *
  * Run: java -cp "target/scala-2.13/classes:&lt;spark jars&gt;"
  *      graft.tools.B21LoopProbe [sfDir]
  */
object B21LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // honors SPARK_GRAFT_CPUS so the probe doubles as the b21 family's
    // low-core/high-core scaling point (r22: the driver's cpus leg is
    // vacuous at sf0.1 bench rows — this probe's legs are the heaviest
    // b21-shaped work on the box)
    val nCpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$nCpus]")
      .config("spark.sql.shuffle.partitions", nCpus)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b21loop_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = Runtime.getRuntime.availableProcessors

    def corpusText(ok: Column, lnum: Column, pk: Column, sk: Column,
        qty: Column, price: Column, rf: Column): Column =
      concat_ws(" ", lit("the record of orders"), ok, lit("item"), lnum,
        lit("holds part number"), pk, lit("from supplier code"), sk,
        lit("delivering"), qty, lit("pieces priced near"), price,
        lit("beneath flag mark"), rf)
    def batchText(ok: Column, lnum: Column, pk: Column, sk: Column,
        qty: Column, price: Column, rf: Column): Column =
      concat_ws(" ", lit("the line"), lnum, lit("of order"), ok,
        lit("has part"), pk, lit("and supplier"), sk, lit("to ship"), qty,
        lit("units that total"), price, lit("with flag"), rf)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"))
      .repartition(cpus)
    val std = li.select(
        (col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
        corpusText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("text"))
      .localCheckpoint(true)
    val daily = li.select(
        (col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
        batchText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("text"))
      .localCheckpoint(true)
    val rules = graft.ops.TextFilters.Rules(minWords = 10, maxWords = 1000,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.4,
      minStopwordHits = 2)
    val pm = pmod(col("doc_id"), lit(100L))
    val work = java.nio.file.Files.createTempDirectory("b21loop").toString
    val corpusDir = s"$work/corpus"

    def withSigs(df: DataFrame): DataFrame = df.select(
      col("doc_id"), col("text"),
      graft.ops.TextAnalysis.fingerprintBin(col("text")).as("fp"),
      graft.functions.TextHash.minhashBandsUdf(32, 8, 3)(col("text")).as("bh"),
      lit(32).as("numhashes"), lit(8).as("bands"), lit(3).as("shinglesize"))
    def time[T](name: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val v = f
      println(f"[b21loop] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      v
    }
    import spark.implicits._
    def ids(df: DataFrame): Set[Long] =
      df.select("doc_id").as[Long].collect().toSet

    // seed the store (batch=0, untimed — the once-per-corpus cost)
    withSigs(std).write.mode("overwrite").parquet(s"$corpusDir/batch=0")
    println(s"[b21loop] store seeded: ${spark.read.parquet(corpusDir).count()} rows")

    // ---- 1. stream-ingest: micro-batch 1 -------------------------------
    // drops: exact store copies; keeps: daily-wording docs (the b17
    // batch wording — shares no meaningful 3-shingle with the corpus
    // wording, so neither dedup stage can touch them). NOT the b21
    // bench's tailed docs: a 3-token tail on a ~23-token doc is Jaccard
    // ~0.87 ≥ 0.7 and near-dup drops it — this probe needs docs that
    // genuinely ADMIT so the later legs have state to carry forward.
    val batch1 = std.where(pm === 0)
      .select((col("doc_id") + 30000000L).as("doc_id"), col("text"))
      .unionAll(daily.where(pm === 50)
        .select((col("doc_id") + 40000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    // warm the write/codegen paths once (replay-idempotent: batch=1
    // overwrites itself)
    graft.streaming.StreamingFlatten.pipelineBatch(batch1, 1L, "text",
      "doc_id", corpusDir, s"$work/out", Some(rules), None,
      0.7, 32, 8, 3, 1000, 13)
    time("stream-ingest (batch 1)") {
      graft.streaming.StreamingFlatten.pipelineBatch(batch1, 1L, "text",
        "doc_id", corpusDir, s"$work/out", Some(rules), None,
        0.7, 32, 8, 3, 1000, 13)
    }
    val streamed = spark.read.parquet(corpusDir).where(col("batch") === 1)
      .select("doc_id", "text").localCheckpoint(true)
    val streamedIds = ids(streamed)
    require(streamedIds.forall(_ >= 40000000L),
      "stream-ingest admitted an exact store copy")
    require(streamedIds.nonEmpty, "stream-ingest admitted nothing")
    println(s"[b21loop] stream admitted ${streamedIds.size} docs")

    // ---- 3. graduate (timed once — the promotion cost) ------------------
    spark.sql("DROP TABLE IF EXISTS b21loop_bands")
    spark.sql("DROP TABLE IF EXISTS b21loop_fp")
    val storeDocs = spark.read.parquet(corpusDir).select("doc_id", "text")
      .localCheckpoint(true)
    time("graduate (band + fp tables)") {
      graft.streaming.StreamingFlatten.graduateNearDupStore(
        spark, corpusDir, "text", "doc_id", "b21loop_bands", numBuckets = 32)
      graft.ops.Dedup.writeFingerprintTable(storeDocs, "text", "b21loop_fp",
        numBuckets = 32)
    }

    // ---- 2. agreement: store index vs graduated table, same probe ------
    val store = spark.read.parquet(corpusDir)
    val storeBands = store.select(col("doc_id").as("id"),
      posexplode(col("bh")).as(Seq("band", "bandHash")))
    // a non-trivial partition for the agreement check: tailed corpus
    // copies (near-dups — drop) plus daily-wording docs (fresh — keep)
    val probeBatch = std.where(pm === 51)
      .select((col("doc_id") + 45000000L).as("doc_id"),
        concat(col("text"), lit(" probe tail words")).as("text"))
      .unionAll(daily.where(pm === 54)
        .select((col("doc_id") + 50000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    val viaStore = time("near-dup probe via store")(ids(
      graft.ops.Dedup.nearDupIncrementIndexed(storeBands,
        storeDocs, probeBatch, "text", "doc_id", 0.7, 32, 8, 3, 1000)))
    val viaTable = time("near-dup probe via table")(ids(
      graft.ops.Dedup.nearDupIncrementIndexed(spark.table("b21loop_bands"),
        storeDocs, probeBatch, "text", "doc_id", 0.7, 32, 8, 3, 1000)))
    require(viaStore == viaTable,
      s"graduated table and native store DISAGREE: ${
        (viaStore diff viaTable).size} store-only, ${
        (viaTable diff viaStore).size} table-only")
    val probeN = probeBatch.count()
    require(viaStore.nonEmpty && viaStore.size < probeN,
      s"agreement check degenerate (${viaStore.size} of $probeN kept) — " +
        "it must exercise both the drop and the keep side")
    println(s"[b21loop] agreement: both representations admit ${viaStore.size} " +
      s"of $probeN probe docs — identical sets")

    // ---- 4. batch-fold day through the public Pipeline API -------------
    val cfg = graft.ops.Pipeline.Config(
      textCol = "text", idCol = "doc_id",
      rules = Some(rules),
      fingerprintTable = Some("b21loop_fp"),
      bandTable = Some("b21loop_bands"),
      nearDup = graft.ops.Pipeline.NearDup(threshold = 0.7, numHashes = 32,
        bands = 8, shingleSize = 3, maxBucket = 1000),
      numBuckets = 32)
    // fresh daily docs at [60M, ~65M); exact copies of the STREAMED
    // admissions (ids [40M, ~45M)) at +100M → [140M, ~145M)
    val day2 = daily.where(pm === 52)
      .select((col("doc_id") + 60000000L).as("doc_id"), col("text"))
      .unionAll(streamed
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    val kept2 = time("batch day (run + fold + append)") {
      val res = graft.ops.Pipeline.run(day2, cfg, corpus = Some(storeDocs))
      val kept = ids(res.kept)
      graft.ops.Pipeline.fold(
        day2.join(res.kept.select("doc_id"), Seq("doc_id"), "left_semi"), cfg)
      // make the batch day's admissions visible to the STREAM side too:
      // append them to the store as their own batch partition (the same
      // columns pipelineBatch writes)
      withSigs(day2.join(res.kept.select("doc_id"), Seq("doc_id"), "left_semi"))
        .write.mode("overwrite").parquet(s"$corpusDir/batch=2")
      if (res.ownsKept) graft.util.Checkpoints.release(res.kept)
      kept
    }
    require(!kept2.exists(_ >= 100000000L),
      "batch day admitted an exact copy of a streamed admission — the " +
        "promoted fingerprint table lost the stream's state")
    require(kept2.nonEmpty, "batch day admitted nothing fresh")
    println(s"[b21loop] batch day admitted ${kept2.size} docs " +
      "(every streamed-admission copy dropped)")

    // ---- 5. stream-resume: micro-batch 3 against the extended store ----
    val day2Admitted = spark.read.parquet(corpusDir)
      .where(col("batch") === 2).select("doc_id", "text").localCheckpoint(true)
    // fresh daily docs at [80M, ~85M); exact copies of the BATCH-day
    // admissions (ids [60M, ~65M)) at +100M → [160M, ~165M)
    val batch3 = daily.where(pm === 53)
      .select((col("doc_id") + 80000000L).as("doc_id"), col("text"))
      .unionAll(day2Admitted
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    time("stream-resume (batch 3)") {
      graft.streaming.StreamingFlatten.pipelineBatch(batch3, 3L, "text",
        "doc_id", corpusDir, s"$work/out", Some(rules), None,
        0.7, 32, 8, 3, 1000, 13)
    }
    val resumedIds = ids(spark.read.parquet(corpusDir)
      .where(col("batch") === 3).select("doc_id"))
    require(!resumedIds.exists(_ >= 100000000L),
      "stream-resume admitted an exact copy of a batch-day admission — " +
        "the store append lost the batch day's state")
    require(resumedIds.nonEmpty, "stream-resume admitted nothing")
    println(s"[b21loop] stream-resume admitted ${resumedIds.size} docs " +
      "(every batch-day-admission copy dropped)")
    println("[b21loop] closed loop GREEN: stream -> graduate -> batch-fold " +
      "-> stream-resume on one standing corpus")
    spark.stop()
  }
}
