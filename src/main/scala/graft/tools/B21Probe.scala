package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Attribution probe for the b21 streaming-pipeline bench row (r19,
  * first recorded point ~7.5 s at sf0.1): where does one 12k-doc
  * micro-batch's time go against a 600k-doc store, and what would
  * GRADUATING the store to a bucketed band table
  * ([[graft.streaming.StreamingFlatten.graduateNearDupStore]]) buy per
  * batch? Times, min-of-N each:
  *
  *   - `full`       — Bench.runB21 verbatim (pipelineBatch vs the store)
  *   - `stateless`  — quality + once-built eval-Bloom decontamination
  *                    only (no store, no writes)
  *   - `exact`      — the fp anti-join + min-id stage vs the stored fps
  *   - `neardup-store` — the near-dup probe over the store's
  *                    posexploded `bh` arrays (what pipelineBatch runs)
  *   - `neardup-graduated` — the same probe through the bucketed band
  *                    TABLE the store graduates to (exact-verify side
  *                    unchanged: candidate texts from the store)
  *
  * A third arg scales the STORE (same batch): `10` seeds a 6M-doc store
  * from 10 suffixed replicas (distinct ids and texts — duplicate
  * structure does not grow, the ScaleCurve convention) and measures the
  * per-batch cost ratio that pins §b21's corpus-linear claim.
  *
  * Run: java -cp "target/scala-2.13/classes:&lt;spark jars&gt;"
  *      graft.tools.B21Probe [sfDir] [reps] [storeScale]
  */
object B21Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val storeScale = args.drop(2).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b21probe_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = Runtime.getRuntime.availableProcessors

    // Bench's b17/b21 corpus, batch, rules, eval — replicated verbatim
    def corpusText(ok: org.apache.spark.sql.Column, lnum: org.apache.spark.sql.Column,
        pk: org.apache.spark.sql.Column, sk: org.apache.spark.sql.Column,
        qty: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
        rf: org.apache.spark.sql.Column) =
      concat_ws(" ", lit("the record of orders"), ok, lit("item"), lnum,
        lit("holds part number"), pk, lit("from supplier code"), sk,
        lit("delivering"), qty, lit("pieces priced near"), price,
        lit("beneath flag mark"), rf)
    def batchText(ok: org.apache.spark.sql.Column, lnum: org.apache.spark.sql.Column,
        pk: org.apache.spark.sql.Column, sk: org.apache.spark.sql.Column,
        qty: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
        rf: org.apache.spark.sql.Column) =
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
    val eval = li.select(
        (col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
        batchText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("text"))
      .where(pmod(col("doc_id"), lit(100L)) === 3).select("text")
      .localCheckpoint(true)
    val rules = graft.ops.TextFilters.Rules(minWords = 10, maxWords = 1000,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.4,
      minStopwordHits = 2)
    val work = java.nio.file.Files.createTempDirectory("b21probe").toString
    val corpusDir = s"$work/corpus"
    // storeScale > 1: replica 0 keeps the ORIGINAL texts (the batch's
    // planted copies reference them); replicas k >= 1 get distinct ids
    // and suffixed texts, so the store grows without growing duplicate
    // structure
    val stored =
      if (storeScale == 1) std
      else (1 until storeScale).map { k =>
        std.select((col("doc_id") + k * 1000000000L).as("doc_id"),
          concat(col("text"), lit(s" replica copy $k")).as("text"))
      }.foldLeft(std)(_ unionAll _).localCheckpoint(true)
    stored.select(col("doc_id"), col("text"),
        graft.ops.TextAnalysis.fingerprintBin(col("text")).as("fp"),
        graft.functions.TextHash.minhashBandsUdf(32, 8, 3)(col("text")).as("bh"),
        lit(32).as("numhashes"), lit(8).as("bands"), lit(3).as("shinglesize"))
      .write.mode("overwrite").parquet(s"$corpusDir/batch=0")
    val pm = pmod(col("doc_id"), lit(100L))
    val batch = std.where(pm === 0)
      .select((col("doc_id") + 30000000L).as("doc_id"), col("text"))
      .unionAll(std.where(pm === 50)
        .select((col("doc_id") + 40000000L).as("doc_id"),
          concat(col("text"), lit(" streamed tail words")).as("text")))
      .localCheckpoint(true)
    val bloom = Some(graft.ops.Decontaminate.buildBloom(eval, "text", 13))
    // graduate NOW, while the store is exactly batch=0 — the timed
    // store-side variants below all probe the same 600k rows
    spark.sql("DROP TABLE IF EXISTS b21probe_bands")
    val (nh, bd, ss) = graft.streaming.StreamingFlatten.graduateNearDupStore(
      spark, corpusDir, "text", "doc_id", "b21probe_bands", numBuckets = 32)
    println(s"[b21probe] sf=$sfDir reps=$reps batch=${batch.count()} " +
      s"storeScale=$storeScale storeRows=${stored.count()} " +
      s"graduated=($nh,$bd,$ss)")

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[b21probe] $name%-22s min ${ts.min}%6.2f  all ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    // warm everything once
    graft.streaming.StreamingFlatten.pipelineBatch(batch, 1L, "text",
      "doc_id", corpusDir, s"$work/out", Some(rules), Some(eval),
      0.7, 32, 8, 3, 1000, 13, bloom)

    time("full") {
      graft.streaming.StreamingFlatten.pipelineBatch(batch, 1L, "text",
        "doc_id", corpusDir, s"$work/out", Some(rules), Some(eval),
        0.7, 32, 8, 3, 1000, 13, bloom)
    }

    // stateless prefix: quality + Bloom decon only (no store, no writes)
    time("stateless") {
      val q = graft.ops.TextFilters(batch, "text", rules)
      graft.ops.Decontaminate.decontaminateBloomPrepared(
          q, "text", "doc_id", eval, "text", bloom.get)
        .write.format("noop").mode("overwrite").save()
    }

    val store = spark.read.parquet(corpusDir).where(col("batch") === 0)
    val fpB = graft.ops.TextAnalysis.fingerprintBin(col("text"))
    time("exact") {
      val batchKeys = batch.select(fpB.as("__k"), col("doc_id"))
      val freshKeys = batchKeys.join(store.select(col("fp").as("__k")),
        Seq("__k"), "left_anti")
      freshKeys.groupBy("__k").agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    val storeBands = store.select(col("doc_id").as("id"),
      posexplode(col("bh")).as(Seq("band", "bandHash")))
    time("neardup-store") {
      graft.ops.Dedup.nearDupIncrementIndexed(storeBands,
          store.select(col("doc_id"), col("text")), batch, "text", "doc_id",
          0.7, 32, 8, 3, 1000)
        .write.format("noop").mode("overwrite").save()
    }

    time("neardup-graduated") {
      graft.ops.Dedup.nearDupIncrementIndexed(spark.table("b21probe_bands"),
          store.select(col("doc_id"), col("text")), batch, "text", "doc_id",
          0.7, 32, 8, 3, 1000)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
