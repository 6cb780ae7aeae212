package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for b17's stage 2 (ingest + quality): how much of
  * the 8.8 s is the NDJSON schema-inference scan that
  * `spark.read.json` performs eagerly, vs the parse proper, vs the
  * quality kernel + checkpoint. A daily-batch adopter knows the
  * landing schema, so inference is a once-per-release cost in
  * production — if it dominates here, the bench should ingest with an
  * explicit schema like the pipeline it models.
  */
object B17IngestProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threads = args.drop(1).headOption.getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b17probe_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jsonDir = java.nio.file.Files.createTempDirectory("b17probe_json").toString + "/docs"
    graft.SparkEntry.nestedOrders(spark, sfDir).write.mode("overwrite").json(jsonDir)
    val sizeMb = new java.io.File(jsonDir).listFiles().map(_.length).sum / 1e6
    println(f"ndjson size: $sizeMb%.0f MB")

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm FS cache + codegen
    spark.read.json(jsonDir).count()

    // Bench's b17Batch, replicated (graft/Bench.scala b17Batch/b17*Text)
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
    def items() = graft.plan.FlattenPlanner.flatten(
      graft.sources.JsonInput.ndjson(spark, jsonDir),
      graft.model.FlattenOptions(
        linkMode = graft.model.LinkMode.NaturalKey("o_orderkey"),
        dropEmptyObjects = false))("items")
    def batch() = {
      val synth = items().select(
        (col("_link_main").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
        corpusText(col("_link_main"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("__tc"),
        batchText(col("_link_main"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("__tb"),
        concat_ws(" ", col("l_quantity"), col("l_extendedprice"),
          col("l_partkey"), col("l_suppkey")).as("__td"))
      val pm = pmod(col("doc_id"), lit(100L))
      val b = synth.select(col("doc_id"),
        when(pm === 0, col("__tc"))
          .when(pm === 2, concat(col("__tc"), lit(" plus appended tail words")))
          .when(pm === 4, col("__td"))
          .otherwise(col("__tb")).as("text"))
      b.unionAll(b.where(pm === 1)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
    }
    val rules = graft.ops.TextFilters.Rules(minWords = 10, maxWords = 1000,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.4,
      minStopwordHits = 2)

    (1 to 3).foreach { i =>
      t(s"[$i] a. flatten items, noop full-field write") {
        items().write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] b. + batch synthesis, noop") {
        batch().write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] c. + quality kernel filter, noop") {
        graft.ops.TextFilters(batch(), "text", rules)
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] d. + localCheckpoint (the real stage 2)") {
        graft.ops.TextFilters(batch(), "text", rules)
          .localCheckpoint(true) match {
            case m => graft.util.Checkpoints.release(m)
          }
      }
      val trivialUdf = udf((t: String) => t != null)
      t(s"[$i] e. batch + TRIVIAL udf filter, noop") {
        batch().where(trivialUdf(col("text")))
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$i] f. batch MATERIALIZED, then kernel filter, noop") {
        val m = batch().localCheckpoint(true)
        println(s"     (batch partitions: ${m.rdd.getNumPartitions})")
        graft.ops.TextFilters(m, "text", rules)
          .write.format("noop").mode("overwrite").save()
        graft.util.Checkpoints.release(m)
      }
      t(s"[$i] g. batch REPARTITIONED(32) + kernel filter + checkpoint") {
        graft.ops.TextFilters(
          batch().repartition(32), "text", rules)
          .localCheckpoint(true) match {
            case m => graft.util.Checkpoints.release(m)
          }
      }
      t(s"[$i] h. instrumented kernel filter (calls + in-UDF nanos)") {
        val calls = spark.sparkContext.longAccumulator("calls")
        val nanos = spark.sparkContext.longAccumulator("nanos")
        val instUdf = udf { (t: String) =>
          val t0 = System.nanoTime()
          val r = t != null && {
            val st = graft.functions.TextHash.gopherStats(t)
            st.nWords >= 10 && st.nWords <= 1000 &&
              (st.nWords == 0 || (st.sumWordLen.toDouble / st.nWords) <= 10.0) &&
              st.stopHits >= 2
          }
          calls.add(1L); nanos.add(System.nanoTime() - t0)
          r
        }
        val m = batch().localCheckpoint(true)
        m.where(instUdf(col("text"))).write.format("noop").mode("overwrite").save()
        println(f"     calls=${calls.value} in-udf=${nanos.value / 1e9}%.2f s (${nanos.value / 1e3 / Math.max(1, calls.value)}%.1f us/call)")
        graft.util.Checkpoints.release(m)
      }
    }
    // driver-side kernel microbench: same wordy strings, single thread
    val sample = (0 until 200000).map { k =>
      s"the line ${k % 7} of order $k has part ${k * 31} and supplier ${k % 997} " +
        s"to ship ${k % 50} units that total ${k * 3}.14 with flag N"
    }
    val t0 = System.nanoTime()
    var acc = 0L
    sample.foreach { s => acc += graft.functions.TextHash.gopherStats(s).nWords }
    println(f"driver kernel: ${(System.nanoTime() - t0) / 1e3 / sample.size}%.2f us/doc (acc=$acc)")
    spark.stop()
  }
}
