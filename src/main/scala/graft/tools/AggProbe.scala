package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash

/** Minimal isolation of the b2 hot step: why does a 2.4M-row
  * groupBy(band, bandHash) cost ~6 s when the same rows scan in 0.6 s?
  * Times exchange-only, agg-on-synthetic-keys, and agg-on-UDF-keys
  * separately.
  */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[aggprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_partkey"), col("l_suppkey")).as("text"))
      .repartition(32).persist()
    t("materialize docs")(docs.count())

    val banded = docs
      .select(col("doc_id").as("id"),
        TextHash.minhashBandsUdf(32, 4, 3)(col("text")).as("bh"))
      .select(col("id"), posexplode(col("bh")).as(Seq("band", "bandHash")))

    // warmup
    t("warm scan")(banded.write.format("noop").mode("overwrite").save())

    val synth = docs.select(col("doc_id").as("id"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bandHash", xxhash64(col("id"), col("band")) % 200000)

    t("synthetic keys: scan only")(
      synth.write.format("noop").mode("overwrite").save())
    t("synthetic keys: groupBy count")(
      synth.groupBy("band", "bandHash").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save())
    t("synthetic keys: repartition (exchange only)")(
      synth.repartition(col("band"), col("bandHash"))
        .write.format("noop").mode("overwrite").save())
    t("udf keys: groupBy count")(
      banded.groupBy("band", "bandHash").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save())
    t("udf keys: groupBy count (2nd)")(
      banded.groupBy("band", "bandHash").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save())
    t("udf keys pre-materialized then groupBy") {
      val m = banded.localCheckpoint(true)
      m.groupBy("band", "bandHash").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
