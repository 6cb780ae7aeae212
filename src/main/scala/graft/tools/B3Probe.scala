package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Phase timing of the b3 near-dedup-apply bench: pair finding vs the
  * connected-components loop vs the final payload anti-join.
  */
object B3Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_partkey"), col("l_suppkey")).as("text"))
    val planted = base.where(col("doc_id") % 100 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val docs = base.unionAll(planted).repartition(32)

    // warmup round (codegen/classloading), untimed
    Dedup.minhashDedupPairs(docs.limit(1000), "text", "doc_id",
      threshold = 0.9, numHashes = 32, bands = 4, shingleSize = 3,
      maxBucket = 1000).write.format("noop").mode("overwrite").save()

    val pairs = Dedup.minhashDedupPairs(docs, "text", "doc_id",
      threshold = 0.9, numHashes = 32, bands = 4, shingleSize = 3,
      maxBucket = 1000).select("id_a", "id_b")

    val mat = t("pairs materialize (localCheckpoint)")(pairs.localCheckpoint(true))
    println(s"  pair count: ${mat.count()}")

    val labels = t("connectedComponents on materialized pairs")(
      Dedup.connectedComponents(mat).localCheckpoint(true))
    println(s"  label count: ${labels.count()}")

    t("losers + anti-join") {
      val losers = labels.where(col("id") =!= col("label"))
        .select(col("id").as("doc_id"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .write.format("noop").mode("overwrite").save()
    }

    t("full dedupByPairs (lazy pairs, as benched)") {
      Dedup.dedupByPairs(docs, "doc_id", pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
