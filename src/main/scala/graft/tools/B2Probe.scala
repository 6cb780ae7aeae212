package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.functions.TextHash

/** Stage-by-stage timing of the b2 minhash bench to locate hot spots. */
object B2Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    val docs = base.unionAll(planted).repartition(32).persist()
    t("materialize docs")(docs.count())

    t("signature only") {
      docs.select(TextHash.minhashUdf(32, 3)(col("text"))).write
        .format("noop").mode("overwrite").save()
    }
    t("bands kernel only") {
      docs.select(TextHash.minhashBandsUdf(32, 4, 3)(col("text"))).write
        .format("noop").mode("overwrite").save()
    }
    val banded = docs
      .select(col("doc_id").as("id"),
        TextHash.minhashBandsUdf(32, 4, 3)(col("text")).as("bh"))
      .select(col("id"), posexplode(col("bh")).as(Seq("band", "bandHash")))
    t("bands + explode") {
      banded.write.format("noop").mode("overwrite").save()
    }
    t("bands + explode + codegen count agg") {
      banded.groupBy("band", "bandHash").agg(count(lit(1)).as("n"))
        .where(col("n") >= 2)
        .write.format("noop").mode("overwrite").save()
    }
    t("shingle kernel only") {
      docs.select(TextHash.shingleHashesUdf(3)(col("text"))).write
        .format("noop").mode("overwrite").save()
    }
    val cands = Dedup.minhashCandidates(docs, "text", "doc_id", 32, 4, 3, 1000).persist()
    println("=== candidates physical plan (expect ONE Exchange of banded rows) ===")
    cands.explain("formatted")
    val nc = t("candidates")(cands.count())
    println(s"candidate pairs: $nc")
    t("verify jaccard") {
      Dedup.minhashDedupPairs(docs, "text", "doc_id", 0.9, 32, 4, 3, 1000)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
