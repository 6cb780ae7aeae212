package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused A/B probe for the bigram-LM phases (bench rows b11/b12 are
  * whole-pipeline medians; this isolates model build vs scoring on the
  * same 600k-doc corpus, min of `reps`, for plan-change comparisons).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.LmProbe"
  */
object LmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lm-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the bench's b2-corpus shape: one text per lineitem row
    def corpus(dir: String): DataFrame =
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"), col("l_suppkey"))
        .repartition(cpus.toInt)
        .withColumn("doc_id", monotonically_increasing_id())
        .withColumn("text", concat_ws(" ",
          col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"), col("l_suppkey")))
        .select("doc_id", "text")

    val docs = corpus(sfDir).localCheckpoint(true)
    System.err.println(s"[lmprobe] corpus rows: ${docs.count()}")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup
    graft.ops.TextAnalysis.bigramModel(docs.limit(2000), "text", 2000, 20000)
      ._2.write.format("noop").mode("overwrite").save()

    val build = (1 to reps).map { _ =>
      time {
        val (u, b) = graft.ops.TextAnalysis.bigramModel(docs, "text", 20000, 200000)
        u.write.format("noop").mode("overwrite").save()
        b.write.format("noop").mode("overwrite").save()
      }
    }
    val (uni, bi) = graft.ops.TextAnalysis.bigramModel(docs, "text", 20000, 200000)
    val (uc, bc) = (uni.localCheckpoint(true), bi.localCheckpoint(true))
    val score = (1 to reps).map { _ =>
      time {
        graft.ops.TextAnalysis.lmScore(docs, "text", "doc_id", uc, bc)
          .write.format("noop").mode("overwrite").save()
      }
    }
    println(f"""{"build_min":${build.min}%.2f,"build_all":[${build.map(t => f"$t%.2f").mkString(",")}],""" +
      f""""score_min":${score.min}%.2f,"score_all":[${score.map(t => f"$t%.2f").mkString(",")}]}""")
    spark.stop()
  }
}
