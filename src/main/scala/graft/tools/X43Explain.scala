package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot plan dump for the r8 operators (x43/x44) — eyeball the
  * exchange count and partial-aggregation shape at sf0.001.
  */
object X43Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("x43-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val x43 = graft.ops.Dedup.sharedWindowFlags(d, "text", "doc_id", n = 10)
    x43.collect()
    println("=== x43 sharedWindowFlags (final adaptive plan) ===")
    println(x43.queryExecution.executedPlan.toString)
    val x44 = graft.ops.TextAnalysis.rareTokenRatio(d, "text", "doc_id", 5)
    x44.collect()
    println("=== x44 rareTokenRatio (final adaptive plan) ===")
    println(x44.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
