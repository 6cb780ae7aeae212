package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot plan inspection for the probed pair generator: does the
  * exact-bucket side and the probe side share ONE evaluation of the
  * signature+window pipeline (ReusedExchange), or does the corpus pay
  * the signature kernel twice?
  *
  *   sbt "runMain graft.tools.ProbedPlanCheck"
  */
object ProbedPlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-probed-plan")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = SyntheticVectors.df(spark, 5000L, partitions = 4)
    val pairs = graft.ops.Similarity.cosineDedupPairs(corpus,
      "vec_id", "embedding", threshold = 0.9, nBits = 8, probeDepth = 1)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    println("REUSED=" + (plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")))
    val kernels = "hyperplane|UDF".r.findAllIn(plan).length
    println(s"plan_udf_mentions=$kernels")
    println(plan.linesIterator.take(80).mkString("\n"))
    spark.stop()
  }
}
