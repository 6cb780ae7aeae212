package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plan for named SparkEntry
  * queries (plan-shape review: pushed filters, pruned scans, broadcast
  * joins, whole-stage codegen spans).
  *
  * usage: runMain graft.tools.Explain <sfDir> <query...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else graft.SparkEntry.queries.keys.toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // table-writing queries (x71, x83) fail on a leftover managed-table
      // directory from a previous run — fresh warehouse per run, the
      // Bench/Verify convention
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_explain_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      try {
        if (n.startsWith("b17mix_")) mixTail(spark, staged = n.endsWith("_staged"))
          .explain("formatted")
        else graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      } catch { case e: Throwable => println(s"ERROR: $e") }
    }
    spark.stop()
  }

  /** The pipeline MIX TAIL (budget mix → interleave → pack) on a small
    * synthetic batch — no declared query exercises Mix, so the plan
    * evidence for the r21 fused-vs-staged physical forms comes from
    * here: `b17mix_fused` (the shipped upTo = 8 path) vs `b17mix_staged`
    * (the countStages/prefix path). `Result.kept` is lazy past the last
    * stage checkpoint, so the printed plan is exactly the mix tail.
    */
  private def mixTail(spark: SparkSession,
      staged: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val batch = spark.range(1, 2001).select(col("id").as("doc_id"),
      concat(lit("document words number "), col("id")).as("text"))
    graft.ops.Pipeline.run(batch,
      graft.ops.Pipeline.Config(
        rules = Some(graft.ops.TextFilters.Rules(minWords = 2,
          maxWords = 100, minMeanWordLen = 0, maxMeanWordLen = 1e9,
          maxSymbolWordRatio = 1e9, maxBulletLineRatio = 1,
          maxEllipsisLineRatio = 1, minAlphaWordRatio = 0,
          minStopwordHits = 0)),
        mix = Some(graft.ops.Pipeline.Mix(
          budgets = Map("s0" -> 30000L, "s1" -> 30000L),
          src = concat(lit("s"), pmod(col("doc_id"), lit(2L))),
          toks = length(col("text")).cast("long"),
          weights = Map("s0" -> 2.0)))),
      countStages = staged).kept
  }
}
