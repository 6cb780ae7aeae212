package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Uses the `noop` sink so the full plan executes
  * (a bare `.count()` lets Spark prune most of the work).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_join_revenue", "q5_window_running",
    "f1_flatten_main", "f2_flatten_child",
    "x1_exact_dedup", "x2_token_stats", "x6_minhash_pairs",
    "x9_ann_bruteforce", "x13_event_window")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/Spark warmup outside the timed region: run every headline query
    // once at the smallest SF so codegen compilation and classloading are
    // paid before timing (plans are identical up to the input path).
    headline.foreach { name =>
      SparkEntry.queries.get(name).foreach { fn =>
        try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
