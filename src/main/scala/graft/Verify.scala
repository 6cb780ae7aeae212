package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Fails LOUDLY: a query that throws is recorded in `errors.json`, the
  * written-output set is diffed against `SparkEntry.queries.keySet` at the
  * end, and the process exits non-zero on any miss — so the correctness
  * artifact can never silently shrink (round 11 lost 6 keys to a schema
  * change and the artifact still read as all-green).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional third arg: comma-separated query-name filter (local
    // iteration only — the driver always runs the full set)
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // catalog-table queries (standing band/fingerprint tables) get a
      // fresh warehouse per run — a leftover managed-table directory
      // from a previous JVM would fail saveAsTable with
      // LOCATION_ALREADY_EXISTS even under overwrite mode
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_verify_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val expected = SparkEntry.queries.keySet.filter(keep)
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (keep(name)) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse(e.toString)
        failures(name) = s"${e.getClass.getSimpleName}: $msg"
        System.err.println(s"[verify] $name FAILED: ${e.getClass.getSimpleName}: $msg")
      }
      }
    }
    def q(s: String): String = graft.util.Json.js(s)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // reconcile: every expected query must have a written output dir
    val written = Option(new java.io.File(outDir).listFiles()).getOrElse(Array())
      .filter(_.isDirectory).map(_.getName).toSet
    val missing = expected -- written
    val errJson = (failures.toSeq ++ missing.filterNot(failures.contains).toSeq.sorted
        .map(_ -> "output directory missing (query never wrote)"))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    System.err.println(
      s"[verify] expected ${expected.size} queries; wrote ${written.intersect(expected).size}; " +
      s"failed ${failures.size}; missing output ${missing.size}")
    if (missing.nonEmpty || failures.nonEmpty) {
      System.err.println(s"[verify] FAILED queries: ${(failures.keySet ++ missing).toSeq.sorted.mkString(", ")}")
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
