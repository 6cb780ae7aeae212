package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal driver for the b6 indexed-SQLite export's new wall-time
  * attribution ([[graft.sinks.SqliteSink.WriteStats]], r20): replays
  * Bench's runB6 frame through `writeSpecs` and prints the stats line
  * after every rep, so the split can be validated on BOTH an idle box
  * and a deliberately I/O-contended one (e.g. a background `dd` to the
  * same disk) — the r19 incident's hypothesis is that b6's 19-29 s mode
  * was writeback contention, which should surface as `raf.write` time
  * here while the CPU-side splits stay flat. SqliteIdxProbe phase-times
  * a hand-replayed pipeline; this one goes through the REAL writeSpecs
  * path the bench times, stats and all.
  *
  * Run: java -cp "target/scala-2.13/classes:&lt;spark jars&gt;"
  *      graft.tools.B6Smoke [sfDir] [reps]
  */
object B6Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_partkey"),
        col("l_suppkey"))
      .repartition(32)
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_partkey"), col("l_suppkey")).as("text"))
      .select(col("doc_id").cast("string").as("_link"),
        (col("doc_id") % 1000).cast("string").as("_link_parent"), col("text"))
    val db = java.nio.file.Files.createTempDirectory("graft_b6smoke")
      .toString + "/b6.db"
    (1 to reps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      graft.sinks.SqliteSink.writeSpecs(Seq(graft.sinks.SqliteSink.TableSpec(
        "docs", docs,
        """CREATE TABLE "docs"("_link" TEXT, "_link_parent" TEXT, "text" TEXT)""",
        Seq(
          graft.sinks.SqliteSink.IndexSpec("idx_docs__link", "_link",
            unique = true,
            Some("""CREATE UNIQUE INDEX "idx_docs__link" ON "docs"("_link")""")),
          graft.sinks.SqliteSink.IndexSpec("idx_docs__link_parent",
            "_link_parent", unique = false,
            Some("""CREATE INDEX "idx_docs__link_parent" ON "docs"("_link_parent")"""))))),
        db)
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[b6smoke] rep $i total $t%.2f s  " +
        graft.sinks.SqliteSink.lastStats.map(_.line).getOrElse("NO STATS"))
    }
    spark.stop()
  }
}
