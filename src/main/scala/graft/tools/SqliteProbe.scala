package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Wall-time attribution for the b5 SQLite-sink bench: times each layer
  * of the write path separately (compute-only, iterator drain, record
  * building, full b-tree write) so sink optimization targets the real
  * bottleneck instead of a guess.
  */
object SqliteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_partkey"), col("l_suppkey"))
      .repartition(32)
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"),
          col("l_suppkey")).as("text"))

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warm everything once
    corpus.write.format("noop").mode("overwrite").save()

    time("noop-write (distributed compute only)") {
      corpus.write.format("noop").mode("overwrite").save()
    }
    time("toLocalIterator drain (count rows)") {
      val it = corpus.toLocalIterator()
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      println(s"[probe]   rows = $n")
    }
    time("drain + per-row field access") {
      val it = corpus.toLocalIterator()
      var bytes = 0L
      while (it.hasNext) {
        val row = it.next()
        bytes += row.getLong(0) % 7 + row.getString(1).length
      }
      println(s"[probe]   proxy bytes = $bytes")
    }
    val db = java.nio.file.Files.createTempDirectory("sqlite_probe").toString + "/p.db"
    time("full writeSpecs (table only)") {
      graft.sinks.SqliteSink.writeSpecs(Seq(graft.sinks.SqliteSink.TableSpec(
        "docs", corpus, """CREATE TABLE "docs"("doc_id" NUMERIC, "text" TEXT)""")), db)
    }
    spark.stop()
  }
}
