package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Fault injection for the CONCURRENT indexed SQLite export (VERDICT r8
  * #6): the error paths fixed in the sink — cancel in-flight sorts,
  * unpersist every cached RDD, shut the pool down, surface the error
  * promptly — had nothing pinning them. Three deterministic failures:
  *
  *   1. corpus materialization dies (a poisoned row evaluates during the
  *      up-front persist+count, before any future exists),
  *   2. the driver-side TABLE stream dies mid-write while index sorts
  *      are in flight (the concurrency window the cleanup exists for),
  *   3. an INDEX stream dies with later index futures pending.
  *
  * 2 and 3 go through the [[SqliteSink.faultInjection]] seam because the
  * export materializes the corpus before streaming — executor-side data
  * poison cannot reach the streams (case 1 proves it fires at count).
  * After every failure: the export must throw within a bounded time, no
  * RDD may stay in `SparkContext.getPersistentRDDs`, and a fresh export
  * on the same session must succeed (nothing wedged: job group cleared,
  * pool gone, page file closed).
  */
class SqliteFaultSpec extends AnyFunSuite {

  lazy val spark = graft.TestSpark.spark

  private def spec(name: String, df: org.apache.spark.sql.DataFrame) =
    SqliteSink.TableSpec(name, df,
      s"""CREATE TABLE "$name"("k" TEXT, "v" TEXT)""",
      Seq(
        SqliteSink.IndexSpec(s"idx_${name}_k", "k", unique = false,
          Some(s"""CREATE INDEX "idx_${name}_k" ON "$name"("k")""")),
        SqliteSink.IndexSpec(s"idx_${name}_v", "v", unique = false,
          Some(s"""CREATE INDEX "idx_${name}_v" ON "$name"("v")"""))))

  private def goodDf(n: Int) = {
    import spark.implicits._
    (1 to n).map(i => (s"k$i", s"v$i")).toDF("k", "v")
  }

  private def assertNoPersistentRdds(clue: String): Unit = {
    // unpersist is synchronous on the registry (block eviction is async,
    // the registry map is the leak the spec guards)
    val left = spark.sparkContext.getPersistentRDDs
    assert(left.isEmpty, s"$clue: leaked persisted RDDs: ${left.values.map(_.toString)}")
  }

  private def timedFailure(clue: String)(body: => Unit): Throwable = {
    val t0 = System.nanoTime()
    val e = intercept[Throwable](body)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, s"$clue: failure took $secs s to surface")
    e
  }

  private def freshExportStillWorks(tag: String): Unit = {
    val db = java.nio.file.Files.createTempDirectory("sqlite_fault").resolve(s"$tag.db")
    SqliteSink.writeSpecs(Seq(spec("ok", goodDf(500))), db.toString)
    assert(java.nio.file.Files.size(db) > 0)
    assertNoPersistentRdds(s"$tag recovery export")
  }

  test("poisoned corpus fails at materialization; caches unpersist; sink recovers") {
    import spark.implicits._
    val boom = udf { (i: Long) =>
      if (i == 666L) throw new IllegalStateException("poisoned row 666")
      s"k$i"
    }
    val df = spark.range(1000).select(boom(col("id")).as("k"),
      concat(lit("v"), col("id")).as("v"))
    val db = java.nio.file.Files.createTempDirectory("sqlite_fault").resolve("poison.db")
    val e = timedFailure("poisoned corpus") {
      SqliteSink.writeSpecs(Seq(spec("t", df)), db.toString)
    }
    assert(Option(e.getMessage).exists(_.contains("poisoned")) ||
      Option(e.getCause).exists(c => Option(c.getMessage).exists(_.contains("poisoned"))) ||
      e.toString.contains("SparkException"),
      s"unexpected error: $e")
    assertNoPersistentRdds("poisoned corpus")
    freshExportStillWorks("after-poison")
  }

  test("table stream dies mid-write with sorts in flight; everything unpersists; sink recovers") {
    val db = java.nio.file.Files.createTempDirectory("sqlite_fault").resolve("tstream.db")
    SqliteSink.faultInjection = (phase, i) =>
      if (phase == "table" && i >= 200) throw new IllegalStateException("table stream fault")
    try {
      val e = timedFailure("table stream fault") {
        SqliteSink.writeSpecs(Seq(spec("t", goodDf(5000))), db.toString)
      }
      assert(e.getMessage != null && e.getMessage.contains("table stream fault"), e.toString)
    } finally SqliteSink.faultInjection = (_, _) => ()
    assertNoPersistentRdds("table stream fault")
    freshExportStillWorks("after-tstream")
  }

  test("index stream dies with another index pending; everything unpersists; sink recovers") {
    val db = java.nio.file.Files.createTempDirectory("sqlite_fault").resolve("istream.db")
    SqliteSink.faultInjection = (phase, rid) =>
      if (phase == "index" && rid >= 100) throw new IllegalStateException("index stream fault")
    try {
      val e = timedFailure("index stream fault") {
        SqliteSink.writeSpecs(Seq(spec("t", goodDf(5000))), db.toString)
      }
      assert(e.getMessage != null && e.getMessage.contains("index stream fault"), e.toString)
    } finally SqliteSink.faultInjection = (_, _) => ()
    assertNoPersistentRdds("index stream fault")
    freshExportStillWorks("after-istream")
  }
}
