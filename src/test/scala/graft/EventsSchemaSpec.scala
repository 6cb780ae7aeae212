package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Pins `SparkEntry.rdEvents`'s dual-layout dispatch: the driver's
  * events.parquet has shipped `ts` both as int64 nanoseconds (legacy
  * TIMESTAMP(NANOS), read via nanosAsLong) and as plain
  * TIMESTAMP(MICROS) (since the 2026-08 testdata regen). The 2026-08
  * switch silently killed six queries for a full round because only the
  * legacy branch existed; this spec keeps BOTH branches exercised no
  * matter which layout the current testdata uses.
  */
class EventsSchemaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("rdEvents: int64-nanos and timestamp-micros layouts decode identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_events_layout").toString
    val micros = Seq(
      (1L, 1735689600123456L, 10L, "click", 1.5, """{"k":1}"""),
      (2L, 1750000000789012L, 11L, "view", 2.5, """{"k":2}"""),
      (3L, 86400000000L, 12L, "click", 0.0, "{}"))
    val modern = micros
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    modern.coalesce(1).write.mode("overwrite").parquet(s"$dir/modern/events.parquet")
    // legacy layout: int64 nanoseconds, including sub-microsecond digits
    // that the div-1000 truncation must drop (not round)
    val legacy = micros
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("us") * 1000L + 789L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    legacy.coalesce(1).write.mode("overwrite").parquet(s"$dir/legacy/events.parquet")

    def read(sub: String) = SparkEntry.rdEvents(spark, s"$dir/$sub")
    assert(read("modern").schema("ts").dataType == TimestampType)
    assert(read("legacy").schema("ts").dataType == TimestampType)
    // sanity: the legacy fixture really does land on the LongType branch
    assert(spark.read.parquet(s"$dir/legacy/events.parquet")
      .schema("ts").dataType == LongType)

    def rows(sub: String) = read(sub)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(rows("modern") == rows("legacy"))
    assert(rows("modern").map(r => (r(0), r(1))) ==
      micros.map(m => (m._1, m._2)))
  }
}
