package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks

/** Bucketed-table layout: equal bucketing on the join key must produce an
  * exchange-free join (the co-located layout repeated 100 TB joins rely
  * on).
  */
class BucketedSinkSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("same-bucketed tables join with zero exchange; results match the plain join") {
    import spark.implicits._
    val o = (1L to 500L).map(i => (i, s"status_${i % 3}")).toDF("okey", "status")
    val li = (1L to 500L).flatMap(i => Seq((i, i * 2.0), (i, i * 3.0))).toDF("okey", "amount")
    Sinks.parquetBucketed(o, "graft_bkt_orders", Seq("okey"), 8)
    Sinks.parquetBucketed(li, "graft_bkt_lineitem", Seq("okey"), 8)
    // tiny test tables would broadcast (which bypasses bucketing); force
    // the shuffle-join path the layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_lineitem"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      val expected = o.join(li, "okey").count()
      assert(joined.count() == expected && expected == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }
}
