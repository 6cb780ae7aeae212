package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.FlattenOptions
import graft.plan.FlattenPlanner

/** Promoted names may collide with literal keys; sinks need unique names. */
class NameCollisionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def docs(json: String*) = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json.toSeq))
  }

  test("colliding promoted column names get suffixed") {
    val df = docs("""{"a": {"b": 1}, "a_b": 2}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions())
    val cols = t("main").columns.toSeq
    assert(cols.distinct.length == cols.length, s"duplicate columns: $cols")
    assert(cols.count(_.startsWith("a_b")) == 2)
    // both values present
    val row = t("main").collect()(0)
    val vals = cols.filter(_.startsWith("a_b")).map(c => row.getAs[Long](c)).sorted
    assert(vals == Seq(1L, 2L))
  }

  test("colliding child table names get suffixed") {
    val df = docs("""{"a": {"b": [{"x": 1}]}, "a_b": [{"x": 2}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions())
    assert(t.keys.count(_.startsWith("a_b")) == 2)
    assert(t.keys.toSeq.distinct.length == t.keys.size)
  }
}
