package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's contract: entry() returns rows on sf0.001, every oracle
  * key names a registered query, and every query runs on sf0.001. */
class DriverContractSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("bench headline names all exist") {
    val missing = Bench.headline.toSet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"headline without queries: $missing")
  }

  test("every registered query executes and returns a schema on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
      assert(df.limit(1).count() >= 0, s"$name failed to execute")
    }
  }
}
