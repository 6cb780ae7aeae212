package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TypeGuess
import graft.sinks.Sinks
import graft.sources.JsonInput

/** Type-guess lattice semantics and CSV value rendering edges. */
class TypeGuessSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def guess(values: Seq[String]): String = {
    import spark.implicits._
    values.toDF("v").agg(TypeGuess.guessAgg(col("v"))).collect()(0).getString(0)
  }

  test("pure kinds") {
    assert(guess(Seq("1", "2.5", "-3e4")) == "number")
    assert(guess(Seq("2020-01-01", "1999-12-31")) == "date")
    assert(guess(Seq("2020-01-01T10:00:00Z", "2020-01-01 10:00:00")) == "datetime")
    assert(guess(Seq("hello", "world")) == "text")
  }

  test("lattice joins") {
    assert(guess(Seq("2020-01-01", "2020-01-01T10:00:00")) == "datetime") // date ⊔ datetime
    assert(guess(Seq("1", "2020-01-01")) == "text")                      // number ⊔ date → text
    assert(guess(Seq("1", "x")) == "text")
    assert(guess(Seq(null, null)) == "text")                             // all null → text
    assert(guess(Seq("1", null)) == "number")                            // nulls ignored
  }

  test("guessTypes statically types non-strings in the same pass") {
    import spark.implicits._
    val df = Seq((1L, 2.5, "2020-01-01", true)).toDF("i", "d", "s", "b")
    val t = TypeGuess.guessTypes(df)
    assert(t("i") == "number" && t("d") == "number")
    assert(t("s") == "date")
    assert(t("b") == "boolean")
  }

  test("CSV rendering: whole doubles integral, quotes/newlines escaped, JSON array strings") {
    import spark.implicits._
    val df = Seq((1.0, 2.5, "say \"hi\"", "line1\nline2")).toDF("a", "b", "c", "d")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Sinks.csvSingleFile(df, dir, "t")
    val content = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/t.csv"))
    assert(content.contains("1,2.5"))          // 1.0 renders as 1
    assert(content.contains("\"say \"\"hi\"\"\"")) // RFC-4180 quote doubling
    assert(content.contains("\"line1\nline2\""))
    // round-trip: Spark's CSV reader recovers the exact values
    val back = spark.read.option("header", true).option("multiLine", true)
      .option("escape", "\"").csv(s"$dir/t.csv")
    assert(back.collect()(0).getString(2) == "say \"hi\"")
  }

  test("path-selected source (S2): array under a nested key") {
    val tmp = java.nio.file.Files.createTempFile("graft_path", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"meta": {"v": 1}, "data": {"games": [{"id": 1}, {"id": 2}]}}""")
    val df = JsonInput.jsonArrayAt(spark, Seq("data", "games"), tmp.toString)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("id"))
  }
}
