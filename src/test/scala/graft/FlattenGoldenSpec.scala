package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.api.Flatten
import graft.model._
import graft.plan.FlattenPlanner
import graft.sources.JsonInput

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-output parity against the reference's committed fixtures
  * (`/root/reference/fixtures/basic_expected`, `pushdown_expected`) —
  * the reference's own dominant test strategy
  * (`/root/reference/flatterer/tests.py:25-44`).
  */
class FlattenGoldenSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private val fixtures = "/root/reference/fixtures"

  /** Pin golden column order (the reference's IndexMap swap-remove quirk —
    * SURVEY.md §1.3 says pin explicitly rather than re-derive). */
  private def basicFieldOrder: Seq[FieldSpec] = Seq(
    FieldSpec("main", "_link"), FieldSpec("main", "id"), FieldSpec("main", "title"),
    FieldSpec("main", "releaseDate"), FieldSpec("main", "rating_code"), FieldSpec("main", "rating_name"),
    FieldSpec("developer", "_link"), FieldSpec("developer", "_link_main"), FieldSpec("developer", "name"),
    FieldSpec("platforms", "_link"), FieldSpec("platforms", "_link_main"), FieldSpec("platforms", "name"))

  private def readGolden(path: String): String =
    Files.readString(Paths.get(path)).trim

  private def writtenCsv(dir: String, table: String): String =
    Files.readString(Paths.get(s"$dir/csv/$table.csv")).trim

  test("basic.json matches basic_expected goldens (S1+P1+P2+P7+K1+K7+A1+A4)") {
    val input = JsonInput.jsonArray(spark, s"$fixtures/basic.json")
    val out = Files.createTempDirectory("graft_basic").toString
    val res = Flatten.flattenToDir(input, out,
      FlattenOptions(fields = basicFieldOrder), sqlScripts = true)

    for (t <- Seq("main", "developer", "platforms")) {
      assert(writtenCsv(out, t) == readGolden(s"$fixtures/basic_expected/csv/$t.csv"), s"table $t")
    }
    assert(readGolden(s"$out/fields.csv") == readGolden(s"$fixtures/basic_expected/fields.csv"))
    assert(readGolden(s"$out/tables.csv") == readGolden(s"$fixtures/basic_expected/tables.csv"))
    assert(readGolden(s"$out/postgresql/postgresql_schema.sql") ==
      readGolden(s"$fixtures/basic_expected/postgresql/postgresql_schema.sql"))
    assert(res.tables.keySet == Set("main", "developer", "platforms"))
  }

  test("basic.json through the VARIANT path matches goldens — schemaless-landing-zone invariance") {
    // the schemaless route: documents as VariantType values (no declared
    // schema), schema derived by schema_of_variant_agg inside
    // flattenVariant — the flatten forest must be identical to the
    // struct-schema route, golden CSVs included
    import org.apache.spark.sql.functions.{struct, to_variant_object}
    val typed = JsonInput.jsonArray(spark, s"$fixtures/basic.json")
    val docs = typed.select(
      to_variant_object(struct(typed.columns.toIndexedSeq.map(col): _*)).as("doc"))
    val tables = FlattenPlanner.flattenVariant(docs, "doc",
      FlattenOptions(fields = basicFieldOrder))
    val out = Files.createTempDirectory("graft_variant").toString
    tables.foreach { case (t, df) =>
      graft.sinks.Sinks.csvSingleFile(df, s"$out/csv", t)
    }
    for (t <- Seq("main", "developer", "platforms")) {
      assert(writtenCsv(out, t) == readGolden(s"$fixtures/basic_expected/csv/$t.csv"), s"table $t")
    }
  }

  test("flattenVariant names an empty/all-null landing zone instead of NPEing") {
    // schema_of_variant_agg aggregates to NULL over zero rows or an
    // all-null column — the error must say what's wrong, not NPE
    import org.apache.spark.sql.functions.{lit, parse_json, struct, to_variant_object, when}
    import spark.implicits._
    val typed = Seq((1L, "a")).toDF("id", "name")
    val docs = typed.select(
      to_variant_object(struct(typed.columns.toIndexedSeq.map(col): _*)).as("doc"))
    val empty = intercept[IllegalArgumentException] {
      FlattenPlanner.flattenVariant(docs.where(lit(false)), "doc")
    }
    assert(empty.getMessage.contains("no non-null variant"), empty.getMessage)
    // an all-null VARIANT column aggregates to the VOID schema — same
    // named error, never an NPE or the misleading "wrap scalars" branch
    val allNull = intercept[IllegalArgumentException] {
      FlattenPlanner.flattenVariant(
        Seq("x").toDF("s").select(
          parse_json(when(lit(false), $"s")).as("doc")), "doc")
    }
    assert(allNull.getMessage.contains("no non-null variant"), allNull.getMessage)
  }

  test("basic.jl (pretty-printed JSON stream, S4) matches goldens — ingest-form invariance") {
    val input = JsonInput.jsonStream(spark, s"$fixtures/basic.jl")
    val out = Files.createTempDirectory("graft_jl").toString
    Flatten.flattenToDir(input, out, FlattenOptions(fields = basicFieldOrder))
    for (t <- Seq("main", "developer", "platforms")) {
      assert(writtenCsv(out, t) == readGolden(s"$fixtures/basic_expected/csv/$t.csv"), s"table $t")
    }
  }

  test("NDJSON source (S3) matches goldens — ingest-form invariance") {
    // Minify basic.json docs into true line-delimited JSON.
    val compact = JsonInput.jsonArray(spark, s"$fixtures/basic.json").toJSON.collect()
    val tmp = Files.createTempFile("graft_ndjson", ".jl")
    Files.writeString(tmp, compact.mkString("\n"))
    val input = JsonInput.ndjson(spark, tmp.toString)
    val out = Files.createTempDirectory("graft_ndjson").toString
    Flatten.flattenToDir(input, out, FlattenOptions(fields = basicFieldOrder))
    for (t <- Seq("main", "developer", "platforms")) {
      assert(writtenCsv(out, t) == readGolden(s"$fixtures/basic_expected/csv/$t.csv"), s"table $t")
    }
  }

  test("pushdown matches pushdown_expected goldens (P6)") {
    val input = JsonInput.jsonArray(spark, s"$fixtures/basic.json")
    val out = Files.createTempDirectory("graft_pushdown").toString
    Flatten.flattenToDir(input, out,
      FlattenOptions(fields = basicFieldOrder, pushdown = Seq("id", "title")))
    for (t <- Seq("main", "developer", "platforms")) {
      assert(writtenCsv(out, t) == readGolden(s"$fixtures/pushdown_expected/csv/$t.csv"), s"table $t")
    }
    assert(readGolden(s"$out/fields.csv") == readGolden(s"$fixtures/pushdown_expected/fields.csv"))
  }

  test("json-stream source (S4) produces the same tables as the array source") {
    // Build a json-stream file (concatenated objects) from basic.json docs.
    val docs = Files.readString(Paths.get(s"$fixtures/basic.jl")).linesIterator
      .filter(_.nonEmpty).mkString(" \n ")
    val tmp = Files.createTempFile("graft_stream", ".json")
    Files.writeString(tmp, docs)
    val input = JsonInput.jsonStream(spark, tmp.toString)
    val tables = FlattenPlanner.flatten(input, FlattenOptions(fields = basicFieldOrder))
    assert(tables("main").count() == 2)
    assert(tables("platforms").count() == 3)
    assert(tables("main").columns.toSeq ==
      Seq("_link", "id", "title", "releaseDate", "rating_code", "rating_name"))
  }

  test("json-stream source (S4) fails fast on files over the wholetext size cap") {
    // wholetext = one file → one String in one task; a multi-GB stream
    // file would OOM an executor with no useful error, so jsonStream
    // pre-flights file sizes. A tiny cap exercises the error path.
    val tmp = Files.createTempFile("graft_stream_big", ".json")
    Files.writeString(tmp, """{"a": 1} {"a": 2} {"a": 3}""")
    val e = intercept[IllegalArgumentException] {
      JsonInput.jsonStream(spark, 10L, tmp.toString)
    }
    assert(e.getMessage.contains("NDJSON"))
    assert(e.getMessage.contains(tmp.getFileName.toString))
    // at the default cap the same file reads fine
    assert(JsonInput.jsonStream(spark, tmp.toString).count() == 3)
  }

  test("daily_16.json.gz: 4999 real-world nested docs flatten like the reference") {
    // mirrors the reference's own large-ingest test
    // (`/root/reference/flatterer/tests.py:60`: main table = 4999 rows)
    // on the real-world weather fixture — gzip NDJSON in (S8+S3), nested
    // structs promoted, arrays of objects (incl. second level) to child
    // tables with a closed FK forest
    val input = JsonInput.ndjson(spark, s"$fixtures/daily_16.json.gz")
    val tables = FlattenPlanner.flatten(input, FlattenOptions())
    assert(tables("main").count() == 4999)
    // city sub-object promoted into main, not a child table
    assert(tables("main").columns.exists(_.startsWith("city_")))
    // the 16-day forecast array and its nested weather array become tables
    val data = tables("data")
    val weather = tables("data_weather")
    assert(data.count() > 4999) // many forecast rows per city
    assert(weather.count() > 0)
    // FK closure at this scale: every child link resolves to a parent row
    val orphans = data.join(tables("main").select(col("_link").as("_link_main")),
      Seq("_link_main"), "left_anti").count()
    assert(orphans == 0)
    val orphanWeather = weather.join(data.select(col("_link").as("_link_data")),
      Seq("_link_data"), "left_anti").count()
    assert(orphanWeather == 0)
  }

  test("iterator ingest (S5) matches file ingest") {
    val lines = JsonInput.jsonArray(spark, s"$fixtures/basic.json").toJSON.collect()
    val input = JsonInput.fromIterator(spark, lines.iterator, parallelism = 2)
    val tables = FlattenPlanner.flatten(input, FlattenOptions(fields = basicFieldOrder))
    assert(tables("main").count() == 2)
    assert(tables("developer").count() == 2)
    assert(tables("platforms").count() == 3)
  }

  test("multi-file union (S6/U1): counts double") {
    val input = JsonInput.jsonArray(spark, s"$fixtures/basic.json", s"$fixtures/basic.json")
    // multiLine json with 2 identical files → 4 docs
    val tables = FlattenPlanner.flatten(input, FlattenOptions())
    assert(tables("main").count() == 4)
    assert(tables("platforms").count() == 6)
  }
}
