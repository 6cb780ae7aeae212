package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.meta.{Metadata, SchemaFields}
import graft.model.FieldSpec
import graft.plan.FlattenPlanner
import graft.model.FlattenOptions

/** Metadata generators: JSONSchema-driven ordering (P9), stats (A2),
  * datapackage foreign keys. */
class MetaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("JSONSchema property order drives field specs; titles slugified") {
    val schema =
      """{"type": "object", "properties": {
        |  "id": {"type": "number", "title": "The Identifier!"},
        |  "rating": {"type": "object", "properties": {
        |      "code": {"type": "string"}}},
        |  "platforms": {"type": "array", "items": {"type": "object", "properties": {
        |      "name": {"type": "string", "title": "Platform Name"}}}}
        |}}""".stripMargin
    val specs = SchemaFields.fromJsonSchema(schema, titleMode = SchemaFields.UnderscoreSlug)
    assert(specs == Seq(
      FieldSpec("main", "id", Some("the_identifier")),
      FieldSpec("main", "rating_code", None),
      FieldSpec("platforms", "name", Some("platform_name"))))
    // drives the planner's field control end-to-end
    import spark.implicits._
    val df = spark.read.json(Seq(
      """{"id": 1, "zz": 9, "rating": {"code": "E"}, "platforms": [{"name": "pc"}]}""").toDS())
    val t = FlattenPlanner.flatten(df, FlattenOptions(fields = specs))
    assert(t("main").columns.take(2).toSeq == Seq("the_identifier", "rating_code"))
    assert(t("main").columns.contains("zz")) // unlisted appended
    assert(t("platforms").columns.contains("platform_name"))
  }

  test("slugify follows the documented rule") {
    assert(SchemaFields.slugify("Hello  World! (v2)", "-") == "hello-world-v2")
    assert(SchemaFields.slugify("Ünïcode Stuff", "_") == "ncode_stuff")
  }

  test("stats: min/max/approx distinct per field in one pass") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "s")
    val st = Metadata.analyzeStats(df).map(s => s.fieldName -> s).toMap
    assert(st("id").min.contains("1") && st("id").max.contains("3"))
    assert(st("s").approxDistinct == 2)
  }

  test("datapackage embeds per-field stats when provided") {
    import Metadata.{FieldMeta, FieldStats}
    val metas = Seq("main" -> Seq(
      FieldMeta("main", "id", "number", "id", 3),
      FieldMeta("main", "s", "text", "s", 3)))
    val stats = Map("main" -> Map(
      "id" -> FieldStats("id", Some("1"), Some("3"), 3L),
      "s" -> FieldStats("s", None, None, 0L)))
    val dp = Metadata.datapackage(metas, "main", stats = stats)
    assert(dp.contains(""""name":"id","type":"number","count":3,"stats":{"min":"1","max":"3","distinct":3}"""), dp)
    assert(dp.contains(""""name":"s","type":"text","count":3,"stats":{"min":null,"max":null,"distinct":0}"""), dp)
    // stats-free call keeps the original shape
    assert(!Metadata.datapackage(metas, "main").contains("\"stats\""))
  }

  test("evolve skips the conflict ALTER when the store column is already TEXT") {
    import Metadata.FieldMeta
    val existing = Seq("main" -> Seq(FieldMeta("main", "id", "text", "id", 2)))
    val target   = Seq("main" -> Seq(FieldMeta("main", "id", "number", "id", 3)))
    assert(Metadata.evolveScript(existing, target, postgres = true).isEmpty)
    assert(Metadata.evolveScript(existing, target, postgres = false).isEmpty)
  }

  test("datapackage emits primaryKey and ancestor foreign keys") {
    import spark.implicits._
    val df = spark.read.json(Seq("""{"a": 1, "kids": [{"n": 1}]}""").toDS())
    val tables = FlattenPlanner.flatten(df, FlattenOptions())
    val metas = tables.toSeq.map { case (n, d) => (n, Metadata.analyze(n, d)) }
    val dp = Metadata.datapackage(metas, "main")
    assert(dp.contains(""""primaryKey":"_link""""))
    assert(dp.contains(""""foreignKeys":[{"fields":"_link_main","reference":{"resource":"main","fields":"_link"}}"""))
  }

  test("evolveScript: new table CREATEs, new field ALTERs, conflict relaxes (pg) or comments (sqlite)") {
    import Metadata.FieldMeta
    val existingDp =
      """{"profile":"tabular-data-package","resources":[
        |  {"profile":"tabular-data-resource","name":"main","schema":{"fields":[
        |    {"name":"_link","type":"text","count":2},
        |    {"name":"id","type":"number","count":2},
        |    {"name":"note","type":"text","count":2}]},"path":"csv/main.csv"}]}""".stripMargin
    val existing = Metadata.parseDatapackage(existingDp)
    assert(existing.map(_._1) == Seq("main"))
    assert(existing.head._2.map(_.fieldName) == Seq("_link", "id", "note"))

    val target = Seq(
      "main" -> Seq(
        FieldMeta("main", "_link", "text", "_link", 3),
        FieldMeta("main", "id", "text", "id", 3),      // number → text conflict
        FieldMeta("main", "extra", "number", "extra", 3)), // new field
      "kids" -> Seq(                                    // new table
        FieldMeta("kids", "_link", "text", "_link", 1),
        FieldMeta("kids", "n", "number", "n", 1)))

    val pg = Metadata.evolveScript(existing, target, postgres = true)
    assert(pg ==
      """ALTER TABLE "main" ALTER COLUMN "id" TYPE TEXT;
        |ALTER TABLE "main" ADD COLUMN "extra" NUMERIC;
        |
        |CREATE TABLE "kids"(
        |    "_link" TEXT,
        |    "n" NUMERIC);
        |""".stripMargin)

    val lite = Metadata.evolveScript(existing, target, postgres = false)
    assert(lite.contains("""-- "main"."id": type TEXT conflicts with existing NUMERIC"""))
    assert(lite.contains("""ALTER TABLE "main" ADD COLUMN "extra" NUMERIC;"""))
    // unchanged fields produce no statements
    assert(!pg.contains("note") && !pg.contains("""ALTER TABLE "main" ADD COLUMN "_link""""))
  }

  test("gzip NDJSON source decompresses transparently (S8)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gz")
    val gz = tmp.resolve("part.jl.gz")
    val out = new java.util.zip.GZIPOutputStream(java.nio.file.Files.newOutputStream(gz))
    out.write("""{"a": 1}
{"a": 2}
""".getBytes("UTF-8"))
    out.close()
    val df = graft.sources.JsonInput.ndjson(spark, gz.toString)
    assert(df.count() == 2)
  }
}
