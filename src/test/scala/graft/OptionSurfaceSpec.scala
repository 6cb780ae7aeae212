package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.plan.FlattenPlanner
import graft.sources.JsonInput

/** Option-surface behavior of the flatten planner beyond the goldens:
  * naming controls, no_link, id_prefix, arrays_new_table, inline_one_to_one,
  * emit_obj, tables control, empty-object suppression.
  */
class OptionSurfaceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def docs(json: String*) = {
    import spark.implicits._
    spark.read.json(spark.createDataset(json.toSeq))
  }

  test("id_prefix prefixes all _link values; path_separator + table_prefix + main_table_name") {
    val df = docs("""{"a": 1, "obj": {"x": {"y": 2}}, "kids": [{"n": 1}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(
      mainTableName = "root", idPrefix = "p.", pathSeparator = "+", tablePrefix = "T_"))
    assert(t.keySet == Set("root", "T_kids"))
    val main = t("root").collect()(0)
    assert(main.getAs[String]("_link") == "p.0")
    assert(t("root").columns.contains("obj+x+y"))
    val kid = t("T_kids").collect()(0)
    assert(kid.getAs[String]("_link") == "p.0.kids.0")
    assert(kid.getAs[String]("_link_root") == "p.0")
  }

  test("no_link removes every link column") {
    val df = docs("""{"a": 1, "kids": [{"n": 2}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(noLink = true))
    assert(t("main").columns.toSeq == Seq("a"))
    assert(t("kids").columns.toSeq == Seq("n"))
  }

  test("arrays_new_table: scalar arrays become value tables; strings verbatim, numbers as text") {
    val df = docs("""{"tags": ["x", "y"], "nums": [1, 2]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(arraysNewTable = true))
    assert(t.keySet == Set("main", "tags", "nums"))
    assert(t("tags").select("value").collect().map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(t("nums").select("value").collect().map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(t("tags").select("_link").collect().map(_.getString(0)).toSeq ==
      Seq("0.tags.0", "0.tags.1"))
  }

  test("scalar arrays JSON-encode into the parent by default") {
    val df = docs("""{"tags": ["x", "y"], "nums": [1, 2]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions())
    val row = t("main").collect()(0)
    assert(row.getAs[String]("tags") == """["x","y"]""")
    assert(row.getAs[String]("nums") == "[1,2]")
    assert(t.keySet == Set("main"))
  }

  test("inline_one_to_one inlines arrays that never exceed one element") {
    val df = docs(
      """{"id": 1, "one": [{"v": "a"}], "many": [{"w": 1}, {"w": 2}]}""",
      """{"id": 2, "many": [{"w": 3}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(inlineOneToOne = true))
    assert(t.keySet == Set("main", "many"))
    assert(t("main").columns.contains("one_v"))
    val byId = t("main").orderBy("id").collect()
    assert(byId(0).getAs[String]("one_v") == "a")
    assert(byId(1).getAs[String]("one_v") == null)
    assert(t("many").count() == 3)
  }

  test("emit_obj forces a 1:1 object out to its own table") {
    val df = docs("""{"id": 1, "meta": {"k": "v"}}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(emitObj = Seq(Seq("meta"))))
    assert(t.keySet == Set("main", "meta"))
    assert(!t("main").columns.contains("meta_k"))
    val m = t("meta").collect()(0)
    assert(m.getAs[String]("k") == "v")
    assert(m.getAs[String]("_link_main") == "0")
  }

  test("empty array elements (all-null objects) produce no child rows") {
    val df = docs("""{"id": 1, "kids": [{}, {"n": 5}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions())
    val kids = t("kids").collect()
    assert(kids.length == 1)
    assert(kids(0).getAs[Long]("n") == 5L)
    // position reflects the original array index (1), not a renumbering
    assert(kids(0).getAs[String]("_link") == "0.kids.1")
  }

  test("tables control: only_tables + table title rename") {
    val df = docs("""{"a": 1, "kids": [{"n": 1}], "pets": [{"p": 2}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(
      onlyTables = true,
      tables = Seq(TableSpec("main", "root"), TableSpec("kids", "children"))))
    assert(t.keySet == Set("root", "children"))
  }

  test("nested arrays two levels deep: FK columns for every ancestor") {
    val df = docs("""{"g": "x", "plats": [{"name": "pc", "reqs": [{"cpu": "fast"}]}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions())
    assert(t.keySet == Set("main", "plats", "plats_reqs"))
    val r = t("plats_reqs").collect()(0)
    assert(r.getAs[String]("_link_main") == "0")
    assert(r.getAs[String]("_link_plats") == "0.plats.0")
    assert(r.getAs[String]("_link") == "0.plats.0.reqs.0")
    assert(r.getAs[String]("cpu") == "fast")
  }

  test("pushdown cascades through every level") {
    val df = docs("""{"id": 7, "plats": [{"name": "pc", "reqs": [{"cpu": "fast"}]}]}""")
    val t = FlattenPlanner.flatten(df, FlattenOptions(pushdown = Seq("id", "name")))
    val r = t("plats_reqs").collect()(0)
    assert(r.getAs[Long]("main_id") == 7L)
    assert(r.getAs[String]("plats_name") == "pc")
  }

  test("monotonic link mode produces unique links without an extra job") {
    val df = docs((1 to 100).map(i => s"""{"v": $i}"""): _*)
    val t = FlattenPlanner.flatten(df, FlattenOptions(linkMode = LinkMode.Monotonic))
    val links = t("main").select("_link").collect().map(_.getString(0))
    assert(links.distinct.length == 100)
  }
}
