package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.XlsxSink
import graft.plan.FlattenPlanner
import graft.model.FlattenOptions
import java.util.zip.ZipFile
import scala.jdk.CollectionConverters._

/** XLSX sink: valid zip structure, well-formed XML parts, sanitization
  * rules (cell truncation, NaN drop, sheet-name constraints). */
class XlsxSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def parts(path: String): Map[String, String] = {
    val zf = new ZipFile(path)
    try zf.entries().asScala.map { e =>
      e.getName -> new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }.toMap
    finally zf.close()
  }

  private def assertWellFormed(xml: String): Unit = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
  }

  test("workbook round-trip: flatten → xlsx with one sheet per table") {
    import spark.implicits._
    val df = spark.read.json(Seq(
      """{"id": 1, "name": "a&b <c>", "score": 1.5, "kids": [{"n": 1}, {"n": 2}]}""").toDS())
    val tables = FlattenPlanner.flatten(df, FlattenOptions())
    val out = java.nio.file.Files.createTempDirectory("graft_xlsx").resolve("out.xlsx").toString
    XlsxSink.write(tables.toSeq, out)
    val p = parts(out)
    assert(p.keySet.contains("xl/workbook.xml"))
    assert(p.keySet.contains("xl/worksheets/sheet1.xml"))
    assert(p.keySet.contains("xl/worksheets/sheet2.xml"))
    p.values.foreach(assertWellFormed)
    assert(p("xl/workbook.xml").contains("""name="main""""))
    assert(p("xl/workbook.xml").contains("""name="kids""""))
    assert(p("xl/worksheets/sheet1.xml").contains("a&amp;b &lt;c&gt;"))
    // whole double renders integral, like the CSV sink
    assert(p("xl/worksheets/sheet2.xml").contains("<v>1</v>"))
  }

  test("sanitization: NaN dropped, huge cells truncated, sheet names constrained") {
    import spark.implicits._
    val big = "x" * 40000
    val df = Seq((Double.NaN, big), (2.5, "ok")).toDF("d", "s")
    val out = java.nio.file.Files.createTempDirectory("graft_xlsx2").resolve("o.xlsx").toString
    XlsxSink.write(Seq("a/very:long*sheet?name[that]exceeds31chars" -> df), out)
    val p = parts(out)
    val sheet = p("xl/worksheets/sheet1.xml")
    assertWellFormed(sheet)
    assert(!sheet.contains("NaN"))
    assert(sheet.contains("<c/>")) // the dropped NaN cell
    assert(!sheet.contains(big))   // truncated
    assert(sheet.contains("x" * 100))
    val wb = p("xl/workbook.xml")
    val name = "name=\"([^\"]+)\"".r.findFirstMatchIn(wb).get.group(1)
    assert(name.length <= 31 && !name.exists("[]:*?/\\".contains(_)))
  }

  test("duplicate sheet names are deduped") {
    assert(XlsxSink.sheetNames(Seq("t", "t", "T")) == Seq("t", "t~1", "T~2"))
  }
}
