package graft.meta

import graft.model.{FieldSpec, TableSpec}
import scala.jdk.CollectionConverters._

/** Parsers for user-supplied `fields.csv` / `tables.csv` control files —
  * the reference's P8 input surface (`/root/reference/docs/options.md:
  * 500-622`): a previously-emitted fields.csv can be edited (reordered,
  * retitled, rows deleted) and fed back in to control output.
  *
  * Expected headers (extra columns like count/field_type are ignored):
  *   fields.csv: table_name,field_name[,field_type][,field_title][,count]
  *   tables.csv: table_name,table_title
  */
object SpecsCsv {

  def parseFieldsCsv(content: String): Seq[FieldSpec] = {
    val rows = parseCsv(content)
    if (rows.isEmpty) return Nil
    val header = rows.head.map(_.trim.toLowerCase)
    val ti = header.indexOf("table_name")
    val fi = header.indexOf("field_name")
    val hi = header.indexOf("field_title")
    require(ti >= 0 && fi >= 0, "fields.csv needs table_name and field_name columns")
    rows.tail.filter(_.length > math.max(ti, fi)).map { r =>
      val title = if (hi >= 0 && r.length > hi && r(hi).nonEmpty && r(hi) != r(fi))
        Some(r(hi)) else None
      FieldSpec(r(ti), r(fi), title)
    }
  }

  def parseTablesCsv(content: String): Seq[TableSpec] = {
    val rows = parseCsv(content)
    if (rows.isEmpty) return Nil
    val header = rows.head.map(_.trim.toLowerCase)
    val ni = header.indexOf("table_name")
    val ti = header.indexOf("table_title")
    require(ni >= 0 && ti >= 0, "tables.csv needs table_name and table_title columns")
    rows.tail.filter(_.length > math.max(ni, ti)).map(r => TableSpec(r(ni), r(ti)))
  }

  /** Minimal RFC-4180 CSV reader (quotes, escaped quotes, newlines in
    * quotes). Control files are small — driver-side parsing is fine. */
  private[meta] def parseCsv(s: String): Seq[Array[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    val cell = new StringBuilder
    var inQ = false
    var i = 0
    def endCell(): Unit = { row += cell.toString; cell.clear() }
    def endRow(): Unit = {
      endCell()
      val r = row.toArray; row.clear()
      if (!(r.length == 1 && r(0).isEmpty)) rows += r
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { cell.append('"'); i += 1 }
          else inQ = false
        } else cell.append(c)
      } else c match {
        case '"'  => inQ = true
        case ','  => endCell()
        case '\r' => ()
        case '\n' => endRow()
        case _    => cell.append(c)
      }
      i += 1
    }
    if (cell.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }
}
