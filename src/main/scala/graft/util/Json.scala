package graft.util

/** Minimal JSON string escaping shared by the hand-rolled JSON writers
  * (datapackage.json, playground responses, oracle_sql.json). Escapes
  * backslash, quote, and ALL control chars (< 0x20) — a raw tab or CR in
  * builder-authored SQL would otherwise break a strict JSON parser.
  */
object Json {
  def js(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
