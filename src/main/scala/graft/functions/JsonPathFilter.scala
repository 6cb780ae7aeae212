package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONPath document filter (SURVEY.md §2.2 F1).
  *
  * The reference evaluates a JSONPath expression against every input object
  * and keeps the object iff any non-null match
  * (`/root/reference/docs/options.md:343-384`). The documented surface is:
  *
  *   - `$` / `$.a.b`                    — keep if the path is non-null
  *   - `$[?(@.a.b == 'v')]`            — predicate filter
  *   - comparison ops `== != > >= < <=` against string/number/bool literals
  *   - `||` and `&&` logical combinations
  *
  * We compile this subset directly to a Catalyst `Column` predicate over the
  * parsed document columns — so the filter participates in predicate pushdown
  * and whole-stage codegen instead of being a per-row interpreter. Apply
  * BEFORE [[graft.plan.FlattenPlanner]] so the filter sits under the explode
  * chain in the logical plan (filter-before-flatten, like the reference's
  * parse-time filtering).
  */
object JsonPathFilter {

  /** Compile `expr` to a boolean Column over a DataFrame of parsed docs. */
  def compile(expr: String): Column = new Parser(expr).parse()

  /** Keep documents where the JSONPath matches non-null. */
  def apply(df: DataFrame, expr: String): DataFrame = df.filter(compile(expr))

  // --- tiny recursive-descent parser ----------------------------------

  private final class Parser(s: String) {
    private var i = 0

    def parse(): Column = {
      skipWs()
      expect('$')
      skipWs()
      if (eof) lit(true)
      else if (peek == '[') { // $[?(pred)]
        expect('['); skipWs(); expect('?'); skipWs(); expect('(')
        val c = orExpr()
        skipWs(); expect(')'); skipWs(); expect(']')
        c
      } else { // $.a.b → non-null check
        pathCol().isNotNull
      }
    }

    private def orExpr(): Column = {
      var c = andExpr()
      skipWs()
      while (!eof && peek == '|') { expect('|'); expect('|'); val r = andExpr(); c = c || r; skipWs() }
      c
    }

    private def andExpr(): Column = {
      var c = cmpExpr()
      skipWs()
      while (!eof && peek == '&') { expect('&'); expect('&'); val r = cmpExpr(); c = c && r; skipWs() }
      c
    }

    private def cmpExpr(): Column = {
      skipWs()
      if (peek == '(') { expect('('); val c = orExpr(); skipWs(); expect(')'); return c }
      expect('@')
      val c = pathCol()
      skipWs()
      if (eof || peek == ')' || peek == '|' || peek == '&') return c.isNotNull
      val op = readOp()
      skipWs()
      val l = readLiteral()
      op match {
        case "==" => l.map(c === _).getOrElse(c.isNull)
        case "!=" => l.map(c =!= _).getOrElse(c.isNotNull)
        case ">"  => c > l.get
        case ">=" => c >= l.get
        case "<"  => c < l.get
        case "<=" => c <= l.get
      }
    }

    /** `.a.b.c` → nested column access. */
    private def pathCol(): Column = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      while (!eof && peek == '.') {
        next()
        val sb = new StringBuilder
        while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '-')) sb.append(next())
        parts += sb.toString
      }
      require(parts.nonEmpty, s"empty path at $i in '$s'")
      parts.tail.foldLeft(col(s"`${parts.head}`"))(_.getField(_))
    }

    private def readOp(): String = {
      val two = s.substring(i, math.min(i + 2, s.length))
      if (Set("==", "!=", ">=", "<=").contains(two)) { i += 2; two }
      else if (peek == '>' || peek == '<') String.valueOf(next())
      else sys.error(s"expected comparison op at $i in '$s'")
    }

    /** 'str' | number | true | false | null → Some(lit) / None for null. */
    private def readLiteral(): Option[Column] = {
      if (peek == '\'' || peek == '"') {
        val q = next(); val sb = new StringBuilder
        while (!eof && peek != q) { if (peek == '\\') next(); sb.append(next()) }
        expect(q)
        Some(lit(sb.toString))
      } else if (s.startsWith("true", i)) { i += 4; Some(lit(true)) }
      else if (s.startsWith("false", i)) { i += 5; Some(lit(false)) }
      else if (s.startsWith("null", i)) { i += 4; None }
      else {
        val sb = new StringBuilder
        while (!eof && (peek.isDigit || peek == '.' || peek == '-' || peek == '+' || peek == 'e' || peek == 'E'))
          sb.append(next())
        require(sb.nonEmpty, s"expected literal at $i in '$s'")
        Some(lit(sb.toString.toDouble))
      }
    }

    private def eof: Boolean = i >= s.length
    private def peek: Char = s.charAt(i)
    private def next(): Char = { val c = s.charAt(i); i += 1; c }
    private def expect(c: Char): Unit = {
      require(!eof && peek == c, s"expected '$c' at $i in '$s'"); i += 1
    }
    private def skipWs(): Unit = while (!eof && peek.isWhitespace) i += 1
  }
}
