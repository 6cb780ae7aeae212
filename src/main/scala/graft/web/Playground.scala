package graft.web

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import graft.model.FlattenOptions
import graft.plan.FlattenPlanner
import graft.sources.JsonInput
import graft.meta.Metadata

/** Web playground (`/root/reference/docs/web.md:1-24`, `src/lib.rs:35-37`):
  * an HTTP server that flattens posted JSON and returns table/field
  * previews, so the operator surface can be explored without the CLI.
  * Mirrors the reference's configuration contract — `PORT` (default 8080),
  * `HOST` (default 127.0.0.1), `MAX_SIZE` in MB (default 500) — on the
  * JDK's built-in HttpServer: no new dependency, works offline.
  *
  * Endpoints:
  *   - `GET  /`            tiny HTML form for pasting JSON
  *   - `POST /api/flatten` body = JSON array / NDJSON / JSON stream
  *     (autodetected); query params: `main_table_name`, `path_separator`,
  *     `no_link`, `arrays_new_table`, `inline_one_to_one`,
  *     `pushdown` (comma-separated), `preview` (rows per table, default 10).
  *     Response: `{"tables": {name: {"fields": [{name, type, count}],
  *     "rows": [[...], ...]}}}` — the fields/tables preview model the
  *     reference UI renders.
  */
object Playground {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-web")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = start(spark,
      sys.env.getOrElse("HOST", "127.0.0.1"),
      sys.env.getOrElse("PORT", "8080").toInt,
      sys.env.getOrElse("MAX_SIZE", "500").toInt)
    println(s"graft playground listening on http://${server.getAddress.getHostString}:${server.getAddress.getPort}/")
    Thread.currentThread().join() // serve until killed
  }

  /** Start the server (port 0 = ephemeral, used by specs). Caller stops it. */
  def start(spark: SparkSession, host: String, port: Int, maxSizeMb: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(host, port), 0)
    server.createContext("/", (ex: HttpExchange) => safely(ex) {
      respond(ex, 200, "text/html", IndexHtml)
    })
    server.createContext("/api/flatten", (ex: HttpExchange) => safely(ex) {
      if (ex.getRequestMethod != "POST") respond(ex, 405, "text/plain", "POST only")
      else {
        val body = readBounded(ex, maxSizeMb.toLong * 1024 * 1024)
        body match {
          case None => respond(ex, 413, "text/plain", s"body exceeds MAX_SIZE=${maxSizeMb}MB")
          case Some(json) if json.trim.isEmpty => respond(ex, 400, "text/plain", "empty body")
          case Some(json) => respond(ex, 200, "application/json",
            flattenToJson(spark, json, params(ex)))
        }
      }
    })
    server.start()
    server
  }

  private def safely(ex: HttpExchange)(body: => Unit): Unit =
    try body
    catch {
      // NonFatal only: an OutOfMemoryError must propagate, not become a 400
      case scala.util.control.NonFatal(e) =>
        // if headers already went out (e.g. client dropped mid-write), a
        // second sendResponseHeaders throws — swallow that, the exchange
        // is already lost
        try respond(ex, 400, "text/plain", s"error: ${e.getMessage}")
        catch { case _: java.io.IOException => () }
    }
    finally ex.close()

  private def respond(ex: HttpExchange, code: Int, ctype: String, content: String): Unit = {
    val bytes = content.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", s"$ctype; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  /** Read at most `max` bytes; None if the body is larger (MAX_SIZE). */
  private def readBounded(ex: HttpExchange, max: Long): Option[String] = {
    val in = ex.getRequestBody
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > max) return None
      n = in.read(buf)
    }
    Some(out.toString("UTF-8"))
  }

  private def params(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split('&').toSeq
      .filter(_.contains('='))
      .map { kv => val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8") }
      .toMap

  /** Flatten pasted JSON (array / NDJSON / stream autodetected via the
    * brace splitter — an array body becomes one doc per element) and
    * render the preview model.
    */
  private[web] def flattenToJson(spark: SparkSession, json: String, p: Map[String, String]): String = {
    import spark.implicits._
    val docs: Seq[String] =
      if (json.trim.startsWith("[")) {
        // top-level array: explode to element documents (collect is eager,
        // so the staging file can be deleted before returning — a
        // long-running server must not accumulate request bodies on disk)
        val tmp = java.nio.file.Files.createTempFile("graft_web", ".json")
        try {
          java.nio.file.Files.writeString(tmp, json)
          JsonInput.jsonArray(spark, tmp.toString).toJSON.collect().toSeq
        } finally java.nio.file.Files.deleteIfExists(tmp)
      } else JsonInput.splitDocuments(json)
    val input = spark.read.json(spark.createDataset(docs))
    val opts = FlattenOptions(
      mainTableName = p.getOrElse("main_table_name", "main"),
      pathSeparator = p.getOrElse("path_separator", "_"),
      noLink = p.get("no_link").exists(_ != "false"),
      arraysNewTable = p.get("arrays_new_table").exists(_ != "false"),
      inlineOneToOne = p.get("inline_one_to_one").exists(_ != "false"),
      pushdown = p.get("pushdown").map(_.split(',').toSeq).getOrElse(Nil))
    val preview = p.getOrElse("preview", "10").toInt
    val tables = FlattenPlanner.flatten(input, opts)
    val rendered = tables.map { case (name, df) =>
      val metas = Metadata.analyze(name, df)
      val fields = metas.map(m =>
        s"""{"name":${js(m.fieldName)},"type":${js(m.fieldType)},"count":${m.count}}""")
        .mkString("[", ",", "]")
      val rows = df.limit(preview).collect().map { r =>
        (0 until r.length).map { i =>
          if (r.isNullAt(i)) "null" else js(String.valueOf(r.get(i)))
        }.mkString("[", ",", "]")
      }.mkString("[", ",", "]")
      s"""${js(name)}:{"fields":$fields,"rows":$rows}"""
    }.mkString("{", ",", "}")
    s"""{"tables":$rendered}"""
  }

  private def js(s: String): String = graft.util.Json.js(s)

  private val IndexHtml: String =
    """<!doctype html><html><head><title>graft playground</title></head>
      |<body><h1>graft playground</h1>
      |<p>Paste a JSON array, NDJSON, or a stream of JSON objects; get the
      |flattened table previews back.</p>
      |<textarea id="j" rows="14" cols="90">[{"id": 1, "kids": [{"n": "a"}]}]</textarea><br>
      |<button onclick="run()">Flatten</button>
      |<pre id="out"></pre>
      |<script>
      |async function run() {
      |  const r = await fetch('/api/flatten', {method: 'POST', body: document.getElementById('j').value});
      |  document.getElementById('out').textContent = JSON.stringify(await r.json(), null, 2);
      |}
      |</script></body></html>""".stripMargin
}
