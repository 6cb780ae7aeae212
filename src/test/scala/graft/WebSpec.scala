package graft

import org.scalatest.funsuite.AnyFunSuite
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI

/** The web playground end-to-end over a real HTTP socket (ephemeral port):
  * post JSON, get the flattened table/field preview back
  * (`/root/reference/docs/web.md`).
  */
class WebSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Retry transient connection-level failures (the JDK client
    * occasionally loses the keep-alive race against com.sun HttpServer
    * when the suite runs under full-parallel load); HTTP status codes
    * are returned as-is — only transport IOExceptions retry.
    */
  private def send(client: HttpClient, req: HttpRequest,
      attempts: Int = 3): HttpResponse[String] =
    try client.send(req, HttpResponse.BodyHandlers.ofString())
    catch {
      case e: java.io.IOException if attempts > 1 =>
        Thread.sleep(250)
        send(client, req, attempts - 1)
    }

  test("playground flattens posted JSON and previews tables, fields, rows") {
    val server = graft.web.Playground.start(spark, "127.0.0.1", 0, maxSizeMb = 1)
    try {
      val port = server.getAddress.getPort
      val client = HttpClient.newHttpClient()

      val index = send(client,
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/")).GET().build())
      assert(index.statusCode() == 200 && index.body().contains("graft playground"))

      val body = """[{"id": 1, "name": "x", "kids": [{"n": "a"}, {"n": "b"}]},
                   | {"id": 2, "name": "y", "kids": []}]""".stripMargin
      val resp = send(client,
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/flatten"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build())
      assert(resp.statusCode() == 200)
      val json = resp.body()
      assert(json.contains("\"main\"") && json.contains("\"kids\""))
      assert(json.contains("\"fields\"") && json.contains("\"rows\""))
      assert(json.contains("\"_link_main\"")) // child FK present in preview

      // NDJSON body goes through the stream splitter path
      val nd = send(client,
        HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/api/flatten?no_link=true&preview=1"))
          .POST(HttpRequest.BodyPublishers.ofString("{\"a\": 1}\n{\"a\": 2}")).build())
      assert(nd.statusCode() == 200 && nd.body().contains("\"a\""))
      assert(!nd.body().contains("_link")) // no_link honored

      // MAX_SIZE enforced
      val big = "[" + Seq.fill(40000)("""{"p": "xxxxxxxxxxxxxxxxxxxxxxxxxxxxx"}""").mkString(",") + "]"
      val over = send(client,
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/api/flatten"))
          .POST(HttpRequest.BodyPublishers.ofString(big)).build())
      assert(over.statusCode() == 413)
    } finally server.stop(0)
  }
}
