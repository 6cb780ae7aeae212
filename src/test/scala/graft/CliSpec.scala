package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** CLI argument parsing and the stdin (`-`) input path
  * (`/root/reference/docs/inputs.md:7-14`). `Cli.run` is exercised with the
  * shared test session (Cli.main owns its own session lifecycle, which
  * would tear down TestSpark's).
  */
class CliSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("value flags parse in one pass; flag-like values cannot shift resolution") {
    val a = Cli.parseArgs(Array("in.json", "out", "--pushdown", "id,title", "--no-link"))
    assert(a.positional == Vector("in.json", "out"))
    assert(a.values.get("--pushdown").contains("id,title"))
    assert(a.flags.contains("--no-link"))

    // a value that looks like a flag name is consumed as the value, not
    // re-resolved as a flag, and doesn't shift any later flag's value
    val b = Cli.parseArgs(Array("--table-prefix", "--pushdown", "in.json", "out", "--preview", "5"))
    assert(b.values.get("--table-prefix").contains("--pushdown"))
    assert(!b.values.contains("--pushdown"))
    assert(b.values.get("--preview").contains("5"))
    assert(b.positional == Vector("in.json", "out"))
  }

  test("http URL input downloads, stages, and flattens like a file input") {
    // serve a JSON doc from a local JDK HttpServer — exercises the real
    // download path with zero egress
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val doc = """[{"id": 9, "name": "from http"}]""".getBytes("UTF-8")
    server.createContext("/docs.json", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.sendResponseHeaders(200, doc.length)
      ex.getResponseBody.write(doc)
      ex.close()
    })
    server.start()
    try {
      val out = Files.createTempDirectory("graft_cli_http").toString
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/docs.json"
      Cli.run(spark, Cli.parseArgs(Array(url, out)), System.in)
      val main = Files.readString(Paths.get(s"$out/csv/main.csv"))
      assert(main.contains("from http"))
    } finally server.stop(0)
  }

  test("--evolve emits the DDL delta against the prior run's datapackage") {
    val out = Files.createTempDirectory("graft_cli_evolve").toString
    val first = Files.createTempFile("graft_ev1", ".json")
    Files.writeString(first, """[{"id": 1, "note": "a"}]""")
    Cli.run(spark, Cli.parseArgs(Array(first.toString, out)), System.in)
    assert(Files.exists(Paths.get(s"$out/datapackage.json")))

    // second load adds a field — evolve must ALTER, not CREATE, main
    val second = Files.createTempFile("graft_ev2", ".json")
    Files.writeString(second, """[{"id": 2, "note": "b", "extra": 7}]""")
    Cli.run(spark, Cli.parseArgs(Array(second.toString, out, "--evolve")), System.in)
    val pg = Files.readString(Paths.get(s"$out/postgresql/postgresql_evolve.sql"))
    assert(pg.contains("""ALTER TABLE "main" ADD COLUMN "extra" NUMERIC;"""))
    assert(!pg.contains("""CREATE TABLE "main""""))

    // the written datapackage must describe the MERGED store schema —
    // 'note' (from load 1) and 'extra' (from load 2) both present, so a
    // third evolve run does not re-ADD existing columns
    val dp = Files.readString(Paths.get(s"$out/datapackage.json"))
    assert(dp.contains("\"note\"") && dp.contains("\"extra\""))
    val third = Files.createTempFile("graft_ev3", ".json")
    Files.writeString(third, """[{"id": 3, "note": "c"}]""")
    Cli.run(spark, Cli.parseArgs(Array(third.toString, out, "--evolve")), System.in)
    val pg3 = Files.readString(Paths.get(s"$out/postgresql/postgresql_evolve.sql"))
    assert(!pg3.contains("ADD COLUMN"), s"re-added existing columns:\n$pg3")
  }

  test("--stats embeds min/max/distinct per field into datapackage.json") {
    val out = Files.createTempDirectory("graft_cli_stats").toString
    val in = Files.createTempFile("graft_stats", ".json")
    Files.writeString(in, """[{"id": 1, "t": "a"}, {"id": 3, "t": "b"}]""")
    Cli.run(spark, Cli.parseArgs(Array(in.toString, out, "--stats")), System.in)
    val dp = Files.readString(Paths.get(s"$out/datapackage.json"))
    assert(dp.contains(""""name":"id","type":"number","count":2,"stats":{"min":"1","max":"3","distinct":2}"""), dp)
    assert(dp.contains(""""name":"t","type":"text","count":2,"stats":{"min":"a","max":"b","distinct":2}"""), dp)
    // without the flag the field entries stay stats-free
    val out2 = Files.createTempDirectory("graft_cli_nostats").toString
    Cli.run(spark, Cli.parseArgs(Array(in.toString, out2)), System.in)
    assert(!Files.readString(Paths.get(s"$out2/datapackage.json")).contains("\"stats\""))
  }

  test("--schema orders/titles fields from a JSONSchema; --emit-obj forces a 1:1 table") {
    val out = Files.createTempDirectory("graft_cli_schema").toString
    val in = Files.createTempFile("graft_schema_in", ".json")
    Files.writeString(in,
      """[{"zz": 9, "id": 1, "rating": {"code": "E"}}, {"zz": 8, "id": 2, "rating": {"code": "T"}}]""")
    val schema = Files.createTempFile("graft_schema", ".json")
    Files.writeString(schema,
      """{"type": "object", "properties": {
        |  "id": {"type": "number", "title": "The Identifier!"},
        |  "zz": {"type": "number"}}}""".stripMargin)
    Cli.run(spark, Cli.parseArgs(Array(in.toString, out,
      "--schema", schema.toString, "--schema-titles", "underscore_slug",
      "--emit-obj", "rating")), System.in)
    val main = Files.readString(Paths.get(s"$out/csv/main.csv"))
    // schema order (id before zz, despite alphabetical inference) + title
    val header = main.linesIterator.next().split(',').toSeq
    assert(header.indexOf("the_identifier") >= 0 &&
      header.indexOf("the_identifier") < header.indexOf("zz"), main)
    // emit-obj: the 1:1 rating object becomes its own table
    val rating = Files.readString(Paths.get(s"$out/csv/rating.csv"))
    assert(rating.contains("E") && rating.contains("T"))
  }

  test("stdin input `-` stages the pipe and flattens like a file input") {
    val out = Files.createTempDirectory("graft_cli_stdin").toString
    val doc = """[{"id":1,"name":"stdin doc"},{"id":2,"name":"another"}]"""
    val in = new java.io.ByteArrayInputStream(doc.getBytes("UTF-8"))
    Cli.run(spark, Cli.parseArgs(Array("-", out)), in)
    val main = Files.readString(Paths.get(s"$out/csv/main.csv"))
    assert(main.contains("stdin doc") && main.contains("another"))
    assert(main.linesIterator.size == 3) // header + 2 rows
  }

  test("--pipeline runs the training-data pipeline over the flattened main table") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_cli_pipe").toString
    val base = "the quick brown fox jumps over the lazy dog with plenty of " +
      "ordinary prose that have been written to pass most of the " +
      "published gopher rules and be long enough for the word count"
    val evalSentence = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima mike november"
    val evalFile = Files.createTempFile("graft_cli_eval", ".txt")
    Files.writeString(evalFile, evalSentence + "\n")
    def j(id: Int, text: String) = s"""{"id":$id,"text":"$text"}"""
    val in = Files.createTempFile("graft_cli_pipe", ".json")
    Files.writeString(in, "[" + Seq(
      j(1, base + " " + base),                      // passes quality → kept
      j(2, "1 2 3"),                                // quality drop (minWords)
      j(3, base + " " + base + " " + evalSentence)  // decontaminate drop
    ).mkString(",") + "]")
    Cli.run(spark, Cli.parseArgs(Array(in.toString, out.toString,
      "--pipeline", "--pipeline-text", "text",
      "--pipeline-eval", evalFile.toString)), System.in)
    val kept = spark.read.parquet(s"$out/pipeline")
    assert(kept.count() == 1L)
    assert(kept.select(col("text")).collect()(0).getString(0) == base + " " + base)
  }

  test("--pipeline-fp/--pipeline-bands/--pipeline-corpus: standing state drops exact and near copies end-to-end") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val work = Files.createTempDirectory("graft_cli_pipe_std").toString
    val out = s"$work/out"
    // distinct-per-doc alphabetic vocabularies: each doc passes the
    // DEFAULT Gopher rules (>=50 words, mean len >=3, all-alpha, two
    // stopword hits) while sharing no shingles with the others, so a
    // near copy scores ~0.95 Jaccard against ITS corpus twin and ~0
    // against everything else
    def w(i: Int): String = "word" + Integer.toString(i, 26).map { c =>
      if (c.isDigit) ('k' + (c - '0')).toChar else c }.mkString
    def docText(k: Int): String =
      (k * 100 until k * 100 + 58).map(w).mkString(" ") + " the and"
    val corpus = Seq(("c1", docText(1)), ("c2", docText(2)), ("c3", docText(3)))
      .toDF("_link", "text")
    corpus.write.parquet(s"$work/corpus")
    // standing state in the CLI's parquet-path form, produced by the
    // same projections the catalog writers use (writeFingerprintTable /
    // writeBandTable) so the temp-view probe sees the real layout —
    // band config (32/8/3) matches the CLI pipeline's NearDup defaults
    corpus.select(graft.ops.TextAnalysis.fingerprintBin(col("text")).as("__k"))
      .write.parquet(s"$work/fp")
    graft.ops.Dedup.bandIndex(corpus, "text", "_link",
      numHashes = 32, bands = 8, shingleSize = 3)
      .write.parquet(s"$work/bands")
    def j(id: Int, text: String) = s"""{"id":$id,"text":"$text"}"""
    val in = Files.createTempFile("graft_cli_pipe_std", ".json")
    Files.writeString(in, "[" + Seq(
      j(1, docText(1)),                   // exact copy of c1 → fp drop
      j(2, docText(2) + " extra tail"),   // near copy of c2 → band drop
      j(3, docText(9)),                   // fresh → kept
      j(4, "1 2 3")                       // quality drop
    ).mkString(",") + "]")
    Cli.run(spark, Cli.parseArgs(Array(in.toString, out,
      "--pipeline", "--pipeline-text", "text",
      "--pipeline-fp", s"$work/fp",
      "--pipeline-bands", s"$work/bands",
      "--pipeline-corpus", s"$work/corpus")), System.in)
    val kept = spark.read.parquet(s"$out/pipeline")
    assert(kept.count() == 1L, kept.collect().mkString("; "))
    assert(kept.select(col("text")).collect()(0).getString(0) == docText(9))
  }

  test("--pipeline-scrub and --pipeline-redact run the optional hygiene stages") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft_cli_pipe_sr").toString
    val base = "the quick brown fox jumps over the lazy dog with plenty of " +
      "ordinary prose that have been written to pass most of the " +
      "published gopher rules and be long enough for the word count."
    // one long content line (the default Gopher rules need >= 50 words
    // on the SCRUBBED text), one junk line, one PII line
    val doc = base + " " + base + "\\nclick here javascript tracking pixel\\n" +
      "contact us at alice@example.com for more details."
    val in = Files.createTempFile("graft_cli_pipe_sr", ".json")
    Files.writeString(in, s"""[{"id":1,"text":"$doc"}]""")
    Cli.run(spark, Cli.parseArgs(Array(in.toString, out,
      "--pipeline", "--pipeline-text", "text",
      "--pipeline-scrub", "--pipeline-redact")), System.in)
    val kept = spark.read.parquet(s"$out/pipeline")
      .select(col("text")).collect().map(_.getString(0))
    assert(kept.toSeq == Seq(base + " " + base +
      "\ncontact us at [EMAIL] for more details."), kept.mkString("|"))
  }

  test("--pipeline-bands without --pipeline-corpus is refused") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft_cli_pipe_ref").toString
    // a real (readable) band frame: the refusal must come from the
    // corpus guard, not from a failed parquet read
    graft.ops.Dedup.bandIndex(
      Seq(("c1", "some corpus text here")).toDF("_link", "text"),
      "text", "_link", numHashes = 32, bands = 8, shingleSize = 3)
      .write.parquet(s"$work/bands")
    val in = Files.createTempFile("graft_cli_pipe_ref", ".json")
    Files.writeString(in, """[{"id":1,"text":"whatever"}]""")
    val e = intercept[IllegalArgumentException] {
      Cli.run(spark, Cli.parseArgs(Array(in.toString, s"$work/out",
        "--pipeline", "--pipeline-text", "text",
        "--pipeline-bands", s"$work/bands")), System.in)
    }
    assert(e.getMessage.contains("--pipeline-corpus"))
  }
}
