package graft

import org.apache.spark.sql.SparkSession
import graft.api.Flatten
import graft.model._
import graft.sources.JsonInput
import graft.functions.JsonPathFilter
import graft.meta.{SchemaFields, SpecsCsv}

/** Command-line entry point mirroring the reference CLI
  * (`/root/reference/src/main.rs:8-123` / `flatterer INPUT OUT_DIR`).
  *
  * Usage:
  *   graft.Cli INPUT... OUT_DIR [--ndjson|--json-stream] [--path k[.k2]]
  *     [--pushdown f1,f2] [--main-table-name n] [--path-separator s]
  *     [--table-prefix p] [--id-prefix p] [--no-link] [--preview N]
  *     [--arrays-new-table] [--inline-one-to-one] [--parquet] [--sql-scripts]
  *     [--sqlite] [--xlsx]
  *
  * An INPUT of `-` reads stdin (`/root/reference/docs/inputs.md:7-14` —
  * `curl ... | flatterer - out`) and an `http(s)://` INPUT is downloaded
  * first (`docs/inputs.md:16-33`); both are staged to a temp file so the
  * normal (seekable, splittable) readers apply. s3a/gs/hdfs URIs work
  * through the Hadoop filesystem layer as-is.
  */
object Cli {
  private val valueFlags = Set("--path", "--pushdown", "--main-table-name",
    "--path-separator", "--table-prefix", "--id-prefix", "--preview",
    "--json-path", "--fields-csv", "--tables-csv",
    "--schema", "--schema-titles", "--emit-obj",
    "--pipeline-text", "--pipeline-id", "--pipeline-eval",
    "--pipeline-corpus", "--pipeline-fp", "--pipeline-bands")

  /** Parsed command line: positionals plus boolean and valued flags. */
  private[graft] final case class Args(positional: Vector[String],
      flags: Set[String], values: Map[String, String])

  /** One pass over argv: a value flag consumes the NEXT token as its value
    * (never re-resolved by position, so `--pushdown x --no-link` parses and
    * a positional that looks like a flag name cannot shift resolution).
    */
  private[graft] def parseArgs(args: Array[String]): Args = {
    val positional = Vector.newBuilder[String]
    val flags = Set.newBuilder[String]
    val values = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) {
        flags += a
        if (valueFlags.contains(a) && i + 1 < args.length) { values += a -> args(i + 1); i += 1 }
      } else positional += a
      i += 1
    }
    Args(positional.result(), flags.result(), values.result())
  }

  def main(args: Array[String]): Unit = {
    val parsedArgs = parseArgs(args)
    if (parsedArgs.flags.contains("--web")) {
      // `flatterer --web` equivalent (`docs/web.md`): serve the playground
      // instead of running a batch flatten
      graft.web.Playground.main(Array.empty)
      return
    }
    if (parsedArgs.positional.length < 2) {
      System.err.println("usage: graft.Cli INPUT... OUT_DIR [--ndjson|--json-stream] [--path k] " +
        "[--json-path expr] [--pushdown f1,f2] [--main-table-name n] [--path-separator s] " +
        "[--table-prefix p] [--id-prefix p] [--no-link] [--preview N] " +
        "[--fields-csv f] [--tables-csv f] [--only-fields] [--only-tables] " +
        "[--schema file|url] [--schema-titles full|slug|underscore_slug] " +
        "[--emit-obj a.b,c] [--stats] " +
        "[--arrays-new-table] [--inline-one-to-one] [--parquet] [--sql-scripts] " +
        "[--sqlite] [--xlsx] [--evolve] [--web] " +
        "[--pipeline [--pipeline-text c] [--pipeline-id c] [--pipeline-eval f] " +
        "[--pipeline-corpus p] [--pipeline-fp p] [--pipeline-bands p] " +
        "[--pipeline-within-batch] [--pipeline-scrub] [--pipeline-redact]]")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, parsedArgs, System.in)
    finally spark.stop()
  }

  /** Stage stdin to a temp file so `-` inputs go through the same seekable
    * readers as paths (the reference does the same buffering for stdin,
    * `src/main.rs` input handling).
    */
  private def stageStdin(stdin: java.io.InputStream): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_stdin", ".json")
    tmp.toFile.deleteOnExit()
    java.nio.file.Files.copy(stdin, tmp,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.toString
  }

  /** Stage an http(s) URL input to a temp file
    * (`/root/reference/docs/inputs.md:16-33` — `flatterer URL out`). The
    * CLI downloads once and the library reads a local, splittable file,
    * matching the reference's download-then-flatten behavior.
    */
  private def stageUrl(url: String): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_url", ".json")
    tmp.toFile.deleteOnExit()
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(30))
      .build()
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        // bound the whole download — a stalled server must fail the CLI,
        // not hang it forever
        .timeout(java.time.Duration.ofMinutes(15))
        .GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofFile(tmp,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    require(resp.statusCode() / 100 == 2, s"GET $url returned ${resp.statusCode()}")
    tmp.toString
  }

  /** Body of the CLI against a provided session + stdin (testable — specs
    * call this with the shared test session; `main` owns session lifecycle).
    */
  private[graft] def run(spark: SparkSession, a: Args, stdin: java.io.InputStream): Unit = {
    val inputs = a.positional.dropRight(1).map {
      case "-" => stageStdin(stdin)
      case p if p.startsWith("http://") || p.startsWith("https://") => stageUrl(p)
      case p => p
    }.toSeq
    val outDir = a.positional.last
    def flagVal(name: String): Option[String] = a.values.get(name)
    def has(name: String): Boolean = a.flags.contains(name)

    {
      val parsed =
        if (has("--ndjson")) JsonInput.ndjson(spark, inputs: _*)
        else if (has("--json-stream")) JsonInput.jsonStream(spark, inputs: _*)
        else flagVal("--path") match {
          case Some(p) => JsonInput.jsonArrayAt(spark, p.split('.').toSeq, inputs: _*)
          case None    => JsonInput.jsonArray(spark, inputs: _*)
        }
      // document filter before flatten — sits under the explode chain
      val input = flagVal("--json-path").map(JsonPathFilter(parsed, _)).getOrElse(parsed)

      def readFile(p: String) = java.nio.file.Files.readString(java.nio.file.Paths.get(p))

      // --schema accepts a local path or an http(s) URL, like the reference
      // ("Link to remote or local JSONSchema", `src/main.rs:30`); titles
      // mode per `--schema-titles` (`src/main.rs:33`, docs/options.md:733)
      val schemaFields = flagVal("--schema").map { loc =>
        val path = if (loc.startsWith("http://") || loc.startsWith("https://")) stageUrl(loc) else loc
        val mode = flagVal("--schema-titles") match {
          case Some("full")            => SchemaFields.FullTitle
          case Some("slug")            => SchemaFields.Slug
          case Some("underscore_slug") => SchemaFields.UnderscoreSlug
          case _                       => SchemaFields.NoTitle
        }
        SchemaFields.fromJsonSchema(readFile(path),
          flagVal("--main-table-name").getOrElse("main"),
          flagVal("--path-separator").getOrElse("_"), mode)
      }.getOrElse(Nil)

      val opts = FlattenOptions(
        mainTableName = flagVal("--main-table-name").getOrElse("main"),
        pathSeparator = flagVal("--path-separator").getOrElse("_"),
        tablePrefix = flagVal("--table-prefix").getOrElse(""),
        idPrefix = flagVal("--id-prefix").getOrElse(""),
        noLink = has("--no-link"),
        pushdown = flagVal("--pushdown").map(_.split(',').toSeq).getOrElse(Nil),
        arraysNewTable = has("--arrays-new-table"),
        inlineOneToOne = has("--inline-one-to-one"),
        preview = flagVal("--preview").map(_.toInt).getOrElse(0),
        emitObj = flagVal("--emit-obj")
          .map(_.split(',').toSeq.map(_.split('.').toSeq)).getOrElse(Nil),
        // fields.csv specs first (explicit control wins), schema order after
        fields = flagVal("--fields-csv").map(p => SpecsCsv.parseFieldsCsv(readFile(p))).getOrElse(Nil)
          ++ schemaFields,
        tables = flagVal("--tables-csv").map(p => SpecsCsv.parseTablesCsv(readFile(p))).getOrElse(Nil),
        onlyFields = has("--only-fields"),
        onlyTables = has("--only-tables"))

      val res = Flatten.flattenToDir(input, outDir, opts,
        parquet = has("--parquet"), sqlScripts = has("--sql-scripts"),
        xlsx = has("--xlsx"), evolve = has("--evolve"), stats = has("--stats"),
        sqliteDb = has("--sqlite"))
      println(s"tables: ${res.tables.keys.mkString(", ")}")

      // --pipeline: run the training-data pipeline (graft.ops.Pipeline —
      // the same entry point the b17 bench times) over the flattened main
      // table. Quality filter always; C4 line scrub and PII redaction via
      // --pipeline-scrub / --pipeline-redact; exact dedup / near-dup /
      // decontamination activate when their standing state is supplied as
      // parquet paths (registered as temp views — a metastore-bucketed
      // table is the 100 TB layout; the path form trades the
      // exchange-free probe, not semantics). Kept rows land in
      // <outDir>/pipeline/ as parquet; per-stage counts print to stdout.
      if (has("--pipeline")) {
        import org.apache.spark.sql.functions.col
        val textCol = flagVal("--pipeline-text").getOrElse("text")
        val idCol = flagVal("--pipeline-id").getOrElse("_link")
        val main = res.tables(opts.mainTableName)
        require(main.columns.contains(textCol) && main.columns.contains(idCol),
          s"--pipeline: main table lacks '$textCol'/'$idCol' (have: " +
            main.columns.mkString(", ") + ") — set --pipeline-text/--pipeline-id")
        val fp = flagVal("--pipeline-fp").map { p =>
          spark.read.parquet(p).createOrReplaceTempView("graft_cli_fp")
          "graft_cli_fp"
        }
        val bands = flagVal("--pipeline-bands").map { p =>
          spark.read.parquet(p).createOrReplaceTempView("graft_cli_bands")
          "graft_cli_bands"
        }
        val corpus = flagVal("--pipeline-corpus").map(spark.read.parquet(_))
        require(bands.isEmpty || corpus.nonEmpty,
          "--pipeline-bands requires --pipeline-corpus (near-dup verifies " +
            "candidates against the corpus texts)")
        val eval = flagVal("--pipeline-eval").map { p =>
          spark.read.textFile(p).toDF(textCol)
        }
        val out = graft.ops.Pipeline.run(
          main.select(col(idCol), col(textCol)),
          graft.ops.Pipeline.Config(textCol = textCol, idCol = idCol,
            scrub = if (has("--pipeline-scrub"))
              Some(graft.ops.Pipeline.Scrub()) else None,
            fingerprintTable = fp, bandTable = bands,
            withinBatchNearDup = has("--pipeline-within-batch"),
            redactPii = has("--pipeline-redact")),
          corpus = corpus, eval = eval, countStages = true)
        out.kept.write.mode("overwrite").parquet(s"$outDir/pipeline")
        out.stageCounts.foreach { case (st, n) => println(s"pipeline $st: $n rows") }
      }
    }
  }
}
