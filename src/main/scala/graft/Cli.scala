package graft

import org.apache.spark.sql.SparkSession
import graft.api.Flatten
import graft.model._
import graft.sources.JsonInput
import graft.functions.JsonPathFilter
import graft.meta.SpecsCsv

/** Command-line entry point mirroring the reference CLI
  * (`/root/reference/src/main.rs:8-123` / `flatterer INPUT OUT_DIR`).
  *
  * Usage:
  *   graft.Cli INPUT... OUT_DIR [--ndjson|--json-stream] [--path k[.k2]]
  *     [--pushdown f1,f2] [--main-table-name n] [--path-separator s]
  *     [--table-prefix p] [--id-prefix p] [--no-link] [--preview N]
  *     [--arrays-new-table] [--inline-one-to-one] [--parquet] [--sql-scripts]
  */
object Cli {
  private val valueFlags = Set("--path", "--pushdown", "--main-table-name",
    "--path-separator", "--table-prefix", "--id-prefix", "--preview",
    "--json-path", "--fields-csv", "--tables-csv")

  def main(args: Array[String]): Unit = {
    // Separate positional args from flags, consuming each value flag's value.
    val positional = Vector.newBuilder[String]
    val flags = Set.newBuilder[String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--")) { flags += a; if (valueFlags.contains(a)) i += 1 }
      else positional += a
      i += 1
    }
    val pos = positional.result()
    if (pos.length < 2) {
      System.err.println("usage: graft.Cli INPUT... OUT_DIR [--ndjson|--json-stream] [--path k] " +
        "[--pushdown f1,f2] [--main-table-name n] [--no-link] [--preview N] " +
        "[--arrays-new-table] [--inline-one-to-one] [--parquet] [--sql-scripts]")
      sys.exit(2)
    }
    val inputs = pos.dropRight(1).toSeq
    val outDir = pos.last

    def flagVal(name: String): Option[String] = {
      val i = args.indexOf(name)
      if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
    }
    val flagSet = flags.result()
    def has(name: String): Boolean = flagSet.contains(name)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    try {
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
        fields = flagVal("--fields-csv").map(p => SpecsCsv.parseFieldsCsv(readFile(p))).getOrElse(Nil),
        tables = flagVal("--tables-csv").map(p => SpecsCsv.parseTablesCsv(readFile(p))).getOrElse(Nil),
        onlyFields = has("--only-fields"),
        onlyTables = has("--only-tables"))

      val res = Flatten.flattenToDir(input, outDir, opts,
        parquet = has("--parquet"), sqlScripts = has("--sql-scripts"),
        xlsx = has("--xlsx"))
      println(s"tables: ${res.tables.keys.mkString(", ")}")
    } finally spark.stop()
  }
}
