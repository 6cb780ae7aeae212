package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input readers (SURVEY.md §2.1 S1-S8).
  *
  * All readers return a DataFrame of parsed documents ready for
  * [[graft.plan.FlattenPlanner]]. They build on Spark's native JSON source
  * wherever possible (parallel splits, schema inference, pushdown-friendly);
  * only the "JSON stream" form (concatenated objects, not line-aligned —
  * `/root/reference/docs/options.md:309-341`) needs a custom splitter since
  * no Spark reader understands it.
  *
  * gzip (`/root/reference/docs/inputs.md:34-40`) is free: Hadoop's codec
  * layer decompresses `.gz` for both `text` and `json` sources.
  */
object JsonInput {

  /** S1: file(s) containing one top-level JSON array of objects
    * (`docs/options.md:229-251`). multiLine mode: one file = one value.
    */
  def jsonArray(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("multiLine", true).json(paths: _*)

  /** S2: the array of objects lives under a (possibly nested) key path
    * (`docs/options.md:253-281`). e.g. path=Seq("games").
    */
  def jsonArrayAt(spark: SparkSession, path: Seq[String], paths: String*): DataFrame = {
    val df = spark.read.option("multiLine", true).json(paths: _*)
    val arr = path.tail.foldLeft(col(path.head))(_.getField(_))
    df.select(explode(arr).as("doc")).select("doc.*")
  }

  /** S3: newline-delimited JSON (`docs/options.md:284-307`) — Spark's
    * default JSON mode; parallel line splits, the scale path. Multi-file
    * union (S6) is the same call with several paths.
    */
  def ndjson(spark: SparkSession, paths: String*): DataFrame =
    spark.read.json(paths: _*)

  /** Default per-file size cap for [[jsonStream]]: 1 GiB. Overridable via
    * the `GRAFT_MAX_STREAM_FILE_BYTES` env var (a plain byte count) or
    * the explicit overload. Parsed defensively — a malformed value must
    * name the setting, not surface as an ExceptionInInitializerError.
    */
  lazy val DefaultMaxStreamFileBytes: Long =
    sys.env.get("GRAFT_MAX_STREAM_FILE_BYTES") match {
      case None => 1L << 30
      case Some(v) =>
        try v.trim.toLong catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"GRAFT_MAX_STREAM_FILE_BYTES must be a plain byte count (e.g. 1073741824), got '$v'")
        }
    }

  /** S4: concatenated "JSON stream" — whitespace-separated top-level
    * objects, not line-aligned (`docs/options.md:309-341`). No native Spark
    * reader exists; we read file-per-row (`wholetext`) and split documents
    * with a linear brace-depth scanner (string/escape aware), then parse
    * each with `from_json`-free `spark.read.json(Dataset[String])` so
    * schema inference matches the other sources.
    *
    * The splitter is a per-file linear scan — fine for the reference's
    * workload shape (many modest files); NDJSON remains the recommended
    * format at 100 TB (as the reference itself documents,
    * `docs/options.md:796-804`). `wholetext` means one file = one String
    * in one task, so a single multi-GB stream file would OOM an executor
    * with no useful error — a pre-flight listing fails fast past
    * `maxFileBytes` (on-disk size; note a `.gz` expands further) with a
    * convert-to-NDJSON pointer instead.
    */
  def jsonStream(spark: SparkSession, paths: String*): DataFrame =
    jsonStream(spark, DefaultMaxStreamFileBytes, paths: _*)

  def jsonStream(spark: SparkSession, maxFileBytes: Long, paths: String*): DataFrame = {
    import spark.implicits._
    preflightSizeCheck(spark, paths, maxFileBytes)
    val whole: Dataset[String] = spark.read.option("wholetext", true).textFile(paths: _*)
    val docs = whole.flatMap(splitTopLevel _)
    spark.read.json(docs)
  }

  /** Fail fast when any input file exceeds `maxFileBytes` — before the
    * scan starts, on the driver, with the file named. Directory listing
    * RECURSES into visible subdirectories, with the hidden-prefix rule
    * applied to every path segment — a conservative SUPERSET of what
    * the read loads: Spark's discovery descends into `key=value`
    * partition layouts (verified empirically — a nested partition file
    * is read, and would OOM unchecked) but ignores plain subdirectories.
    * Listing both means no oversized file the scan might load can slip
    * past the cap; the cost is a false rejection when an oversized file
    * sits in a plain subdirectory the read would skip — point at
    * explicit files or a glob to exclude it.
    */
  private def preflightSizeCheck(spark: SparkSession, paths: Seq[String],
      maxFileBytes: Long): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    // Spark's file index skips hidden entries (`_`/`.` prefixes — e.g. a
    // leftover _temporary spill); the pre-flight must not reject files
    // the read would never load
    def visible(st: org.apache.hadoop.fs.FileStatus): Boolean = {
      val n = st.getPath.getName
      !n.startsWith("_") && !n.startsWith(".")
    }
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      val matched = Option(fs.globStatus(hp)).filter(_.nonEmpty)
        .getOrElse(Array(fs.getFileStatus(hp)))
      def leaves(st: org.apache.hadoop.fs.FileStatus): Seq[org.apache.hadoop.fs.FileStatus] =
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq.filter(visible).flatMap(leaves)
        else if (visible(st)) Seq(st) else Nil
      val files = matched.flatMap(leaves)
      files.find(_.getLen > maxFileBytes).foreach { st =>
        throw new IllegalArgumentException(
          s"json-stream input ${st.getPath} is ${st.getLen} bytes, over the " +
            s"$maxFileBytes-byte per-file cap: wholetext loads each stream file " +
            "as ONE string in ONE task, so a file this size risks executor OOM. " +
            "Convert the input to NDJSON (one document per line) — the scalable " +
            "format for large inputs — or raise GRAFT_MAX_STREAM_FILE_BYTES.")
      }
    }
  }

  /** S5: driver-side iterator/collection ingest
    * (`flatterer/__init__.py:48-55`; `docs/library.md:10-44`). Strings must
    * each be a standalone JSON document.
    */
  def fromIterator(spark: SparkSession, docs: Iterator[String], parallelism: Int = 0): DataFrame = {
    import spark.implicits._
    val seq = docs.toSeq
    val par = if (parallelism > 0) parallelism else spark.sparkContext.defaultParallelism
    spark.read.json(spark.createDataset(seq).repartition(par))
  }

  /** Split an in-memory string of concatenated top-level JSON values into
    * documents (NDJSON, pretty-printed streams, and mixes all work) — the
    * driver-side counterpart of [[jsonStream]], used by the web playground
    * on request bodies. */
  def splitDocuments(s: String): Seq[String] = splitTopLevel(s)

  /** Split a string of concatenated top-level JSON values into documents.
    * Handles strings/escapes; tolerates whitespace and commas between docs.
    */
  private[sources] def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inStr = false
    var esc = false
    var start = -1
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '{' | '[' =>
          if (depth == 0) start = i
          depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0 && start >= 0) { out += s.substring(start, i + 1); start = -1 }
        case _ => ()
      }
      i += 1
    }
    out.toSeq
  }
}
