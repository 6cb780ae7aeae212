package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextFilters

/** Bit-for-bit parity of the compiled Gopher-stats kernel
  * ([[graft.functions.TextHash.gopherStats]], what
  * [[TextFilters.annotate]] now evaluates) against the
  * [[TextFilters.ruleChecks]] expression spelling — the cross-engine
  * reference the x25 oracle replays in SQL. The fuzz corpus leans on
  * every seam the kernel had to replicate by construction: Unicode
  * whitespace classes (U+000B, NBSP, U+2028...), code-point vs
  * UTF-16-unit lengths (astral chars), `trim()`/`lower()` via Spark's
  * own UTF8String, and java.util.regex `find()` line-anchor subtleties
  * (`$` before a final \r).
  */
class GopherParitySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** The pre-kernel annotate, verbatim: rule booleans as expression trees. */
  private def exprAnnotate(df: DataFrame, rules: TextFilters.Rules): DataFrame = {
    val checks = TextFilters.ruleChecks(col("text"), rules)
    val withFlags = checks.foldLeft(df) { case (d, (name, ok)) =>
      d.withColumn(s"ok_$name", ok)
    }
    val keep = checks.map { case (n, _) => col(s"ok_$n") }.reduce(_ && _)
    val reasons = concat_ws(",",
      checks.map { case (n, _) => when(!col(s"ok_$n"), n) }: _*)
    withFlags.withColumn("keep", keep).withColumn("drop_reasons", reasons)
  }

  private val outCols = Seq("doc_id", "ok_word_count", "ok_mean_word_len",
    "ok_symbol_ratio", "ok_bullet_lines", "ok_ellipsis_lines",
    "ok_alpha_words", "ok_stopword_hits", "keep", "drop_reasons")

  private def check(texts: Seq[String], rules: TextFilters.Rules): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = TextFilters.annotate(df, "text", rules)
      .select(outCols.map(col): _*).orderBy("doc_id").collect()
    val expr = exprAnnotate(df, rules)
      .select(outCols.map(col): _*).orderBy("doc_id").collect()
    kernel.zip(expr).foreach { case (k, e) =>
      assert(k == e,
        s"kernel/expression mismatch for doc ${k.get(0)}: " +
          s"text=${texts(k.getLong(0).toInt)}\n kernel=$k\n expr  =$e")
    }
  }

  private val edgeTexts: Seq[String] = Seq(
    null, "", " ", "\n", "\n\n", "\t\t", "", " word ",
    "the be to of and that have with",
    "THE BE TO OF AND THAT HAVE WITH",
    "17.00 21168.23 0.04 1551 25",
    "# # # lots of symbols # # #",
    "... … ...… mixed ellipses ... runs .....",
    "- bullet line\n* another\n• third\n‣ fourth\n◦ fifth\nplain line",
    "ends with dots...\nends with unicode…\nplain",
    "trailing cr line...\r\nnext line",
    "abc...\r",
    "𐀀 astral 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 words 🙂 here",
    "\u2028separator\u2029paragraph \u1680ogham\u3000ideographic end",
    "word\u00A0nbsp\u000Bvtab\u2009thin\u2002en\u205Fmath words",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "The quick brown fox jumps over the lazy dog with plenty of " +
      "ordinary prose that have been written to pass most of the " +
      "published gopher rules and be long enough for the word count",
    "ße İstanbul ÅNGSTRÖM Σίσυφος МОСКВА",
    "mixed 123abc456 tokens-with-dashes and_underscores",
    // tokens past the 256-byte thread-local buffer: the md5 kernels'
    // growth paths (gramKeys/windowKeys ensure, simhash highestOneBit
    // resize) are otherwise never exercised
    ("x" * 300) + " the long token doc with words " + ("y" * 1000),
    "the astral long token " + ("𐀀" * 200) + " with more words after",
    // lone surrogates (directly constructed — Spark-ingested text never
    // contains them): the kernels' manual UTF-8 encoders must emit '?'
    // (0x3F) exactly like String.getBytes(UTF_8)/UTF8String, not a
    // CESU-style 3-byte sequence
    "lone high \uD83D surrogate word tail",
    "lone low \uDE02 surrogate word tail",
    "swapped pair \uDE02\uD83D surrogates here",
    "high at end of text \uD83D")

  private def fuzzTexts(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val pieces = Array("the", "be", "to", "of", "and", "that", "have",
      "with", "lorem", "ipsum", "42", "3.14", "#", "...", "…", "•", "‣",
      "-", "*", "𐀀", "🙂", "É", "ß", " ", "", " ",
      " ", " ", "\t", "\r", "\n", "\n\n", " ", "  ",
      "word...", "...word", "#tag", "x", "supercalifragilistic")
    (0 until n).map { _ =>
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        sb.append(pieces(rnd.nextInt(pieces.length)))
        if (rnd.nextBoolean()) sb.append(' ')
      }
      sb.toString
    }
  }

  test("kernel annotate equals expression spelling on edge corpus (default rules)") {
    check(edgeTexts, TextFilters.Rules())
  }

  test("kernel annotate equals expression spelling on edge corpus (tuned rules)") {
    // the b17 pipeline's tuned thresholds: exercises the comparisons at
    // different cut points (incl. mean-word-len bounds that edge texts
    // straddle)
    check(edgeTexts, TextFilters.Rules(minWords = 10, maxWords = 1000,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.4,
      minStopwordHits = 2))
  }

  test("gramKeys kernel equals the expression spelling (n=3 and n=13)") {
    import spark.implicits._
    val texts = edgeTexts ++ fuzzTexts(300, seed = 0x6ea3L) ++ Seq(
      "one two three four five six seven eight nine ten eleven twelve " +
        "thirteen fourteen fifteen one two three four five six seven " +
        "eight nine ten eleven twelve thirteen")  // repeated 13-grams → distinct bites
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    Seq(3, 13).foreach { n =>
      val kernel = df.select(col("doc_id"),
          graft.functions.TextHash.gramKeysUdf(n)(col("text")).as("g"))
        .orderBy("doc_id").collect()
      val expr = df.select(col("doc_id"),
          graft.ops.Decontaminate.gramKeysExpr(col("text"), n).as("g"))
        .orderBy("doc_id").collect()
      kernel.zip(expr).foreach { case (k, e) =>
        assert(k.getSeq[String](1) == e.getSeq[String](1),
          s"n=$n doc ${k.get(0)}: kernel=${k.getSeq[String](1)} " +
            s"expr=${e.getSeq[String](1)}")
      }
    }
  }

  test("kernel annotate equals expression spelling on 400 fuzzed documents") {
    check(fuzzTexts(400, seed = 0xb17L), TextFilters.Rules())
    check(fuzzTexts(400, seed = 0x5eedL), TextFilters.Rules(minWords = 3,
      maxWords = 30, minMeanWordLen = 2.0, maxMeanWordLen = 8.0,
      maxSymbolWordRatio = 0.2, maxBulletLineRatio = 0.5,
      maxEllipsisLineRatio = 0.1, minAlphaWordRatio = 0.6,
      minStopwordHits = 1))
  }

  test("allocation-free gopherStats equals the regex reference spelling") {
    // the r17 rewrite: pure index scans (no Pattern.split / String.split
    // / HashSet / per-line UTF8String) must reproduce the original regex
    // spelling field-for-field on every edge and fuzz document — this is
    // the direct kernel≡ref pin; the annotate tests above pin both
    // against the expression ground truth through Spark
    val texts = (edgeTexts.filter(_ != null) ++
      fuzzTexts(800, seed = 0x60f3L) ++ fuzzTexts(800, seed = 0x9a11L))
    texts.foreach { t =>
      val fast = graft.functions.TextHash.gopherStats(t)
      val ref = graft.functions.TextHash.gopherStatsRef(t)
      assert(fast == ref, s"gopherStats mismatch\n text=$t\n fast=$fast\n ref =$ref")
    }
  }

  test("windowKeys kernel equals the expression spelling (n=2 and n=10)") {
    // the exact-substring-window key kernel vs Dedup.windowKeysExpr, the
    // oracle spelling the x43/x46 DuckDB checks replay: same distinct
    // 16-byte md5 keys in the same first-occurrence order, including the
    // Java split(-1) empty-field semantics at non-space whitespace edges
    // (a doc starting with '\t' has a leading EMPTY token that joins as
    // a bare separator) and the no-windows empty array for null / short
    // / space-only texts
    import spark.implicits._
    val texts = edgeTexts ++ fuzzTexts(300, seed = 0x3a7L) ++ Seq(
      "\tleading tab token one two three four five six seven eight nine ten",
      "trailing ws one two three four five six seven eight nine ten\t",
      " nbsp start one two three four five six seven eight nine ten",
      "  spaces only trim me  ", "\t", " \t ")
    Seq(2, 10).foreach { n =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val rows = df.select(col("doc_id"),
        graft.functions.TextHash.windowKeysUdf(n)(col("text")).as("k"),
        graft.ops.Dedup.windowKeysExpr(col("text"), n).as("e"))
        .collect()
      rows.foreach { r =>
        val k = r.getSeq[Array[Byte]](1).map(_.toSeq)
        val e = r.getSeq[Array[Byte]](2).map(_.toSeq)
        assert(k == e,
          s"windowKeys mismatch n=$n doc=${r.getLong(0)} " +
            s"text=${texts(r.getLong(0).toInt)}\n kernel=$k\n expr  =$e")
      }
    }
  }

  test("windowKeys encodes a lone surrogate as '?' (direct JVM call)") {
    // Spark-ingested text can never carry an unpaired surrogate
    // (UTF8String.fromString already replaces it with '?'), so the
    // corpus parity test above pins nothing here — call the kernel
    // directly on raw JVM strings and check against a reference built
    // with String.getBytes(UTF_8), the encoder the expression spelling
    // (cast to binary) uses. A CESU-style 3-byte encoding of the lone
    // surrogate would fork the window key.
    val ws = "[ \\t\\n\\u000B\\f\\r\\u0085\\u00A0\\u1680\\u2000-\\u200A" +
      "\\u2028\\u2029\\u202F\\u205F\\u3000]+"
    def ref(text: String, n: Int): Seq[Seq[Byte]] = {
      val trimmed = {
        var s = 0; var e = text.length
        while (s < e && text.charAt(s) == ' ') s += 1
        while (e > s && text.charAt(e - 1) == ' ') e -= 1
        text.substring(s, e)
      }
      if (trimmed.isEmpty) return Seq.empty
      val toks = trimmed.split(ws, -1)
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = scala.collection.mutable.LinkedHashSet[Seq[Byte]]()
      (0 to toks.length - n).foreach { w =>
        md.reset()
        out += md.digest(
          toks.slice(w, w + n).mkString(" ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toSeq
      }
      out.toSeq
    }
    val raw = Seq(
      "lone\uD83Dhigh inside token one two three",
      "lone\uDE02low inside token one two three",
      "tail ends with lone \uD83D",
      "swapped \uDE02\uD83D pair one two three",
      "paired 😂 emoji control case one two")
    for (t <- raw; n <- Seq(2, 3)) {
      val fast = graft.functions.TextHash.windowKeys(t, n).toSeq.map(_.toSeq)
      assert(fast == ref(t, n), s"lone-surrogate windowKeys fork n=$n text=$t")
    }
  }

  test("apply (single keep-kernel filter) keeps the exact annotate keep-set") {
    import spark.implicits._
    // apply's compiled keep decision must match annotate's `keep` column
    // row-for-row — same kernel stats, same threshold arithmetic — on
    // both the edge corpus (incl. null text: dropped either way) and a
    // fuzz corpus, under default and tuned thresholds
    Seq(TextFilters.Rules(),
        TextFilters.Rules(minWords = 3, maxWords = 30, minMeanWordLen = 2.0,
          maxMeanWordLen = 8.0, maxSymbolWordRatio = 0.2,
          maxBulletLineRatio = 0.5, maxEllipsisLineRatio = 0.1,
          minAlphaWordRatio = 0.6, minStopwordHits = 1)).foreach { rules =>
      val texts = edgeTexts ++ fuzzTexts(300, seed = 0xa991L)
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val applied = TextFilters(df, "text", rules)
      assert(applied.columns.toSeq == Seq("doc_id", "text"),
        "apply must return the input columns unchanged")
      val fromApply = applied.select("doc_id").as[Long].collect().sorted
      val fromAnnotate = TextFilters.annotate(df, "text", rules)
        .where(col("keep")).select("doc_id").as[Long].collect().sorted
      assert(fromApply.toSeq == fromAnnotate.toSeq)
    }
  }

  test("apply over a derived text column evaluates the kernel once per row") {
    import spark.implicits._
    // the regression this spelling exists to prevent: filtering on
    // annotate's `keep` alias lets predicate-pushdown substitute the
    // stats UDF (and the caller's whole text expression) into the
    // condition once per rule — seven kernel calls per row. The bare
    // single-UDF filter must survive optimization as exactly one call.
    // a file-backed frame: a LocalRelation lets the optimizer evaluate
    // the whole filter at plan time (ConvertToLocalRelation), leaving no
    // Filter to inspect — a parquet scan keeps it physical
    val dir = java.nio.file.Files.createTempDirectory("gopher_plan").toString
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "raw")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .withColumn("text", concat_ws(" ", lit("the be to of and that have"),
        col("raw"), lit("with plenty of ordinary words here")))
    val plan = TextFilters(df, "text", TextFilters.Rules(minWords = 3))
      .queryExecution.executedPlan
    // count structurally (the plan STRING echoes the one filter again in
    // the FileScan's DataFilters): every Filter node's condition must
    // carry exactly one ScalaUDF total
    val udfCalls = plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec =>
        f.condition.collect {
          case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
        }.size
    }.sum
    assert(udfCalls == 1, s"expected exactly 1 kernel call across Filter " +
      s"conditions, got $udfCalls:\n$plan")
  }
}
