package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gopher-style document quality filtering (published heuristics from the
  * Gopher/MassiveText paper, arXiv:2112.11446 Appendix A — reimplemented
  * from the paper's prose, not any codebase): per-rule booleans, an
  * overall keep flag, and a human-readable reasons string.
  *
  * Pure column expressions — fully codegen'd, scan-speed over 100 TB, and
  * exactly replicable in any SQL engine for auditing (every rule is
  * length/regexp/list arithmetic; the whitespace and punctuation classes
  * are the explicit cross-engine sets from [[TextAnalysis]]).
  */
object TextFilters {

  /** Thresholds, defaulting to the published MassiveText values. */
  final case class Rules(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolWordRatio: Double = 0.1,
      maxBulletLineRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2)

  /** The paper's required-stopword set ("the, be, to, of, and, that,
    * have, with"). */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(text: Column): Column =
    filter(split(text, TextAnalysis.FingerprintWsJava), w => length(w) > 0)

  /** Per-rule pass columns for `text`. Keys are stable rule names. */
  def ruleChecks(text: Column, rules: Rules = Rules()): Seq[(String, Column)] = {
    val ws = words(text)
    val nWords = size(ws)
    val meanLen = when(nWords === 0, 0.0)
      .otherwise(aggregate(ws, lit(0L), (a, w) => a + length(w)).cast(DoubleType) / nWords)
    // symbols: '#' plus ASCII '...' plus U+2026, per word
    val nSymbols = (length(text) - length(regexp_replace(text, "#", ""))) +
      size(regexp_extract_all(text, lit("\\.\\.\\.|…"), lit(0)))
    val ls = TextAnalysis.lines(text)
    val nLines = size(ls)
    val bulletRatio = when(nLines === 0, 0.0).otherwise(
      size(filter(ls, l => l.rlike("^[-*•‣◦]"))).cast(DoubleType) / nLines)
    val ellipsisRatio = when(nLines === 0, 0.0).otherwise(
      size(filter(ls, l => l.rlike("(\\.\\.\\.|…)$"))).cast(DoubleType) / nLines)
    val alphaRatio = when(nWords === 0, 0.0).otherwise(
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast(DoubleType) / nWords)
    val toks = TextAnalysis.tokens(text)
    val stopHits = size(filter(
      array(RequiredStopwords.map(lit): _*), s => array_contains(toks, s)))
    Seq(
      "word_count"     -> nWords.between(rules.minWords, rules.maxWords),
      "mean_word_len"  -> meanLen.between(rules.minMeanWordLen, rules.maxMeanWordLen),
      "symbol_ratio"   -> (when(nWords === 0, 0.0)
        .otherwise(nSymbols.cast(DoubleType) / nWords) <= rules.maxSymbolWordRatio),
      "bullet_lines"   -> (bulletRatio <= rules.maxBulletLineRatio),
      "ellipsis_lines" -> (ellipsisRatio <= rules.maxEllipsisLineRatio),
      "alpha_words"    -> (alphaRatio >= rules.minAlphaWordRatio),
      "stopword_hits"  -> (stopHits >= rules.minStopwordHits))
  }

  /** The same per-rule booleans derived from the compiled
    * [[graft.functions.TextHash.gopherStats]] kernel's integer stats:
    * the ratio divisions and threshold comparisons are the IDENTICAL
    * Column expressions as [[ruleChecks]] (int/long casts, one double
    * division each), so with identical stats the booleans are
    * bit-for-bit the expression spelling's — GopherParitySpec fuzzes
    * that equality and the x25 oracle replays every rule in SQL.
    */
  private def ruleChecksStats(st: Column, rules: Rules): Seq[(String, Column)] = {
    val nWords = st.getField("nWords")
    val nLines = st.getField("nLines")
    val meanLen = when(nWords === 0, 0.0)
      .otherwise(st.getField("sumWordLen").cast(DoubleType) / nWords)
    val bulletRatio = when(nLines === 0, 0.0)
      .otherwise(st.getField("nBulletLines").cast(DoubleType) / nLines)
    val ellipsisRatio = when(nLines === 0, 0.0)
      .otherwise(st.getField("nEllipsisLines").cast(DoubleType) / nLines)
    val alphaRatio = when(nWords === 0, 0.0)
      .otherwise(st.getField("nAlphaWords").cast(DoubleType) / nWords)
    Seq(
      "word_count"     -> nWords.between(rules.minWords, rules.maxWords),
      "mean_word_len"  -> meanLen.between(rules.minMeanWordLen, rules.maxMeanWordLen),
      "symbol_ratio"   -> (when(nWords === 0, 0.0)
        .otherwise(st.getField("nSymbols").cast(DoubleType) / nWords) <= rules.maxSymbolWordRatio),
      "bullet_lines"   -> (bulletRatio <= rules.maxBulletLineRatio),
      "ellipsis_lines" -> (ellipsisRatio <= rules.maxEllipsisLineRatio),
      "alpha_words"    -> (alphaRatio >= rules.minAlphaWordRatio),
      // null text: the expression spelling yields FALSE here, not NULL —
      // `filter(stopwords, s => array_contains(null, s))` drops every
      // element on a null predicate, so size()=0 and 0 >= min is false.
      // coalesce replicates that (the one rule whose null-text value
      // differs from the rest; GopherParitySpec pins it)
      "stopword_hits"  -> (coalesce(st.getField("stopHits"), lit(0)) >=
        rules.minStopwordHits))
  }

  /** Annotate `df` with one boolean per rule (`ok_<rule>`), an overall
    * `keep`, and a comma-joined `drop_reasons` string (empty when kept).
    *
    * Evaluation rides the compiled kernel (one scan per document)
    * instead of the [[ruleChecks]] expression trees — seven interpreted
    * higher-order functions per document made the quality stage the
    * most expensive step of the b17 pipeline bench (~75 µs/doc) for
    * booleans the kernel reproduces bit-for-bit (see
    * [[ruleChecksStats]]). [[ruleChecks]] remains the cross-engine
    * reference spelling (and the fuzz baseline).
    */
  def annotate(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame = {
    require(!df.columns.contains("__gstats"),
      "TextFilters.annotate: column name __gstats is reserved")
    val withStats = df.withColumn("__gstats",
      graft.functions.TextHash.gopherStatsUdf(col(textCol)))
    val checks = ruleChecksStats(col("__gstats"), rules)
    val withFlags = checks.foldLeft(withStats) { case (d, (name, ok)) =>
      d.withColumn(s"ok_$name", ok)
    }
    val keep = checks.map { case (n, _) => col(s"ok_$n") }.reduce(_ && _)
    val reasons = concat_ws(",",
      checks.map { case (n, _) => when(!col(s"ok_$n"), n) }: _*)
    withFlags.withColumn("keep", keep).withColumn("drop_reasons", reasons)
      .drop("__gstats")
  }

  /** The keep decision of [[ruleChecksStats]] as one compiled evaluation
    * over the kernel's integer stats — the IDENTICAL arithmetic (same
    * int→double conversions, one IEEE division per ratio, same comparison
    * spellings), so the boolean is bit-for-bit the expression form's.
    * Null text: the expression spelling makes every rule NULL except the
    * coalesced stopword rule (false), and `NULL AND … AND false` is
    * false — a filter drops the row either way, which `t != null` at the
    * call site replicates. GopherParitySpec fuzzes the equivalence.
    */
  private def keepStats(st: graft.functions.TextHash.GopherStats,
      rules: Rules): Boolean = {
    val nWords = st.nWords
    val nLines = st.nLines
    val meanLen = if (nWords == 0) 0.0 else st.sumWordLen.toDouble / nWords
    val symbolRatio = if (nWords == 0) 0.0 else st.nSymbols.toDouble / nWords
    val bulletRatio = if (nLines == 0) 0.0 else st.nBulletLines.toDouble / nLines
    val ellipsisRatio =
      if (nLines == 0) 0.0 else st.nEllipsisLines.toDouble / nLines
    val alphaRatio = if (nWords == 0) 0.0 else st.nAlphaWords.toDouble / nWords
    nWords >= rules.minWords && nWords <= rules.maxWords &&
      meanLen >= rules.minMeanWordLen && meanLen <= rules.maxMeanWordLen &&
      symbolRatio <= rules.maxSymbolWordRatio &&
      bulletRatio <= rules.maxBulletLineRatio &&
      ellipsisRatio <= rules.maxEllipsisLineRatio &&
      alphaRatio >= rules.minAlphaWordRatio &&
      st.stopHits >= rules.minStopwordHits
  }

  /** Filter to kept documents only — the pipeline form.
    *
    * Deliberately ONE scalar kernel call in a bare Filter rather than
    * `annotate(...).where(col("keep"))`: pushing a filter through a
    * projection substitutes the projection's aliases into the condition
    * with no cost guard, so the `keep` spelling re-inlines the stats
    * UDF — and the caller's entire `textCol` expression — once per rule
    * (seven kernel calls and seven text evaluations per row, measured
    * ~28 µs/doc as stage 2 of the b17 pipeline bench over an
    * unmaterialized flatten chain; the giant duplicated projection also
    * blew the 64 KB codegen method limit into interpreted fallback).
    * The single-call form is one kernel evaluation per row and keeps
    * surrounding predicates free to move — nothing here is marked
    * non-deterministic, so Catalyst loses no other freedom.
    */
  def apply(df: DataFrame, textCol: String, rules: Rules = Rules()): DataFrame = {
    val keepUdf = udf((t: String) =>
      t != null && keepStats(graft.functions.TextHash.gopherStats(t), rules))
    df.where(keepUdf(col(textCol)))
  }

  /** C4-STYLE LINE-level scrub (line heuristics in the spirit of the
    * published C4 recipe, re-expressed from the paper's prose — not any
    * codebase, and with deliberately different defaults): keep only
    * lines that end in terminal punctuation (`. ! ? "`), carry at least
    * `minLineWords` whitespace words, and contain none of the `banned`
    * substrings (case-insensitive); survivors rejoin with newlines.
    * Fidelity notes: C4's line floor is 5 words (`minLineWords = 5`
    * reproduces it; the default here is 3), and C4 applies "lorem
    * ipsum" as a page-level drop while this stage bans it per line —
    * dials, not the published constants. The document-level rules above
    * keep or drop whole pages — this scrubs INSIDE a page, the other
    * half of the published pipeline.
    *
    * Pure column expressions — scan-speed over 100 TB and exactly
    * replicable in a SQL engine: the word split uses the explicit
    * whitespace class ([[TextAnalysis.TokenWsJava]]), the punctuation
    * test is a 4-char regex, and the ban is a substring `contains` on the
    * lowercased trimmed line.
    */
  def scrubLines(text: Column, minLineWords: Int = 3,
      banned: Seq[String] = Seq("lorem ipsum", "javascript")): Column = {
    val keepLine = (x: Column) => {
      val t = trim(x)
      val nWords = size(filter(split(t, TextAnalysis.TokenWsJava),
        w => length(w) > 0))
      val notBanned =
        if (banned.isEmpty) lit(true)
        else banned.map(b => !contains(lower(t), lit(b))).reduce(_ && _)
      t.rlike("""[.!?"]$""") && nWords >= minLineWords && notBanned
    }
    array_join(filter(split(text, "\n"), keepLine), "\n")
  }
}
