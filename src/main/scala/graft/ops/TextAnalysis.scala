package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting.
  *
  * All pure column expressions (`org.apache.spark.sql.functions`) — fully
  * codegen'd, no UDFs, so they run at scan speed over 100 TB of documents
  * and push down through Catalyst like any built-in.
  */
object TextAnalysis {

  /** The explicit whitespace character set (class contents, no brackets):
    * ASCII whitespace incl. vertical tab U+000B, NEL, and the Unicode
    * space separators. Spelled out so every engine agrees: a bare `\s`
    * means different sets in java.util.regex (includes U+000B) vs
    * RE2/DuckDB (does not), and both miss Unicode spaces — real-world
    * text with an NBSP would tokenize/fingerprint differently per engine.
    * `WsCharsRe2` is the same set in RE2 escape syntax for oracle/DuckDB.
    */
  val WsCharsJava: String =
    " \\t\\n\\u000B\\f\\r\\u0085\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000"
  val WsCharsRe2: String =
    " \\t\\n\\x{000B}\\f\\r\\x{0085}\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}"

  /** Whitespace-run pattern built from [[WsCharsJava]] — used for both
    * fingerprint normalization and whitespace tokenization so the token
    * boundary definition is engine-portable. [[TokenWsRe2]] is the RE2
    * spelling for DuckDB oracles.
    */
  val FingerprintWsJava: String = s"[$WsCharsJava]+"
  val FingerprintWsRe2: String = s"[$WsCharsRe2]+"
  val TokenWsJava: String = FingerprintWsJava
  val TokenWsRe2: String = FingerprintWsRe2

  /** Whitespace token count. Splits on [[TokenWsJava]] — the explicit
    * whitespace class, not `\s` — so Spark and RE2-based oracle engines
    * tokenize identically (java.util.regex counts U+000B as `\s`, RE2
    * does not; see [[FingerprintWsJava]]).
    */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0)
      .otherwise(size(split(trim(text), TokenWsJava)))

  /** BPE-ish subword-ish token count: words and individual punctuation
    * marks counted separately (a cheap proxy for tokenizer cost — the
    * standard pretraining heuristic when the real tokenizer is too slow
    * for a first pass). The whitespace set inside the negated class is
    * spelled explicitly for the same cross-engine reason as [[tokenCountWs]].
    */
  def tokenCountRegex(text: Column): Column =
    size(regexp_extract_all(text,
      lit(s"[A-Za-z0-9_]+|[^A-Za-z0-9_$WsCharsJava]"), lit(0)))

  /** Tokens as an array column (lowercased words). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Fraction of repeated `n`-grams over whitespace tokens — the Gopher
    * repetition signal (published heuristic: heavily self-repeating
    * documents are low-quality): 1 - distinct_ngrams / total_ngrams,
    * 0.0 for documents with fewer than `n` tokens. Exact small-integer
    * division in both engines, so the double is oracle-reproducible.
    * Pure column expressions — scan-speed like every other text metric.
    */
  def dupNgramRatio(text: Column, n: Int = 3): Column = {
    val toks = split(trim(text), TokenWsJava)
    val total = size(toks) - (n - 1)
    when(length(trim(text)) === 0 || total <= 0, 0.0).otherwise(
      lit(1.0) -
        size(array_distinct(transform(sequence(lit(1), total),
          i => array_join(slice(toks, i, lit(n)), " ")))).cast(DoubleType) /
        total)
  }

  /** Per-group vocabulary statistics over whitespace tokens
    * ([[TokenWsJava]], the engine-portable boundary): distinct-token
    * count (vocabulary size), total token count, and their quotient
    * (type-token ratio — the classic lexical-diversity signal:
    * near-0 means templated/boilerplate text, near-1 means no token
    * reuse). Whitespace-only documents contribute nothing.
    *
    * Exact path (`approx = false`): one codegen'd explode + a single
    * two-phase aggregate — Catalyst plans `countDistinct` alongside
    * `count` as one Expand + partial/final pair, so tokens shuffle
    * once on (group, token). With `approx = true`,
    * `approx_count_distinct` (HyperLogLog++, `rsd` relative standard
    * error) replaces the exact distinct: a plain partial aggregate
    * whose shuffle moves only fixed-width HLL sketches per group —
    * the path for corpus-scale vocabularies where shuffling every
    * distinct token string is the bottleneck. The approx path is
    * spec-verified against the exact one at `rsd`-consistent
    * tolerance; the exact path is the oracle-checked one (HLL
    * estimates are engine-specific).
    */
  def vocabStats(df: DataFrame, textCol: String, groupCol: String,
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(!df.columns.contains("__tok"), "column name __tok is reserved")
    val toks = df.where(length(trim(col(textCol))) > 0)
      .select(col(groupCol),
        explode(split(trim(col(textCol)), TokenWsJava)).as("__tok"))
    val distinctAgg =
      if (approx) approx_count_distinct(col("__tok"), rsd)
      else countDistinct(col("__tok"))
    toks.groupBy(col(groupCol))
      .agg(distinctAgg.as("vocab_size"), count(lit(1)).as("n_tokens"))
      .withColumn("type_token_ratio",
        col("vocab_size").cast(DoubleType) / col("n_tokens"))
  }

  /** Split documents into overlapping fixed-size token windows — the
    * standard pre-tokenization chunking step of a training pipeline
    * (long documents become `maxTokens`-token chunks that overlap by
    * `overlap` tokens so no span is lost at a boundary).
    *
    * Output: one row per (doc, chunk) with `chunk_id` (0-based),
    * `chunk_text` (the window re-joined with single spaces) and
    * `n_tokens`. Documents with no tokens produce no chunks; documents
    * at or under `maxTokens` produce exactly one. Chunk count is
    * `ceil((n - maxTokens) / stride) + 1` with `stride = maxTokens -
    * overlap`, so the last window always starts within the document.
    *
    * Pure column expressions (split → sequence → explode → slice) — the
    * whole operator is one codegen'd projection + generate, no shuffle
    * at all: chunking 100 TB is a scan.
    */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && maxTokens > overlap,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    require(!df.columns.contains("__toks"), "column name __toks is reserved")
    val stride = maxTokens - overlap
    val toks = split(trim(col(textCol)), TokenWsJava)
    val n = size(col("__toks"))
    val nChunks = greatest(lit(0),
      ceil((n - lit(maxTokens)).cast(DoubleType) / lit(stride)).cast(IntegerType)) + 1
    df.where(length(trim(col(textCol))) > 0)
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        size(slice(col("__toks"), col("chunk_id") * stride + 1, lit(maxTokens)))
          .as("n_tokens"))
  }

  /** Non-punctuation class (alphanumerics + the explicit whitespace set of
    * [[FingerprintWsJava]]) — same cross-engine rationale: a bare `\s`
    * here would count U+000B as whitespace in Spark but as punctuation in
    * an RE2 oracle, flipping quality gates near the threshold.
    * [[PunctExcludeRe2]] is the RE2 spelling for DuckDB oracles.
    */
  val PunctExcludeJava: String = s"[A-Za-z0-9$WsCharsJava]"
  val PunctExcludeRe2: String = s"[A-Za-z0-9$WsCharsRe2]"

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, PunctExcludeJava, "")).cast(DoubleType) / length(text))

  /** Ratio of whitespace-separated tokens that are in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = array(stopwords.map(lit): _*)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => array_contains(stops, t))).cast(DoubleType) / size(toks))
  }

  /** Mean word length over whitespace tokens. */
  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType) / size(toks))
  }

  /** Composite quality score in [0,1] — the usual cheap pretraining filter:
    * penalize extreme lengths, high punctuation, low stopword incidence.
    * Thresholds follow the published C4/Gopher-style heuristics (public
    * papers), not any particular implementation.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenOk   = (length(text) >= 50 && length(text) <= 100000).cast(DoubleType)
    val punctOk = (punctRatio(text) < 0.2).cast(DoubleType)
    val stopOk  = (stopwordRatio(text, stopwords) > 0.01).cast(DoubleType)
    val wordOk  = (meanWordLen(text).between(2.0, 12.0)).cast(DoubleType)
    (lenOk + punctOk + stopOk + wordOk) / 4.0
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercased text.
    * Stable across engines (md5 is md5 everywhere) — the exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), FingerprintWsJava, " ").cast(BinaryType))

  /** 16-byte binary form of [[fingerprint]] — the same md5, `unhex`ed.
    * Used as the internal exact-dedup shuffle key: half the bytes of the
    * 32-char hex string, which at 100 TB is roughly half the dedup
    * shuffle. The hex form stays for user-facing outputs (fingerprint
    * columns, dup-group reports), where readability and SQL-engine parity
    * matter more than key width.
    */
  def fingerprintBin(text: Column): Column = unhex(fingerprint(text))

  /** Non-empty trimmed lines of a document. */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Order-preserving WITHIN-document line dedup — the scrub form of the
    * [[dupLineRatio]] signal (C4-family cleanup: repeated lines inside a
    * page are boilerplate; keep the first occurrence, preserve order).
    * Exact raw-line match — no trim/case normalization — so any SQL
    * engine replays it as a first-index comparison over the split lines.
    * The corpus-wide analog (shared boilerplate ACROSS documents) is
    * [[graft.ops.Dedup.dedupLines]]; this one is a pure column
    * expression, no joins — scan-speed, O(lines²) comparisons per row
    * bounded by the document's own line count (a per-row cost, not a
    * per-pair path).
    */
  def dedupDocLines(text: Column): Column = {
    val l = split(text, "\n")
    array_join(
      filter(l, (x, i) => !exists(slice(l, lit(1), i), e => e === x)),
      "\n")
  }

  /** Fraction of lines that repeat an earlier line — the Gopher-style
    * repetition signal (published heuristic: high duplicate-line fraction
    * marks boilerplate/spam). 0 for empty or all-unique documents.
    */
  def dupLineRatio(text: Column): Column = {
    val ls = lines(text)
    when(size(ls) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(ls)).cast(DoubleType) / size(ls))
  }

  /** Fraction of a document's token OCCURRENCES whose corpus-wide
    * frequency is below `minCount` — the cheap "is this mostly garbage /
    * OCR noise / random identifiers" filter: real prose is dominated by
    * common words, junk is dominated by near-unique tokens. Integer-exact
    * by construction (counts and a final division), so the oracle is
    * bit-identical — unlike a unigram log-prob score, where libm `log`
    * differs across engines in the last ulp.
    *
    * Output: (id, n_rare, rare_ratio) per input doc; token-less docs get
    * (0, 0.0). Two shuffles: the vocabulary count (map-side combined; the
    * token stream itself shuffles as (token, count) partials) and the
    * token→count join back (standard vocabulary-join shape). At 100 TB
    * the counts frame is vocabulary-sized — when the caller knows it
    * fits in executor memory (natural-language corpora: tens of
    * millions of (token, count) rows, a few GB), pass
    * `broadcastCounts = true` to make the fast path DELIBERATE: the
    * join back is then a broadcast-hash join and the second token-stream
    * shuffle disappears, instead of depending on AQE noticing the count
    * frame is small. Identifier-heavy corpora with unbounded
    * vocabularies keep the default shuffle join.
    */
  def rareTokenRatio(df: DataFrame, textCol: String, idCol: String,
      minCount: Long = 5, broadcastCounts: Boolean = false): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("__token"))
    val counts0 = tok.groupBy(col("__token")).agg(count(lit(1)).as("__cnt"))
    val counts = if (broadcastCounts) broadcast(counts0) else counts0
    val scored = tok.join(counts, Seq("__token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__cnt") < minCount, 1L).otherwise(0L)).as("__r"))
    df.select(col(idCol)).join(scored, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__r"), lit(0L)).as("n_rare"),
        coalesce(col("__r").cast(DoubleType) / col("__n"), lit(0.0)).as("rare_ratio"))
  }

  /** Corpus-level top-k vocabulary: token → document-stream frequency,
    * deterministically ordered (count desc, token asc). Partial map-side
    * aggregation then one shuffle of (token, count) pairs — the token
    * stream itself never shuffles; top-k folds per-partition
    * (TakeOrdered). The first pass of any vocabulary/stopword analysis.
    */
  def topTokens(df: DataFrame, textCol: String, k: Int = 100): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)

  /** N-gram language ID heuristic: score each candidate language by hits of
    * its most-frequent function words in the token stream; pick the argmax.
    * Pure column expressions (one pass, codegen'd); `und` when nothing hits.
    */
  def langId(text: Column, profiles: Map[String, Seq[String]] = LangProfiles): Column = {
    val toks = tokens(text)
    val scored = profiles.toSeq.sortBy(_._1).map { case (langName, words) =>
      val ws = array(words.map(lit): _*)
      struct(size(filter(toks, t => array_contains(ws, t))).as("hits"), lit(langName).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling-hash shingle fingerprints: 64-bit hash per `n`-token shingle.
    * The building block for MinHash / n-gram Jaccard dedup. Delegates to
    * the compiled kernel so values are consistent with every Dedup stage
    * (an expression-tree variant here once produced disjoint hash spaces).
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    graft.functions.TextHash.shingleHashesUdf(n)(text)

  /** Exact per-group percentiles of a numeric column (corpus length
    * audits: token-count quartiles per language/source). Uses Spark's
    * exact `percentile` aggregate — ONE shuffle with map-side partial
    * aggregation; the per-group value multiset is what aggregates, never
    * the documents. For quartile-style percentages over integer values
    * the linear interpolation is exact binary arithmetic, so results are
    * engine-identical (DuckDB `quantile_cont` computes the same number).
    * At 100 TB prefer grouping columns with bounded cardinality (lang,
    * source) — each group's values collect into one aggregation buffer;
    * for percentiles over ungrouped billions use approx_percentile.
    */
  def groupPercentiles(df: DataFrame, groupCol: String, valueCol: String,
      percentages: Seq[Double] = Seq(0.25, 0.5, 0.75)): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      percentages.map(p => percentile(col(valueCol), lit(p))
        .as(s"p${(p * 100).round}"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Approximate per-group percentiles — the 100 TB scale path for
    * [[groupPercentiles]]. The exact form's `percentile` aggregate
    * buffers EVERY group value in executor memory, so one billion-row
    * group OOMs the executor no matter how the data is partitioned;
    * `percentile_approx` keeps a bounded, MERGEABLE sketch of ~`accuracy`
    * entries per group (map-side partial aggregation works, rank error
    * ≤ n/accuracy), so memory per group is constant in n. Same output
    * shape as [[groupPercentiles]] (n, p25, p50, ...), but values are
    * order statistics drawn from the data, not interpolated — when
    * n ≤ accuracy the sketch retains every value and the result is the
    * exact discrete percentile (pinned by the x48 oracle and OpsSpec).
    */
  def groupPercentilesApprox(df: DataFrame, groupCol: String, valueCol: String,
      percentages: Seq[Double] = Seq(0.25, 0.5, 0.75),
      accuracy: Int = 10000): DataFrame = {
    val aggs = count(lit(1)).as("n") +:
      percentages.map(p => percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"p${(p * 100).round}"))
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Character-class mix of a document — the charset-level QC signal
    * (script detection, mojibake/binary-spill flags, "mostly digits"
    * boilerplate) that language filters threshold before any
    * tokenization: the total plus counts of ASCII letters, ASCII
    * digits, whitespace (the explicit [[WsCharsJava]] set,
    * engine-portable), and non-ASCII code points. Classes OVERLAP by
    * design (an NBSP is both whitespace and non-ASCII): each count
    * answers its own filter question; they are not a partition.
    * Counts are integer-exact — each class is `length(text) minus
    * length(text with the class deleted)` over explicit character
    * classes, so any SQL engine replays them bit-identically (fractions
    * are one division away and engine-dependent; keep the counts).
    * Pure column expressions: codegen'd, scan-speed, pushdown-friendly.
    * Both `length()` and character classes operate on CODE POINTS in
    * Spark and RE2-based engines alike, so the counts agree beyond the
    * BMP too.
    */
  def charClassCounts(text: Column): Column = {
    def without(cls: String): Column = length(regexp_replace(text, cls, ""))
    val n = length(text)
    struct(
      n.as("n_chars"),
      (n - without("[a-zA-Z]")).as("n_alpha"),
      (n - without("[0-9]")).as("n_digit"),
      (n - without(s"[$WsCharsJava]")).as("n_ws"),
      (n - without("[^\\x00-\\x7F]")).as("n_non_ascii"))
  }

  // ============ Bigram language-model scoring (CCNet-style) ============

  /** Train the corpus bigram language model behind [[lmScore]] — the
    * published LM-filtering recipe (CCNet / Wenzek et al. 2020 score
    * corpora with an n-gram LM; this is the dependency-free in-corpus
    * form). The top `vocabSize` tokens by (count desc, token asc) keep
    * themselves; every other token maps to `<unk>` (impossible as a real
    * token: [[tokens]] emits only [a-z0-9]+). Returns:
    *
    *   - `uni`: (token, n) unigram counts over the MAPPED stream —
    *     vocab rows carry their corpus counts, plus one `<unk>` row
    *     carrying everything else (always present, 0 when the vocab
    *     covers the corpus);
    *   - `bi`: (w1, w2, n) mapped-bigram counts, capped to the top
    *     `maxBigrams` by (n desc, w1 asc, w2 asc).
    *
    * Both frames are bounded by the caps, not the corpus — persist them
    * once and score any number of batches. Scale shape: one shuffle-free
    * scan (total token count), one (token, count) aggregation, and one
    * bigram-pair aggregation — the token stream itself shuffles only as
    * map-side-combined count partials; vocabulary mapping runs inside a
    * compiled per-doc kernel over the broadcast vocab set (bounded by
    * `vocabSize`), so the exploded pair stream is one short string per
    * bigram and never shuffles before its partial aggregation. Every
    * selection order is total (counts then token text, ASCII by
    * construction), so the model — and everything scored with it — is
    * deterministic and oracle-replayable.
    *
    * The three scans re-evaluate `df`'s lineage each time — persist or
    * checkpoint an input that is expensive to recompute before calling
    * (the LmProbe measurement: on a checkpointed 600k corpus the build
    * is ~2 s; through an unsplittable re-synthesized input the same
    * build reads as ~10 s of corpus decode).
    */
  def bigramModel(df: DataFrame, textCol: String,
      vocabSize: Int = 20000, maxBigrams: Int = 200000): (DataFrame, DataFrame) = {
    require(vocabSize >= 1, s"need vocabSize >= 1, got $vocabSize")
    require(maxBigrams >= 1, s"need maxBigrams >= 1, got $maxBigrams")
    val toks = df.select(tokens(col(textCol)).as("__toks"))
    // ONE corpus tokenize/explode pass builds the full (token, n)
    // histogram; vocab (sort-limit) and the corpus token total (sum of
    // all counts — identical to summing per-doc sizes, since explode
    // emits one row per token occurrence) both derive from its
    // materialized blocks. Pre-r21 the total was a SECOND full corpus
    // tokenize pass. NOTE the histogram is DISTINCT-TOKEN-sized — far
    // under corpus-sized but, unlike the vocabSize-capped `vocab`
    // checkpoint, unbounded (it grows with the corpus, Heaps' law) — so
    // it is released as soon as its two consumers below have run.
    val counts = toks.select(explode(col("__toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val vocab = counts
      .orderBy(col("n").desc, col("token")).limit(vocabSize)
      .localCheckpoint(true) // vocab-sized; reused by three consumers below
    val totalToks = counts.agg(coalesce(sum(col("n")), lit(0L)))
      .first().getLong(0)
    // vocab (its own checkpoint) and totalToks are the histogram's only
    // consumers — drop its blocks now instead of holding a
    // distinct-token-sized persist until GC (r21 ADVICE)
    graft.util.Checkpoints.release(counts)
    val vocabToks = vocab.agg(coalesce(sum(col("n")), lit(0L))).first().getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    val uni = vocab.unionAll(
      Seq(("<unk>", totalToks - vocabToks)).toDF("token", "n"))
    // bigram counting through a compiled per-doc kernel over the
    // broadcast vocab set (bounded by vocabSize): each doc emits its
    // mapped "w1 w2" pair strings in one pass — no struct explode, no
    // per-pair join probes. A single space joins the pair, and since
    // space sorts below every token character ([a-z0-9]), the
    // (n desc, pair asc) selection below is EXACTLY the documented
    // (n desc, w1 asc, w2 asc) order; the pair splits back apart after
    // the cap.
    val vocabSet: Set[String] =
      vocab.select("token").collect().map(_.getString(0)).toSet
    val bcVocab = spark.sparkContext.broadcast(vocabSet)
    val pairsOf = udf { (ts: Seq[String]) =>
      if (ts == null || ts.lengthCompare(2) < 0) Array.empty[String]
      else {
        val vs = bcVocab.value
        val raw = ts.toArray
        val m = new Array[String](raw.length)
        var i = 0
        while (i < raw.length) {
          m(i) = if (vs.contains(raw(i))) raw(i) else "<unk>"
          i += 1
        }
        val out = new Array[String](raw.length - 1)
        i = 0
        while (i < raw.length - 1) {
          out(i) = m(i) + " " + m(i + 1)
          i += 1
        }
        out
      }
    }
    val bi = toks
      .select(explode(pairsOf(col("__toks"))).as("p"))
      .groupBy("p").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("p")).limit(maxBigrams)
      .select(element_at(split(col("p"), " "), 1).as("w1"),
        element_at(split(col("p"), " "), 2).as("w2"),
        col("n"))
    (uni, bi)
  }

  /** Score documents against a [[bigramModel]]: per doc,
    * (n_tokens, n_oov, n_known_bigrams, cross_entropy) where the
    * integer evidence is exact (and oracle-checkable in any SQL engine)
    * and cross_entropy is the add-alpha bigram cross-entropy in BITS per
    * transition — the LM quality signal a perplexity filter thresholds
    * (low = fluent in-domain text, high = junk; perplexity = 2^H):
    *
    *   p(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha × V)
    *
    * over the vocab-mapped token stream, V = |uni| (vocab + `<unk>`),
    * c from the model frames, missing counts 0. Docs with < 2 tokens
    * score H = 0 with zero counts. This is the practical scoring
    * shortcut (unigram counts as the transition denominator, additive
    * smoothing), a filter signal — not a normalized LM.
    *
    * The model frames materialize on the driver and broadcast —
    * bounded by [[bigramModel]]'s caps, re-CHECKED here against
    * `maxModelRows` so an uncapped frame fails actionably instead of
    * OOMing the driver (the collectQueryBatch discipline). Scoring
    * itself is one corpus scan through a compiled per-row kernel
    * (per-token map lookups; the expression form would interpret the
    * lambda per element), tokenized by the SAME [[tokens]] expression
    * every other text operator uses. Summation is left-to-right over
    * the doc's transitions — fixed FP order, deterministic replays.
    */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
      uni: DataFrame, bi: DataFrame, alpha: Double = 0.1,
      maxModelRows: Int = 2000000): DataFrame = {
    require(alpha > 0, s"need alpha > 0, got $alpha")
    def bounded(m: DataFrame, what: String): Array[org.apache.spark.sql.Row] = {
      val n = m.count()
      if (n > maxModelRows) throw new IllegalArgumentException(
        s"lmScore: $what model frame has $n rows, exceeding maxModelRows = " +
          s"$maxModelRows. The model broadcasts to every executor; rebuild it " +
          "with smaller bigramModel caps or raise maxModelRows deliberately.")
      m.collect()
    }
    val uniMap: Map[String, Long] =
      bounded(uni, "unigram").map(r => r.getString(0) -> r.getLong(1)).toMap
    val biMap: Map[String, Long] =
      bounded(bi, "bigram").map(r =>
        (r.getString(0) + " " + r.getString(1)) -> r.getLong(2)).toMap
    val v = uniMap.size.toDouble
    val vocabSet: Set[String] = uniMap.keySet - "<unk>"
    val spark = df.sparkSession
    val bcUni = spark.sparkContext.broadcast(uniMap)
    val bcBi = spark.sparkContext.broadcast(biMap)
    val bcVocab = spark.sparkContext.broadcast(vocabSet)
    val a = alpha
    val score = udf { (ts: Seq[String]) =>
      val vocab = bcVocab.value
      val u = bcUni.value
      val b = bcBi.value
      val raw = if (ts == null) Array.empty[String] else ts.toArray
      val n = raw.length
      val m = new Array[String](n)
      var nOov = 0L
      var i = 0
      while (i < n) {
        if (vocab.contains(raw(i))) m(i) = raw(i)
        else { m(i) = "<unk>"; nOov += 1 }
        i += 1
      }
      var known = 0L
      var lp = 0.0
      i = 0
      while (i < n - 1) {
        val c12 = b.getOrElse(m(i) + " " + m(i + 1), 0L)
        if (c12 > 0) known += 1
        val c1 = u.getOrElse(m(i), 0L)
        lp += math.log((c12 + a) / (c1 + a * v))
        i += 1
      }
      val h = if (n >= 2) -lp / ((n - 1) * math.log(2.0)) else 0.0
      (n.toLong, nOov, known, h)
    }
    require(!df.columns.contains("__lmsc"), "column name __lmsc is reserved")
    // the four output names must be absent too: withColumn would
    // silently OVERWRITE a pre-existing column of the same name (a
    // realistic collision — chunkDocuments emits n_tokens), destroying
    // input data with no error
    locally {
      val clash = Seq("n_tokens", "n_oov", "n_known_bigrams", "cross_entropy")
        .filter(df.columns.contains)
      require(clash.isEmpty,
        s"lmScore: input already has column(s) ${clash.mkString(", ")} — " +
          "lmScore appends these four score columns and would overwrite " +
          "them; rename or drop the input columns first")
    }
    // input columns pass through (filter on the scores and continue with
    // the text in ONE stateless projection — also what lets the same
    // call run unchanged on a readStream frame; StreamingSpec pins it)
    df.withColumn("__lmsc", score(tokens(col(textCol))))
      .withColumn("n_tokens", col("__lmsc._1"))
      .withColumn("n_oov", col("__lmsc._2"))
      .withColumn("n_known_bigrams", col("__lmsc._3"))
      .withColumn("cross_entropy", col("__lmsc._4"))
      .drop("__lmsc")
  }

  // ================= Relevance scoring (TF-IDF / BM25) =================

  /** Per-document top-`k` terms by TF-IDF over the [[tokens]] stream —
    * the standard keyword-extraction / relevance-feature pass (Spärck
    * Jones 1972). Output: one row per kept (doc, term) with `rank`
    * 1..k, the term's in-doc count `tf`, its document frequency
    * `df_docs`, and `score`.
    *
    * Two idf shapes, selected by `logIdf`:
    *   - `true` (default, the classic): score = tf · ln(N / df) —
    *     involves libm `ln`, whose last ulp differs across engines, so
    *     this mode is pinned by TextOpsPropertySpec against naive
    *     reference math (the x60 precedent), not by a SQL oracle;
    *   - `false` (linear idf): score = (tf · N) / df computed as one
    *     exact long product (< 2^53) and ONE correctly-rounded double
    *     division — bit-identical in any IEEE engine, which is what
    *     lets the x78 oracle replay ranking AND score exactly. Rank
    *     order ties break by term text ascending either way.
    *
    * Scale shape: explode → (doc, term) count [one shuffle of
    * map-side-combined pairs] → per-term doc frequency [one shuffle of
    * (term, count)] → join back on term → per-doc top-k window [one
    * shuffle on doc id]. `broadcastCounts = true` broadcasts the
    * document-frequency frame (bounded by vocabulary size) and removes
    * the join shuffle — the [[rareTokenRatio]] dial, same trade-off.
    * The shuffle join stays the DEFAULT because the df frame is
    * vocabulary-sized (a web-scale corpus cannot broadcast its
    * vocabulary) and AQE's skew-split serves the hot stopword terms;
    * flip the dial only for known-bounded vocabularies, where it is
    * also immune to the AQE replan jitter measured in SCALE.md
    * §b18-tfidf (stable ~2.1 s vs a 2.1–6.3 s band at 600k docs).
    * Documents with no tokens produce no rows.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
      k: Int = 10, logIdf: Boolean = true,
      broadcastCounts: Boolean = false): DataFrame = {
    require(k > 0, s"tfidfTopTerms: k must be positive, got $k")
    val reserved = Seq("term", "tf", "df_docs", "score", "rank")
    require(!reserved.contains(idCol),
      s"tfidfTopTerms: id column '$idCol' clashes with an output column")
    // one bounded driver action: the corpus document count N
    val nDocs = df.count()
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq0 = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val dfreq = if (broadcastCounts) broadcast(dfreq0) else dfreq0
    val score =
      if (logIdf) col("tf") * log(lit(nDocs.toDouble) / col("df_docs"))
      else (col("tf") * nDocs).cast(DoubleType) / col("df_docs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"),
        col("df_docs"), col("score"))
  }

  /** The engine-portable BM25 core: for each query `term`, every
    * document containing it, with the exact integer evidence (`tf`
    * in-doc count, `dl` document token length, `df_docs` document
    * frequency) and the saturated length-normalized term frequency
    *
    *   tf_norm = tf·(k1+1) / (tf + k1·(1 − b + b·(dl / avgdl)))
    *
    * (Robertson & Walker 1994). Every input to `tf_norm` is an exact
    * integer or an exact binary literal (the k1 = 1.5 / b = 0.75
    * defaults), `avgdl` is one exact-integer division, and the
    * expression is evaluated in this spelled order — each step is a
    * single correctly-rounded IEEE op, so the double is bit-identical
    * in any engine that mirrors the expression (the x79 oracle
    * replays score AND per-term ranking exactly; the libm-dependent
    * idf lives in [[bm25]], pinned by spec instead — the x60 split).
    *
    * Scale shape: the exploded token stream is filtered to the query
    * terms BEFORE any shuffle (an `isin` over a literal set — pushed
    * into the scan projection), so the per-term frame is tiny; doc
    * lengths aggregate per-doc from a codegen'd projection (no second
    * explode); the (term, df) frame is bounded by |terms| and
    * broadcast. One shuffle of (doc, term) count pairs, one of (doc,
    * length) pairs, one broadcast join.
    */
  def bm25Components(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25Components: terms must be non-empty")
    require(terms.size <= 256,
      s"bm25Components: ${terms.size} query terms — cap is 256 " +
        "(scores are per-term columns in bm25's fixed-order sum)")
    require(terms.distinct.size == terms.size,
      "bm25Components: duplicate query terms")
    val reserved = Seq("term", "tf", "dl", "df_docs", "tf_norm")
    require(!reserved.contains(idCol),
      s"bm25Components: id column '$idCol' clashes with an output column")
    // one bounded driver action: N docs and total token count → avgdl
    val g = df.agg(count(lit(1)), sum(size(tokens(col(textCol))))).head()
    val nDocs = g.getLong(0)
    val totalTokens = if (g.isNullAt(1)) 0L else g.getLong(1)
    require(nDocs > 0 && totalTokens > 0,
      "bm25Components: empty corpus (no documents or no tokens)")
    val avgdl = totalTokens.toDouble / nDocs // exact ints, one division
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term").isin(terms: _*))
    val tf = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dl = df.select(col(idCol), size(tokens(col(textCol))).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
    val tfd = col("tf").cast(DoubleType)
    val dld = col("dl").cast(DoubleType)
    // spelled to match the oracle SQL operation-for-operation
    val tfNorm = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * (dld / lit(avgdl))))
    tf.join(dl, Seq(idCol))
      .join(broadcast(dfreq), Seq("term"))
      .select(col("term"), col(idCol), col("tf"), col("dl"),
        col("df_docs"), tfNorm.as("tf_norm"))
  }

  /** Full BM25 ranked retrieval: top-`topK` documents for the query
    * `terms`, score = Σ_t idf(t) · tf_norm(t, doc) with the
    * always-positive idf = ln(1 + (N − df + 0.5) / (df + 0.5)).
    * Built on [[bm25Components]]; the per-doc sum is a FIXED-ORDER
    * addition chain (one `sum(when(term = t, …))` aggregate column per
    * query term — each aggregates at most ONE row per doc, so there is
    * no FP reassociation anywhere), making the score deterministic
    * run-to-run and plan-independent even though idf's libm `ln` keeps
    * it out of SQL-oracle scope (TextOpsPropertySpec pins it against
    * naive reference math). Ties rank by doc id ascending.
    */
  def bm25(df: DataFrame, textCol: String, idCol: String,
      terms: Seq[String], k1: Double = 1.5, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(topK > 0, s"bm25: topK must be positive, got $topK")
    val nDocs = df.count()
    val comp = bm25Components(df, textCol, idCol, terms, k1, b)
      .withColumn("__contrib",
        log(lit(1.0) + (lit(nDocs.toDouble) - col("df_docs") + lit(0.5)) /
          (col("df_docs") + lit(0.5))) * col("tf_norm"))
    // per-term columns are named by index, not term text — a term
    // containing '.' or '`' would make col() parse a field path
    val sorted = terms.sorted
    val perTerm = sorted.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("__contrib"))).as(s"__c_$i") }
    val score = sorted.indices.map(i => coalesce(col(s"__c_$i"), lit(0.0)))
      .reduce(_ + _)
    comp.groupBy(col(idCol)).agg(perTerm.head, perTerm.tail: _*)
      .select(col(idCol), score.as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("score"))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "at", "by", "from", "this", "be", "are")

  /** Tiny function-word profiles for the lang-ID heuristic. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "para", "con", "por", "como"))
}
