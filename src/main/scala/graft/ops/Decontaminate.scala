package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark decontamination: flag training documents that share any
  * `n`-token gram with a benchmark/eval set — the published GPT-3/PaLM
  * method (13-gram overlap) reimplemented Spark-first.
  *
  * Plan shape at 100 TB: both sides explode to n-gram postings; the
  * benchmark side is tiny (an eval set), so after its `distinct` the
  * join broadcasts under AQE and the corpus postings NEVER shuffle — the
  * whole check is a map-side semi-join at scan speed. Corpus text is not
  * carried through the explode (only ids and 16-char keys), and the
  * result is a per-doc overlap count the caller anti-joins on.
  *
  * Gram keys are `substr(md5(gram_text), 1, 16)` — 64 bits of md5, the
  * same engine-replicable trick as the SimHash oracle, so a SQL engine
  * can recompute the exact same contamination verdicts.
  */
object Decontaminate {

  /** Distinct n-gram keys of `text` as an array column; empty when the
    * document has fewer than `n` tokens. Evaluates the compiled
    * [[graft.functions.TextHash.gramKeys]] kernel — the expression
    * spelling below ([[gramKeysExpr]], the cross-engine reference the
    * oracles replay in SQL) paid an interpreted
    * `transform`/`slice`/`md5` tree per GRAM; the kernel is one pass
    * per document with identical values (GopherParitySpec pins the
    * equality, the x27/x38 oracles replay the verdicts).
    */
  private def gramKeys(text: Column, n: Int): Column =
    graft.functions.TextHash.gramKeysUdf(n)(text)

  /** The expression spelling of [[gramKeys]] — kept as the engine-
    * portable reference (any SQL engine can replay it) and the parity
    * fuzz baseline. */
  private[graft] def gramKeysExpr(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => substring(md5(concat_ws(" ", slice(toks, i + 1, lit(n))).cast(BinaryType)), 1, 16)))
      .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Per-document contamination report against `bench`: (idCol,
    * n_overlap_grams, contaminated). Only documents with ≥ 1 overlapping
    * gram appear; the caller treats absence as clean (or left-joins).
    */
  def overlapReport(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val docGrams = docs.select(col(idCol).as("id"),
      explode(gramKeys(col(textCol), n)).as("gram"))
    val benchGrams = bench
      .select(explode(gramKeys(col(benchTextCol), n)).as("gram")).distinct()
    docGrams.join(benchGrams, Seq("gram")) // broadcasts: bench is small
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_overlap_grams"))
      .withColumn("contaminated", lit(true))
  }

  /** Drop contaminated documents from the corpus — payload anti-joined,
    * never shuffled. */
  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val bad = overlapReport(docs, textCol, idCol, bench, benchTextCol, n)
      .select(idCol)
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** Bloom-prefiltered decontamination — same exact result as
    * [[decontaminate]], cheaper at corpus scale. The benchmark's distinct
    * gram keys fold into a `BloomFilter` built DISTRIBUTED
    * (`stat.bloomFilter` merges per-partition filters — no driver
    * collect of the gram set) and broadcast once. The corpus then tests
    * gram membership in-place at scan speed; only documents with a
    * possible hit (true positives + an fpp-bounded sliver) explode into
    * postings for the exact verify join. False negatives are impossible
    * (Bloom guarantees), and the verify join eliminates false positives
    * — so the output is EXACTLY [[decontaminate]]'s, but the per-doc
    * posting explode+shuffle that dominates the exact path now touches
    * ~0.1% of a clean corpus instead of all of it.
    */
  def decontaminateBloom(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      fpp: Double = 0.001): DataFrame =
    decontaminateBloomPrepared(docs, textCol, idCol, bench, benchTextCol,
      buildBloom(bench, benchTextCol, n, fpp))

  /** A benchmark's gram-key Bloom state, built ONCE and reusable across
    * many corpus batches: the benchmark frame of a streaming
    * decontamination is fixed for the stream's lifetime, so rebuilding
    * the filter (distinct + count + bloomFilter aggregate jobs) every
    * micro-batch is pure waste — build here before the loop, reuse the
    * broadcast in every [[decontaminateBloomPrepared]] call. `bfB` is
    * None for a benchmark with NO n-grams (every text shorter than `n`
    * tokens): nothing can be contaminated, and `stat.bloomFilter` over
    * the empty frame would NPE deserializing a null sketch — the Option
    * makes that state unrepresentable as a bare null access.
    *
    * CONSISTENCY CONTRACT: the state is only meaningful against the
    * benchmark frame (and `n`) it was built from —
    * [[decontaminateBloomPrepared]] takes both and cannot verify they
    * match, so a state built from a different bench would silently
    * over-drop (stale prefilter hits killed by the verify join are
    * fine, but contamination the filter never saw is MISSED — false
    * negatives, the one error class Bloom otherwise excludes).
    */
  final case class BloomState(
      bfB: Option[org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]],
      n: Int) {
    def empty: Boolean = bfB.isEmpty
  }

  /** Build [[BloomState]] from the benchmark's distinct `n`-gram keys —
    * DISTRIBUTED (`stat.bloomFilter` merges per-partition filters, no
    * driver collect of the gram set) and broadcast once. */
  def buildBloom(bench: DataFrame, benchTextCol: String, n: Int = 13,
      fpp: Double = 0.001): BloomState = {
    val benchGrams = bench
      .select(explode(gramKeys(col(benchTextCol), n)).as("gram")).distinct()
    val nGrams = benchGrams.count()
    if (nGrams == 0L) return BloomState(None, n)
    val bf = benchGrams.stat.bloomFilter("gram", nGrams, fpp)
    BloomState(Some(bench.sparkSession.sparkContext.broadcast(bf)), n)
  }

  /** [[decontaminateBloom]] with the Bloom prefilter already built —
    * the exact-verify join against `bench` (which kills the filter's
    * false positives) still runs per call; only the filter build is
    * hoisted. PRECONDITION (unverifiable here — see [[BloomState]]):
    * `bench` must be the frame (and gram size) `state` was built from;
    * the gram size always comes from `state.n` so the prefilter and the
    * exact verify can never disagree on n, but a state from a DIFFERENT
    * benchmark would miss contamination its filter never saw. */
  def decontaminateBloomPrepared(docs: DataFrame, textCol: String,
      idCol: String, bench: DataFrame, benchTextCol: String,
      state: BloomState): DataFrame = {
    if (state.empty) return docs
    val bfB = state.bfB.get
    val mightHit = udf { (gs: Seq[String]) =>
      gs != null && gs.exists(bfB.value.mightContainString)
    }
    val candidates = docs.where(mightHit(gramKeys(col(textCol), state.n)))
    val confirmed = overlapReport(candidates, textCol, idCol,
      bench, benchTextCol, state.n).select(idCol)
    docs.join(confirmed, Seq(idCol), "left_anti")
  }

  /** SURGICAL decontamination: instead of dropping a contaminated
    * document, remove exactly the token spans that overlap the benchmark
    * and keep the rest — the span-removal form the published decon
    * pipelines apply when a long document embeds one leaked eval item
    * (dropping the whole doc wastes the other 99%).
    *
    * Semantics: over the canonical token stream ([[TextAnalysis.tokens]]
    * — the same normalization every gram key in this file is built
    * from), every position covered by ANY matching n-gram window is
    * removed; adjacent/overlapping windows merge into maximal spans.
    * Output per input doc: `textCol` (the ORIGINAL text byte-identical
    * when nothing matched; the space-joined surviving token stream when
    * something did — span surgery is only expressible on the token
    * stream the grams were keyed on), `n_spans_removed`,
    * `n_tokens_removed`.
    *
    * Plan shape: corpus docs explode to (id, window-start, gram-key)
    * postings — ids and 16-char keys only, text never shuffles — the
    * tiny benchmark gram side broadcasts under AQE, matched START
    * POSITIONS (rare) collect per doc through one map-side-combined
    * aggregation, and the surgery itself is a compiled per-doc kernel
    * over (tokens, starts). With `bloomFpp > 0` the posting explode is
    * prefiltered by a broadcast Bloom filter exactly like
    * [[decontaminateBloom]] — identical output (false negatives are
    * impossible, the join kills false positives), but only possible-hit
    * docs ever explode.
    */
  def scrubSpans(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      bloomFpp: Double = 0.0): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val toksC = TextAnalysis.tokens(col(textCol))
    val withToks = docs.select(col(idCol), col(textCol), toksC.as("__toks"))
    val benchGrams = bench
      .select(explode(gramKeys(col(benchTextCol), n)).as("gram")).distinct()
    val explodable = {
      val base = withToks.where(size(col("__toks")) >= n)
      if (bloomFpp <= 0) base
      else {
        val expected = math.max(benchGrams.count(), 1L)
        val bf = benchGrams.stat.bloomFilter("gram", expected, bloomFpp)
        val bfB = docs.sparkSession.sparkContext.broadcast(bf)
        val mightHit = udf { (gs: Seq[String]) =>
          gs != null && gs.exists(bfB.value.mightContainString)
        }
        base.where(mightHit(gramKeys(col(textCol), n)))
      }
    }
    val grams = transform(sequence(lit(0), size(col("__toks")) - n),
      i => struct(i.as("pos"),
        substring(md5(concat_ws(" ", slice(col("__toks"), i + 1, lit(n)))
          .cast(BinaryType)), 1, 16).as("gram")))
    val postings = explodable
      .select(col(idCol), explode(grams).as("pg"))
      .select(col(idCol), col("pg.pos").as("__pos"), col("pg.gram").as("gram"))
    val hits = postings.join(benchGrams, Seq("gram"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos"))).as("__starts"))
    val span = n
    // per-doc surgery kernel: mark covered positions, count maximal runs,
    // join the survivors. Always invoked (empty starts for clean docs) so
    // no conditional UDF evaluation order to reason about; the output
    // text column switches back to the untouched original when nothing
    // was removed.
    val cut = udf { (ts: Seq[String], starts: Seq[Int]) =>
      val arr = if (ts == null) Array.empty[String] else ts.toArray
      val st = starts.toArray
      val covered = new Array[Boolean](arr.length)
      var k = 0
      while (k < st.length) {
        var p = st(k)
        val end = math.min(st(k) + span, arr.length)
        while (p < end) { covered(p) = true; p += 1 }
        k += 1
      }
      var spans = 0
      var removed = 0
      var i = 0
      while (i < covered.length) {
        if (covered(i)) {
          removed += 1
          if (i == 0 || !covered(i - 1)) spans += 1
        }
        i += 1
      }
      val sb = new StringBuilder
      i = 0
      while (i < arr.length) {
        if (!covered(i)) {
          if (sb.nonEmpty) sb.append(' ')
          sb.append(arr(i))
        }
        i += 1
      }
      (sb.toString, spans, removed)
    }
    withToks.join(hits, Seq(idCol), "left")
      .withColumn("__cut", cut(col("__toks"),
        coalesce(col("__starts"), array().cast(ArrayType(IntegerType)))))
      .select(col(idCol),
        when(col("__cut._3") === 0, col(textCol))
          .otherwise(col("__cut._1")).as(textCol),
        col("__cut._2").as("n_spans_removed"),
        col("__cut._3").as("n_tokens_removed"))
  }

  /** Fuzzy decontamination: drop corpus documents whose exact shingle-set
    * Jaccard against ANY benchmark document clears `threshold` — the
    * near-duplicate complement to the exact n-gram paths above, for eval
    * sets that leak into training data lightly paraphrased or with
    * boilerplate attached (where no verbatim 13-gram survives but the
    * document is still the benchmark item).
    *
    * Composition, not new machinery: the benchmark plays the standing
    * corpus of [[graft.ops.Dedup.nearDupIncrement]] and the training
    * corpus is the incoming batch — MinHash-banded LSH proposes
    * (corpus doc, bench doc) candidates through an equi-join on
    * (band, bandHash), and exact Jaccard over candidate shingle sets
    * confirms, so false band collisions can never drop a clean document.
    * The benchmark side is keyed internally by `xxhash64` of its text
    * (deterministic across re-evaluations of the plan's two benchmark
    * scans; identical benchmark rows collapsing to one key only dedups
    * the candidate set).
    *
    * Scale shape: the corpus is scanned once for band keys and once more
    * (candidates only, semi-joined ids) for verification shingles — text
    * never shuffles, band rows are fixed-width (id, band, hash), and the
    * benchmark side is an eval set, so its banded frame broadcasts under
    * AQE. Same `maxBucket` degenerate-bucket guard and
    * `neardup_dropped_bucket_rows` accumulator as the incremental path.
    */
  def decontaminateFuzzy(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 32, shingleSize: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    val benchKeyed = bench
      .select(col(benchTextCol).as(textCol))
      .withColumn(idCol, xxhash64(col(textCol)))
    Dedup.nearDupIncrement(benchKeyed, docs, textCol, idCol, threshold,
      numHashes, bands, shingleSize, maxBucket)
  }

  /** Embedding-space decontamination — the semantic counterpart of the
    * n-gram forms above: drop training documents whose EMBEDDING
    * reaches `threshold` cosine against any held-out benchmark
    * embedding. Catches the paraphrased/translated eval leakage that
    * token-gram overlap ([[decontaminate]]/[[decontaminateFuzzy]])
    * cannot see — the published "semantic decontamination" recipe.
    *
    * Delegates to the measured-recall incremental machinery: the eval
    * set is signed once via [[Similarity.lshIndex]] (benchmarks are
    * small and fixed — sign at job start, the eval-Bloom discipline),
    * candidates come from the banded signature probe, and every
    * candidate is EXACT-cosine verified — so a probe miss can only
    * KEEP a doc a deeper probe would drop, never drop a clean one
    * (the [[Similarity.cosineDedupIncrement]] one-sided contract;
    * x66/x68 are its oracle surface, NearDupRecallSpec its measured
    * recall). Ids must be distinct across the two frames.
    */
  def semanticDecontaminate(docs: DataFrame, evalEmb: DataFrame,
      idCol: String, vecCol: String, threshold: Double = 0.95,
      nBits: Int = 16, probeDepth: Int = 2): DataFrame =
    Similarity.cosineDedupIncrement(
      Similarity.lshIndex(evalEmb, idCol, vecCol, nBits),
      docs, idCol, vecCol, threshold, nBits, probeDepth)
}
