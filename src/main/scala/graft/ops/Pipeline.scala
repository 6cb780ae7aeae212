package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data pipeline as a PUBLIC entry point — the
  * composition the b17 bench measures and PipelineLoopSpec folds across
  * days, shipped as one call so the measured recipe and the adopter's
  * recipe cannot drift (both of those callers now call THIS).
  *
  * Stages (each optional via its config field, each output
  * localCheckpoint-materialized before the next — a real pipeline
  * writes stage outputs to durable storage for exactly this reason;
  * without boundaries every dedup/mix operator's multi-consumer plan
  * re-executes the upstream chain multiplicatively, measured 5× at
  * sf0.01 in SCALE.md §b17-pipeline):
  *
  *   2a. line scrub  — optional [[TextFilters.scrubLines]] under `scrub`
  *                     (C4 order: inside-page line heuristics first)
  *   2. quality      — [[TextFilters.apply]] under `rules`
  *   2b. classify    — optional [[Classify.nbKeep]] under `classifier`
  *                     (model-based quality filter on the heuristic
  *                     survivors — the GPT-3/PaLM recipe position)
  *   2c. lm filter   — optional [[TextAnalysis.lmScore]] cut under
  *                     `lmFilter` (CCNet's perplexity filter)
  *   3. exact dedup  — [[Dedup.dedupIncrementBucketed]] vs the standing
  *                     bucketed fingerprint table (batch-only shuffle)
  *   4. near-dup     — [[Dedup.nearDupIncrementIndexed]] vs the standing
  *                     band table + corpus exact-verify
  *   5. decontaminate— [[Decontaminate.decontaminateBloom]] vs the eval
  *                     frame's 13-gram Bloom filter
  *   5b. redact      — optional [[Redact.redact]] under `redactPii`
  *                     (after admission decisions; only output text
  *                     changes)
  *   6. budget mix   — [[Sampling.tokenBudgetMix]] per source
  *   7. interleave   — [[Sampling.interleaveSources]]
  *   8. pack         — [[Packing.packByTokenBudget]]
  *
  * (Stage numbers follow `upTo`'s 8-stage contract — 1 is the caller's
  * ingest; the optional 2a/5b sub-stages run with their parent number.)
  *
  * Ingest (NDJSON flatten, batch synthesis) stays with the caller: a
  * batch arrives however the deployment lands it. [[fold]] appends the
  * admitted documents' fingerprints and band signatures back into the
  * standing tables through the append-safe writers, closing the daily
  * loop (PipelineLoopSpec pins that day 2 drops exact AND near copies
  * of day-1 admissions).
  *
  * 100 TB shape (SCALE.md §b17-pipeline): quality/decontaminate are
  * scan-fused compiled kernels, both dedups are bucketed/banded
  * equi-joins against standing state with no corpus-side exchange, and
  * mix/interleave/pack shuffle fixed-width key/count rows only.
  */
object Pipeline {

  /** Default arm of the `graft.pipeline.mix` dial (see [[run]]'s mix
    * block): `fused` computes the budget/interleave/pack decisions on a
    * slim (id, src, toks) frame and attaches them to the payload with
    * one join — the guide-§8 shape that keeps exactly one payload
    * exchange at any scale; `staged` keeps the per-stage spelling
    * (fewer driver-blocking gate jobs per call — the better shape when
    * the decision frames all broadcast anyway, i.e. at bench scale).
    * Values are bit-identical either way (FusedMixSpec). Default chosen
    * by the r22 interleaved A/B (OPTIMIZATION_r22.md §b17).
    */
  private[graft] val MixPathDefault = "fused"

  /** Near-dup dials — must match the standing band table's write-time
    * config ([[Dedup.writeBandTable]]); the probe guards this and
    * throws on mismatch rather than silently missing collisions.
    */
  final case class NearDup(threshold: Double = 0.7, numHashes: Int = 32,
      bands: Int = 8, shingleSize: Int = 3, maxBucket: Int = 1000)

  /** C4-STYLE line-scrub dials ([[TextFilters.scrubLines]]) for the
    * optional stage 2a. The defaults deliberately diverge from the
    * published C4 recipe — C4 keeps lines with at least 5 words
    * (`minLineWords = 5` reproduces that) and drops "lorem ipsum" at
    * the PAGE level, not per line — so read these as configurable
    * line heuristics in C4's spirit, not a fidelity claim. */
  final case class Scrub(minLineWords: Int = 3,
      banned: Seq[String] = Seq("lorem ipsum", "javascript"))

  /** Stage-2b model-based quality filter ([[Classify]]) — the
    * GPT-3/PaLM classifier-filter recipe position: AFTER the cheap
    * heuristic rules, BEFORE the dedup stages (the model scores what
    * the heuristics admit). Pass a pretrained `model` for the
    * daily-loop shape (train once, filter every batch); otherwise
    * `labeled`/`labelCol` train one at run time. Documents scoring
    * `score_micro > minScoreMicro` are kept (0 = the model's
    * `predicted` boundary; raise it to trade recall for precision —
    * the integer micro-nat scale makes the threshold engine-exact). */
  final case class Classifier(model: Option[Classify.NbModel] = None,
      labeled: Option[DataFrame] = None, labelCol: String = "label",
      vocabSize: Int = 50000, minScoreMicro: Long = 0L)

  /** Stage-2c CCNet-style LM perplexity filter: keep documents whose
    * bigram-LM cross-entropy ([[TextAnalysis.lmScore]]'s
    * `cross_entropy`, bits per bigram against a model trained on the
    * trusted corpus — [[TextAnalysis.bigramModel]]) is at most
    * `maxCrossEntropy`. Pretrained model frames only (train once,
    * filter every batch — CCNet's shape: the model defines "looks like
    * the target domain", low entropy = familiar text). The entropy is
    * a double whose last-ulp value is engine-specific (the x60 oracle
    * lesson), so this stage is spec-pinned, not SQL-oracled; within
    * ONE engine the decision is deterministic. Score columns are
    * dropped after the cut — the kept frame keeps its input columns.
    *
    * `minTokens`: [[TextAnalysis.lmScore]] hardwires
    * `cross_entropy = 0.0` for documents with fewer than 2 tokens
    * (nothing to score), and 0 passes ANY positive cut — so a 1-token
    * junk doc would ride straight through the filter whose whole job
    * is cutting unfamiliar text. Documents under `minTokens` are
    * therefore DROPPED (unscorable ≠ target-like); set `minTokens = 0`
    * to keep them deliberately. */
  final case class LmFilter(uni: DataFrame, bi: DataFrame,
      maxCrossEntropy: Double, alpha: Double = 0.1, minTokens: Int = 2)

  /** Mixture stages. `src` and `toks` are column EXPRESSIONS evaluated
    * against the batch (e.g. a domain column, or a derived
    * `concat(lit("s"), pmod(col("doc_id"), lit(16)))`); budgets/weights
    * key off the src values. `weights` drives the interleave stage
    * (skip it with `interleave = false` to mix without reordering).
    */
  final case class Mix(budgets: Map[String, Long],
      src: org.apache.spark.sql.Column,
      toks: org.apache.spark.sql.Column,
      weights: Map[String, Double] = Map.empty,
      defaultWeight: Double = 1.0,
      interleave: Boolean = true,
      maxTokensPerBin: Long = 4096,
      nShards: Int = 32)

  /** Pipeline configuration. Every stage is opt-in: `rules = None`
    * skips quality, `fingerprintTable = None` skips exact dedup,
    * `bandTable = None` skips near-dup, no eval frame skips
    * decontamination, `mix = None` stops after the filter/dedup stages
    * (the kept frame keeps its original columns).
    */
  final case class Config(
      textCol: String = "text",
      idCol: String = "doc_id",
      /** stage 2a — C4-style LINE scrub inside each page, BEFORE the
        * document-level quality rules (the published C4 order: line
        * heuristics first, page heuristics on what survives). The text
        * column is rewritten in place, so every later stage — including
        * the dedup fingerprints/bands and what [[fold]] appends — works
        * on the SCRUBBED text; the standing corpus and tables must hold
        * that form too ([[fold]] re-applies the scrub itself, so pass
        * it the admitted docs with their original text as usual).
        */
      scrub: Option[Scrub] = None,
      rules: Option[TextFilters.Rules] = Some(TextFilters.Rules()),
      /** stage 2b — optional model-based quality filter on the
        * heuristic survivors (see [[Classifier]]); judges the same
        * text form the dedup stages see (post-scrub, pre-redact). */
      classifier: Option[Classifier] = None,
      /** stage 2c — optional CCNet-style LM perplexity filter on what
        * the classifier admits (see [[LmFilter]]). */
      lmFilter: Option[LmFilter] = None,
      fingerprintTable: Option[String] = None,
      bandTable: Option[String] = None,
      nearDup: NearDup = NearDup(),
      /** also collapse near-duplicates WITHIN the batch (LSH pairs →
        * connected components → min-id keep, the `nearDup` dials). The
        * standing-band probe deliberately does NOT do this
        * (nearDupIncrementIndexed's contract: two fresh near-twins
        * arriving in the same batch both survive it) — this stage
        * closes that gap for batch-heavy sources. Off by default: the
        * benched b17 recipe measures the corpus-probe path alone.
        */
      withinBatchNearDup: Boolean = false,
      decontaminateGramSize: Int = 13,
      decontaminateFpp: Double = 0.001,
      /** stage 5b — PII redaction ([[Redact.redact]]: emails, IPv4,
        * phone numbers → typed placeholders) AFTER the admission
        * decisions: quality/dedup/decontamination judge the original
        * text, so the standing tables keep fingerprinting the form
        * future batches arrive in, and only the ADMITTED output is
        * redacted. `Mix.toks` expressions that derive from the text
        * column see the redacted form (token budgets measure what
        * ships). */
      redactPii: Boolean = false,
      mix: Option[Mix] = None,
      /** bucket count used by [[fold]]'s appends; must match the
        * standing tables' write-time bucketing. */
      numBuckets: Int = 32)

  /** `kept` is the admitted frame (packed when `mix` is configured —
    * id/src/toks/pos/bin columns — otherwise the surviving batch rows
    * with their original columns); `stageCounts` is (stage name, rows
    * remaining after it), in execution order, only for stages that ran.
    *
    * When `ownsKept` is true, `kept` is backed by a checkpoint THIS run
    * created (the final materialized stage's — lineage truncation means
    * no caller-owned block is reachable from its plan) and a long-lived
    * driver should [[graft.util.Checkpoints.release]] it after consuming
    * (writing/folding) it. When false — a Config with no materializing
    * stage (no scrub/rules/tables/eval/mix, or `upTo = 1`) — `kept` IS
    * the caller's input frame, and releasing it would unpersist the
    * caller's own checkpoint blocks (unrecoverable on lineage-truncated
    * frames); release nothing.
    */
  final case class Result(kept: DataFrame, stageCounts: Seq[(String, Long)],
      ownsKept: Boolean)

  /** Run the pipeline over one batch.
    *
    * @param batch  incoming documents: `cfg.idCol` (unique, non-null —
    *               every dedup join keys on it) + `cfg.textCol`
    * @param corpus the standing corpus (id + text) — required with
    *               `cfg.bandTable` (near-dup's exact-verify side reads
    *               candidate texts from it)
    * @param eval   held-out benchmark texts to decontaminate against
    *               (`cfg.textCol` column)
    * @param upTo   run only the first `upTo` stages of the 8-stage
    *               numbering (1 ingest — the caller's, always "run" —
    *               2 quality, 3 exact, 4 near-dup, 5 decontaminate,
    *               6 mix, 7 interleave, 8 pack); stage-attribution
    *               probes time cumulative prefixes with it
    * @param countStages collect per-stage row counts (one cheap count
    *               job per materialized stage; off for timed bench runs
    *               so the recorded recipe has no extra actions)
    */
  def run(batch: DataFrame, cfg: Config,
      corpus: Option[DataFrame] = None,
      eval: Option[DataFrame] = None,
      upTo: Int = 8,
      countStages: Boolean = false): Result = {
    require(cfg.bandTable.isEmpty || corpus.nonEmpty,
      "Pipeline.run: bandTable is configured but no corpus frame was " +
        "passed — near-dup's exact-verify side reads candidate texts " +
        "from the corpus")
    require(cfg.mix.isEmpty ||
        !(batch.columns.contains("src") || batch.columns.contains("toks")),
      "Pipeline.run: the mix stages materialize working columns `src` " +
        "and `toks` — the batch already has one of them, which would be " +
        "silently overwritten; rename it or fold it into cfg.mix.src/toks")
    val counts = Seq.newBuilder[(String, Long)]
    // Each stage materializes eagerly from the previous stage's
    // checkpoint, after which that checkpoint's blocks are dead weight —
    // a long-lived daily-loop driver that never released them would
    // accumulate storage-pool pressure until GC (the nondeterministic
    // mode SCALE.md §b4 documents), so release each superseded stage as
    // soon as its successor is materialized. The FINAL stage's
    // checkpoint stays alive: `Result.kept` derives from it (release it
    // via [[graft.util.Checkpoints.release]] once consumed).
    var prevStage: Option[DataFrame] = None
    def mat(name: String)(d: DataFrame): DataFrame = {
      val m = d.localCheckpoint(true)
      if (countStages) counts += name -> m.count()
      prevStage.foreach(graft.util.Checkpoints.release)
      prevStage = Some(m)
      m
    }
    var df = batch
    if (upTo >= 2) cfg.scrub.foreach { s =>
      df = mat("scrub_lines")(df.withColumn(cfg.textCol,
        TextFilters.scrubLines(col(cfg.textCol), s.minLineWords, s.banned)))
    }
    if (upTo >= 2) cfg.rules.foreach { r =>
      df = mat("quality")(TextFilters(df, cfg.textCol, r))
    }
    if (upTo >= 2) cfg.classifier.foreach { c =>
      require(c.model.nonEmpty || c.labeled.nonEmpty,
        "Pipeline.run: classifier stage needs a pretrained model or a " +
          "labeled frame to train one from")
      val m = c.model.getOrElse(Classify.nbTrain(c.labeled.get,
        cfg.textCol, c.labelCol, c.vocabSize))
      df = mat("classify")(
        Classify.nbKeep(df, cfg.textCol, cfg.idCol, m, c.minScoreMicro))
    }
    if (upTo >= 2) cfg.lmFilter.foreach { lf =>
      df = mat("lm_filter")(TextAnalysis.lmScore(df, cfg.textCol,
          cfg.idCol, lf.uni, lf.bi, lf.alpha)
        .where(col("n_tokens") >= lf.minTokens &&
          col("cross_entropy") <= lf.maxCrossEntropy)
        .drop("n_tokens", "n_oov", "n_known_bigrams", "cross_entropy"))
    }
    if (upTo >= 3) cfg.fingerprintTable.foreach { t =>
      df = mat("exact_dedup")(
        Dedup.dedupIncrementBucketed(t, df, cfg.textCol, cfg.idCol))
    }
    if (upTo >= 4) cfg.bandTable.foreach { t =>
      val nd = cfg.nearDup
      df = mat("near_dup")(Dedup.nearDupIncrementIndexed(
        df.sparkSession.table(t), corpus.get, df, cfg.textCol, cfg.idCol,
        threshold = nd.threshold, numHashes = nd.numHashes,
        bands = nd.bands, shingleSize = nd.shingleSize,
        maxBucket = nd.maxBucket))
    }
    if (upTo >= 4 && cfg.withinBatchNearDup) {
      val nd = cfg.nearDup
      df = mat("within_batch_near_dup")(Dedup.dedupByPairs(df, cfg.idCol,
        Dedup.minhashDedupPairs(df, cfg.textCol, cfg.idCol,
          threshold = nd.threshold, numHashes = nd.numHashes,
          bands = nd.bands, shingleSize = nd.shingleSize,
          maxBucket = nd.maxBucket).select("id_a", "id_b")))
    }
    if (upTo >= 5) eval.foreach { ev =>
      df = mat("decontaminate")(Decontaminate.decontaminateBloom(
        df, cfg.textCol, cfg.idCol, ev, cfg.textCol,
        n = cfg.decontaminateGramSize, fpp = cfg.decontaminateFpp))
    }
    if (upTo >= 5 && cfg.redactPii) {
      df = mat("redact")(df.withColumn(cfg.textCol,
        Redact.redact(col(cfg.textCol))))
    }
    cfg.mix.foreach { m =>
      // FUSED mix path (guide §8: decide on small rows, move big rows
      // once). The budget keep-set, interleave positions, and pack bins
      // are all pure functions of (id, src, toks) — compute every one
      // of them on a slim frame and attach the results to the payload
      // with ONE join, instead of the staged spelling's three payload
      // movements (budget semi-join + checkpoint, position join +
      // global range sort, pack's shard exchange). Row values and
      // column order are IDENTICAL to the staged path (FusedMixSpec
      // pins row-for-row equality); the only deltas are physical — the
      // payload crosses one exchange instead of three, and the
      // interleave's range sort is skipped outright because pack's
      // shard window re-partitions immediately anyway (`pos` carries
      // the interleave order as data either way). Gated on:
      //   - the full mix recipe running (upTo >= 8, interleave on) —
      //     prefix runs keep per-stage outputs for attribution probes;
      //   - !countStages — stage counting wants the staged boundaries;
      //   - a prior materialized stage (prevStage nonEmpty) — the fused
      //     tail's own working checkpoints are created AND released
      //     inside this block (see below), and `kept` stays releasable
      //     under the normal Result.ownsKept contract (a mix-only
      //     Config keeps the staged path, whose ownership story is
      //     pinned by CheckpointsSpec);
      //   - the `graft.pipeline.mix` dial (JVM property /
      //     SPARK_GRAFT_PIPELINE_MIX env; values `fused` | `staged`,
      //     default [[MixPathDefault]]) — both spellings produce
      //     bit-identical rows (FusedMixSpec), they differ only in
      //     physical shape: fused keeps exactly ONE payload exchange at
      //     any scale (the 100 TB shape), staged degrades to three once
      //     the decision frames outgrow AQE's broadcast threshold but
      //     has fewer driver-blocking gate jobs per call. The default is
      //     set by measurement (OPTIMIZATION_r22.md §b17).
      val mixPath = {
        val raw = System.getProperty("graft.pipeline.mix",
          sys.env.getOrElse("SPARK_GRAFT_PIPELINE_MIX", MixPathDefault))
        val v = raw.trim.toLowerCase
        if (v == "fused" || v == "staged") v
        else {
          // a silent fall-through on a typo would quietly select the
          // three-payload-exchange staged shape at scale — say so
          System.err.println(s"[pipeline] ignoring unrecognized " +
            s"graft.pipeline.mix value '$raw' — using '$MixPathDefault'")
          MixPathDefault
        }
      }
      if (upTo >= 8 && m.interleave && !countStages && prevStage.nonEmpty &&
          mixPath == "fused") {
        val slim = df.select(col(cfg.idCol), m.src.as("src"), m.toks.as("toks"))
          .localCheckpoint(false) // 2 consumers: keep-set core + semi-join
        val keptSlim = slim.join(
            Sampling.tokenBudgetKeepIds(slim, cfg.idCol, "toks", "src",
              m.budgets),
            Seq(cfg.idCol), "left_semi")
          .localCheckpoint(false) // 2 consumers: position core + pack
        val pos = Sampling.interleavePositionsFrame(keptSlim, cfg.idCol, "src",
          m.weights, defaultWeight = m.defaultWeight).drop("__h")
        // materialize the finished decision frame EAGERLY (slim-sized:
        // id/src/toks/pos/shard/start_tok/bin rows for the kept set) so
        // the two slim working checkpoints above are dead right here and
        // can be released NOW — their LogicalRDDs are hidden behind this
        // checkpoint's lineage truncation, so the caller's
        // Checkpoints.release(kept) could never free them and a
        // long-lived daily loop would leak one pair per batch until GC
        // (the r21 ADVICE finding; the old comment claiming they were
        // reachable from kept's plan was wrong).
        val packed = Packing.packByTokenBudget(
            keptSlim.join(pos, Seq(cfg.idCol)),
            cfg.idCol, "toks", maxTokensPerBin = m.maxTokensPerBin,
            nShards = m.nShards)
          .localCheckpoint(true)
        graft.util.Checkpoints.release(keptSlim)
        graft.util.Checkpoints.release(slim)
        // the ONE payload movement: an inner join on id attaches
        // src/toks/pos/shard/start_tok/bin and IS the keep filter
        // (packed holds exactly the kept ids) — same columns, same
        // order, same rows as the staged path. `packed`'s checkpoint
        // IS reachable from kept's plan, so the normal Result.ownsKept
        // release covers it.
        df = df.join(packed, Seq(cfg.idCol))
      } else {
        if (upTo >= 6) {
          df = mat("budget_mix")(Sampling.tokenBudgetMix(
            df.withColumn("src", m.src).withColumn("toks", m.toks),
            cfg.idCol, "toks", "src", m.budgets))
        }
        // when pack follows (upTo >= 8), its shard repartition destroys
        // the interleave's physical order immediately — skip the global
        // range sort (a sampling pass + one full-payload exchange) and
        // keep only the `pos` column, whose values are identical either
        // way; with upTo == 7 the interleave IS the output and keeps its
        // documented ordering
        if (upTo >= 7 && m.interleave)
          df = Sampling.interleaveSources(df, cfg.idCol, "src", m.weights,
            defaultWeight = m.defaultWeight, sorted = upTo < 8)
        // pack keys on the ID column, not interleave's pos: packByTokenBudget
        // hash-shards on its id (bin layout is order-independent by design)
        // and pos carries cross-source rank TIES, which would make the
        // within-shard window order — and so the bins — nondeterministic
        if (upTo >= 8) {
          df = Packing.packByTokenBudget(df, cfg.idCol, "toks",
            maxTokensPerBin = m.maxTokensPerBin, nShards = m.nShards)
          if (countStages) counts += "pack" -> df.count()
        }
      }
    }
    Result(df, counts.result(), ownsKept = prevStage.isDefined)
  }

  /** Fold one day's ADMITTED documents into the standing tables so the
    * next batch dedups against them: fingerprints through
    * [[Dedup.writeFingerprintTable]] and band signatures through
    * [[Dedup.writeBandTable]], both `append = true` (the writers
    * re-produce the exact standing layout and config — a hand-rolled
    * append with mismatched bucketing would silently disable the
    * exchange-free probe; the band writer additionally refuses a
    * config mismatch).
    *
    * @param admitted the kept documents WITH their text column (e.g.
    *                 `batch.join(result.kept.select(idCol), Seq(idCol),
    *                 "left_semi")` when the mix stages replaced columns).
    *                 Pass the ORIGINAL text: when `cfg.scrub` is set the
    *                 fold re-applies the scrub itself, so the appended
    *                 fingerprints/bands match what [[run]]'s probes
    *                 compute (stage 2a rewrites the text BEFORE the
    *                 dedup stages — folding unscrubbed text would
    *                 silently stop future exact copies from colliding).
    *                 `redactPii` needs no such replay: redaction runs
    *                 AFTER the dedup probes, which see original text on
    *                 both sides.
    */
  def fold(admitted: DataFrame, cfg: Config): Unit = {
    val adm = cfg.scrub.map { s =>
      admitted.withColumn(cfg.textCol,
        TextFilters.scrubLines(col(cfg.textCol), s.minLineWords, s.banned))
    }.getOrElse(admitted)
    cfg.fingerprintTable.foreach { t =>
      Dedup.writeFingerprintTable(adm, cfg.textCol, t,
        numBuckets = cfg.numBuckets, append = true)
    }
    cfg.bandTable.foreach { t =>
      val nd = cfg.nearDup
      Dedup.writeBandTable(adm, cfg.textCol, cfg.idCol, t,
        numHashes = nd.numHashes, bands = nd.bands,
        shingleSize = nd.shingleSize, numBuckets = cfg.numBuckets,
        append = true)
    }
  }
}
