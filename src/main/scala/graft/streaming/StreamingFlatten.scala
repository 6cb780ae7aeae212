package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{FlattenOptions, LinkMode}
import graft.plan.FlattenPlanner
import graft.sinks.Sinks

/** Streaming ingest (SURVEY.md §2.10).
  *
  * The reference is streaming-ingest/batch-output (bounded-channel pipeline,
  * `/root/reference/src/lib.rs:237`). The Spark-native generalization is
  * Structured Streaming: because [[FlattenPlanner]] is a pure function of
  * (schema, options), it runs unchanged inside `foreachBatch` — each
  * micro-batch is flattened to the same table forest and appended.
  *
  * Root links use [[LinkMode.Monotonic]] prefixed with the batch id
  * (`<batchId>.<id>`) — globally unique without any cross-batch
  * coordination, exactly like the reference's per-thread id_prefix trick
  * (`src/lib.rs:248`).
  */
object StreamingFlatten {

  /** Start a streaming flatten: NDJSON files arriving in `inputDir` →
    * parquet table directories under `outDir`.
    */
  def start(spark: SparkSession, inputDir: String, outDir: String,
      schema: org.apache.spark.sql.types.StructType,
      opts: FlattenOptions = FlattenOptions(),
      checkpoint: Option[String] = None): StreamingQuery = {
    val stream = spark.readStream.schema(schema).json(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpoint.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchOpts = opts.copy(
          linkMode = LinkMode.Monotonic,
          idPrefix = s"$batchId.${opts.idPrefix}")
        // N table writes from one micro-batch — parse the batch once
        batch.persist()
        try FlattenPlanner.flatten(batch, batchOpts).foreach { case (name, df) =>
          df.write.mode("append").parquet(s"$outDir/$name")
        } finally batch.unpersist()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming exact dedup for continuous ingestion: drop documents
    * whose (whitespace-normalized) text fingerprint was already seen
    * within the watermark horizon. The streaming face of
    * [[graft.ops.Dedup.exactDedup]] — same 16-byte binary fingerprint,
    * so a batch backfill and the streaming path agree on what is a
    * duplicate.
    *
    * State is the fingerprint set inside the watermark window — 16
    * bytes/doc, evicted as event time advances, so state size is bounded
    * by (ingest rate × delay), not stream lifetime. For dedup against
    * ALL history, run the stream into [[graft.ops.Dedup.dedupIncrement]]
    * batches instead (streaming state cannot hold a 100 TB corpus'
    * fingerprints; a daily anti-join against the corpus can).
    */
  def streamingDedup(docs: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    docs.withColumn("__fp", graft.ops.TextAnalysis.fingerprintBin(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming NEAR-duplicate suppression: each micro-batch drops
    * documents that are near-dups (banded MinHash candidates + exact
    * Jaccard verify — [[graft.ops.Dedup.nearDupIncrement]], the same
    * plan as the batch path, so backfill and stream agree) of the
    * ACCUMULATED corpus, and the batch's survivors join that corpus for
    * every later batch. `dropDuplicatesWithinWatermark` cannot express
    * this — its state keys are exact, near-dup needs a candidate join
    * plus verification — so this is the `foreachBatch` composition the
    * Structured Streaming guide prescribes for batch-operator reuse.
    *
    * The corpus lives as parquet under `corpusDir`, one
    * `batch=<id>` partition per micro-batch: a replayed batch after a
    * failure OVERWRITES its own partition (idempotent, restart-safe
    * with the checkpoint), and the accumulated corpus is just
    * `spark.read.parquet(corpusDir)` — queryable mid-stream. Each
    * partition also stores its docs' MinHash band arrays (`bh` + the
    * band-config columns), so the accumulated store doubles as a
    * standing band index: a micro-batch probes the stored hashes
    * ([[graft.ops.Dedup.nearDupIncrementIndexed]]) instead of
    * re-running the MinHash kernel over every accumulated document —
    * per-batch corpus cost is flat in stream length. At 100 TB the
    * existing-side scan is fingerprint-width (band keys and candidate
    * shingles, never corpus text — ShuffleEvidenceSpec); a long-lived
    * pipeline can graduate to [[graft.ops.Dedup.writeBandTable]]'s
    * bucketed catalog table for exchange-free batches on top.
    * Within-batch near-dups are NOT collapsed (the
    * nearDupIncrement contract; compose [[graft.ops.Dedup.minhashDedupPairs]]
    * on the batch first if needed).
    */
  def streamingNearDup(docs: DataFrame, textCol: String, idCol: String,
      corpusDir: String, checkpointDir: String, threshold: Double = 0.7,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucket: Int = 10000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        nearDupBatch(batch, batchId, textCol, idCol, corpusDir,
          threshold, numHashes, bands, shingleSize, maxBucket)
      }
      .start()

  /** One [[streamingNearDup]] micro-batch — package-visible so the
    * replay-idempotence contract is testable without driving a failure
    * through the streaming engine: re-running a batch id OVERWRITES its
    * own partition and dedups only against the OTHER partitions, so a
    * post-failure replay can neither duplicate corpus rows nor drop a
    * batch against its own partial write.
    */
  private[graft] def nearDupBatch(batch: DataFrame, batchId: Long,
      textCol: String, idCol: String, corpusDir: String, threshold: Double,
      numHashes: Int, bands: Int, shingleSize: Int, maxBucket: Int): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasOther = fs.exists(new org.apache.hadoop.fs.Path(corpusDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(corpusDir))
        .exists { st =>
          st.getPath.getName.startsWith("batch=") &&
            st.getPath.getName != s"batch=$batchId"
        }
    val fresh =
      if (!hasOther) batch
      else {
        // never dedup a replayed batch against its own partial write
        val existing = spark.read.parquet(corpusDir)
          .where(col("batch") =!= batchId)
        val texts = existing.select(col(idCol), col(textCol))
        graft.ops.Dedup.nearDupIncrementIndexed(
          storeBandIndex(existing, textCol, idCol, numHashes, bands, shingleSize),
          texts, batch,
          textCol, idCol, threshold, numHashes, bands, shingleSize, maxBucket)
      }
    fresh.select(col(idCol), col(textCol))
      .withColumn("bh", graft.functions.TextHash
        .minhashBandsUdf(numHashes, bands, shingleSize)(col(textCol)))
      .withColumn("numhashes", lit(numHashes))
      .withColumn("bands", lit(bands))
      .withColumn("shinglesize", lit(shingleSize))
      .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
  }

  /** The accumulated store as a standing band index
    * ([[graft.ops.Dedup.writeBandTable]]'s shape, inlined in the
    * partitioned store): stored band arrays make the corpus-side
    * per-batch cost a posexplode of fixed-width hashes, NOT a MinHash
    * pass over every accumulated document. Only legacy rows (store
    * written before this layout / null `bh` in a schema-merged mixed
    * store) pay the kernel again; the config columns ride along so a
    * stream restarted with different band parameters fails fast
    * ([[rebandStore]] migrates the store to a new config).
    */
  private def storeBandIndex(existing: DataFrame, textCol: String,
      idCol: String, numHashes: Int, bands: Int, shingleSize: Int): DataFrame =
    if (existing.columns.contains("bh") &&
        existing.columns.contains("numhashes")) {
      val stored = existing.where(col("bh").isNotNull)
        .select(col(idCol).as("id"),
          posexplode(col("bh")).as(Seq("band", "bandHash")),
          col("numhashes"), col("bands"), col("shinglesize"))
      val legacy = graft.ops.Dedup.bandIndex(
        existing.where(col("bh").isNull).select(col(idCol), col(textCol)),
        textCol, idCol, numHashes, bands, shingleSize)
      stored.unionByName(legacy)
    } else
      graft.ops.Dedup.bandIndex(
        existing.select(col(idCol), col(textCol)),
        textCol, idCol, numHashes, bands, shingleSize)

  /** The ingest-hygiene STACK on a stream — the streaming face of
    * [[graft.ops.Pipeline]]'s filter/dedup stages: each micro-batch runs
    * an optional C4 line scrub (`scrub` — rewrites the text in place, so
    * the store holds the canonical form) → quality filtering → 13-gram
    * Bloom decontamination (stateless scan-fused kernels, so they run
    * before any state is touched) → exact dedup against the accumulated
    * store (anti-join on STORED 16-byte fingerprints — no re-hash of the
    * corpus per batch) → near-dup against the stored band arrays
    * ([[streamingNearDup]]'s standing-index machinery), then appends its
    * admitted documents to the store and writes them to
    * `outDir/batch=<id>` as the admitted output stream (PII-redacted
    * when `redactPii` is set — the store itself stays unredacted, the
    * form future probes compare to).
    *
    * Replay idempotence (the property the batch-table fold CANNOT give a
    * stream: re-running a batch that already folded its admissions into
    * a catalog table would see its own fingerprints and admit nothing):
    * both writes go to the batch's OWN `batch=<id>` partition with
    * overwrite, and both dedups exclude that partition — a post-failure
    * replay reproduces the exact same admissions. Store rows carry
    * (fp, bh, config), so the store IS the standing state: exact and
    * near-dup probes read fixed-width columns, never re-kernel the
    * corpus, and [[graduateNearDupStore]] can promote it to the batch
    * pipeline's bucketed band table at any point (the store schema is a
    * superset of [[streamingNearDup]]'s).
    *
    * Within-batch duplicates: exact dups collapse to their min id (the
    * [[graft.ops.Dedup.dedupIncrement]] contract); near-dup twins inside
    * ONE batch both survive (the nearDupIncrement contract — compose
    * [[graft.ops.Dedup.minhashDedupPairs]] on the batch first if that
    * matters at your batch sizes).
    */
  def streamingPipeline(docs: DataFrame, textCol: String, idCol: String,
      corpusDir: String, outDir: String, checkpointDir: String,
      rules: Option[graft.ops.TextFilters.Rules] =
        Some(graft.ops.TextFilters.Rules()),
      eval: Option[DataFrame] = None,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, maxBucket: Int = 10000,
      decontaminateGramSize: Int = 13,
      // the batch pipeline's optional hygiene stages, same placements
      // ([[graft.ops.Pipeline.Config]]): scrub rewrites the text BEFORE
      // quality/dedup — the store then holds the canonical scrubbed form
      // (fp/bh computed on it), so future batches' junk-wrapped copies
      // collide; redact rewrites ONLY the admitted output stream — the
      // store keeps the unredacted scrubbed text the probes compare to
      scrub: Option[graft.ops.Pipeline.Scrub] = None,
      redactPii: Boolean = false,
      // the batch pipeline's stage-2b model filter ([[graft.ops
      // .Pipeline.Classifier]]), PRETRAINED form only — a stream cannot
      // train per batch, the same once-per-stream discipline as the
      // eval Bloom. Judged BEFORE the admission decisions, so rejected
      // documents never enter the store. Materialize the model's
      // weights frame (localCheckpoint) before passing it: each
      // micro-batch re-collects it for the broadcast join, and an
      // unmaterialized frame would re-run its training aggregations
      // every batch.
      classifier: Option[graft.ops.Classify.NbModel] = None,
      classifierMinScoreMicro: Long = 0L,
      // the batch pipeline's stage-2c CCNet-style perplexity cut
      // ([[graft.ops.Pipeline.LmFilter]]) — pretrained frames only,
      // same once-per-stream discipline; materialize uni/bi
      // (localCheckpoint) before passing, each micro-batch re-collects
      // them for the broadcast
      lmFilter: Option[graft.ops.Pipeline.LmFilter] = None): StreamingQuery = {
    // the eval frame is fixed for the stream's lifetime — build its
    // 13-gram Bloom filter ONCE here, not per micro-batch (the build is
    // distinct + count + bloomFilter aggregate jobs over the benchmark;
    // the per-batch exact-verify join, which kills false positives,
    // stays per batch)
    val bloom = eval.map(ev => graft.ops.Decontaminate.buildBloom(
      ev, textCol, decontaminateGramSize))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        pipelineBatch(batch, batchId, textCol, idCol, corpusDir, outDir,
          rules, eval, threshold, numHashes, bands, shingleSize, maxBucket,
          decontaminateGramSize, bloom, scrub, redactPii, classifier,
          classifierMinScoreMicro, lmFilter)
      }
      .start()
  }

  /** One [[streamingPipeline]] micro-batch — package-visible for the
    * replay-idempotence contract, like [[nearDupBatch]]. */
  private[graft] def pipelineBatch(batch: DataFrame, batchId: Long,
      textCol: String, idCol: String, corpusDir: String, outDir: String,
      rules: Option[graft.ops.TextFilters.Rules], eval: Option[DataFrame],
      threshold: Double, numHashes: Int, bands: Int, shingleSize: Int,
      maxBucket: Int, decontaminateGramSize: Int,
      // precomputed eval Bloom ([[streamingPipeline]] builds it once for
      // the stream); None — the direct-call replay path — builds per call
      bloom: Option[graft.ops.Decontaminate.BloomState] = None,
      scrub: Option[graft.ops.Pipeline.Scrub] = None,
      redactPii: Boolean = false,
      classifier: Option[graft.ops.Classify.NbModel] = None,
      classifierMinScoreMicro: Long = 0L,
      lmFilter: Option[graft.ops.Pipeline.LmFilter] = None): Unit = {
    val spark = batch.sparkSession
    var df = batch
    scrub.foreach(s => df = df.withColumn(textCol,
      graft.ops.TextFilters.scrubLines(col(textCol), s.minLineWords,
        s.banned)))
    rules.foreach(r => df = graft.ops.TextFilters(df, textCol, r))
    // stage 2b (batch-pipeline order): the model judges the heuristic
    // survivors, before any admission decision touches the store
    classifier.foreach(m => df = graft.ops.Classify.nbKeep(
      df, textCol, idCol, m, classifierMinScoreMicro))
    // stage 2c: CCNet perplexity cut on what the classifier admits
    // (sub-minTokens docs drop — lmScore's 0.0 for unscorable text
    // would pass any positive cut; see Pipeline.LmFilter)
    lmFilter.foreach(lf => df = graft.ops.TextAnalysis.lmScore(
        df, textCol, idCol, lf.uni, lf.bi, lf.alpha)
      .where(col("n_tokens") >= lf.minTokens &&
        col("cross_entropy") <= lf.maxCrossEntropy)
      .drop("n_tokens", "n_oov", "n_known_bigrams", "cross_entropy"))
    eval.foreach { ev =>
      val st = bloom.getOrElse(graft.ops.Decontaminate.buildBloom(
        ev, textCol, decontaminateGramSize))
      df = graft.ops.Decontaminate.decontaminateBloomPrepared(
        df, textCol, idCol, ev, textCol, st)
    }
    // the surviving batch feeds three consumers (exact keys, near-dup
    // signatures, the final writes) — materialize once, micro-batch-sized
    df = df.localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasOther = fs.exists(new org.apache.hadoop.fs.Path(corpusDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(corpusDir))
        .exists { st =>
          st.getPath.getName.startsWith("batch=") &&
            st.getPath.getName != s"batch=$batchId"
        }
    val fp = graft.ops.TextAnalysis.fingerprintBin(col(textCol))
    val existing =
      if (hasOther)
        Some(spark.read.parquet(corpusDir).where(col("batch") =!= batchId))
      else None
    // exact dedup: against STORED fingerprints (legacy/mixed-store rows
    // without an fp column re-hash their text, once per batch) AND
    // within the batch itself (min id per fingerprint group — the
    // dedupIncrement contract, applied from the very first batch)
    val batchKeys = df.select(fp.as("__k"), col(idCol))
    val freshKeys = existing match {
      case Some(ex) =>
        val seen =
          if (ex.columns.contains("fp")) ex.select(coalesce(col("fp"), fp).as("__k"))
          else ex.select(fp.as("__k"))
        batchKeys.join(seen, Seq("__k"), "left_anti")
      case None => batchKeys
    }
    // materialize the kept-id set (batch-sized, ids only): `exactKept`
    // below is consumed THREE times inside the near-dup probe (its band
    // kernel, the verify semi-join, the final anti-join), and each lazy
    // recomputation re-ran the anti-join's full store fingerprint scan —
    // with the ids checkpointed the store's fp column is read ONCE per
    // batch and the re-evaluations are broadcast semi-joins over the
    // already-checkpointed batch blocks (guide §1.2: don't recompute)
    val keepIds = freshKeys.groupBy("__k")
      .agg(min(col(idCol)).as(idCol)).select(idCol)
      .localCheckpoint(true)
    val exactKept = df.join(keepIds, Seq(idCol), "left_semi")
    val fresh = existing match {
      case Some(ex) =>
        graft.ops.Dedup.nearDupIncrementIndexed(
          storeBandIndex(ex, textCol, idCol, numHashes, bands, shingleSize),
          ex.select(col(idCol), col(textCol)), exactKept,
          textCol, idCol, threshold, numHashes, bands, shingleSize, maxBucket)
      case None => exactKept
    }
    val admitted = fresh.select(col(idCol), col(textCol))
      .withColumn("fp", fp)
      .withColumn("bh", graft.functions.TextHash
        .minhashBandsUdf(numHashes, bands, shingleSize)(col(textCol)))
      .withColumn("numhashes", lit(numHashes))
      .withColumn("bands", lit(bands))
      .withColumn("shinglesize", lit(shingleSize))
      .localCheckpoint(true) // two writes below — compute admissions once
    // the two writes read the SAME checkpointed `admitted` blocks into
    // two independent directories — submit them concurrently (guide
    // §2.6: actions are only sequential because the driver calls them
    // sequentially) so the second write's tasks back-fill the first
    // write's straggler tail instead of waiting behind a full barrier.
    // The store keeps the (scrubbed) UNREDACTED text — the form future
    // batches' exact-verify compares against; only the admitted OUTPUT
    // stream redacts.
    val outText =
      if (redactPii) graft.ops.Redact.redact(col(textCol)).as(textCol)
      else col(textCol)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
      val writes = Seq(
        scala.concurrent.Future(admitted.write.mode("overwrite")
          .parquet(s"$corpusDir/batch=$batchId"))(ec),
        scala.concurrent.Future(admitted.select(col(idCol), outText)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId"))(ec))
      writes.foreach(scala.concurrent.Await.result(_,
        scala.concurrent.duration.Duration.Inf))
    } finally pool.shutdown()
    // the working frames are dead after the writes — drop their
    // checkpoint blocks NOW rather than letting a long-lived stream
    // accumulate them per micro-batch until GC (Dataset.unpersist()
    // would be a no-op here: graft.util.Checkpoints Scaladoc)
    graft.util.Checkpoints.release(df)
    graft.util.Checkpoints.release(keepIds)
    graft.util.Checkpoints.release(admitted)
  }

  /** Embedding near-dup on a STREAM — the vector twin of
    * [[streamingNearDup]]: each micro-batch drops rows whose EXACT
    * cosine against the accumulated corpus reaches `threshold`
    * ([[graft.ops.Similarity.cosineDedupIncrement]] over an
    * [[graft.ops.Similarity.lshIndex]] of the store, with the
    * `probeDepth` recall dial), then appends the survivors to its own
    * `batch=<id>` partition — the same replay-idempotent layout:
    * re-running a batch id overwrites its own partition and dedups only
    * against the others.
    *
    * Each partition stores its rows' LSH SIGNATURES alongside the
    * vectors ([[graft.ops.Similarity.lshIndex]] columns `bucket` /
    * `nbits`), so the accumulated store IS the standing index: a
    * micro-batch's corpus-side cost is the probe join over stored
    * fixed-width columns — flat in stream length — instead of
    * re-running the signature kernel over every accumulated row per
    * batch (which made cumulative stream cost quadratic). Store rows
    * written before this layout (no `bucket` column, or null buckets
    * from a schema-merged mixed store) are re-signed per batch — only
    * those rows pay the kernel — and a stream restarted with a
    * DIFFERENT `nBits` than the store was written with fails fast on
    * the index's `nbits` guard instead of silently probing the wrong
    * bucket space — [[resignCosineStore]] migrates the store to the new
    * width (the occupancy dial SCALE.md §vstream measures: raise nBits
    * as the store grows to keep per-batch cost flat).
    */
  def streamingCosineDedup(docs: DataFrame, vecCol: String, idCol: String,
      corpusDir: String, checkpointDir: String, threshold: Double = 0.95,
      nBits: Int = 16, probeDepth: Int = 2): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        cosineDedupBatch(batch, batchId, vecCol, idCol, corpusDir,
          threshold, nBits, probeDepth)
      }
      .start()

  /** One [[streamingCosineDedup]] micro-batch — package-visible for the
    * replay-idempotence contract, like [[nearDupBatch]]. */
  private[graft] def cosineDedupBatch(batch: DataFrame, batchId: Long,
      vecCol: String, idCol: String, corpusDir: String, threshold: Double,
      nBits: Int, probeDepth: Int): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(corpusDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasOther = fs.exists(new org.apache.hadoop.fs.Path(corpusDir)) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(corpusDir))
        .exists { st =>
          st.getPath.getName.startsWith("batch=") &&
            st.getPath.getName != s"batch=$batchId"
        }
    val fresh =
      if (!hasOther) batch
      else {
        val existing = spark.read.parquet(corpusDir)
          .where(col("batch") =!= batchId)
        // stored signatures make the accumulated store a standing
        // lshIndex frame; only rows without one (legacy layout, or the
        // null-bucket half of a mixed store) pay the kernel again
        val idx =
          if (existing.columns.contains("bucket") &&
              existing.columns.contains("nbits")) {
            val stored = existing.where(col("bucket").isNotNull)
              .select(col(idCol), col(vecCol), col("bucket"), col("nbits"))
            val legacy = graft.ops.Similarity.lshIndex(
              existing.where(col("bucket").isNull)
                .select(col(idCol), col(vecCol)),
              idCol, vecCol, nBits)
            stored.unionByName(legacy)
          } else
            graft.ops.Similarity.lshIndex(
              existing.select(col(idCol), col(vecCol)), idCol, vecCol, nBits)
        graft.ops.Similarity.cosineDedupIncrement(
          idx, batch, idCol, vecCol, threshold, nBits, probeDepth)
      }
    graft.ops.Similarity.lshIndex(
        fresh.select(col(idCol), col(vecCol)), idCol, vecCol, nBits)
      .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
  }

  /** Offline signature compaction for a [[streamingCosineDedup]] store:
    * rewrite every `batch=<id>` partition with fresh LSH signatures at
    * `nBits`. This is the dial maintenance the measured scale curve
    * prescribes (SCALE.md §vstream): per-batch dedup cost tracks bucket
    * occupancy (store rows / 2^nBits), so a store that has outgrown its
    * write-time width should be re-signed at the forecast width — one
    * kernel pass over the store, run offline between micro-batches.
    * With doubling-style raises the total resign work over a stream's
    * life is bounded by ~2× one full pass. It is also the migration
    * path for legacy stores (rows without stored signatures) and the
    * remedy behind the width-mismatch fail-fast: a stream restarted at
    * a new `nBits` raises until the store is re-signed.
    *
    * Each partition is materialized (`localCheckpoint`) before its
    * directory is overwritten — Spark cannot stream a write over its
    * own input. NOT safe concurrently with an active stream on the same
    * store (stop the query first); a crash mid-compaction leaves whole
    * partitions either old- or new-width, and a re-run (or the batch
    * path's legacy re-sign fallback for null-signature rows) completes
    * the migration. Returns the number of partitions rewritten.
    */
  def resignCosineStore(spark: SparkSession, corpusDir: String,
      vecCol: String, idCol: String, nBits: Int): Int = {
    val root = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val parts = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
    parts.foreach { p =>
      val fresh = graft.ops.Similarity.lshIndex(
          spark.read.parquet(p.toString).select(col(idCol), col(vecCol)),
          idCol, vecCol, nBits)
        .localCheckpoint(true)
      fresh.write.mode("overwrite").parquet(p.toString)
    }
    parts.length
  }

  /** The text twin of [[resignCosineStore]]: rewrite every `batch=<id>`
    * partition of a [[streamingNearDup]] store with fresh MinHash band
    * arrays under a NEW band configuration. Text band hashes live in an
    * unbounded keyspace, so there is no occupancy dial to chase — this
    * is the recall-migration path: a stream restarted with different
    * `(numHashes, bands, shingleSize)` fails fast on the store's config
    * columns until the store is re-banded. Same concurrency and
    * crash-recovery contract as the vector form. Returns the number of
    * partitions rewritten.
    */
  def rebandStore(spark: SparkSession, corpusDir: String,
      textCol: String, idCol: String, numHashes: Int, bands: Int,
      shingleSize: Int): Int = {
    val root = new org.apache.hadoop.fs.Path(corpusDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return 0
    val parts = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
    parts.foreach { p =>
      val fresh = spark.read.parquet(p.toString)
        .select(col(idCol), col(textCol))
        .withColumn("bh", graft.functions.TextHash
          .minhashBandsUdf(numHashes, bands, shingleSize)(col(textCol)))
        .withColumn("numhashes", lit(numHashes))
        .withColumn("bands", lit(bands))
        .withColumn("shinglesize", lit(shingleSize))
        .localCheckpoint(true)
      fresh.write.mode("overwrite").parquet(p.toString)
    }
    parts.length
  }

  /** GRADUATE a [[streamingNearDup]] store to the bucketed catalog band
    * table [[graft.ops.Dedup.writeBandTable]] maintains — the
    * "long-lived pipeline" migration the batch path's Scaladoc promises:
    * the per-batch store and the catalog table are the SAME standing
    * band representation in two layouts (per-`batch=` parquet partitions
    * probed via a posexplode of stored `bh` arrays vs a (band, bandHash)
    * bucketed table probed corpus-side exchange-free), and this writes
    * the latter FROM the former. Stored band arrays are reused verbatim
    * — no MinHash pass over the corpus text; only null-`bh` legacy rows
    * (the schema-merged mixed-store case) pay the kernel once, under the
    * config read from the store's own columns. A store with NO signature
    * layout records no config at all — run [[rebandStore]] to the target
    * config first. A mixed-config store (possible only by hand-editing
    * partitions; the batch path fail-fasts before creating one) is
    * refused rather than silently written as a table that never
    * collides.
    *
    * After graduation the ingest loop becomes the batch-side recipe:
    * probe `spark.table(table)` with
    * [[graft.ops.Dedup.nearDupIncrementIndexed]] (the store stays the
    * corpus TEXT side) and fold each kept batch in with
    * `writeBandTable(append = true)`. Returns the `(numHashes, bands,
    * shingleSize)` config the table was written under, for those
    * subsequent probes.
    */
  def graduateNearDupStore(spark: SparkSession, corpusDir: String,
      textCol: String, idCol: String, table: String,
      numBuckets: Int = 256): (Int, Int, Int) = {
    val store = spark.read.parquet(corpusDir)
    require(store.columns.contains("bh") && store.columns.contains("numhashes"),
      "graduateNearDupStore: store has no signature layout (bh/config " +
        "columns) and so no recorded band config — rebandStore it to the " +
        "target config first")
    val configs = store
      .select(col("numhashes"), col("bands"), col("shinglesize"))
      .where(col("numhashes").isNotNull).distinct().collect()
    require(configs.length == 1,
      s"graduateNearDupStore: store holds ${configs.length} band configs — " +
        "rebandStore it to one config before graduating")
    val (nh, bd, ss) =
      (configs(0).getInt(0), configs(0).getInt(1), configs(0).getInt(2))
    val stored = store.where(col("bh").isNotNull)
      .select(col(idCol).as("id"),
        posexplode(col("bh")).as(Seq("band", "bandHash")))
      .withColumn("numhashes", lit(nh))
      .withColumn("bands", lit(bd))
      .withColumn("shinglesize", lit(ss))
    val legacy = graft.ops.Dedup.bandIndex(
      store.where(col("bh").isNull).select(col(idCol), col(textCol)),
      textCol, idCol, nh, bd, ss)
    // graduation rewrites the WHOLE standing representation, so the
    // write-time group sizes are exact over the union — same `bandn`
    // contract as writeBandTable's overwrite (probe-side fast maxBucket
    // path; later folds append null bandn, which disables it until a
    // rebuild)
    graft.sinks.Sinks.parquetBucketed(
      stored.unionByName(legacy).withColumn("bandn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bandHash")))),
      table, Seq("band", "bandHash"), numBuckets, mode = "overwrite")
    (nh, bd, ss)
  }

  /** Event-time windowed aggregation with watermark — the standard
    * streaming analytics shape over an events stream.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Stream-stream interval join: enrich a fact stream with a second
    * stream (e.g. click events joined to the impressions that caused
    * them) within `joinWindow` of event time. Both sides carry
    * watermarks so Spark can bound the join state and evict rows whose
    * match window has passed — the canonical Structured Streaming
    * stream-stream equi-join with a time-bound condition. Also works on
    * batch frames (the time condition is just a predicate there).
    *
    * Columns from `right` are prefixed `<rightPrefix>` to avoid
    * collisions; the join key columns keep the left names.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      joinWindow: String = "15 minutes", watermark: String = "30 minutes",
      rightPrefix: String = "r_"): DataFrame = {
    val l = (if (left.isStreaming) left.withWatermark(leftTsCol, watermark) else left)
    val r0 = (if (right.isStreaming) right.withWatermark(rightTsCol, watermark) else right)
    val r = r0.columns.foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"$rightPrefix$c"))
    l.join(r,
      col(keyCol) === col(s"$rightPrefix$keyCol") &&
        col(s"$rightPrefix$rightTsCol") >= col(leftTsCol) - expr(s"INTERVAL $joinWindow") &&
        col(s"$rightPrefix$rightTsCol") <= col(leftTsCol) + expr(s"INTERVAL $joinWindow"))
  }

  // --- custom state: sessionization ------------------------------------

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: java.sql.Timestamp, lastSeen: java.sql.Timestamp,
      n: Int, total: Double)
  final case class Session(user_id: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp, n_events: Int, total_value: Double)

  /** Epoch micros of a Timestamp — getTime() alone is millis and would
    * round gap comparisons on micro-precision event streams. */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Gap-based sessionization with `flatMapGroupsWithState` — the custom
    * per-key state shape Structured Streaming supports and plain windowing
    * can't express (session end depends on the NEXT event's timestamp).
    * A session closes after `gapMs` of user inactivity (state timeout in a
    * live stream; end-of-group in batch mode, where Spark feeds all events
    * of a key to one call — both paths covered).
    *
    * State per key is O(1) (no event buffering), so the operator's memory
    * is bounded by the number of ACTIVE users, not traffic.
    */
  def sessionize(events: org.apache.spark.sql.Dataset[Event], gapMs: Long = 30 * 60 * 1000L):
      org.apache.spark.sql.Dataset[Session] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val isStream = events.isStreaming // capture the Boolean, not the Dataset

    val gapUs = gapMs * 1000L
    def fn(userId: Long, it: Iterator[Event], state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var st = state.getOption.orNull
      it.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
        st match {
          case null =>
            st = SessionState(e.ts, e.ts, 1, e.value)
          case s if micros(e.ts) - micros(s.lastSeen) > gapUs =>
            out += Session(userId, s.start, s.lastSeen, s.n, s.total)
            st = SessionState(e.ts, e.ts, 1, e.value)
          case s =>
            st = s.copy(lastSeen = e.ts, n = s.n + 1, total = s.total + e.value)
        }
      }
      if (state.hasTimedOut || !isStream) {
        // close the open session (timeout in streaming; end-of-input in batch)
        if (st != null) {
          out += Session(userId, st.start, st.lastSeen, st.n, st.total)
          state.remove()
          st = null
        }
      }
      if (st != null) {
        state.update(st)
        if (isStream)
          state.setTimeoutTimestamp(st.lastSeen.getTime + gapMs)
      }
      out.iterator
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
