package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.DsirHash

/** DSIR-style data selection: importance resampling on hashed n-gram
  * features (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling" — re-expressed from the paper's prose, not
  * any codebase). Fit a bag-of-hashed-ngram generative model on a
  * trusted TARGET corpus and on the RAW web corpus; each raw document's
  * importance weight is `log p_target(doc) - log p_raw(doc)`, a sum of
  * per-bucket log-ratios over the document's unigram+bigram features;
  * select by weight (deterministic top-k) or Gumbel-top-k resample
  * (the paper's sampling-without-replacement form).
  *
  * EXACTNESS DESIGN (the Classify/x76 "oracle the model" pattern):
  * bucket log-ratios are QUANTIZED to integer micro-nats
  * (`floor(1e6 * (ln a - ln b) + 0.5)`), so a document's weight is an
  * exact INTEGER sum — partition-order-free and bit-identical in any
  * SQL engine. Every count feeding the weights (per-bucket gram counts,
  * corpus gram totals) is an exact integer, and the feature space
  * itself is the engine-portable md5 bucket of [[DsirHash]], so the
  * x85 oracle replays the WHOLE pipeline — features, fit, weights,
  * scores, selection — in SQL.
  *
  * Scale shape at 100 TB: fitting is two map-side-combined
  * explode→groupBy passes that each reduce a corpus to `numBuckets`
  * rows (fixed-width, tiny shuffle); scoring is MAP-ONLY — the weight
  * table is a dense `Array[Long]` of length `numBuckets` broadcast to
  * executors, and [[DsirHash.score]] folds each document to one
  * (id, long) pair at scan speed. Corpus text never shuffles; the only
  * post-scan movement is the top-k (`TakeOrdered`, k-bounded).
  */
object Dsir {

  /** Fitted model: `buckets` = (bucket, c_target, c_raw, w_micro) over
    * every bucket observed in EITHER corpus; `defaultMicro` the weight
    * of a bucket seen in neither (same smoothed spelling with zero
    * counts) — only reachable when scoring documents outside both
    * fitted corpora; totals kept for audit/replay.
    *
    * The dense weight table and its broadcast are cached ON the model
    * (computed on first [[score]]): [[fit]] materializes the per-corpus
    * histograms, so collecting `buckets` is a join of two bucket-sized
    * frames, and a daily loop that scores many batches against one model
    * pays the collect and the broadcast exactly once instead of
    * re-running both corpus aggregations and leaking one broadcast per
    * `score` call (the r20 ADVICE finding). */
  final case class DsirModel(buckets: DataFrame, nTargetGrams: Long,
      nRawGrams: Long, numBuckets: Int, defaultMicro: Long) {
    /** Dense executor-side weight table (length numBuckets, unseen →
      * defaultMicro). Bounded driver collect: ≤ numBuckets ≤ 2^24 rows,
      * filled from a projected iterator so no Array[Row] of generic rows
      * is retained. Computed once per model. */
    private[graft] lazy val weights: Array[Long] = {
      val arr = Array.fill(numBuckets)(defaultMicro)
      val it = buckets.select(col("bucket").cast(LongType),
        col("w_micro").cast(LongType)).toLocalIterator()
      while (it.hasNext) {
        val r = it.next()
        arr(r.getLong(0).toInt) = r.getLong(1)
      }
      arr
    }
    /** One broadcast of [[weights]] per model, shared by every
      * [[score]]/[[select]]/[[resample]] call. */
    private[graft] lazy val weightsBc
        : org.apache.spark.broadcast.Broadcast[Array[Long]] =
      buckets.sparkSession.sparkContext.broadcast(weights)
  }

  /** Per-corpus hashed-feature histogram: (bucket, c) with c the total
    * gram count (multiplicity, not presence — DSIR models counts). */
  def featureCounts(docs: DataFrame, textCol: String,
      numBuckets: Int): DataFrame = {
    val grams = udf((t: String) => DsirHash.gramBuckets(t, numBuckets))
    docs.select(explode(grams(col(textCol))).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
  }

  /** Quantized smoothed log-ratio — the ONE spelling (Laplace over the
    * bucket space: `(c+1)/(n+numBuckets)` per side), kept identical in
    * the Spark expression, the driver default, and the x85 oracle. */
  private def wMicro(cT: Column, cR: Column, nT: Long, nR: Long,
      k: Int): Column =
    floor((log((cT + 1L) / lit(nT + k.toDouble)) -
      log((cR + 1L) / lit(nR + k.toDouble))) * 1e6 + 0.5).cast(LongType)

  /** Fit on a raw corpus and a trusted target corpus. `numBuckets` is
    * the hashed feature-space size (the paper uses 10k; anything up to
    * ~2^24 keeps the broadcast weight array small). */
  def fit(raw: DataFrame, target: DataFrame, textCol: String,
      numBuckets: Int = 4096): DsirModel = {
    require(numBuckets > 0 && numBuckets <= (1 << 24),
      s"numBuckets must be in [1, 2^24], got $numBuckets")
    // materialize each histogram ONCE (≤ numBuckets fixed-width rows —
    // the streaming-NbModel discipline): the totals aggregation below,
    // the buckets join, and every later weight collect all read these
    // blocks instead of re-running the full-corpus explode→groupBy per
    // consumer (pre-r21 the fit totals + one score paid each corpus
    // aggregation TWICE — measured ~2× the whole fit+score cost on b22)
    val cT = featureCounts(target, textCol, numBuckets)
      .withColumnRenamed("c", "c_target").localCheckpoint(true)
    val cR = featureCounts(raw, textCol, numBuckets)
      .withColumnRenamed("c", "c_raw").localCheckpoint(true)
    val nT = cT.agg(coalesce(sum("c_target"), lit(0L))).head().getLong(0)
    val nR = cR.agg(coalesce(sum("c_raw"), lit(0L))).head().getLong(0)
    require(nT > 0 && nR > 0,
      s"fit: both corpora need at least one token (target=$nT raw=$nR grams)")
    // FULL outer: a bucket observed only in the target corpus must keep
    // its target-informed weight — left-joining on raw would silently
    // hand exactly the most target-characteristic grams the
    // neither-corpus defaultMicro when scoring documents OUTSIDE the
    // fitted raw corpus (the day-2 batch case), underscoring them by
    // ~ln(c_target+1) micro-nats per occurrence
    val buckets = cR.join(cT, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("c_target"), lit(0L)).as("c_target"),
        coalesce(col("c_raw"), lit(0L)).as("c_raw"),
        wMicro(coalesce(col("c_target"), lit(0L)),
          coalesce(col("c_raw"), lit(0L)), nT, nR,
          numBuckets).as("w_micro"))
    val default = math.floor((math.log(1.0 / (nT + numBuckets.toDouble)) -
      math.log(1.0 / (nR + numBuckets.toDouble))) * 1e6 + 0.5).toLong
    DsirModel(buckets, nT, nR, numBuckets, default)
  }

  /** Score documents: (idCol, n_grams, logw_micro) — `logw_micro =
    * Σ w_micro(bucket(gram))` over the document's grams, an exact long
    * sum; gram-less documents score 0. Map-only (the model's cached
    * broadcast weights + compiled kernel); no shuffle beyond whatever
    * the caller does with the result. */
  def score(docs: DataFrame, textCol: String, idCol: String,
      model: DsirModel): DataFrame = {
    val bc = model.weightsBc
    val k = udf((t: String) => {
      val (n, s) = DsirHash.score(t, bc.value)
      (n, s)
    })
    docs.withColumn("__ds", k(col(textCol)))
      .select(col(idCol), col("__ds._1").cast(LongType).as("n_grams"),
        col("__ds._2").as("logw_micro"))
  }

  /** Deterministic selection: the k highest-weight documents
    * (ties → lower id first) — `TakeOrdered`, never a single-partition
    * global sort. The greedy "top importance weight" variant. */
  def select(docs: DataFrame, textCol: String, idCol: String,
      model: DsirModel, k: Int): DataFrame =
    score(docs, textCol, idCol, model)
      .orderBy(col("logw_micro").desc, col(idCol).asc).limit(k)

  /** Gumbel-top-k importance RESAMPLING — the paper's
    * sample-without-replacement form: perturb each document's
    * log-weight with deterministic Gumbel noise
    * `-ln(-ln(u))`, `u = (hashLong(id, salt) + 0.5) / 2^60` (the
    * [[Sampling]] md5-uniform, shifted off the 0/1 endpoints so the
    * noise is finite), and take the k largest perturbed keys. Stable
    * across runs/partitionings/cluster sizes; a different `salt` draws
    * an independent sample. The perturbed key is a double, so this
    * form is spec-pinned rather than SQL-oracled (libm ulp differences
    * could flip near-ties across engines); the integer-exact
    * [[score]]/[[select]] path is the oracle surface. */
  def resample(docs: DataFrame, textCol: String, idCol: String,
      model: DsirModel, k: Int, salt: String = "dsir"): DataFrame = {
    val u = (Sampling.hashLong(col(idCol), salt).cast(DoubleType) +
      lit(0.5)) / lit(math.pow(2, 60))
    score(docs, textCol, idCol, model)
      .withColumn("__key",
        col("logw_micro").cast(DoubleType) / lit(1e6) - log(-log(u)))
      .orderBy(col("__key").desc, col(idCol).asc).limit(k)
      .drop("__key")
  }
}
