package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TopK

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a production pipeline needs both:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline and
  *     the right choice when the query set is small (broadcast queries ×
  *     scan corpus; no shuffle of the corpus at all).
  *   - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path. The
  *     corpus is bucketed once (deterministic signs, seeded hashes), queries
  *     probe only their own bucket: the join is an equi-join on the bucket
  *     key instead of a cross product.
  *
  * Scoring and bucketing expose expression forms ([[cosine]],
  * [[hyperplaneSignature]]) for composability, but the hot paths run
  * compiled kernels: higher-order functions are CodegenFallback —
  * interpreted per element — and pair scoring multiplies that by
  * |corpus|×|queries| while bucketing runs once per corpus row. The
  * kernels are raw-bit-identical to the expression forms (pinned by the
  * kernel-parity spec), so either path yields the same scores. No MLlib
  * model state anywhere — signatures and centroids are plain data.
  */
object Similarity {

  /** Rank a `(query_id, neighbor_id, score)` frame down to the top `k`
    * rows per query by (score desc, neighbor_id asc), appending `rank`.
    *
    * ALWAYS the bounded-aggregation path — never a `row_number` window:
    * a k-bounded typed aggregate ([[graft.functions.TopKAgg]] for
    * integral ids, [[graft.functions.TopKBinAgg]] for string/binary
    * ids carried as UTF-8 bytes) runs map-side first, so only ~k rows
    * per (query, partition) reach the exchange — the scored frame
    * itself (|corpus|×|queries| rows in the brute-force case) never
    * shuffles. Both aggregators reproduce Spark's own
    * `orderBy(score.desc, id)` total order exactly: scores through
    * `java.lang.Double.compare` (NaN above all finite, -0.0 < 0.0),
    * string ids through unsigned lexicographic UTF-8 bytes
    * (UTF8_BINARY). Other id types (decimal, date, …) raise — no
    * caller can silently fall into a window plan that shuffles every
    * scored row.
    *
    * Null `score` or `neighbor_id` rows are filtered out first: a null
    * score is "no similarity" and a null id is unrankable. (The old
    * window form ordered them nulls-last, so they could only ever
    * surface when a query had fewer than k real candidates.)
    */
  private def rankTopK(scored: DataFrame, k: Int, idType: DataType): DataFrame = {
    val nn = scored.where(col("score").isNotNull && col("neighbor_id").isNotNull)
    def unpack(grouped: DataFrame): DataFrame =
      grouped.select(col("query_id"), posexplode(col("top")).as(Seq("r0", "t")))
        .select(col("query_id"), col("t.id").cast(idType).as("neighbor_id"),
          col("t.score").as("score"), (col("r0") + 1).as("rank"))
    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val agg = TopK.topK(k)
        unpack(nn.groupBy("query_id")
          .agg(agg(col("score"), col("neighbor_id").cast(LongType)).as("top")))
      case StringType | BinaryType =>
        val agg = TopK.topKBin(k)
        unpack(nn.groupBy("query_id")
          .agg(agg(col("score"), col("neighbor_id").cast(BinaryType)).as("top")))
      case other =>
        throw new IllegalArgumentException(
          s"top-k id column must be integral, string, or binary; got $other")
    }
  }

  /** Cosine similarity between two array<float/double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot  = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na   = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb   = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Compiled cosine kernels for the pair-scoring hot paths — the
    * TextHash-style exception to the expressions-first rule. The
    * higher-order form ([[cosine]]) is interpreted (`ArrayAggregate` is
    * a CodegenFallback: the lambda evaluates per element through the
    * expression interpreter), and the candidate join evaluates it per
    * PAIR — the one place in the engine where interpretation multiplies
    * by |corpus|×|queries|. The 10× scale curve measured the difference.
    *
    * Bit-compatibility: each kernel runs the exact IEEE operation
    * sequence of the expression tree on the same element type — products
    * and squares computed in the ELEMENT type then widened to double
    * (that is what `x * y` on float columns followed by the double
    * accumulator does), left-to-right accumulation, then
    * `dot / (sqrt(na) * sqrt(nb))` — so scores are bit-identical to
    * [[cosine]] and the DuckDB oracles (x9/x10/x11/x18) are unaffected.
    * Length-mismatched pairs score null, matching `zip_with`'s null
    * padding through the sum. Null vector elements (a corrupt embedding)
    * are a documented precondition violation here: the expression form
    * nulls the score, the kernels throw.
    *
    * Marked nondeterministic ONLY as an evaluation barrier (the kernels
    * are pure): [[rankTopK]]'s null filter otherwise pushes through the
    * scoring projection into the join condition, and every candidate
    * pair pays the kernel twice — once in the condition, once in the
    * surviving row's projection.
    */
  /** The ONE float cosine loop every float-scoring path shares (UDF
    * kernels AND the batched closures), so the raw-bit parity spec pins
    * them all at once. First argument's products accumulate `na` —
    * callers pass the QUERY side first, matching `cosine(qv, cv)`.
    */
  private[graft] def cosineArrF(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += (a(i) * b(i)).toDouble
      na += (a(i) * a(i)).toDouble
      nb += (b(i) * b(i)).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Double twin of [[cosineArrF]]. */
  private[graft] def cosineArrD(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i) * b(i)
      na += a(i) * a(i)
      nb += b(i) * b(i)
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private[graft] val cosineKernelF = udf { (a: Seq[Float], b: Seq[Float]) =>
    if (a == null || b == null || a.length != b.length) Option.empty[Double]
    else Some(cosineArrF(a.toArray, b.toArray))
  }.asNondeterministic()

  private[graft] val cosineKernelD = udf { (a: Seq[Double], b: Seq[Double]) =>
    if (a == null || b == null || a.length != b.length) Option.empty[Double]
    else Some(cosineArrD(a.toArray, b.toArray))
  }.asNondeterministic()

  /** The scoring column for a candidate pair: compiled kernel when the
    * element type has one, [[cosine]] expression otherwise.
    */
  private def cosineFast(vecType: DataType): (Column, Column) => Column = vecType match {
    case ArrayType(FloatType, _)  => cosineKernelF(_, _)
    case ArrayType(DoubleType, _) => cosineKernelD(_, _)
    case _                        => cosine(_, _)
  }

  /** Hyperplane weights for the signature kernels, cached per
    * (nBits, dims): weight(i)(j) is exactly the expression form's
    * `xxhash64(j, i) / Long.MaxValue` (seed 42, ints hashed through
    * Spark's own XXH64) — the weights depend only on the position pair,
    * never the row, so the expression's two-hashes-per-element-per-bit-
    * per-ROW evaluation collapses to a lookup.
    */
  private object HyperplaneWeights {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()
    def apply(nBits: Int, dims: Int): Array[Array[Double]] =
      cache.computeIfAbsent((nBits, dims), { key =>
        val (b, d) = key
        Array.tabulate(d, b) { (i, j) =>
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashInt(i, org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(j, 42L))
          h.toDouble / Long.MaxValue.toDouble
        }
      })
  }

  /** Compiled [[hyperplaneSignature]] kernels — same rationale and same
    * bit-compatibility contract as the cosine kernels above: the
    * expression form is a doubly-nested interpreted higher-order
    * function (dims × nBits lambda evaluations per row, each with two
    * xxhash64 expression evals), and it runs once per CORPUS row — the
    * linear scan that dominates LSH bucketing at 100 TB. The kernels
    * accumulate per bit in the same element order with the same
    * element-type→double widening, so signatures are bit-identical
    * (pinned by the kernel-parity spec). Deterministic — signatures
    * feed join keys and window partitions, where a nondeterministic
    * marker would be illegal; no filter pushes through these
    * projections, so no evaluation barrier is needed.
    */
  private[graft] def hyperplaneKernelF(nBits: Int) = udf { (v: Seq[Float]) =>
    if (v == null) Option.empty[Long]
    // expression-form parity for dims = 0: sequence(0, dims-1) counts DOWN
    // to -1, zip_with null-pads, the accumulator null-poisons, and every
    // bit falls to the otherwise(0L) branch — signature 0L, not all-ones
    else if (v.isEmpty) Some(0L)
    else {
      val x = v.toArray
      val w = HyperplaneWeights(nBits, x.length)
      val s = new Array[Double](nBits)
      var i = 0
      while (i < x.length) {
        val vi = x(i).toDouble
        val wi = w(i)
        var j = 0
        while (j < nBits) { s(j) += vi * wi(j); j += 1 }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < nBits) { if (s(j) >= 0) sig |= (1L << j); j += 1 }
      Some(sig)
    }
  }

  private[graft] def hyperplaneKernelD(nBits: Int) = udf { (v: Seq[Double]) =>
    if (v == null) Option.empty[Long]
    else if (v.isEmpty) Some(0L) // dims = 0 parity, see float twin
    else {
      val x = v.toArray
      val w = HyperplaneWeights(nBits, x.length)
      val s = new Array[Double](nBits)
      var i = 0
      while (i < x.length) {
        val vi = x(i)
        val wi = w(i)
        var j = 0
        while (j < nBits) { s(j) += vi * wi(j); j += 1 }
        i += 1
      }
      var sig = 0L
      var j = 0
      while (j < nBits) { if (s(j) >= 0) sig |= (1L << j); j += 1 }
      Some(sig)
    }
  }

  /** The bucketing column: compiled kernel when the element type has
    * one, [[hyperplaneSignature]] expression otherwise.
    */
  private def hyperplaneFast(vecType: DataType, nBits: Int): Column => Column = vecType match {
    case ArrayType(FloatType, _)  => hyperplaneKernelF(nBits)(_)
    case ArrayType(DoubleType, _) => hyperplaneKernelD(nBits)(_)
    case _                        => hyperplaneSignature(_, nBits)
  }

  /** L2-normalize `vecCol` into `outCol` (elements cast to double so
    * results are engine-identical IEEE arithmetic). Zero vectors come
    * back as zeros instead of NaN. Two stacked projections — still a
    * pure scan over 100 TB of embeddings.
    *
    * The norm is a SEPARATE projected column on purpose: an aggregate
    * embedded inside the element lambda is re-evaluated per element
    * (O(d²) per row — ~400× slower at 768 dims). The hoisted column is
    * referenced twice in the lambda, which also keeps CollapseProject
    * from inlining it back in (it only inlines single-reference
    * expensive expressions).
    */
  def l2Normalize(df: DataFrame, vecCol: String,
      outCol: String = "normalized"): DataFrame = {
    require(!df.columns.contains("__norm"), "column name __norm is reserved")
    val norm = sqrt(aggregate(col(vecCol), lit(0.0d),
      (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
    df.withColumn("__norm", norm)
      .withColumn(outCol, transform(col(vecCol), x =>
        when(col("__norm") === 0.0d, lit(0.0d))
          .otherwise(x.cast(DoubleType) / col("__norm"))))
      .drop("__norm")
  }

  /** Symmetric int8 quantization for embedding storage: per-vector
    * scale = 127 / max|x| into `scaleCol`, q_i = floor(x_i * scale + 0.5)
    * into `qCol`. Shrinks an fp32 embedding column 4× before it lands in
    * parquet — at 100 TB of vectors that is the difference between one
    * storage tier and the next. Dequantize as q / scale.
    *
    * floor(x + 0.5) instead of round(): round-half-up vs banker's
    * rounding differs across engines, while floor over IEEE doubles is
    * bit-identical everywhere — the quantized bytes are reproducible by
    * any SQL engine (and oracle-checkable). Zero vectors quantize to
    * zeros with scale 0. Like [[l2Normalize]], the scale is hoisted into
    * its own projection so the max-abs aggregate runs once per row, not
    * once per element.
    */
  def quantizeInt8(df: DataFrame, vecCol: String,
      qCol: String = "q", scaleCol: String = "scale"): DataFrame = {
    val maxAbs = aggregate(col(vecCol), lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast(DoubleType))))
    df.withColumn(scaleCol,
        when(maxAbs === 0.0d, lit(0.0d)).otherwise(lit(127.0d) / maxAbs))
      // the zero-scale branch keeps a SECOND lambda reference to the
      // scale column, so CollapseProject never inlines the max-abs
      // aggregate back into the per-element lambda even if a caller
      // projects the scale column away
      .withColumn(qCol, transform(col(vecCol), x =>
        when(col(scaleCol) === 0.0d, lit(0))
          .otherwise(floor(x.cast(DoubleType) * col(scaleCol) + lit(0.5d))
            .cast(IntegerType))))
  }

  /** Collect the query batch for a batched scoring path with a hard cap:
    * count first (one fully-parallel job over the query lineage), raise
    * an actionable error if the count exceeds the cap, then collect.
    * Count-then-collect beats the earlier `limit(cap + 1).collect()`
    * spelling at scale: CollectLimit's ramp-up re-executes the
    * query-side lineage in up to log₄(P) SEQUENTIAL partial jobs when
    * rows < cap (the normal case), where count + collect are two
    * parallel jobs. The batched paths always assumed a driver-boundable
    * query set (it broadcasts either way); this turns a silent driver
    * OOM on a violated assumption into an actionable error before
    * anything materializes.
    */
  private def collectQueryBatch(q: DataFrame, cap: Int,
      op: String): Array[org.apache.spark.sql.Row] = {
    require(cap >= 1, s"need maxQueryBatch >= 1, got $cap")
    val n = q.count()
    if (n > cap) throw new IllegalArgumentException(
      s"$op: query batch has $n rows, exceeding maxQueryBatch = $cap. The " +
        "batched scoring path materializes the query set on the driver and " +
        "broadcasts it; split the query set into smaller batches or " +
        "raise maxQueryBatch if the driver has the headroom.")
    q.collect()
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast — the corpus is
    * scanned once, never shuffled); `corpus` can be arbitrarily large.
    * Excludes self-matches when ids collide.
    *
    * The |corpus|×|queries| scored rows are reduced by a per-partition
    * bounded top-k BEFORE any exchange (see [[rankTopK]]) — only
    * k×partitions rows per query are ever in flight, so the exact
    * baseline survives a 100× corpus as long as the query set stays
    * broadcastable.
    *
    * For integral ids with float/double vectors (the common case) the
    * scoring runs CORPUS-ROW-BATCHED: one compiled kernel call per
    * corpus row scores every broadcast query and emits the (query,
    * score) pairs for a single generate — measured ~10× over the
    * broadcast-nested-loop join at 6M×100, whose per-PAIR row
    * construction and per-call vector deserialization were ~98% of the
    * wall time (the 10× scale curve + thread dumps). Per-pair arithmetic
    * is the same kernel loop, so scores are bit-identical; the query
    * set materializes on the driver, which is the same boundedness
    * assumption the broadcast already made (ivfTrain's centroid collect
    * is the precedent). Other id types keep the join form.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10,
      maxQueryBatch: Int = 100000): DataFrame = {
    val idT = corpus.schema(idCol).dataType
    val vecT = corpus.schema(vecCol).dataType
    val integralId = idT match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val batched = integralId && (vecT match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (!batched) {
      val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
      val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineFast(vecT)(col("qv"), col("cv")).as("score"))
      rankTopK(scored, k, idT)
    } else {
      // join-form parity: queries with a null id never survive the
      // `query_id =!= neighbor_id` condition, and null vectors on EITHER
      // side score null and are filtered by rankTopK — drop both up
      // front (the corpus-side isNotNull pushes to the scan). Query
      // vectors CAST to the corpus element type: dispatch is by corpus
      // schema, so a mixed-precision query frame normalizes to the
      // corpus's precision instead of crashing the driver-side decode.
      val spark = corpus.sparkSession
      val qNN = queries
        .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol).cast(LongType), col(vecCol).cast(vecT))
      val qRaw = collectQueryBatch(qNN, maxQueryBatch, "bruteForceTopK")
      val scoreAll = vecT match {
        case ArrayType(FloatType, _) =>
          val qArr: Array[(Long, Array[Float])] =
            qRaw.map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          val bc = spark.sparkContext.broadcast(qArr)
          udf { (nid: Long, v: Seq[Float]) =>
            val x = v.toArray
            val qs = bc.value
            val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](qs.length)
            var qi = 0
            while (qi < qs.length) {
              val (qid, y) = qs(qi)
              if (qid != nid && y.length == x.length) out += ((qid, cosineArrF(y, x)))
              qi += 1
            }
            out.toSeq
          }
        case _ =>
          val qArr: Array[(Long, Array[Double])] =
            qRaw.map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
          val bc = spark.sparkContext.broadcast(qArr)
          udf { (nid: Long, v: Seq[Double]) =>
            val x = v.toArray
            val qs = bc.value
            val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](qs.length)
            var qi = 0
            while (qi < qs.length) {
              val (qid, y) = qs(qi)
              if (qid != nid && y.length == x.length) out += ((qid, cosineArrD(y, x)))
              qi += 1
            }
            out.toSeq
          }
      }
      val scored = corpus
        .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol).cast(LongType).as("neighbor_id"), col(vecCol).as("cv"))
        .select(col("neighbor_id"),
          explode(scoreAll(col("neighbor_id"), col("cv"))).as("t"))
        .select(col("t._1").cast(idT).as("query_id"), col("neighbor_id"),
          col("t._2").as("score"))
      rankTopK(scored, k, idT)
    }
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits, hyperplane j's
    * i-th coordinate derived from xxhash64(j, i) mapped to [-1, 1] —
    * deterministic, identical on every executor, no model object to ship.
    *
    * Single pass over the vector: ONE `aggregate` whose accumulator is
    * the array of nBits running projections (each element updates all
    * nBits sums via `zip_with`), finished by packing the sign bits into
    * a long. The naive spelling — nBits separate array-aggregates OR'd
    * together — walks the vector nBits times (16 traversals of a
    * 768-dim array per row); this walks it once. Per-bit accumulation
    * order over i is unchanged (ascending element order), so the sums
    * and therefore the signatures are bit-identical to the multi-pass
    * form this replaced.
    */
  def hyperplaneSignature(vec: Column, nBits: Int = 16): Column = {
    val dims = size(vec)
    val jSeq = sequence(lit(0), lit(nBits - 1))
    val zipped = zip_with(vec, sequence(lit(0), dims - 1),
      (v, i) => struct(v.as("v"), i.as("i")))
    aggregate(
      zipped,
      array_repeat(lit(0.0d), nBits),
      (acc, x) => zip_with(acc, jSeq, (a, j) =>
        a + x.getField("v") *
          (xxhash64(j, x.getField("i")).cast(DoubleType) / lit(Long.MaxValue.toDouble))),
      acc => aggregate(
        zip_with(acc, jSeq, (s, j) =>
          when(s >= 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
        lit(0L), (a, b) => a.bitwiseOR(b)))
  }

  /** Approximate top-k: bucket corpus and queries by hyperplane signature,
    * equi-join on the bucket, rank within. `nBits` trades recall for
    * bucket size (2^nBits buckets). Multi-probe: also joins buckets at
    * Hamming distance 1 when `probe1 = true` to recover near-boundary
    * neighbors (standard multi-probe LSH).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nBits: Int = 12,
      probe1: Boolean = true): DataFrame =
    lshTopKProbed(corpus, queries, idCol, vecCol, k, nBits,
      probeDepth = if (probe1) 1 else 0)

  /** [[lshTopK]] with a configurable multi-probe DEPTH: the query also
    * joins every bucket within Hamming distance `probeDepth` of its own
    * signature (0 = exact bucket only, 1 = the classic nBits single-bit
    * flips, 2 = plus all C(nBits, 2) double flips). Depth is the recall
    * knob that makes raising nBits safe at scale: more bits shrink the
    * scanned corpus fraction per bucket (2^-nBits of the corpus each),
    * and a deeper probe set buys the recall back for a known candidate
    * budget — (1 + nBits + nBits(nBits-1)/2) buckets per query at depth
    * 2, still a vanishing corpus fraction (measured: AnnRecallSpec /
    * SCALE.md §ANN-recall — nBits=16 depth 2 beats nBits=12 depth 1 on
    * both recall AND candidate volume). The probe set is distinct by
    * construction (distinct bit patterns XORed into one signature), so
    * the no-dedup-shuffle argument of the depth-1 form still holds.
    */
  def lshTopKProbed(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nBits: Int = 16,
      probeDepth: Int = 2): DataFrame =
    lshSearchIndexed(lshIndex(corpus, idCol, vecCol, nBits), queries,
      idCol, vecCol, k, nBits, probeDepth)

  /** The LSH standing index: every corpus vector with its `nBits`-bit
    * hyperplane signature bucket — (id, vector, bucket), the frame to
    * persist. The signature kernel is the dominant corpus-side cost of
    * an LSH search (one compiled pass per row — 3.7 s at 6M on the 10×
    * curve), and it depends only on the corpus: build it once, write it
    * to parquet (optionally bucketed by `bucket` for a co-located probe
    * join), and search any number of query batches with
    * [[lshSearchIndexed]] — completing the train-once/search-many split
    * the IVF ([[ivfIndex]]) and PQ ([[pqEncode]]) families already
    * have. Searching `nBits` must match the index's — the index carries
    * it as the constant `nbits` column (free under parquet RLE) so
    * [[lshSearchIndexed]] can verify instead of silently probing the
    * wrong bucket space.
    */
  def lshIndex(corpus: DataFrame, idCol: String, vecCol: String,
      nBits: Int = 16): DataFrame = {
    val sig = hyperplaneFast(corpus.schema(vecCol).dataType, nBits)(col(vecCol))
    corpus.select(col(idCol), col(vecCol), sig.as("bucket"),
      lit(nBits).as("nbits"))
  }

  /** The LSH width the measured scale recipe prescribes for a corpus of
    * `rows` vectors: the smallest `nBits` whose expected bucket
    * occupancy (rows / 2^nBits) is at or under `targetOccupancy`.
    * Per-batch dedup/search cost tracks occupancy (SCALE.md §vstream:
    * a FIXED width grows corpus-linearly at 10×, the forecast width
    * stays flat at ratio 1.04), so size the width from the corpus
    * forecast instead of hard-coding a constant — and re-sign a store
    * that has outgrown its width
    * ([[graft.streaming.StreamingFlatten.resignCosineStore]]).
    * Floored at 12 (the recall tables' smallest measured dial) and
    * capped at 30 (keeps bucket longs and [[lshIndexWrite]]'s
    * prefix-partitioned directory counts sane). The default occupancy
    * of 16 preserves the recall/cost tables' 600k → 16-bit anchor.
    */
  def nBitsFor(rows: Long, targetOccupancy: Int = 16): Int = {
    require(rows >= 0 && targetOccupancy >= 1,
      s"need rows >= 0 and targetOccupancy >= 1, got $rows / $targetOccupancy")
    val needed = math.ceil(
      math.log(math.max(1.0, rows.toDouble / targetOccupancy)) / math.log(2)).toInt
    math.min(30, math.max(12, needed))
  }

  /** Write [[lshIndex]]'s frame laid out so [[lshSearchIndexed]]'s
    * probe-union predicate becomes SOURCE-level partition pruning: a
    * query batch reads only its probe buckets' partitions
    * (PartitionPruneSpec measures the scan-output rows at the probed
    * fraction).
    *
    * At `nBits` ≤ 12 the frame partitions directly by `bucket` (≤ 4096
    * directories — the historical layout, and what legacy stores on
    * disk already look like). Above 12 bits, one directory per bucket
    * would mean 2^nBits directories (65,536 at the 16-bit default —
    * hostile to object-store listings and driver file indexes), so the
    * store partitions by the bucket PREFIX `bucket >>> (nBits - 12)`
    * (≤ 4096 directories again) and keeps the full `bucket` as a data
    * column: partition pruning happens on the prefix (the search path
    * derives the probe prefixes from the probe buckets), and parquet
    * min/max stats on the sorted-within-partition `bucket` column
    * finish the job at row-group granularity. The shift is carried in
    * the constant `pfxshift` column (free under RLE, like `nbits`) so
    * the search side never guesses the layout.
    */
  def lshIndexWrite(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nBits: Int = 16, maxDirs: Int = 4096): Unit = {
    require(maxDirs >= 1 && (maxDirs & (maxDirs - 1)) == 0,
      s"maxDirs must be a power of two, got $maxDirs")
    val idx = lshIndex(corpus, idCol, vecCol, nBits)
    // every probed directory costs a file open at search time, so the
    // right dir count scales with the STORE, not the bucket space:
    // 4096 suits corpora whose per-dir slice is at least a few MB;
    // shrink maxDirs for smaller standing corpora (file-count overhead
    // dominates) — row-group/footer stats on the sorted `bucket`
    // column keep pruning effective at any dir granularity.
    val shift = math.max(0, nBits - java.lang.Integer.numberOfTrailingZeros(maxDirs))
    // repartition ON the partition column first: a partitionBy write
    // otherwise emits one file per (input task × directory) — 32 tasks
    // × 4096 dirs ≈ 131k tiny files, and a search then pays file
    // listing/open overhead instead of scanning (measured: 116 s for a
    // 100-query probe over a 600k store written without this, ~2 s
    // with it). One exchange at build time buys exactly one sorted
    // file per directory.
    if (shift == 0)
      idx.repartition(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    else
      idx.withColumn("pfxshift", lit(shift))
        .withColumn("bucket_pfx", shiftrightunsigned(col("bucket"), shift))
        .repartition(col("bucket_pfx"))
        .sortWithinPartitions(col("bucket"))
        .write.mode("overwrite").partitionBy("bucket_pfx").parquet(path)
  }

  /** All XOR masks within Hamming distance `probeDepth` of zero — the
    * multi-probe flip set every LSH probe path shares (0 = identity
    * only, 1 = the nBits single-bit flips, 2 = plus C(nBits, 2) double
    * flips). Distinct by construction, so probe-bucket sets derived by
    * XOR are duplicate-free.
    */
  private def hammingMasks(nBits: Int, probeDepth: Int): Seq[Long] = {
    require(probeDepth >= 0 && probeDepth <= 2,
      s"probeDepth must be 0, 1, or 2, got $probeDepth")
    val single = (0 until nBits).map(i => 1L << i)
    val double = for {
      i <- 0 until nBits; j <- (i + 1) until nBits
    } yield (1L << i) | (1L << j)
    probeDepth match {
      case 0 => Seq(0L)
      case 1 => 0L +: single
      case _ => (0L +: single) ++ double
    }
  }

  /** Multi-probe ANN search over a prebuilt [[lshIndex]] frame — the
    * query side of [[lshTopKProbed]], identical candidates and scores
    * (the one-shot form delegates here; the parquet round-trip is
    * pinned by spec).
    *
    * ASSUMES a DETERMINISTIC query lineage: the probe-bucket IN
    * pushdown collects the probe set from a separate execution of the
    * `queries` plan, so a non-deterministic frame (rand-derived,
    * sampled with Spark's split-dependent `sample`, a re-read mutable
    * source) can yield a collected set that diverges from the
    * join-side buckets and silently prunes true candidates.
    * `cache()`/`localCheckpoint()` such a frame first (every operator
    * in this library is hash-deterministic, so this only arises with
    * caller-supplied randomness). The same assumption applies to
    * [[semanticDedupIncrement]]'s `pruneCells` collect.
    */
  def lshSearchIndexed(index: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nBits: Int = 16,
      probeDepth: Int = 2, maxProbeFilter: Int = 65536): DataFrame = {
    require(probeDepth >= 0 && probeDepth <= 2,
      s"probeDepth must be 0, 1, or 2, got $probeDepth")
    val sig = hyperplaneFast(index.schema(vecCol).dataType, nBits)(col(vecCol))
    // a signature-width mismatch (index built at one nBits, searched at
    // another) probes the wrong bucket space and returns near-empty
    // results with no error — fail fast instead. The index carries its
    // width as the constant `nbits` column ([[lshIndex]]); the check is
    // a codegen'd per-row assert on a RLE constant, no extra action —
    // which also means it is LAZY: it fires only when an action scans at
    // least one index row, so an empty (or fully pruned) mismatched
    // index still returns empty results silently. Frames persisted
    // before the column existed pass through unchecked, and so do NULL
    // nbits values (e.g. a legacy frame unioned with a new one —
    // null-tolerance keeps the legacy half from failing the whole scan
    // with a misleading width error).
    val checked =
      if (index.columns.contains("nbits"))
        index.where(assert_true(
          col("nbits").isNull || col("nbits") === lit(nBits),
          lit(s"lshSearchIndexed: searching with nBits = $nBits but the " +
            "standing index was built with a different width (see the " +
            "index's nbits column) — rebuild the index or pass its nBits"))
          .isNull)
      else index
    def project(df: DataFrame): DataFrame =
      df.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        col("bucket"))
    val qSig = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"), sig.as("qsig"))
    // flip masks are a tiny compile-time-constant set (≤ 1 + nBits +
    // nBits(nBits-1)/2 longs) shared by every row — build them once on
    // the driver as a literal array instead of nested sequence lambdas
    val masks: Seq[Long] = hammingMasks(nBits, probeDepth)
    val probes =
      if (probeDepth == 0) qSig.withColumn("bucket", col("qsig"))
      else qSig.select(col("query_id"), col("qv"),
        explode(transform(array(masks.map(lit): _*),
          m => col("qsig").bitwiseXOR(m))).as("bucket"))
    // probe-union predicate for SOURCE-level pruning, the ivfSearchIndexed
    // pattern brought to LSH: the distinct probe buckets are collected
    // driver-side (one extra job over the QUERY lineage — the small side
    // by assumption) and pushed as an IN filter on the index scan, so a
    // bucket-partitioned standing index ([[lshIndexWrite]]) reads only
    // the probed partitions and even an unpartitioned scan short-circuits
    // rows before the join. Skipped when the probe set exceeds
    // `maxProbeFilter` (capped via limit-collect so the driver never
    // materializes an unbounded set). The default covers the full
    // 16-bit bucket space (65,536 longs ≈ 512 KB driver-side; Catalyst
    // turns the IN into an O(1)-lookup InSet) — the r15 depth-2 default
    // probes 137 buckets per query, so a 4096 cap would have silently
    // disabled pruning past ~30 queries; when the probe union saturates
    // the bucket space anyway, pruning is a no-op either way.
    val probeSet: Option[Array[Long]] = {
      // null buckets (null query vectors) never equi-join — exclude them
      // from the IN list instead of tripping the primitive getter
      val got = probes.select(col("bucket")).where(col("bucket").isNotNull)
        .distinct().limit(maxProbeFilter + 1).collect().map(_.getLong(0))
      if (got.length > maxProbeFilter) None else Some(got)
    }
    val cPruned = probeSet match {
      case Some(bs) =>
        // the IN filter can remove EVERY row of a mismatched-width index
        // before the lazy per-row width assert sees one — exactly the
        // silently-empty failure the guard exists to kill. When pruning
        // applies, check the width EAGERLY off one index row first (one
        // tiny job; on a bucket-partitioned store this reads a single
        // row group). The per-row assert stays as belt and braces.
        // The same one-row read recovers `pfxshift` when the store is
        // prefix-partitioned ([[lshIndexWrite]] above 12 bits), so the
        // probe set can also prune on the PARTITION column bucket_pfx —
        // the bucket IN filter alone would only hit row-group stats.
        val hasPfx = index.columns.contains("bucket_pfx") &&
          index.columns.contains("pfxshift")
        var shift: Option[Int] = None
        if (index.columns.contains("nbits")) {
          val sel =
            if (hasPfx) Seq(col("nbits"), col("pfxshift")) else Seq(col("nbits"))
          val one = index.select(sel: _*).where(col("nbits").isNotNull)
            .limit(1).collect()
          if (one.nonEmpty && one(0).getInt(0) != nBits)
            throw new IllegalArgumentException(
              s"lshSearchIndexed: searching with nBits = $nBits but the " +
                "standing index was built with a different width " +
                s"(nBits = ${one(0).getInt(0)}) — rebuild the index or " +
                "pass its nBits")
          if (hasPfx && one.nonEmpty && !one(0).isNullAt(1))
            shift = Some(one(0).getInt(1))
        }
        val byBucket = checked.where(col("bucket").isin(bs.toIndexedSeq.map(Long.box): _*))
        project(shift match {
          case Some(s) =>
            val pfxs = bs.map(_ >>> s).distinct
            byBucket.where(col("bucket_pfx").isin(pfxs.toIndexedSeq.map(Long.box): _*))
          case None => byBucket
        })
      case None => project(checked)
    }
    // no distinct needed (same argument as ivfTopK below): each corpus row
    // lives in exactly one bucket — its own signature — and a query's probe
    // set (qsig XOR distinct masks) is a set of DISTINCT bucket values, so
    // a (query, neighbor) pair can match at most once. A distinct here
    // would full-shuffle every scored candidate row before rankTopK's
    // map-side bounded aggregate gets to reduce them.
    val scored = probes.join(cPruned, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineFast(index.schema(vecCol).dataType)(col("qv"), col("cv")).as("score"))
    rankTopK(scored, k, index.schema(idCol).dataType)
  }

  /** IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    * into `nlist` cells around deterministic centroids, then probe only
    * the `nprobe` nearest cells per query — the standard IVF-Flat
    * layout. Seeds are a deterministic pseudo-random corpus sample —
    * the nlist vectors with the smallest xxhash64(id), a distributed
    * top-k (TakeOrdered), never a global sort — refined by
    * `lloydPasses` Lloyd iterations (default 1): assign every corpus
    * vector to its nearest centroid, recompute each cell's mean. The
    * means are summed in DECIMAL, so the reduction is order-independent
    * and the refined centroids are bit-deterministic across runs,
    * partitionings, and cluster sizes — still no RNG and no trained
    * model object to version or ship; executors get the centroids as a
    * broadcast of nlist × dim floats.
    *
    * Scale shape: one pass assigns each corpus vector to its cell (the
    * shuffle key); queries explode to nprobe cells and equi-join on the
    * cell id, so the join is corpus-partition-local — no cross join, and
    * the scanned fraction is ≈ nprobe / nlist of the corpus. Each Lloyd
    * pass adds one corpus scan whose shuffle is (cell, pos, partial-sum)
    * rows — map-side partial aggregation reduces a partition to at most
    * nlist × dim rows regardless of its row count.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nlist: Int = 64,
      nprobe: Int = 8, lloydPasses: Int = 1): DataFrame = {
    val centroids = ivfTrain(corpus, idCol, vecCol, nlist, lloydPasses)
    ivfSearchIndexed(ivfIndex(corpus, idCol, vecCol, centroids), centroids,
      queries, idCol, vecCol, k, nprobe)
  }

  /** Compiled per-row kernel (TextHash-style exception): an argmin over
    * nlist centroids as an expression tree would inline nlist copies of
    * the vector pipeline.
    */
  /** The `m` nearest centroids for one vector, most-similar first — ONE
    * shared function so the executor-side UDF and the driver-side probe
    * assignment in the batched [[ivfSearchIndexed]] path compute
    * identical cells by construction. Array access, not Seq: the
    * deserialized Seq is a linked list at runtime, so indexing it inside
    * the distance loop is O(dim) per element — O(dim² × nlist) per row;
    * the 10× scale curve caught this as a crawl at 6M rows.
    */
  private def cellScore(cs: Array[Array[Float]], a: Array[Float], c: Int): Double = {
    val cv = cs(c)
    var dot = 0.0; var nv = 0.0; var nc = 0.0
    var i = 0
    val d = math.min(a.length, cv.length)
    while (i < d) { dot += a(i) * cv(i); nv += a(i) * a(i); nc += cv(i) * cv(i); i += 1 }
    -(dot / (math.sqrt(nv) * math.sqrt(nc) + 1e-30)) // ascending = most similar first
  }

  private def nearCells(cs: Array[Array[Float]], a: Array[Float], m: Int): Array[Int] = {
    if (cs.isEmpty) Array.emptyIntArray
    else if (m == 1) {
      // the index-assignment path (every corpus row, every Lloyd pass)
      // needs only the argmin — a linear scan, not an O(nlist log nlist)
      // sort of every cell's score. Strict `<` keeps the FIRST index on
      // ties, exactly the order the stable sortBy below yields.
      var best = 0
      var bestScore = cellScore(cs, a, 0)
      var c = 1
      while (c < cs.length) {
        val s = cellScore(cs, a, c)
        if (s < bestScore) { best = c; bestScore = s }
        c += 1
      }
      Array(best)
    } else {
      val scored = cs.indices.map(c => c -> cellScore(cs, a, c))
      scored.sortBy(_._2).take(m).map(_._1).toArray
    }
  }

  private def nearCellsUdf(bc: org.apache.spark.broadcast.Broadcast[Array[Array[Float]]]) =
    udf { (v: Seq[Float], m: Int) => nearCells(bc.value, v.toArray, m) }

  /** Train the IVF coarse quantizer: deterministic seeds (nlist
    * smallest-hash vectors, a distributed TakeOrdered) refined by
    * `lloydPasses` Lloyd iterations. Returned centroids are plain data —
    * persist them once and reuse across query batches instead of
    * re-training per call ([[ivfTopK]] composes train → index → search
    * for the one-shot form).
    */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 64, lloydPasses: Int = 1): Array[Array[Float]] = {
    require(lloydPasses >= 0, "lloydPasses must be >= 0")
    val spark = corpus.sparkSession
    var centroids: Array[Array[Float]] = corpus
      .select(col(idCol), col(vecCol).cast(ArrayType(FloatType)).as("v"))
      .orderBy(xxhash64(col(idCol)))
      .limit(nlist)
      .select("v").collect().map(_.getSeq[Float](0).toArray)
    var bc = spark.sparkContext.broadcast(centroids)

    for (_ <- 1 to lloydPasses) {
      val near = nearCellsUdf(bc)
      // nlist × dim rows to the driver — same order as the centroid
      // broadcast itself; empty cells keep their seed vector
      val means = corpus
        .select(col(vecCol).cast(ArrayType(FloatType)).as("v"))
        .withColumn("cell", element_at(near(col("v"), lit(1)), 1))
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(col("x").cast(DecimalType(38, 12))) / count(lit(1)))
          .cast(FloatType).as("m"))
        .collect()
      val byCell = means.groupBy(_.getInt(0))
      val seeds = centroids
      centroids = seeds.indices.map { cIdx =>
        byCell.get(cIdx) match {
          case Some(rows) =>
            // sized from max position, not row count: a ragged corpus
            // (vectors longer than the cell's mean coverage) must not
            // index past the array
            val dim = math.max(seeds(cIdx).length, rows.iterator.map(_.getInt(1)).max + 1)
            val arr = new Array[Float](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getFloat(2))
            arr
          case None => seeds(cIdx)
        }
      }.toArray
      val old = bc
      bc = spark.sparkContext.broadcast(centroids)
      old.destroy() // the pass's jobs have collected; the stale nlist×dim block is dead weight
    }
    val out = centroids
    bc.destroy()
    out
  }

  /** Assign every corpus vector its IVF cell — the persistable index
    * frame (id, vector, cell). Write it with [[ivfIndexWrite]] (or by
    * hand, partitioned/bucketed by `cell`, so a probe scans only its
    * cells) and search it repeatedly with [[ivfSearchIndexed]]; the
    * corpus is scanned once here instead of once per query batch.
    */
  def ivfIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    corpus.select(col(idCol),
      col(vecCol).cast(ArrayType(FloatType)).as(vecCol))
      .withColumn("cell", element_at(nearCellsUdf(bc)(col(vecCol), lit(1)), 1))
  }

  /** One sorted file per cell directory — repartitioning on the
    * partition column first is what keeps a partitioned store usable:
    * a plain `partitionBy` write emits one file per input-task ×
    * directory, and a search then pays file listing/open overhead
    * instead of scanning (SCALE.md §lsh-store-dirs: 116 s → 2 s on the
    * LSH store). Directory count = |cells| ≤ nlist, bounded by the
    * quantizer by construction.
    */
  private def writeCellPartitioned(idx: DataFrame, path: String): Unit =
    idx.repartition(col("cell"))
      .sortWithinPartitions(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Persist [[ivfIndex]] cell-partitioned with one sorted file per
    * cell directory — the layout under which [[ivfSearchIndexed]] /
    * [[semanticDedupIncrement]]'s probe-union predicate becomes
    * source-level partition pruning (PartitionPruneSpec). */
  def ivfIndexWrite(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], path: String): Unit =
    writeCellPartitioned(ivfIndex(corpus, idCol, vecCol, centroids), path)

  /** ANN search over a prebuilt [[ivfIndex]] frame: queries probe their
    * `nprobe` nearest cells, score only those cells' members, and rank
    * through the bounded map-side top-k. Same candidate set and
    * guarantees as [[ivfTopK]] — each corpus vector lives in exactly one
    * cell and a query's probe cells are distinct, so no dedup shuffle is
    * needed. The query batch materializes on the driver for the batched
    * scoring path (bounded like [[bruteForceTopK]]'s — the query set was
    * already assumed broadcastable); the index scan streams, 26.7 s →
    * 2.6 s measured at 6M×100 on the 10× curve.
    */
  def ivfSearchIndexed(index: DataFrame, centroids: Array[Array[Float]],
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, nprobe: Int = 8, maxQueryBatch: Int = 100000): DataFrame = {
    require(nprobe >= 1, s"need nprobe >= 1, got $nprobe")
    require(centroids.nonEmpty, "centroids must be non-empty")
    // clamp instead of require: ivfTrain returns min(nlist, corpus rows)
    // centroids, so a small corpus with the default nprobe must degrade
    // to probing every cell, not throw
    val probes = math.min(nprobe, centroids.length)
    val idT = index.schema(idCol).dataType
    val integralId = idT match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integralId) {
      // CELL-BATCHED scoring, the [[bruteForceTopK]] lesson applied: the
      // candidate volume is ~(nprobe/nlist) × |corpus| × |queries| and a
      // per-pair UDF pays join row machinery + a per-PAIR float→double
      // array cast on every candidate (measured 26.7 s for search alone
      // at 6M×100 on the 10× curve). Probe cells are assigned on the
      // driver with the SAME [[nearCells]] function the index used, each
      // index row looks up its cell's queries in one broadcast map, and
      // one kernel call scores them all — identical candidates, and the
      // per-pair double arithmetic sequence matches [[cosineKernelD]] on
      // the per-row-widened vectors, so scores are bit-identical.
      val qRows: Array[(Long, Array[Float])] = collectQueryBatch(
        queries
          .where(col(idCol).isNotNull && col(vecCol).isNotNull)
          .select(col(idCol).cast(LongType), col(vecCol).cast(ArrayType(FloatType))),
        maxQueryBatch, "ivfSearchIndexed")
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val cellMap: Map[Int, Array[(Long, Array[Double])]] = qRows
        .flatMap { case (qid, qv) =>
          // widen ONCE per query, not once per probe cell — nprobe
          // copies of a wide query vector would multiply the broadcast
          val qd = qv.map(_.toDouble)
          nearCells(centroids, qv, probes).map(c => c -> (qid, qd))
        }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
      val bcq = queries.sparkSession.sparkContext.broadcast(cellMap)
      val scoreCell = udf { (nid: Long, cell: Int, v: Seq[Float]) =>
        bcq.value.get(cell) match {
          case None => Seq.empty[(Long, Double)]
          case Some(qs) =>
            val n = v.length
            val x = new Array[Double](n)
            locally {
              val it = v.iterator; var i = 0
              while (it.hasNext) { x(i) = it.next().toDouble; i += 1 }
            }
            val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](qs.length)
            var qi = 0
            while (qi < qs.length) {
              val (qid, y) = qs(qi)
              if (qid != nid && y.length == n) out += ((qid, cosineArrD(y, x)))
              qi += 1
            }
            out.toSeq
        }
      }
      // explicit probe-union filter: the scoring UDF already no-ops on
      // unprobed cells, but only a PREDICATE lets Catalyst prune — on a
      // cell-partitioned standing index this skips the unprobed
      // partitions at the source (nprobe × |queries| cells read instead
      // of the whole frame; PartitionPruneSpec measures it), and even
      // unpartitioned it short-circuits rows before the UDF
      val probedCells = cellMap.keys.toSeq
      val scored = index
        .where(col(idCol).isNotNull && col(vecCol).isNotNull &&
          col("cell").isin(probedCells: _*))
        .select(col(idCol).cast(LongType).as("neighbor_id"), col("cell"),
          col(vecCol).cast(ArrayType(FloatType)).as("cv"))
        .select(col("neighbor_id"),
          explode(scoreCell(col("neighbor_id"), col("cell"), col("cv"))).as("t"))
        .select(col("t._1").cast(idT).as("query_id"), col("neighbor_id"),
          col("t._2").as("score"))
      rankTopK(scored, k, idT)
    } else {
      val bc = queries.sparkSession.sparkContext.broadcast(centroids)
      val cellsUdf = nearCellsUdf(bc)
      // double-cast hoisted per ROW — a per-pair cast re-widens the same
      // corpus vector once per colliding query
      val c = index.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast(ArrayType(FloatType)).cast(ArrayType(DoubleType)).as("cv"),
        col("cell"))
      val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast(ArrayType(FloatType)).as("qv"))
        .withColumn("cell", explode(cellsUdf(col("qv"), lit(probes))))
        .withColumn("qv", col("qv").cast(ArrayType(DoubleType)))
      val scored = q.join(c, Seq("cell"))
        .where(col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineKernelD(col("qv"), col("cv")).as("score"))
      rankTopK(scored, k, idT)
    }
  }

  /** k-NN majority-vote classification: each query takes the most common
    * label among its top-k cosine neighbors in the labeled corpus — the
    * standard label-propagation / weak-supervision primitive for
    * extending a labeled seed set over an unlabeled embedding corpus.
    * Ties break to the SMALLEST label (deterministic, SQL-replayable).
    * `labelCol` must be numeric (the tie-break negates it inside a
    * struct ordering); map categorical labels to codes first.
    *
    * Scale shape: the ranking is [[bruteForceTopK]] (corpus scanned
    * once, never shuffled; map-side bounded top-k), and the label join
    * attaches corpus labels to the tiny queries×k frame — Spark
    * broadcasts the small side, so the corpus still moves through at
    * most one scan. Output: (query_id, label, votes).
    */
  def knnClassify(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int = 10,
      maxQueryBatch: Int = 100000): DataFrame = {
    val top = bruteForceTopK(corpus, queries, idCol, vecCol, k, maxQueryBatch)
    val labels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__knn_label"))
    top.join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__knn_label"))
      .agg(count(lit(1)).as("votes"))
      .groupBy(col("query_id"))
      .agg(
        max_by(col("__knn_label"),
          struct(col("votes"), col("__knn_label") * -1)).as("label"),
        max(col("votes")).as("votes"))
  }

  /** Embedding near-duplicate pairs: corpus self-join via LSH buckets,
    * cosine ≥ threshold. The embedding analog of MinHash near-dup.
    *
    * `maxBucket` is the skew guard (same idea as `Dedup.bucketPairs`): a
    * bucket with n members contributes n²/2 scored pairs, and a
    * degenerate signature shared by a large corpus fraction (e.g. a mass
    * of near-zero or boilerplate embeddings) would turn the self-join
    * quadratic. Bucket sizes come from a window `count` over the bucket
    * key — rows in buckets outside 2..maxBucket are dropped BEFORE the
    * join (singletons can't pair anyway), so the join's per-key fan-out
    * is bounded by construction.
    *
    * The cap is NOT silent (same contract as
    * [[graft.ops.Dedup.nearDupIncrement]]): every row an OVERSIZED
    * bucket drops bumps the named accumulator
    * `cosine_dedup_dropped_bucket_rows` EXACTLY ONCE per action — the
    * marker UDF lives on only ONE designated side of the bucket
    * self-join (the other side filters with the plain predicate over
    * the same window counts), so the join's two evaluations of the
    * bucket pipeline don't double the count the way a shared marked
    * frame would. The usual Spark caveat applies on top: accumulators
    * in transformations are at-least-once under task retries and
    * speculation, so on an unhealthy run read the value as "non-zero
    * means rows were dropped", not as an exact census. A non-zero value
    * means some near-duplicate pairs may have lived entirely inside a
    * degenerate-signature bucket and were never scored — raise
    * `maxBucket` or pre-filter the degenerate embeddings (e.g. all-zero
    * vectors) if that matters for the corpus. Singleton-bucket rows do
    * NOT count: they can't pair with anything, so dropping them loses
    * no output by construction. Each call registers a FRESH accumulator
    * under this name; to read the count of a specific run (rather than
    * scanning the UI), call [[cosineDedupPairsCounted]] and keep the
    * returned handle.
    */
  def cosineDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nBits: Int = 16,
      maxBucket: Int = 10000, probeDepth: Int = 2): DataFrame =
    cosineDedupPairsCounted(df, idCol, vecCol, threshold, nBits, maxBucket,
      probeDepth)._1

  /** [[cosineDedupPairs]] plus this run's dropped-row accumulator
    * handle — the only reliable way to read the count of a particular
    * invocation, since every call registers a fresh same-named
    * accumulator on the context.
    *
    * `probeDepth` is the RECALL dial, and the DEFAULT is the measured
    * scale recipe (nBits = 16, depth 2 — 0.924 pair recall on the
    * threshold-straddling corpus, NearDupRecallSpec): a true
    * near-duplicate pair at cosine ≈ threshold sits at angle
    * θ = arccos(threshold), and each hyperplane splits it with
    * probability θ/π — at the 0.95 threshold exact-bucket pairing at
    * 12 bits keeps only ~0.90^12 ≈ 0.28 of such pairs in one bucket,
    * so depth 0 MISSES most threshold-straddling pairs (measured 0.419
    * pair recall; the planted-twin oracles pair identical-direction
    * twins whose signatures collide by construction and cannot see
    * this). Depth d recovers every pair whose signatures differ in
    * ≤ d bits via the [[hammingMasks]] flip set — the full measured
    * table is SCALE.md §near-dup-pair-recall. Raising nBits SHRINKS
    * the per-bucket corpus fraction faster than the flip set grows
    * (137/2^16 at 16-bit depth 2 vs 79/2^12 at 12-bit depth 2 — ~9×
    * less candidate volume), which is why the default raises both
    * dials together. Pass probeDepth = 0 for the cheap low-recall
    * exact-bucket pairing. Cost is ~|masks| probe rows per corpus row
    * through the bucket join; each qualifying pair is still scored
    * EXACTLY once (the smaller id probes into the larger id's exact
    * bucket through the pair's unique XOR mask), so no dedup shuffle.
    */
  def cosineDedupPairsCounted(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nBits: Int = 16, maxBucket: Int = 10000,
      probeDepth: Int = 2)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val sig = hyperplaneFast(df.schema(vecCol).dataType, nBits)(col(vecCol))
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("bucket"))
    if (probeDepth == 0)
      cappedBucketPairs(base, df.schema(idCol).dataType,
        df.schema(vecCol).dataType, threshold, maxBucket,
        "cosine_dedup_dropped_bucket_rows")
    else {
      val masks = hammingMasks(nBits, probeDepth)
      probedBucketPairs(base,
        kept => kept.select(col("id"), col("v"),
          explode(transform(array(masks.map(lit): _*),
            m => col("bucket").bitwiseXOR(m))).as("bucket")),
        df.schema(idCol).dataType, df.schema(vecCol).dataType, threshold,
        maxBucket, bothSides = false, "cosine_dedup_dropped_bucket_rows")
    }
  }

  /** Incremental embedding near-dup — the daily-batch shape of
    * [[cosineDedupPairs]], completing the family symmetry with
    * [[graft.ops.Dedup.nearDupIncrement]] (text MinHash): drop incoming
    * rows whose cosine against the STANDING corpus reaches `threshold`,
    * without ever re-scoring corpus × corpus. `index` is a [[lshIndex]]
    * frame — persist it once (optionally [[lshIndexWrite]]-partitioned,
    * so the batch's probe-bucket set prunes the scan at the source) and
    * amortize across daily batches; the corpus pays nothing per batch
    * beyond the probed buckets.
    *
    * Candidates come from `probeDepth`-deep multi-probe (the
    * NearDupRecallSpec recall dial — exact-bucket probing misses most
    * threshold-straddling pairs, depth 2 recovers ≥ 0.96 measured) and
    * every candidate is EXACT-cosine verified, so a probe miss can only
    * KEEP a row a deeper probe would have dropped — never drop a clean
    * one. Batch-internal duplicates are out of scope (both survive if
    * neither matches the corpus); run [[cosineDedupPairs]] within the
    * batch for that, like the text form. Ids must be distinct across
    * the two frames (the search path excludes same-id matches as
    * self-pairs).
    */
  def cosineDedupIncrement(index: DataFrame, incoming: DataFrame,
      idCol: String, vecCol: String, threshold: Double = 0.95,
      nBits: Int = 16, probeDepth: Int = 2,
      maxProbeFilter: Int = 65536): DataFrame = {
    val hits = lshSearchIndexed(index, incoming, idCol, vecCol, k = 1,
        nBits, probeDepth, maxProbeFilter)
      .where(col("score") >= threshold)
      .select(col("query_id").as(idCol))
    incoming.join(hits, Seq(idCol), "left_anti")
  }

  /** The semantic (k-means-cell) twin of [[cosineDedupIncrement]]: drop
    * incoming rows whose exact cosine against the STANDING [[ivfIndex]]
    * frame reaches `threshold`, probing each batch row's `nprobe`
    * nearest cells. Fully DISTRIBUTED on both sides — cell assignment is
    * an executor-side kernel over the broadcast centroids and the
    * candidate step is a cell equi-join, so the BATCH is unbounded (no
    * driver collect; the deliberate contrast with [[ivfSearchIndexed]]'s
    * driver-batched query path, which assumes a small query set).
    *
    * `pruneCells = true` (default) additionally collects the batch's
    * probed-cell union (bounded by nlist rows) and pushes it as a
    * `cell IN (...)` predicate — on a cell-partitioned standing index
    * the corpus reads only those partitions. It costs one extra
    * cell-assignment pass over the batch — and, like
    * [[lshSearchIndexed]]'s probe pushdown, ASSUMES the batch's
    * lineage is deterministic (the cell set is collected from a
    * separate execution of the `incoming` plan; cache or
    * localCheckpoint a rand-derived/sampled/mutable-source batch first
    * or the pruned scan can silently miss true matches). Disable it
    * when the batch dwarfs the index. Ids must be distinct across
    * frames, as in the LSH form; batch-internal duplicates are out of
    * scope.
    */
  def semanticDedupIncrement(index: DataFrame, centroids: Array[Array[Float]],
      incoming: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nprobe: Int = 8,
      pruneCells: Boolean = true): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val probes = math.min(nprobe, centroids.length)
    val bc = incoming.sparkSession.sparkContext.broadcast(centroids)
    val cellsUdf = nearCellsUdf(bc)
    val q = incoming
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).as("__qid"),
        col(vecCol).cast(ArrayType(FloatType)).as("__qv"))
      .withColumn("cell", explode(cellsUdf(col("__qv"), lit(probes))))
      .withColumn("__qv", col("__qv").cast(ArrayType(DoubleType)))
    val c0 = index.select(col(idCol).as("__nid"),
      col(vecCol).cast(ArrayType(FloatType)).cast(ArrayType(DoubleType)).as("__cv"),
      col("cell"))
    val c =
      if (!pruneCells) c0
      else {
        val probed = q.select(col("cell")).distinct().collect().map(_.getInt(0))
        c0.where(col("cell").isin(probed.toIndexedSeq.map(Int.box): _*))
      }
    val hits = q.join(c, Seq("cell"))
      .where(col("__qid") =!= col("__nid"))
      .select(col("__qid"),
        cosineKernelD(col("__qv"), col("__cv")).as("__score"))
      .where(col("__score") >= threshold)
      .select(col("__qid").as(idCol)).distinct()
    incoming.join(hits, Seq(idCol), "left_anti")
  }

  /** SemDeDup-style semantic near-duplicate pairs: k-means-cluster the
    * embedding corpus ([[ivfTrain]]'s deterministic seeds + Lloyd
    * refinement) and score cosine only WITHIN a cluster — the clustering
    * replaces [[cosineDedupPairs]]'s LSH buckets as the candidate
    * generator (the SemDeDup observation: semantic duplicates land in the
    * same k-means cluster, so the all-pairs problem shrinks to per-cluster
    * pairs). The two candidate generators are complementary: LSH buckets
    * are cheap and index-free, clusters adapt to the corpus's actual
    * density so a tight semantic neighborhood is not split across an
    * arbitrary hyperplane.
    *
    * Same skew contract as the LSH form: cluster sizes come from a window
    * count over the cell id, rows in cells larger than `maxCell` are
    * dropped BEFORE the self-join, and each dropped row bumps the
    * `semantic_dedup_dropped_cell_rows` accumulator exactly once per
    * action (the one-side-marker pattern of [[cosineDedupPairsCounted]];
    * the same at-least-once caveat under task retries applies). Singleton
    * cells are skipped — they cannot pair.
    *
    * Scale shape: training is a TakeOrdered seed pass plus one aggregated
    * corpus scan per Lloyd pass (at most nlist × dim partial-mean rows
    * shuffle); assignment is one corpus scan against broadcast centroids;
    * the pair join is an equi-join on the cell id, so candidate volume is
    * Σ_cell min(n_cell, maxCell)²/2 — never corpus². At 100 TB, grow
    * `nlist` with the corpus (keep the expected cell size well under
    * `maxCell`) and persist [[ivfIndex]]'s frame bucketed by cell so
    * re-runs skip assignment entirely.
    */
  def semanticDedupPairsCounted(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 64, lloydPasses: Int = 1,
      maxCell: Int = 10000, probeCells: Int = 2)
      : (DataFrame, org.apache.spark.util.LongAccumulator) =
    semanticDedupPairsCounted(df, idCol, vecCol,
      ivfTrain(df, idCol, vecCol, nlist, lloydPasses), threshold, maxCell,
      probeCells)

  /** [[semanticDedupPairsCounted]] over PREBUILT centroids — the 100 TB
    * form: train the quantizer once on a hash-sample of the corpus
    * ([[graft.ops.Sampling.hashSample]] → [[ivfTrain]] — k-means
    * centroids converge on a sample; the full corpus only pays the
    * assignment scan), persist the centroids, and reuse them across
    * daily runs so re-clustering never rides the dedup job.
    *
    * `probeCells` is the RECALL dial (default 2 — 0.990 measured pair
    * recall, NearDupRecallSpec): a near-duplicate pair straddling a
    * Voronoi boundary lands in two different cells and is never scored
    * at probeCells = 1 (measured 0.905 on the boundary-straddling
    * corpus; SCALE.md §near-dup-pair-recall). At p > 1 each row ALSO
    * probes its p nearest cells (the same [[nearCells]] ranking the
    * assignment uses), pairing with those cells' members. Unlike the
    * Hamming flip set, probe sets are not symmetric (cellB ∈ topP(A)
    * does not imply cellA ∈ topP(B)), so BOTH orderings probe and the
    * thresholded pair frame deduplicates on (id_a, id_b) — a shuffle
    * of the tiny pair set only, never the corpus.
    */
  def semanticDedupPairsCounted(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double, maxCell: Int)
      : (DataFrame, org.apache.spark.util.LongAccumulator) =
    semanticDedupPairsCounted(df, idCol, vecCol, centroids, threshold,
      maxCell, probeCells = 2)

  /** [[semanticDedupPairsCounted]] (prebuilt centroids) with the
    * multi-probe dial explicit. */
  def semanticDedupPairsCounted(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], threshold: Double, maxCell: Int,
      probeCells: Int)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    require(probeCells >= 1, s"need probeCells >= 1, got $probeCells")
    val base = ivfIndex(df, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        col("cell").as("bucket"))
    if (probeCells == 1)
      cappedBucketPairs(base, df.schema(idCol).dataType, ArrayType(FloatType),
        threshold, maxCell, "semantic_dedup_dropped_cell_rows")
    else {
      val p = math.min(probeCells, centroids.length)
      val bc = df.sparkSession.sparkContext.broadcast(centroids)
      probedBucketPairs(base,
        kept => kept.select(col("id"), col("v"),
          explode(nearCellsUdf(bc)(col("v"), lit(p))).as("bucket")),
        df.schema(idCol).dataType, ArrayType(FloatType), threshold, maxCell,
        bothSides = true, "semantic_dedup_dropped_cell_rows")
    }
  }

  /** The ONE capped same-bucket pair scorer behind the embedding
    * near-dup family — [[cosineDedupPairsCounted]] (LSH-signature
    * buckets) and [[semanticDedupPairsCounted]] (k-means cells) differ
    * only in how `bucket` was produced. `base0` is (id, v, bucket);
    * bucket sizes come from one window count, rows in buckets outside
    * 2..maxBucket drop BEFORE any pairing (each oversized-bucket row
    * bumps `accName` exactly once per action — the one-side-marker
    * pattern), and scoring dispatches:
    *
    *   - integral id + float vectors (the embedding norm): BUCKET-
    *     BATCHED — the bruteForceTopK/ivfSearchIndexed lesson applied
    *     to the self-join. The joined form paid per-PAIR join-row
    *     machinery plus a UDF dispatch on every candidate (~5 µs/pair
    *     against ~60 ns of float arithmetic; 28.5 s → 6.6 s measured at
    *     600k×2048 cells, SCALE.md). Each surviving bucket aggregates
    *     its members — bounded by maxBucket BEFORE the aggregation, so
    *     the group buffer is capped — and ONE kernel call emits the
    *     bucket's whole thresholded pair set. The two collect_lists
    *     consume the same aggregation pass, so ids and vectors stay
    *     aligned; members score smaller-id first through
    *     [[cosineArrF]], the exact FP order of the joined form's
    *     `cosineFast(a.v, b.v)` — scores are bit-identical (path-parity
    *     spec) and the oracle hashes cannot drift. No join, ONE
    *     exchange: the groupBy reuses the window's partitioning.
    *   - anything else: the capped self-join, whose two sides share the
    *     bucket pipeline through one reused exchange.
    */
  private def cappedBucketPairs(base0: DataFrame, idT: DataType,
      vecT: DataType, threshold: Double, maxBucket: Int, accName: String)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val acc = base0.sparkSession.sparkContext.longAccumulator(accName)
    val keepMark = udf { (keep: Boolean, oversized: Boolean) =>
      if (oversized) acc.add(1L)
      keep
    }.asNondeterministic()
    val base = base0
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("bucket")))
    val integralId = idT match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val floatVec = vecT match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (integralId && floatVec) {
      val th = threshold
      val scoreBucket = udf { (ids: Seq[Long], vs: Seq[Seq[Float]]) =>
        val n = ids.length
        val idArr = ids.toArray
        val vecs = new Array[Array[Float]](n)
        locally {
          val it = vs.iterator; var i = 0
          while (it.hasNext) {
            val v = it.next()
            vecs(i) = if (v == null) null else v.toArray
            i += 1
          }
        }
        val ord = Array.range(0, n).sortBy(idArr)
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
        var a = 0
        while (a < n) {
          val ia = ord(a); val va = vecs(ia)
          var b = a + 1
          while (b < n) {
            val ib = ord(b); val vb = vecs(ib)
            if (va != null && vb != null && va.length == vb.length) {
              val s = cosineArrF(va, vb)
              if (s >= th) out += ((idArr(ia), idArr(ib), s))
            }
            b += 1
          }
          a += 1
        }
        out.toSeq
      }
      val pairs = base
        .where(keepMark(col("__n").between(2, maxBucket), col("__n") > maxBucket))
        // AFTER the window count (bucket sizes include every row, like
        // the joined form) but BEFORE the aggregation: collect_list
        // skips nulls independently per column, which would misalign
        // the two lists — and a null id/vector can never pair anyway
        .where(col("id").isNotNull && col("v").isNotNull)
        .groupBy(col("bucket"))
        .agg(collect_list(col("id").cast(LongType)).as("ids"),
          collect_list(col("v").cast(ArrayType(FloatType))).as("vs"))
        .select(explode(scoreBucket(col("ids"), col("vs"))).as("t"))
        .select(col("t._1").cast(idT).as("id_a"),
          col("t._2").cast(idT).as("id_b"), col("t._3").as("score"))
      (pairs, acc)
    } else {
      val a = base
        .where(keepMark(col("__n").between(2, maxBucket), col("__n") > maxBucket))
        .drop("__n").alias("a")
      val b = base
        .where(col("__n").between(2, maxBucket))
        .drop("__n").alias("b")
      val pairs = a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          cosineFast(vecT)(col("a.v"), col("b.v")).as("score"))
        .where(col("score") >= threshold)
      (pairs, acc)
    }
  }

  /** The multi-probe sibling of [[cappedBucketPairs]]: `base0` is
    * (id, v, bucket) exactly as there, and `mkProbes` expands the
    * CAPPED, null-filtered base into probe rows (id, v, bucket) — one
    * per (row, probe bucket). Probe rows join the exact-bucket side
    * aggregated per bucket (the batched-kernel shape for integral id +
    * float vectors; a plain join otherwise), so a pair is scored when
    * the prober reaches its partner's HOME bucket — candidates beyond
    * the exact-bucket set are exactly what buys the recall.
    *
    * `bothSides = false` (symmetric probe sets, e.g. Hamming flips):
    * only smaller-id-probes-larger pairs are emitted — each qualifying
    * pair is produced exactly once, no dedup. `bothSides = true`
    * (asymmetric probe sets, e.g. nearest cells): both orderings probe
    * and the thresholded output deduplicates on (id_a, id_b).
    *
    * Cap contract matches [[cappedBucketPairs]] with ONE deliberate
    * difference: singleton buckets are NOT dropped (their rows can now
    * pair across buckets), so only rows in buckets over `maxBucket`
    * drop — each bumping `accName` once per action via the designated
    * exact side. Scores run the same smaller-id-first [[cosineArrF]]
    * order as the exact-bucket path, so a pair found by both paths has
    * bit-identical scores.
    *
    * Plan shape (verified with ProbedPlanCheck): both sides consume the
    * signature+window pipeline through ONE exchange (ReusedExchange) —
    * the corpus pays the signature kernel once, not twice — and the
    * probe rows carry their vectors through the bucket equi-join, so
    * multi-probe's real cost is |masks| × corpus bytes through that one
    * join (measured in SCALE.md §near-dup-pair-recall's cost table; AQE
    * broadcasts the aggregated bucket side when it fits).
    */
  private def probedBucketPairs(base0: DataFrame,
      mkProbes: DataFrame => DataFrame, idT: DataType, vecT: DataType,
      threshold: Double, maxBucket: Int, bothSides: Boolean, accName: String)
      : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    val acc = base0.sparkSession.sparkContext.longAccumulator(accName)
    val keepMark = udf { (keep: Boolean, oversized: Boolean) =>
      if (oversized) acc.add(1L)
      keep
    }.asNondeterministic()
    val base = base0
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("bucket")))
    val exact = base
      .where(keepMark(col("__n") <= maxBucket, col("__n") > maxBucket))
      .where(col("id").isNotNull && col("v").isNotNull)
      .drop("__n")
    val probes = mkProbes(
      base.where(col("__n") <= maxBucket)
        .where(col("id").isNotNull && col("v").isNotNull)
        .drop("__n"))
    val integralId = idT match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val floatVec = vecT match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val pairs =
      if (integralId && floatVec) {
        val th = threshold
        val bs = bothSides
        val scoreProbe = udf { (pid: Long, pv: Seq[Float],
            ids: Seq[Long], vs: Seq[Seq[Float]]) =>
          val x = pv.toArray
          val idArr = ids.toArray
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
          val it = vs.iterator; var i = 0
          while (it.hasNext) {
            val wv = it.next()
            val nid = idArr(i)
            if ((if (bs) nid != pid else nid > pid) && wv != null) {
              val w = wv.toArray
              if (w.length == x.length) {
                val s = if (pid < nid) cosineArrF(x, w) else cosineArrF(w, x)
                if (s >= th)
                  out += ((math.min(pid, nid), math.max(pid, nid), s))
              }
            }
            i += 1
          }
          out.toSeq
        }
        val agg = exact.groupBy(col("bucket"))
          .agg(collect_list(col("id").cast(LongType)).as("ids"),
            collect_list(col("v").cast(ArrayType(FloatType))).as("vs"))
        probes
          .select(col("id").cast(LongType).as("pid"),
            col("v").cast(ArrayType(FloatType)).as("pv"), col("bucket"))
          .join(agg, Seq("bucket"))
          .select(explode(scoreProbe(col("pid"), col("pv"),
            col("ids"), col("vs"))).as("t"))
          .select(col("t._1").cast(idT).as("id_a"),
            col("t._2").cast(idT).as("id_b"), col("t._3").as("score"))
      } else {
        val a = probes.alias("a")
        val b = exact.alias("b")
        val cond = col("a.bucket") === col("b.bucket") &&
          (if (bothSides) col("a.id") =!= col("b.id")
           else col("a.id") < col("b.id"))
        a.join(b, cond)
          .select(least(col("a.id"), col("b.id")).as("id_a"),
            greatest(col("a.id"), col("b.id")).as("id_b"),
            cosineFast(vecT)(col("a.v"), col("b.v")).as("score"))
          .where(col("score") >= threshold)
      }
    (if (bothSides) pairs.dropDuplicates("id_a", "id_b") else pairs, acc)
  }

  /** [[semanticDedupPairsCounted]] without the accumulator handle. */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 64, lloydPasses: Int = 1,
      maxCell: Int = 10000, probeCells: Int = 2): DataFrame =
    semanticDedupPairsCounted(df, idCol, vecCol, threshold, nlist,
      lloydPasses, maxCell, probeCells)._1

  /** Apply semantic dedup to the corpus: within each connected component
    * of the [[semanticDedupPairs]] graph, keep only the minimum id — rows
    * never mentioned in a pair pass through untouched. The loser set is
    * tiny next to the corpus, so [[graft.ops.Dedup.dedupByPairs]]'s
    * anti-join broadcasts and the payload never shuffles.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nlist: Int = 64, lloydPasses: Int = 1,
      maxCell: Int = 10000, probeCells: Int = 2): DataFrame =
    Dedup.dedupByPairs(df, idCol,
      semanticDedupPairs(df, idCol, vecCol, threshold, nlist, lloydPasses,
        maxCell, probeCells))

  /** Each row's nearest centroid and its cosine to it —
    * (idCol, cell, score). The per-cluster density signal cluster-based
    * pruning ranks on; centroids are plain data (from [[ivfTrain]] or
    * anywhere else). Null-id / null-vector rows are excluded (nothing to
    * score). One corpus scan against the broadcast centroids, no shuffle.
    */
  def centroidScores(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]]): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val score = udf { (cell: Int, v: Seq[Float]) =>
      cosineArrF(v.toArray, bc.value(cell))
    }
    ivfIndex(df.where(col(idCol).isNotNull && col(vecCol).isNotNull),
        idCol, vecCol, centroids)
      .select(col(idCol), col("cell"),
        score(col("cell"), col(vecCol)).as("score"))
  }

  /** Cluster-based data pruning (the SSL-prototypes / density family of
    * published curation methods): rank every row within its cluster by
    * cosine-to-centroid (descending, ties to the smaller id) and keep a
    * `keepFraction` of each cluster — by default the TOP of the ranking
    * (most central members; pruning drops far-from-centroid outliers and
    * noise). With `dropPrototypes = true` the BOTTOM is kept instead —
    * the most prototypical, redundant examples are dropped, the
    * diversity-preserving variant. `ceil(keepFraction × n_cell)` rows
    * survive per cluster, so no non-empty cluster is ever emptied.
    *
    * Scale shape: scoring is one corpus scan against broadcast centroids
    * ([[centroidScores]]); the rank window shuffles only fixed-width
    * (id, cell, score) rows partitioned by cell; and the payload moves
    * through one anti-join on the DROPPED id set (the smaller side under
    * the usual keepFraction > 0.5 — broadcastable under AQE whenever the
    * drop list fits, an id-only shuffle join otherwise).
    */
  def clusterPrune(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], keepFraction: Double,
      dropPrototypes: Boolean = false): DataFrame = {
    require(keepFraction > 0 && keepFraction <= 1,
      s"keepFraction must be in (0, 1], got $keepFraction")
    val byCell = Window.partitionBy("cell")
    val ranked = centroidScores(df, idCol, vecCol, centroids)
      .withColumn("__r", row_number().over(
        Window.partitionBy("cell").orderBy(col("score").desc, col(idCol))))
      .withColumn("__n", count(lit(1)).over(byCell))
    val nKeep = ceil(lit(keepFraction) * col("__n")).cast(LongType)
    val dropped = ranked
      .where(if (dropPrototypes) col("__r") <= (col("__n") - nKeep)
             else col("__r") > nKeep)
      .select(col(idCol))
    df.join(dropped, Seq(idCol), "left_anti")
  }

  // ================= Product quantization (PQ / ADC) =================
  //
  // The embedding-compression scale path (Jégou, Douze, Schmid: "Product
  // Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  // method): split each d-dim vector into `m` contiguous subvectors,
  // k-means each subspace to `ksub` centroids, and store each vector as
  // m small codes instead of d floats. A 768-dim float corpus (3 KB/row)
  // compresses to m=8..96 bytes/row — at 100 TB of embeddings that is
  // the difference between an index that fits the cluster's memory and
  // one that doesn't. Search is asymmetric distance computation (ADC):
  // the UNCOMPRESSED query builds one (m × ksub) lookup table of
  // subspace inner products, and scoring a corpus row is m table
  // lookups — no float math per pair at all.
  //
  // Scores approximate the INNER PRODUCT of the stored vectors; run
  // [[l2Normalize]] first (queries and corpus) to make that a cosine
  // approximation, matching the rest of the family. Everything is
  // deterministic: hash-ordered seeds, decimal-mean Lloyd refinement,
  // strict-< argmin tie-breaks — so oracle replays are stable.

  /** Subspace slice boundaries: prefix offsets (length m+1) of `m`
    * contiguous chunks of ceil(d/m) dims each over a d-dim vector; the
    * last chunk is shorter when m does not divide d, and trailing chunks
    * are empty when m > d (legal, but choose m dividing d).
    */
  private def pqOffsets(d: Int, m: Int): Array[Int] = {
    val subLen = (d + m - 1) / m
    Array.tabulate(m + 1)(s => math.min(s * subLen, d))
  }

  /** Zero-pad (or truncate) to the trained dimension — ragged corpus
    * rows quantize against the codebook geometry instead of crashing,
    * same contract as the padded refinement expression in [[pqTrain]].
    */
  private[graft] def pqPad(v: Array[Float], d: Int): Array[Float] =
    if (v.length == d) v
    else { val out = new Array[Float](d); System.arraycopy(v, 0, out, 0, math.min(v.length, d)); out }

  /** Per-subspace L2 argmin over the codebook — the assignment kernel
    * every PQ path shares (train refinement, encode, and the naive spec
    * reference call it alike, so parity is structural). Differences
    * accumulate in double from float-subtracted operands, left to right;
    * strict `<` keeps the FIRST (lowest) code on ties.
    */
  private[graft] def pqAssign(cb: Array[Array[Array[Float]]],
      offs: Array[Int], v0: Array[Float]): Array[Int] = {
    val v = pqPad(v0, offs.last)
    val m = cb.length
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = offs(s)
      val len = offs(s + 1) - off
      val cents = cb(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cents.length) {
        val c = cents(j)
        var dist = 0.0
        var t = 0
        while (t < len) {
          val diff = (v(off + t) - c(t)).toDouble
          dist += diff * diff
          t += 1
        }
        if (dist < bestD) { best = j; bestD = dist }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    codes
  }

  private def pqAssignUdf(bc: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Float]]]],
      offs: Array[Int]) =
    udf { (v: Seq[Float]) => pqAssign(bc.value, offs, v.toArray) }

  /** Train the PQ codebooks: `ksub` deterministic seeds per subspace
    * (the hash-min sample [[ivfTrain]] uses, sliced per subspace — one
    * distributed TakeOrdered, no RNG) refined by `lloydPasses` Lloyd
    * iterations per subspace, all subspaces in the SAME corpus pass
    * (assign all m codes per row in one kernel call, then one
    * decimal-mean aggregation keyed by (subspace, code, position)).
    * Returned codebooks are plain data — `codebooks(s)(j)` is subspace
    * s's centroid j — persist once, reuse across encode/search calls.
    * The trained dimension is the max seed length; shorter/longer rows
    * zero-pad/truncate ([[pqPad]]).
    *
    * Default geometry, DECIDED (SCALE.md §ivfadc-dials): `m = 8,
    * ksub = 256` is 8 bytes per vector — 32× smaller than 64 raw
    * float32 dims, the memory-bound regime PQ exists for at 100 TB
    * (the whole code frame of a 10^11-vector corpus fits a cluster's
    * RAM at 8 B/vec; it does not at the recall-first m=32 geometry).
    * The measured dial table stands next to it: at 64 dims m=32/
    * ksub=64 lifts spread-corpus recall@1 from 0.783 to 0.983 for 2-3×
    * the code bytes, and raising ksub is the cheaper dial when ADC LUT
    * lookups (m per candidate) bind instead. Recall-critical callers
    * should pass the §ivfadc-dials recipe explicitly — the default
    * optimizes for the index-must-fit constraint, which at target
    * scale is the binding one; pair with residual coding
    * ([[pqTrainResidual]]) to claw back most of the narrow-m loss.
    */
  def pqTrain(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 256, lloydPasses: Int = 1): Array[Array[Array[Float]]] = {
    require(m >= 1, s"need m >= 1 subspaces, got $m")
    require(ksub >= 1, s"need ksub >= 1 codes, got $ksub")
    require(lloydPasses >= 0, "lloydPasses must be >= 0")
    val spark = corpus.sparkSession
    val seeds: Array[Array[Float]] = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast(ArrayType(FloatType)).as("v"))
      .orderBy(xxhash64(col(idCol)))
      .limit(ksub)
      .select("v").collect().map(_.getSeq[Float](0).toArray)
    require(seeds.nonEmpty, "pqTrain: corpus has no non-null vectors")
    val d = seeds.iterator.map(_.length).max
    val offs = pqOffsets(d, m)
    var codebooks: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      seeds.map(v => pqPad(v, d).slice(offs(s), offs(s + 1)))
    }
    var bc = spark.sparkContext.broadcast(codebooks)
    // pad/truncate to the trained d in ONE expression (concat d zeros,
    // slice back to d) — positionally identical to pqPad, so the
    // refinement means see exactly the vectors the assignment kernel saw
    val padded = slice(
      concat(col("v"), array_repeat(lit(0.0f), lit(d))), 1, d)

    for (_ <- 1 to lloydPasses) {
      val assign = pqAssignUdf(bc, offs)
      val subLen = (d + m - 1) / m
      // m × ksub × subLen rows to the driver — bounded by the codebook
      // size, not the corpus; empty (subspace, code) cells keep seeds
      val means = corpus
        .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(vecCol).cast(ArrayType(FloatType)).as("v"))
        .select(padded.as("v"))
        .withColumn("codes", assign(col("v")))
        .select(col("codes"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(
          (col("pos") / subLen).cast(IntegerType).as("sub"),
          element_at(col("codes"), (col("pos") / subLen).cast(IntegerType) + 1).as("code"),
          (col("pos") % subLen).cast(IntegerType).as("t"),
          col("x"))
        .groupBy("sub", "code", "t")
        .agg((sum(col("x").cast(DecimalType(38, 12))) / count(lit(1)))
          .cast(FloatType).as("mean"))
        .collect()
      val byCell: Map[(Int, Int), Array[org.apache.spark.sql.Row]] =
        means.groupBy(r => (r.getInt(0), r.getInt(1)))
      val old = codebooks
      codebooks = Array.tabulate(m) { s =>
        val len = offs(s + 1) - offs(s)
        old(s).indices.map { j =>
          byCell.get((s, j)) match {
            case Some(rows) =>
              val arr = new Array[Float](len)
              rows.foreach(r => arr(r.getInt(2)) = r.getFloat(3))
              arr
            case None => old(s)(j)
          }
        }.toArray
      }
      val stale = bc
      bc = spark.sparkContext.broadcast(codebooks)
      stale.destroy()
    }
    val out = codebooks
    bc.destroy()
    out
  }

  /** Encode every corpus vector to its `m` PQ codes — the persistable
    * compressed index frame (id, codes array<int>). Write it to parquet
    * and search it repeatedly with [[pqSearch]]; at m=8 over 64-dim
    * floats the stored index is ~8× smaller than the raw vectors.
    */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "pqEncode: codebooks must have >= 1 centroid per subspace")
    val d = codebooks.map(_.head.length).sum
    val offs = pqOffsets(d, codebooks.length)
    val bc = corpus.sparkSession.sparkContext.broadcast(codebooks)
    corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol),
        pqAssignUdf(bc, offs)(col(vecCol).cast(ArrayType(FloatType))).as("codes"))
  }

  /** ADC top-k over a prebuilt [[pqEncode]] frame: each query builds one
    * (m × ksub) inner-product lookup table against the codebooks, the
    * tables broadcast with the batch, and scoring a corpus row is m
    * integer lookups per query — the code frame streams, nothing
    * shuffles except the bounded map-side top-k ([[rankTopK]]). Scores
    * are the inner product of the query with the RECONSTRUCTED
    * (quantized) corpus vector — approximate by construction; recall
    * at realistic settings is measured in AnnRecallSpec and SCALE.md.
    * LUT entries accumulate per-subspace float products into a double
    * left-to-right, and the final score sums subspaces left-to-right —
    * fixed FP order, stable oracle hashes. Integral ids only (the code
    * frame is built by [[pqEncode]] from an integral-keyed corpus).
    */
  def pqSearch(codes: DataFrame, codebooks: Array[Array[Array[Float]]],
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, maxQueryBatch: Int = 100000): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "pqSearch: codebooks must have >= 1 centroid per subspace")
    val idT = codes.schema(idCol).dataType
    idT match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"pqSearch: id column must be integral, got $other")
    }
    val m = codebooks.length
    val d = codebooks.map(_.head.length).sum
    val offs = pqOffsets(d, m)
    val qRows: Array[(Long, Array[Float])] = collectQueryBatch(
      queries
        .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol).cast(LongType), col(vecCol).cast(ArrayType(FloatType))),
      maxQueryBatch, "pqSearch")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // one LUT per query: lut(s)(j) = <query subvector s, codebook s_j>
    val luts: Array[(Long, Array[Array[Double]])] = qRows.map { case (qid, qv0) =>
      val qv = pqPad(qv0, d)
      val lut = Array.tabulate(m) { s =>
        val off = offs(s)
        val len = offs(s + 1) - off
        codebooks(s).map { c =>
          var acc = 0.0
          var t = 0
          while (t < len) { acc += (qv(off + t) * c(t)).toDouble; t += 1 }
          acc
        }
      }
      (qid, lut)
    }
    val bcl = queries.sparkSession.sparkContext.broadcast(luts)
    // a code row whose length != m means the frame was encoded with a
    // DIFFERENT codebook — raise instead of silently skipping the row
    // (a mis-paired codebook would otherwise return empty/partial
    // results with no error, the lshSearchIndexed nbits lesson)
    val mm = m
    val scoreCodes = udf { (nid: Long, codesRow: Seq[Int]) =>
      val cs = codesRow.toArray
      if (cs.length != mm) throw new IllegalArgumentException(
        s"pqSearch: codes row for id $nid has ${cs.length} codes but the " +
          s"codebook has m = $mm subspaces — the code frame was encoded " +
          "with a different codebook; re-encode or pass the matching one")
      val qs = bcl.value
      val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](qs.length)
      var qi = 0
      while (qi < qs.length) {
        val (qid, lut) = qs(qi)
        if (qid != nid) {
          var acc = 0.0
          var s = 0
          while (s < cs.length) { acc += lut(s)(cs(s)); s += 1 }
          out += ((qid, acc))
        }
        qi += 1
      }
      out.toSeq
    }
    val scored = codes
      .where(col(idCol).isNotNull && col("codes").isNotNull)
      .select(col(idCol).cast(LongType).as("neighbor_id"), col("codes"))
      .select(col("neighbor_id"),
        explode(scoreCodes(col("neighbor_id"), col("codes"))).as("t"))
      .select(col("t._1").cast(idT).as("query_id"), col("neighbor_id"),
        col("t._2").as("score"))
    rankTopK(scored, k, idT)
  }

  /** One-shot PQ ANN: train → encode → ADC search. For repeated query
    * batches, train and encode once and call [[pqSearch]] directly.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, m: Int = 8,
      ksub: Int = 256, lloydPasses: Int = 1): DataFrame = {
    val cb = pqTrain(corpus, idCol, vecCol, m, ksub, lloydPasses)
    pqSearch(pqEncode(corpus, idCol, vecCol, cb), cb, queries, idCol, vecCol, k)
  }

  /** The per-row residual against a vector's nearest centroid,
    * x − centroid(cell), over the first `min(|x|, |centroid|)` dims
    * (extra dims pass through — the [[pqPad]] ragged-row contract).
    * Float subtraction, so residual codes are engine-deterministic
    * like everything else in the family.
    */
  private[graft] def cellResidual(cents: Array[Array[Float]],
      x: Array[Float]): (Int, Array[Float]) = {
    val cell = nearCells(cents, x, 1)(0)
    val c = cents(cell)
    val r = Array.tabulate(x.length)(j =>
      if (j < c.length) x(j) - c(j) else x(j))
    (cell, r)
  }

  /** Train PQ codebooks on the CELL RESIDUALS x − centroid(cell) instead
    * of the raw vectors — the full IVFADC recipe (Jégou et al. 2011,
    * §IV-A): within a cell the residual distribution is far tighter
    * than the global vector distribution, so the same m × ksub codebook
    * budget resolves much finer structure (measured on a spread corpus
    * in AnnRecallSpec — raw codes mostly collapse to the coarse cell,
    * residual codes separate neighbors within it). Pair with
    * `ivfPqIndex(..., residual = true)` and
    * `ivfPqSearch(..., residual = true)`; one shared codebook across
    * cells (the published simplification that keeps the LUT per query,
    * not per (query, cell) — the per-cell shift moves into a scalar
    * bias term at search time).
    */
  def pqTrainResidual(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]], m: Int = 8, ksub: Int = 256,
      lloydPasses: Int = 1): Array[Array[Array[Float]]] = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val bc = corpus.sparkSession.sparkContext.broadcast(centroids)
    val res = udf { (v: Seq[Float]) => cellResidual(bc.value, v.toArray)._2 }
    pqTrain(
      corpus.where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol),
          res(col(vecCol).cast(ArrayType(FloatType))).as(vecCol)),
      idCol, vecCol, m, ksub, lloydPasses)
  }

  /** IVF+PQ standing index (the IVFADC composition of Jégou et al. 2011,
    * §IV — coarse cells prune the scan, PQ codes compress what remains):
    * one corpus pass assigns each vector its [[ivfTrain]] cell AND its
    * [[pqTrain]] codes — (id, cell, codes), the frame to persist. The
    * 10× curve measured why the composition exists: flat-scan ADC
    * ([[pqSearch]]) is corpus-linear (ratio 4.2 at 6M), IVF cell
    * pruning is flat (1.1) — IVFADC gets both the pruned scan and the
    * compressed rows.
    *
    * `residual = false` (default) quantizes the RAW vectors — the
    * historical simplification, fine on clustered geometry (recall
    * table in SCALE.md). `residual = true` quantizes x − centroid(cell)
    * (§IV-A of the paper; train the codebooks with [[pqTrainResidual]])
    * — markedly better code resolution on spread corpora, measured in
    * AnnRecallSpec. The frame records the mode as the constant
    * `residual` column so [[ivfPqSearch]] fail-fasts on a mode
    * mismatch instead of silently scoring garbage (the lshIndex nbits
    * pattern).
    */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      residual: Boolean = false): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "ivfPqIndex: codebooks must have >= 1 centroid per subspace")
    val d = codebooks.map(_.head.length).sum
    val offs = pqOffsets(d, codebooks.length)
    val sc = corpus.sparkSession.sparkContext
    val bcCents = sc.broadcast(centroids)
    val bcCb = sc.broadcast(codebooks)
    val nn = corpus
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), col(vecCol).cast(ArrayType(FloatType)).as("__v"))
    if (!residual)
      nn.select(col(idCol),
        element_at(nearCellsUdf(bcCents)(col("__v"), lit(1)), 1).as("cell"),
        pqAssignUdf(bcCb, offs)(col("__v")).as("codes"),
        lit(false).as("residual"))
    else {
      // cell and codes from ONE kernel call (codes depend on the cell's
      // centroid, so the two assignments can't be independent columns)
      val assign = udf { (v: Seq[Float]) =>
        val (cell, r) = cellResidual(bcCents.value, v.toArray)
        (cell, pqAssign(bcCb.value, offs, r))
      }
      nn.select(col(idCol), assign(col("__v")).as("__a"))
        .select(col(idCol), col("__a._1").as("cell"),
          col("__a._2").as("codes"), lit(true).as("residual"))
    }
  }

  /** Persist [[ivfPqIndex]] cell-partitioned with one sorted file per
    * cell directory, like [[ivfIndexWrite]] — the IVFADC standing-store
    * layout whose probe predicate prunes at the source. */
  def ivfPqIndexWrite(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], path: String,
      residual: Boolean = false): Unit =
    writeCellPartitioned(
      ivfPqIndex(corpus, idCol, vecCol, centroids, codebooks, residual), path)

  /** ADC top-k over a prebuilt [[ivfPqIndex]] frame: queries probe their
    * `nprobe` nearest cells exactly like [[ivfSearchIndexed]] (probe
    * cells assigned on the driver by the SAME [[nearCells]] function the
    * index used), each probing query ships its (m × ksub) LUT in one
    * broadcast cell→queries map, and scoring an index row is m lookups
    * per query probing its cell. With `nprobe >= nlist` the candidate
    * set is the whole corpus and results equal [[pqSearch]] row for row
    * (pinned by spec); at production nprobe the scan fraction is
    * nprobe/nlist of the code frame — both dials (pruning and
    * compression) at once. Integral ids only, like [[pqSearch]].
    */
  def ivfPqSearch(index: DataFrame, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nprobe: Int = 8,
      maxQueryBatch: Int = 100000, residual: Boolean = false): DataFrame = {
    require(nprobe >= 1, s"need nprobe >= 1, got $nprobe")
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "ivfPqSearch: codebooks must have >= 1 centroid per subspace")
    val idT = index.schema(idCol).dataType
    idT match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"ivfPqSearch: id column must be integral, got $other")
    }
    // scoring a residual-coded frame with raw LUTs (or vice versa)
    // produces silently-wrong scores — fail fast off the index's
    // constant `residual` marker, lazily per row like the lshIndex
    // nbits guard (null / pre-column legacy frames pass unchecked)
    val checked =
      if (index.columns.contains("residual"))
        index.where(assert_true(
          col("residual").isNull || col("residual") === lit(residual),
          lit(s"ivfPqSearch: searching with residual = $residual but the " +
            "index was built in the other encoding mode (see its residual " +
            "column) — pass the matching residual flag and codebooks"))
          .isNull)
      else index
    val probes = math.min(nprobe, centroids.length)
    val m = codebooks.length
    val d = codebooks.map(_.head.length).sum
    val offs = pqOffsets(d, m)
    val qRows: Array[(Long, Array[Float])] = collectQueryBatch(
      queries
        .where(col(idCol).isNotNull && col(vecCol).isNotNull)
        .select(col(idCol).cast(LongType), col(vecCol).cast(ArrayType(FloatType))),
      maxQueryBatch, "ivfPqSearch")
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // one LUT per query (same construction and FP order as [[pqSearch]],
    // so the all-cells probe is score-identical), fanned out to the
    // query's probe cells — the LUT array is SHARED across the cells,
    // not copied per probe. In residual mode the per-cell shift is the
    // scalar bias <q, centroid(cell)>: score = bias + Σ lut, since the
    // reconstructed vector is centroid + decode(codes). Raw mode's bias
    // is 0.0, making the summation sequence identical to the historical
    // code (acc starts at 0.0 either way).
    val cellMap: Map[Int, Array[(Long, Array[Array[Double]], Double)]] = qRows
      .flatMap { case (qid, qv0) =>
        val qv = pqPad(qv0, d)
        val lut = Array.tabulate(m) { s =>
          val off = offs(s)
          val len = offs(s + 1) - off
          codebooks(s).map { c =>
            var acc = 0.0
            var t = 0
            while (t < len) { acc += (qv(off + t) * c(t)).toDouble; t += 1 }
            acc
          }
        }
        nearCells(centroids, qv0, probes).map { c =>
          val bias = if (!residual) 0.0 else {
            val cent = centroids(c)
            var acc = 0.0
            var j = 0
            val n = math.min(qv.length, cent.length)
            while (j < n) { acc += (qv(j) * cent(j)).toDouble; j += 1 }
            acc
          }
          c -> (qid, lut, bias)
        }
      }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2) }
    val bcq = queries.sparkSession.sparkContext.broadcast(cellMap)
    // same mis-paired-codebook contract as [[pqSearch]]: wrong code
    // length raises, it never silently drops candidates. The check runs
    // on every scanned row, not just probed cells — a bad frame fails on
    // the first action instead of whenever a probe happens to land on it.
    val mm = m
    val scoreCell = udf { (nid: Long, cell: Int, codesRow: Seq[Int]) =>
      val cs = codesRow.toArray
      if (cs.length != mm) throw new IllegalArgumentException(
        s"ivfPqSearch: codes row for id $nid has ${cs.length} codes but " +
          s"the codebook has m = $mm subspaces — the index was encoded " +
          "with a different codebook; re-encode or pass the matching one")
      bcq.value.get(cell) match {
        case None => Seq.empty[(Long, Double)]
        case Some(qs) =>
          val out = new scala.collection.mutable.ArrayBuffer[(Long, Double)](qs.length)
          var qi = 0
          while (qi < qs.length) {
            val (qid, lut, bias) = qs(qi)
            if (qid != nid) {
              var acc = bias
              var s = 0
              while (s < cs.length) { acc += lut(s)(cs(s)); s += 1 }
              out += ((qid, acc))
            }
            qi += 1
          }
          out.toSeq
      }
    }
    // probe-union predicate for source-level pruning, exactly like
    // [[ivfSearchIndexed]] — on a cell-partitioned code frame the
    // unprobed partitions are never read
    val probedCells = cellMap.keys.toSeq
    val scored = checked
      .where(col(idCol).isNotNull && col("codes").isNotNull &&
        col("cell").isin(probedCells: _*))
      .select(col(idCol).cast(LongType).as("neighbor_id"), col("cell"), col("codes"))
      .select(col("neighbor_id"),
        explode(scoreCell(col("neighbor_id"), col("cell"), col("codes"))).as("t"))
      .select(col("t._1").cast(idT).as("query_id"), col("neighbor_id"),
        col("t._2").as("score"))
    rankTopK(scored, k, idT)
  }
}
