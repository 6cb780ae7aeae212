package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Principal-component analysis for embedding columns — the standard
  * decorrelation / dimensionality-reduction step ahead of ANN indexing
  * and semantic dedup (whitening makes cosine thresholds comparable
  * across dimensions; k < d cuts standing-index width before
  * [[Similarity.lshIndex]]/[[Similarity.pqEncode]]). The reference has
  * no embedding surface at all — this is part of the beyond-reference
  * training-data family, alongside the quantize/normalize ops.
  *
  * Scale shape: training is ONE aggregate pass over the corpus — each
  * task folds its rows into (n, Σx, upper-triangular Σx⊗x), which is
  * d + d(d+1)/2 doubles of state (~17 KB at d = 64), map-side
  * combined like any aggregate; no vector ever shuffles and nothing
  * row-sized reaches the driver. The d×d covariance eigendecomposition
  * runs on the driver (d is the embedding width — tiny by
  * construction; 64×64 is microseconds). Component sign is fixed by
  * making each component's largest-|coordinate| entry positive, so
  * independent runs and engines agree on direction, not just span.
  * Projection is a compiled per-row kernel over the broadcast model —
  * a scan, like the rest of the stateless embedding family.
  *
  * Determinism: moment sums are plain double additions — for
  * integer-valued features under 2^53 they are EXACT in any partition
  * order (the x76 oracle exploits this); for float embeddings they are
  * deterministic to reduction-order noise (~1e-12 relative), which the
  * spec pins with layout-independence tolerances.
  */
object Pca {

  /** `components` is k rows × d (unit length, sign-fixed);
    * `explainedVariance` the matching eigenvalues, descending.
    */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
      explainedVariance: Array[Double]) {
    def d: Int = mean.length
    def k: Int = components.length
  }

  /** Aggregation buffer: count, per-dim sums, upper-triangular sums of
    * x⊗x flattened row-major ((i,j) with j ≥ i).
    */
  case class Moments(n: Long, s: Array[Double], g: Array[Double])

  private final class MomentAgg(d: Int)
      extends Aggregator[Array[Double], Moments, Moments] {
    def zero: Moments =
      Moments(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    def reduce(b: Moments, x: Array[Double]): Moments = {
      if (x.length != d)
        throw new IllegalArgumentException(
          s"pcaTrain: ragged vector width ${x.length}, expected $d " +
            "(all embeddings must share one width)")
      var i = 0
      var t = 0
      while (i < d) {
        b.s(i) += x(i)
        var j = i
        while (j < d) { b.g(t) += x(i) * x(j); t += 1; j += 1 }
        i += 1
      }
      Moments(b.n + 1, b.s, b.g)
    }
    def merge(a: Moments, b: Moments): Moments = {
      var i = 0
      while (i < d) { a.s(i) += b.s(i); i += 1 }
      var t = 0
      val len = a.g.length
      while (t < len) { a.g(t) += b.g(t); t += 1 }
      Moments(a.n + b.n, a.s, a.g)
    }
    def finish(r: Moments): Moments = r
    def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Train a PCA model: top-`k` principal components of the population
    * covariance of `vecCol` (array of numeric, one shared width). Null
    * rows are skipped; null ELEMENTS are a decode error by design (an
    * embedding with missing dimensions is corrupt input, not data).
    */
  def pcaTrain(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val spark = df.sparkSession
    val vecs = df.select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .where(col("v").isNotNull)
    val head = vecs.limit(1).collect()
    require(head.nonEmpty, "pcaTrain: no non-null vectors to train on")
    val d = head(0).getSeq[Double](0).length
    require(k >= 1 && k <= d, s"pcaTrain: need 1 <= k <= d=$d, got $k")
    implicit val enc: Encoder[Array[Double]] = spark.implicits.newDoubleArrayEncoder
    val m = vecs.as[Array[Double]]
      .select(new MomentAgg(d).toColumn)
      .head()
    val n = m.n.toDouble
    val mean = m.s.map(_ / n)
    val cov = breeze.linalg.DenseMatrix.tabulate[Double](d, d) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      val t = lo * d - lo * (lo - 1) / 2 + (hi - lo)
      m.g(t) / n - mean(lo) * mean(hi)
    }
    val es = breeze.linalg.eigSym(cov) // eigenvalues ascending
    val comps = new Array[Array[Double]](k)
    val vars = new Array[Double](k)
    var r = 0
    while (r < k) {
      val idx = d - 1 - r
      vars(r) = es.eigenvalues(idx)
      val c = Array.tabulate(d)(i => es.eigenvectors(i, idx))
      // sign fix: first largest-|coordinate| entry made positive
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(c(i)) > math.abs(c(best))) best = i; i += 1 }
      comps(r) = if (c(best) < 0) c.map(x => -x) else c
      r += 1
    }
    PcaModel(mean, comps, vars)
  }

  /** Project `vecCol` onto the model's components: out_j =
    * (x − mean) · c_j, emitted as `array<float>` so the result feeds
    * the ANN/dedup family directly. `whiten = true` additionally
    * divides each output dimension by sqrt(variance + eps) — unit
    * variance per retained component, the SemDeDup-style
    * preconditioning. Compiled per-row kernel over the broadcast
    * model; null vectors project to null; a width mismatch raises the
    * pcaTrain message rather than silently mis-projecting.
    */
  def pcaProject(df: DataFrame, vecCol: String, model: PcaModel,
      outCol: String = "pca", whiten: Boolean = false,
      eps: Double = 1e-9): DataFrame = {
    val d = model.d
    val scaled =
      if (!whiten) model.components
      else model.components.zip(model.explainedVariance).map { case (c, v) =>
        val s = 1.0 / math.sqrt(v + eps); c.map(_ * s)
      }
    val bc = df.sparkSession.sparkContext.broadcast((model.mean, scaled))
    val project = udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val x = v.toArray // Spark hands UDFs linked Seqs; index via array
        val (mean, comps) = bc.value
        if (x.length != d)
          throw new IllegalArgumentException(
            s"pcaProject: vector width ${x.length}, model expects $d")
        val out = new Array[Float](comps.length)
        var r = 0
        while (r < comps.length) {
          val c = comps(r)
          var acc = 0.0
          var i = 0
          while (i < d) { acc += (x(i) - mean(i)) * c(i); i += 1 }
          out(r) = acc.toFloat
          r += 1
        }
        out
      }
    }
    df.withColumn(outCol, project(col(vecCol).cast(ArrayType(DoubleType))))
  }
}
