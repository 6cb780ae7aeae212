package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** PAIR recall of the embedding near-dup generators at REALISTIC
  * perturbation — the planted-twin oracles (x11/x50/x51) pair
  * identical-direction twins whose signatures/cells collide by
  * construction, so they cannot see the real failure mode: a true
  * 0.95-cosine near-duplicate that straddles one hyperplane or one
  * Voronoi boundary is never scored. This spec plants twins at cosine
  * 0.93–0.99 (straddling the 0.95 default threshold), computes the
  * EXACT all-pairs ground truth, and measures what fraction each
  * generator finds — at the historical defaults AND with the
  * multi-probe dials this round added. Every corpus value is
  * hash-derived (splitmix64, no RNG), so each recall number below is a
  * constant of the implementation; the measured table is recorded in
  * SCALE.md §near-dup-pair-recall.
  */
class NearDupRecallSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private val Dims = 64
  private val Bases = 300
  private val Twins = 150
  private val Threshold = 0.95

  /** splitmix64 → [-1, 1). Deterministic, well-mixed, dependency-free. */
  private def h(a: Long, b: Long): Double = {
    var x = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L + 0x2545F4914F6CDD1DL
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private def base(i: Int): Array[Float] =
    Array.tabulate(Dims)(j => h(i.toLong * Dims + j, 7L).toFloat)

  /** Twin i: base i plus noise scaled for target cosine 0.93 + 0.06·i/(T−1)
    * — an even spread straddling the 0.95 default. The noise direction is
    * not exactly orthogonal, so realized cosines scatter around the
    * target; ground truth below is computed from the REALIZED vectors.
    */
  private def twin(i: Int): Array[Float] = {
    val b = base(i)
    val target = 0.93 + 0.06 * i.toDouble / (Twins - 1)
    val eps = math.sqrt(1.0 / (target * target) - 1.0)
    val bn = math.sqrt(b.map(x => x.toDouble * x).sum)
    Array.tabulate(Dims) { j =>
      val nj = h((i.toLong << 20) | j.toLong, 11L)
      (b(j) + eps * bn * nj / math.sqrt(Dims / 3.0)).toFloat
    }
  }

  private lazy val rows: Seq[(Long, Array[Float])] =
    (0 until Bases).map(i => (i.toLong, base(i))) ++
      (0 until Twins).map(i => (10000L + i, twin(i)))

  private lazy val corpus = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "embedding").cache()
    df.count()
    df
  }

  /** Exact all-pairs ground truth at the threshold, driver-side. */
  private lazy val truth: Set[(Long, Long)] = {
    val arr = rows.toArray
    val out = Set.newBuilder[(Long, Long)]
    var a = 0
    while (a < arr.length) {
      var b = a + 1
      while (b < arr.length) {
        if (Similarity.cosineArrF(arr(a)._2, arr(b)._2) >= Threshold) {
          val (x, y) = (arr(a)._1, arr(b)._1)
          out += ((math.min(x, y), math.max(x, y)))
        }
        b += 1
      }
      a += 1
    }
    out.result()
  }

  private def found(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
  }

  private def recall(s: Set[(Long, Long)]): Double =
    s.intersect(truth).size.toDouble / truth.size

  test("ground truth is well-formed: a threshold-straddling planted-pair set") {
    // roughly half the twins target cosine >= 0.95; noise scatters a few
    // across the boundary in each direction — the interesting regime
    info(s"exact ground-truth pairs at >= $Threshold: ${truth.size}")
    assert(truth.size > 40 && truth.size < Twins,
      s"geometry drifted: ${truth.size} true pairs")
    // no accidental base-base pairs at dim 64 (they'd muddy pair recall)
    assert(truth.forall { case (a, b) => b >= 10000L && a < 10000L })
  }

  test("LSH pair recall: exact-bucket defaults miss threshold pairs; probeDepth recovers them") {
    val d0 = found(Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nBits = 12, probeDepth = 0))
    val d1 = found(Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nBits = 12, probeDepth = 1))
    val d2 = found(Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nBits = 12, probeDepth = 2))
    val (r0, r1, r2) = (recall(d0), recall(d1), recall(d2))
    info(f"cosineDedupPairs nBits=12 depth=0 pair-recall = $r0%.3f (${d0.size} pairs)")
    info(f"cosineDedupPairs nBits=12 depth=1 pair-recall = $r1%.3f (${d1.size} pairs)")
    info(f"cosineDedupPairs nBits=12 depth=2 pair-recall = $r2%.3f (${d2.size} pairs)")
    // found pairs are exact-cosine-verified, so precision is 1 by
    // construction — a violation means the scorer drifted from cosineArrF
    assert(d0.subsetOf(truth) && d1.subsetOf(truth) && d2.subsetOf(truth))
    // deeper probing only adds candidate buckets
    assert(d0.subsetOf(d1) && d1.subsetOf(d2))
    // the measured constants (deterministic corpus): the exact-bucket
    // default finds well under half the true pairs — this is the gap the
    // probe dial exists for — and depth 2 clears 0.9
    assert(r0 < 0.6, f"exact-bucket recall unexpectedly high: $r0%.3f")
    assert(r2 >= 0.9, f"depth-2 pair recall = $r2%.3f")
  }

  test("LSH pair recall at nBits=16: the scale recipe (raise bits, then probe) clears 0.9") {
    // SCALE.md's ANN recipe says scale-up should RAISE nBits (smaller
    // corpus fraction per bucket) and buy recall back with the probe
    // dial. These rows measure the PAIR-generator recall of that recipe
    // — the candidate-volume comparison is in ProbedPairsProbe/SCALE.md.
    val d1 = found(Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nBits = 16, probeDepth = 1))
    val d2 = found(Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nBits = 16, probeDepth = 2))
    val (r1, r2) = (recall(d1), recall(d2))
    info(f"cosineDedupPairs nBits=16 depth=1 pair-recall = $r1%.3f (${d1.size} pairs)")
    info(f"cosineDedupPairs nBits=16 depth=2 pair-recall = $r2%.3f (${d2.size} pairs)")
    assert(d1.subsetOf(truth) && d2.subsetOf(truth))
    assert(d1.subsetOf(d2))
  }

  test("the out-of-the-box defaults reach the measured-recall bar (>= 0.9 pair recall)") {
    // r14's verdict: a default-config user must not get the
    // 0.419-recall exact-bucket behavior silently. These calls pass NO
    // dials — whatever the defaults are, their measured pair recall on
    // the threshold-straddling corpus must clear 0.9.
    val lsh = found(Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold))
    val rLsh = recall(lsh)
    info(f"cosineDedupPairs DEFAULT config pair-recall = $rLsh%.3f (${lsh.size} pairs)")
    assert(lsh.subsetOf(truth))
    assert(rLsh >= 0.9, f"default cosineDedupPairs pair recall = $rLsh%.3f")
    val sem = found(Similarity.semanticDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nlist = 64))
    val rSem = recall(sem)
    info(f"semanticDedupPairs DEFAULT config pair-recall = $rSem%.3f (${sem.size} pairs)")
    assert(sem.subsetOf(truth))
    assert(rSem >= 0.9, f"default semanticDedupPairs pair recall = $rSem%.3f")
  }

  test("semantic pair recall: single-cell defaults miss boundary pairs; probeCells recovers them") {
    val cents = Similarity.ivfTrain(corpus, "vec_id", "embedding",
      nlist = 64, lloydPasses = 1)
    def run(p: Int): Set[(Long, Long)] =
      found(Similarity.semanticDedupPairsCounted(corpus, "vec_id", "embedding",
        cents, Threshold, 10000, probeCells = p)._1)
    val (c1, c2, c3) = (run(1), run(2), run(3))
    val (r1, r2, r3) = (recall(c1), recall(c2), recall(c3))
    info(f"semanticDedupPairs nlist=64 probeCells=1 pair-recall = $r1%.3f (${c1.size} pairs)")
    info(f"semanticDedupPairs nlist=64 probeCells=2 pair-recall = $r2%.3f (${c2.size} pairs)")
    info(f"semanticDedupPairs nlist=64 probeCells=3 pair-recall = $r3%.3f (${c3.size} pairs)")
    assert(c1.subsetOf(truth) && c2.subsetOf(truth) && c3.subsetOf(truth))
    assert(c1.subsetOf(c2) && c2.subsetOf(c3))
    assert(r2 >= r1 && r3 >= r2)
    // measured constants: 2-cell probing must clear 0.9 on this geometry
    assert(r2 >= 0.9, f"probeCells=2 pair recall = $r2%.3f")
  }

  test("probed fast path matches the generic joined path (string ids), scores bit-identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, format_string}
    val sdf = corpus.select(
      format_string("d%05d", col("vec_id")).as("vec_id"), col("embedding"))
    val fast = Similarity.cosineDedupPairs(corpus, "vec_id", "embedding",
      threshold = Threshold, nBits = 12, probeDepth = 2)
      .select($"id_a", $"id_b", $"score").as[(Long, Long, Double)].collect().toSet
    val joined = Similarity.cosineDedupPairs(sdf, "vec_id", "embedding",
      threshold = Threshold, nBits = 12, probeDepth = 2)
      .select($"id_a", $"id_b", $"score").as[(String, String, Double)].collect().toSet
    assert(joined == fast.map { case (a, b, s) => (f"d$a%05d", f"d$b%05d", s) },
      s"probed paths disagree: fast=${fast.size} joined=${joined.size}")
  }
}
