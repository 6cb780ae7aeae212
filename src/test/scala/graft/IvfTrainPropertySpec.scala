package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Property fuzz of [[Similarity.ivfTrain]]'s Lloyd refinement against an
  * independent driver-side reference model built from the documented
  * contract:
  *
  *   - assignment: each vector goes to the centroid with the highest
  *     cosine (argmin of negative cosine, eps 1e-30, first-index-wins on
  *     ties, distance over min(len) shared positions);
  *   - refinement: position p of cell c becomes the mean of v(p) over
  *     the cell's members that HAVE a position p; the refined array is
  *     sized max(seed length, max member position + 1), unfilled
  *     positions zero;
  *   - empty cells keep their seed vector exactly.
  *
  * Corpora are hash-derived (deterministic, no RNG) and include exact
  * duplicates (forcing duplicate seeds → deterministic empty cells) and
  * ragged vector lengths.
  */
class IvfTrainPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // --- reference model (independent re-derivation, not the impl) ---

  private def refCellScore(c: Array[Float], v: Array[Float]): Double = {
    var dot = 0.0; var nv = 0.0; var nc = 0.0
    val d = math.min(v.length, c.length)
    var i = 0
    while (i < d) { dot += v(i) * c(i); nv += v(i) * v(i); nc += c(i) * c(i); i += 1 }
    -(dot / (math.sqrt(nv) * math.sqrt(nc) + 1e-30))
  }

  private def refAssign(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestScore = refCellScore(cs(0), v); var c = 1
    while (c < cs.length) {
      val s = refCellScore(cs(c), v)
      if (s < bestScore) { best = c; bestScore = s } // strict < : first wins ties
      c += 1
    }
    best
  }

  private def refLloyd(seeds: Array[Array[Float]],
      vecs: Seq[Array[Float]]): Array[Array[Float]] = {
    val byCell = vecs.groupBy(v => refAssign(seeds, v))
    seeds.indices.map { c =>
      byCell.get(c) match {
        case None => seeds(c)
        case Some(members) =>
          val dim = math.max(seeds(c).length, members.map(_.length).max)
          Array.tabulate(dim) { p =>
            val have = members.filter(_.length > p)
            if (have.isEmpty) 0.0f
            else (have.map(_(p).toDouble).sum / have.size).toFloat
          }
      }
    }.toArray
  }

  // --- deterministic corpora ---

  private def h(a: Long, b: Long): Double = {
    var x = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L + 0x2545F4914F6CDD1DL
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private def mkVec(id: Long, dim: Int, salt: Long): Array[Float] =
    Array.tabulate(dim)(j => h(id * 131 + j, salt).toFloat)

  private def check(label: String, vecs: Seq[(Long, Array[Float])], nlist: Int): Unit = {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val seeds = Similarity.ivfTrain(df, "vec_id", "embedding", nlist, lloydPasses = 0)
    val got = Similarity.ivfTrain(df, "vec_id", "embedding", nlist, lloydPasses = 1)
    val want = refLloyd(seeds, vecs.map(_._2))
    assert(got.length == want.length, s"$label: centroid count")
    got.indices.foreach { c =>
      assert(got(c).length == want(c).length,
        s"$label: cell $c dim ${got(c).length} != ${want(c).length}")
      got(c).indices.foreach { p =>
        val g = got(c)(p); val w = want(c)(p)
        assert(math.abs(g - w) <= 1e-4f * math.max(1.0f, math.abs(w)),
          s"$label: cell $c pos $p: got $g want $w")
      }
    }
    // empty cells must keep seeds EXACTLY (not approximately): cells whose
    // reference assignment is empty must be bit-identical to the seed
    val assigned = vecs.map(v => refAssign(seeds, v._2)).toSet
    seeds.indices.filterNot(assigned).foreach { c =>
      assert(got(c).toSeq == seeds(c).toSeq, s"$label: empty cell $c lost its seed")
    }
  }

  test("Lloyd pass equals the naive per-cell mean (uniform dims)") {
    val vecs = (0L until 60L).map(i => i -> mkVec(i, 6, 7L))
    check("uniform", vecs, nlist = 8)
  }

  test("Lloyd pass with exact duplicates: duplicate seeds leave empty cells that keep seeds") {
    // 10 distinct directions, each repeated 6 times: seeds are drawn by
    // smallest xxhash64(id) so several seeds are IDENTICAL vectors; ties
    // assign to the first, leaving later duplicate-seed cells empty
    val vecs = (0L until 60L).map(i => i -> mkVec(i % 10, 5, 11L))
    check("duplicates", vecs, nlist = 8)
  }

  test("Lloyd pass survives ragged vector lengths") {
    // lengths cycle 3..8 — shared-prefix cosine for assignment, per-position
    // member counts for the means, refined dims = max(seed, longest member)
    val vecs = (0L until 48L).map(i => i -> mkVec(i, 3 + (i % 6).toInt, 13L))
    check("ragged", vecs, nlist = 6)
  }

  test("Lloyd pass with nlist > corpus rows degrades to per-vector cells") {
    val vecs = (0L until 5L).map(i => i -> mkVec(i, 4, 17L))
    check("tiny", vecs, nlist = 16)
  }
}
