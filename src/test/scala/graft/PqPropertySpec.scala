package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** Property fuzz of the PQ family against independent driver-side
  * reference models built from the documented contracts:
  *
  *   - split: m contiguous chunks of ceil(d/m) dims, last chunk shorter
  *     when m does not divide d; d = max seed length; ragged rows
  *     zero-pad/truncate to d;
  *   - assignment ([[Similarity.pqEncode]]): per subspace, the L2-argmin
  *     code over that subspace's codebook, first-index-wins on ties;
  *   - refinement ([[Similarity.pqTrain]]): position t of (subspace s,
  *     code j) becomes the mean of the padded members' value at that
  *     position; EMPTY (s, j) cells keep their seed subvector exactly;
  *   - search ([[Similarity.pqSearch]]): score = Σ_s <query subvector,
  *     codebook(s)(code_s)> — the ADC inner product against the
  *     reconstruction — ranked (score desc, neighbor_id asc), self
  *     excluded.
  *
  * Corpora are hash-derived (deterministic, no RNG) and include exact
  * duplicates (duplicate seeds → deterministic empty cells) and ragged
  * vector lengths.
  */
class PqPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // --- reference model (independent re-derivation, not the impl) ---

  private def refOffsets(d: Int, m: Int): Array[Int] = {
    val subLen = (d + m - 1) / m
    Array.tabulate(m + 1)(s => math.min(s * subLen, d))
  }

  private def refPad(v: Array[Float], d: Int): Array[Float] =
    Array.tabulate(d)(i => if (i < v.length) v(i) else 0.0f)

  private def refAssign(cb: Array[Array[Array[Float]]], offs: Array[Int],
      v0: Array[Float]): Array[Int] = {
    val v = refPad(v0, offs.last)
    cb.indices.map { s =>
      val sub = v.slice(offs(s), offs(s + 1))
      val dists = cb(s).map { c =>
        sub.indices.map(t => { val df = (sub(t) - c(t)).toDouble; df * df }).sum
      }
      dists.indexOf(dists.min) // first index on ties
    }.toArray
  }

  private def refLloyd(seeds: Array[Array[Array[Float]]], offs: Array[Int],
      vecs: Seq[Array[Float]]): Array[Array[Array[Float]]] = {
    val d = offs.last
    val padded = vecs.map(refPad(_, d))
    val codes = padded.map(refAssign(seeds, offs, _))
    seeds.indices.map { s =>
      val len = offs(s + 1) - offs(s)
      seeds(s).indices.map { j =>
        val members = padded.indices.filter(i => codes(i)(s) == j)
        if (members.isEmpty) seeds(s)(j)
        else Array.tabulate(len) { t =>
          (members.map(i => padded(i)(offs(s) + t).toDouble).sum / members.size).toFloat
        }
      }.toArray
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

  private def checkTrain(label: String, vecs: Seq[(Long, Array[Float])],
      m: Int, ksub: Int): Unit = {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    val seeds = Similarity.pqTrain(df, "vec_id", "embedding", m, ksub, lloydPasses = 0)
    val got = Similarity.pqTrain(df, "vec_id", "embedding", m, ksub, lloydPasses = 1)
    val d = seeds.map(_.head.length).sum
    val offs = refOffsets(d, m)
    val want = refLloyd(seeds, offs, vecs.map(_._2))
    assert(got.length == want.length, s"$label: subspace count")
    got.indices.foreach { s =>
      assert(got(s).length == want(s).length, s"$label: sub $s centroid count")
      got(s).indices.foreach { j =>
        assert(got(s)(j).length == want(s)(j).length, s"$label: sub $s code $j dim")
        got(s)(j).indices.foreach { t =>
          val g = got(s)(j)(t); val w = want(s)(j)(t)
          assert(math.abs(g - w) <= 1e-4f * math.max(1.0f, math.abs(w)),
            s"$label: sub $s code $j pos $t: got $g want $w")
        }
      }
    }
    // empty cells keep seeds EXACTLY
    val codes = vecs.map(v => refAssign(seeds, offs, v._2))
    got.indices.foreach { s =>
      val assigned = codes.map(_(s)).toSet
      seeds(s).indices.filterNot(assigned).foreach { j =>
        assert(got(s)(j).toSeq == seeds(s)(j).toSeq,
          s"$label: empty cell (sub $s, code $j) lost its seed")
      }
    }
  }

  test("Lloyd pass equals the naive per-(subspace, code) mean (m divides d)") {
    val vecs = (0L until 60L).map(i => i -> mkVec(i, 8, 7L))
    checkTrain("uniform", vecs, m = 4, ksub = 6)
  }

  test("Lloyd pass with m not dividing d: last subspace is shorter") {
    val vecs = (0L until 50L).map(i => i -> mkVec(i, 10, 11L))
    checkTrain("uneven", vecs, m = 4, ksub = 5) // chunks 3,3,3,1
  }

  test("Lloyd pass with exact duplicates: duplicate seeds leave empty cells that keep seeds") {
    val vecs = (0L until 60L).map(i => i -> mkVec(i % 10, 6, 13L))
    checkTrain("duplicates", vecs, m = 3, ksub = 8)
  }

  test("Lloyd pass survives ragged vector lengths (zero-pad to trained d)") {
    val vecs = (0L until 48L).map(i => i -> mkVec(i, 3 + (i % 6).toInt, 17L))
    checkTrain("ragged", vecs, m = 4, ksub = 5)
  }

  test("pqEncode equals the naive per-subspace argmin; stable across partitioning") {
    import spark.implicits._
    val vecs = (0L until 80L).map(i => i -> mkVec(i, 12, 19L))
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", m = 4, ksub = 8, lloydPasses = 1)
    val d = cb.map(_.head.length).sum
    val offs = refOffsets(d, 4)
    val want = vecs.map { case (id, v) => id -> refAssign(cb, offs, v).toSeq }.toMap
    def codesOf(frame: org.apache.spark.sql.DataFrame): Map[Long, Seq[Int]] =
      Similarity.pqEncode(frame, "vec_id", "embedding", cb)
        .as[(Long, Seq[Int])].collect().toMap
    val got = codesOf(df)
    assert(got == want)
    assert(codesOf(df.repartition(7)) == want, "codes changed under repartitioning")
  }

  test("ivfPqSearch with nprobe = nlist equals pqSearch row for row; pruning only drops candidates") {
    import spark.implicits._
    val vecs = (0L until 120L).map(i => i -> mkVec(i, 8, 29L))
    val df = vecs.toDF("vec_id", "embedding")
    val queries = (0L until 8L).map(i => (2000L + i) -> mkVec(i * 7 + 2, 8, 29L))
      .toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", m = 4, ksub = 8, lloydPasses = 1)
    val cents = Similarity.ivfTrain(df, "vec_id", "embedding", nlist = 6, lloydPasses = 1)
    val idx = Similarity.ivfPqIndex(df, "vec_id", "embedding", cents, cb).cache()
    idx.count()
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      d.select($"query_id", $"rank", $"neighbor_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSet
    // all-cells probe = the flat ADC scan, bit-identical scores included
    val full = rows(Similarity.ivfPqSearch(idx, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = 6))
    val flat = rows(Similarity.pqSearch(
      Similarity.pqEncode(df, "vec_id", "embedding", cb), cb, queries,
      "vec_id", "embedding", k = 5))
    assert(full == flat)
    // pruned probe returns a SUBSET of the flat candidate pairs with
    // identical scores for what it does return (k large enough that the
    // flat run ranks every corpus row)
    val pruned = rows(Similarity.ivfPqSearch(idx, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = 2))
    val flatScores = rows(Similarity.pqSearch(
        Similarity.pqEncode(df, "vec_id", "embedding", cb), cb, queries,
        "vec_id", "embedding", k = 200))
      .map { case (q, _, n, s) => (q, n) -> s }.toMap
    pruned.foreach { case (q, _, n, s) =>
      assert(flatScores.get((q, n)).contains(s), s"pruned pair ($q, $n) score drifted")
    }
    idx.unpersist()
  }

  test("pqSearch equals the naive ADC ranking (score desc, id asc, self excluded)") {
    import spark.implicits._
    val vecs = (0L until 40L).map(i => i -> mkVec(i, 8, 23L))
    val df = vecs.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", m = 4, ksub = 8, lloydPasses = 1)
    val d = cb.map(_.head.length).sum
    val offs = refOffsets(d, 4)
    val queries = (0L until 5L).map(i => (1000L + i) -> mkVec(i * 3 + 1, 8, 23L))
    val k = 5
    val got = Similarity.pqSearch(
        Similarity.pqEncode(df, "vec_id", "embedding", cb), cb,
        queries.toDF("vec_id", "embedding"), "vec_id", "embedding", k = k)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val codes = vecs.map { case (id, v) => id -> refAssign(cb, offs, v) }
    val want = queries.flatMap { case (qid, qv0) =>
      val qv = refPad(qv0, d)
      codes.filter(_._1 != qid).map { case (nid, cs) =>
        val score = cb.indices.map { s =>
          val off = offs(s)
          val c = cb(s)(cs(s))
          c.indices.map(t => (qv(off + t) * c(t)).toDouble).sum
        }.sum
        (nid, score)
      }.sortBy { case (nid, sc) => (-sc, nid) }
        .take(k).zipWithIndex
        .map { case ((nid, _), r) => (qid, r + 1, nid) }
    }.toSet
    assert(got == want)
  }
}
