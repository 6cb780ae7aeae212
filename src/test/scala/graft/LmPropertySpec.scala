package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

/** Property fuzz of the bigram-LM family against an independent
  * driver-side reference model built from the documented contracts:
  *
  *   - tokenize: lowercase, split on [^a-z0-9]+, drop empties (the
  *     shared [[TextAnalysis.tokens]] definition);
  *   - vocab: top `vocabSize` tokens by (count desc, token asc);
  *     everything else maps to `<unk>`;
  *   - uni: vocab counts plus one `<unk>` row carrying the remainder
  *     (present even when zero);
  *   - bi: mapped-bigram counts capped to top `maxBigrams` by
  *     (count desc, w1 asc, w2 asc);
  *   - score: p(w2|w1) = (c12 + α) / (c1 + α·V), V = |uni|; H = bits
  *     per transition, left-to-right accumulation; < 2 tokens → H = 0.
  *
  * Corpora are hash-derived (deterministic, no RNG) over a small word
  * alphabet so bigram repetition, cap-boundary ties, empty docs, and
  * OOV-free corners all actually occur.
  */
class LmPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  // --- reference model (independent re-derivation, not the impl) ---

  private def refTokens(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  private case class RefModel(uni: Map[String, Long], bi: Map[(String, String), Long],
      vocab: Set[String])

  private def refModel(texts: Seq[String], vocabSize: Int, maxBigrams: Int): RefModel = {
    val all = texts.flatMap(refTokens)
    val counts = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(vocabSize)
      .map(_._1).toSet
    def m(t: String) = if (vocab(t)) t else "<unk>"
    val uni = counts.filter { case (t, _) => vocab(t) } +
      ("<unk>" -> (all.size.toLong - counts.filter { case (t, _) => vocab(t) }.values.sum))
    val bigrams = texts.flatMap { tx =>
      val ts = refTokens(tx).map(m)
      ts.zip(ts.drop(1))
    }
    val biCounts = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = biCounts.toSeq.sortBy { case ((w1, w2), n) => (-n, w1, w2) }
      .take(maxBigrams).toMap
    RefModel(uni, bi, vocab)
  }

  private def refScore(text: String, model: RefModel, alpha: Double):
      (Long, Long, Long, Double) = {
    val ts = refTokens(text)
    val m = ts.map(t => if (model.vocab(t)) t else "<unk>")
    val nOov = m.count(_ == "<unk>").toLong
    val v = model.uni.size.toDouble
    var known = 0L
    var lp = 0.0
    var i = 0
    while (i < m.length - 1) {
      val c12 = model.bi.getOrElse((m(i), m(i + 1)), 0L)
      if (c12 > 0) known += 1
      val c1 = model.uni.getOrElse(m(i), 0L)
      lp += math.log((c12 + alpha) / (c1 + alpha * v))
      i += 1
    }
    val h = if (m.length >= 2) -lp / ((m.length - 1) * math.log(2.0)) else 0.0
    (m.length.toLong, nOov, known, h)
  }

  // --- deterministic corpora ---

  private def h64(a: Long, b: Long): Long = {
    var x = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L + 0x2545F4914F6CDD1DL
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private val Words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "x1", "x2", "x3")

  private def mkDoc(id: Long, salt: Long): String = {
    val n = (math.floorMod(h64(id, salt), 9)).toInt // 0..8 tokens: empties + singles occur
    (0 until n).map(j =>
      Words(math.floorMod(h64(id * 31 + j, salt + 1), Words.length).toInt))
      .mkString(" ") + (if (id % 4 == 0) "!?." else "") // punctuation-only tails
  }

  private def check(label: String, texts: Seq[String], vocabSize: Int,
      maxBigrams: Int, alpha: Double): Unit = {
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.bigramModel(docs, "text", vocabSize, maxBigrams)
    val want = refModel(texts, vocabSize, maxBigrams)
    val gotUni = uni.as[(String, Long)].collect().toMap
    assert(gotUni == want.uni, s"$label: unigram model")
    val gotBi = bi.as[(String, String, Long)].collect()
      .map { case (w1, w2, n) => (w1, w2) -> n }.toMap
    assert(gotBi == want.bi, s"$label: bigram model")
    val got = TextAnalysis.lmScore(docs, "text", "doc_id", uni, bi, alpha)
      .select("doc_id", "n_tokens", "n_oov", "n_known_bigrams", "cross_entropy")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (wn, woov, wknown, wh) = refScore(t, want, alpha)
      val (gn, goov, gknown, gh) = got(i.toLong)
      assert((gn, goov, gknown) == ((wn, woov, wknown)),
        s"$label doc $i: counts got ($gn,$goov,$gknown) want ($wn,$woov,$wknown)")
      assert(math.abs(gh - wh) <= 1e-12 * math.max(1.0, math.abs(wh)),
        s"$label doc $i: H got $gh want $wh")
    }
  }

  test("model + score equal the naive reference (uncapped regime)") {
    val texts = (0L until 60L).map(mkDoc(_, 7L))
    check("uncapped", texts, vocabSize = 100, maxBigrams = 1000, alpha = 0.1)
  }

  test("vocab cap bites: OOV mass moves to <unk>, ties break by token text") {
    // 13-word alphabet, vocab 5: count ties at the boundary are broken
    // (count desc, token asc) identically in both engines
    val texts = (0L until 80L).map(mkDoc(_, 11L))
    check("vocab-capped", texts, vocabSize = 5, maxBigrams = 1000, alpha = 0.1)
  }

  test("bigram cap bites: known-bigram evidence counts only surviving rows") {
    val texts = (0L until 80L).map(mkDoc(_, 13L))
    check("bigram-capped", texts, vocabSize = 8, maxBigrams = 10, alpha = 0.5)
  }

  test("degenerate docs: empty, punctuation-only, single-token all score H = 0") {
    val texts = Seq("", "?!.", "alpha", "alpha beta", "  ", "x1")
    check("degenerate", texts, vocabSize = 3, maxBigrams = 5, alpha = 0.1)
  }

  test("OOV-free corpus keeps a zero-count <unk> row (V stays vocab + 1)") {
    val texts = Seq("alpha beta alpha", "beta alpha beta")
    check("oov-free", texts, vocabSize = 10, maxBigrams = 10, alpha = 0.1)
    import spark.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (uni, _) = TextAnalysis.bigramModel(docs, "text", 10, 10)
    assert(uni.as[(String, Long)].collect().toMap.get("<unk>").contains(0L))
  }

  test("lmScore refuses an over-cap model frame actionably") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma delta eps zeta")).toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.bigramModel(docs, "text", 100, 100)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.lmScore(docs, "text", "doc_id", uni, bi, maxModelRows = 2).collect()
    }
    assert(e.getMessage.contains("maxModelRows"))
  }

  test("lmScore refuses input columns that collide with its four outputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val docs = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val (uni, bi) = TextAnalysis.bigramModel(docs, "text", 10, 10)
    // realistic collision: chunkDocuments emits n_tokens — lmScore's
    // withColumn would silently overwrite it without the guard
    val chunked = TextAnalysis.chunkDocuments(docs, "text", "doc_id",
      maxTokens = 2, overlap = 0)
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.lmScore(chunked, "chunk_text", "doc_id", uni, bi)
    }
    assert(e1.getMessage.contains("n_tokens"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.lmScore(docs.withColumn("cross_entropy", lit(0.0)),
        "text", "doc_id", uni, bi)
    }
    assert(e2.getMessage.contains("cross_entropy"))
  }
}
