package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Dedup, TextAnalysis}
import graft.functions.TextHash

/** Property-fuzz of the INCREMENTAL dedup operators against naive
  * in-memory references (VERDICT r8 #5): x45/x46/x47 check planted
  * corpora; these properties pin the algebra over random token
  * structures —
  *
  *   - `sharedWindowIncrement`: an incoming doc drops IFF at least one
  *     of its n-token windows appears in the corpus window set (exact
  *     window equality — no tolerance, the reference is the definition).
  *   - `nearDupIncrement`: sound with banding tolerance — anything the
  *     operator DROPS must truly have exact shingle Jaccard ≥ threshold
  *     against some existing doc (verification is exact, so no false
  *     drops, ever), and anything at Jaccard 1.0 MUST drop (identical
  *     shingle sets give identical signatures, so every band collides —
  *     recall 1 by construction). Between threshold and 1.0 banding may
  *     deterministically miss; survivors there are legal.
  *
  * Tokenization in each reference mirrors the operator's compiled path:
  * the whitespace-class split for windows ([[TextAnalysis.TokenWsJava]]),
  * [a-z0-9] runs + the whole-text-if-short shingle rule for MinHash
  * ([[TextHash.tokenize]]/`shingleHashes`, `TextHash.scala:25-89`).
  */
class IncrementalDedupPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(40), Seed(4242L + i)))
    }

  private val token: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 8).flatMap(l => Gen.listOfN(l, Gen.alphaNumChar).map(_.mkString)),
    2 -> Gen.oneOf("the", "a", "of", "shared")) // repeats make collisions likely

  private val docGen: Gen[String] = Gen.frequency(
    8 -> (for {
      n    <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, token)
    } yield toks.mkString(" ")),
    1 -> Gen.oneOf("", " ", "\t \n"))

  /** Incoming docs derived from the corpus: exact copies, token-slice
    * fragments (share windows without being copies), fragments with a
    * fresh tail (near-dup territory), and fully fresh docs.
    */
  private def incomingGen(corpus: List[String]): Gen[String] = Gen.frequency(
    2 -> Gen.oneOf(corpus),
    3 -> (for {
      src   <- Gen.oneOf(corpus)
      toks   = src.split("\\s+").filter(_.nonEmpty)
      from  <- Gen.choose(0, math.max(0, toks.length - 1))
      len   <- Gen.choose(1, math.max(1, toks.length - from))
    } yield toks.slice(from, from + len).mkString(" ")),
    2 -> (for {
      src  <- Gen.oneOf(corpus)
      tail <- Gen.choose(1, 6)
      mark <- Gen.choose(0, 1000000)
    } yield (src + " " + (1 to tail).map(j => s"fz$mark$j").mkString(" ")).trim),
    2 -> docGen)

  private val caseGen: Gen[(List[String], List[String], Int)] = for {
    corpus   <- Gen.choose(4, 15).flatMap(Gen.listOfN(_, docGen))
    nonEmpty  = if (corpus.exists(_.trim.nonEmpty)) corpus else "seed doc" :: corpus
    incoming <- Gen.choose(4, 15).flatMap(Gen.listOfN(_, incomingGen(nonEmpty)))
    n        <- Gen.choose(2, 6)
  } yield (nonEmpty, incoming, n)

  // the operator's window tokenizer: Spark trim strips spaces only,
  // split keeps inner empties per the whitespace class
  private def spaceTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }
  private def wsToks(text: String): Array[String] = {
    val t = spaceTrim(text)
    if (t.isEmpty) Array.empty else t.split(TextAnalysis.TokenWsJava, -1)
  }

  test("fuzz: sharedWindowIncrement drops a doc iff it shares a window with the corpus") {
    import spark.implicits._
    forAllSeeded(caseGen, 8) { case (corpus, incoming, n) =>
      val existing = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = incoming.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val kept = Dedup.sharedWindowIncrement(existing, batch, "text", "doc_id", n)
        .select($"doc_id").as[Long].collect().toSet

      def windows(t: String): Set[String] =
        wsToks(t).sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
      val corpusWindows = corpus.flatMap(windows).toSet
      val want = incoming.zipWithIndex.collect {
        case (t, i) if (windows(t) intersect corpusWindows).isEmpty => 1000L + i
      }.toSet
      assert(kept == want, s"n=$n corpus=${corpus.take(3)}…")
    }
  }

  test("fuzz: nearDupIncrement never false-drops; exact shingle matches always drop") {
    import spark.implicits._
    val paramGen = for {
      c         <- caseGen
      threshold <- Gen.oneOf(0.5, 0.7, 0.9)
    } yield (c, threshold)

    forAllSeeded(paramGen, 8) { case ((corpus, incoming, _), threshold) =>
      val existing = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = incoming.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val kept = Dedup.nearDupIncrement(existing, batch, "text", "doc_id",
        threshold = threshold, numHashes = 32, bands = 8, shingleSize = 3)
        .select($"doc_id").as[Long].collect().toSet

      // the MinHash shingle reference: [a-z0-9]-run tokens, 3-token
      // shingles, whole text as ONE shingle when shorter (TextHash rule)
      def shingles(t: String): Set[String] = {
        val toks = TextHash.tokenize(t)
        if (toks.length <= 3) Set(toks.mkString(""))
        else toks.sliding(3).map(_.mkString("")).toSet
      }
      def jaccard(a: Set[String], b: Set[String]): Double =
        if ((a ++ b).isEmpty) 0.0
        else (a intersect b).size.toDouble / (a union b).size
      val exSh = corpus.map(shingles)
      val maxJ: Map[Long, Double] = incoming.zipWithIndex.map { case (t, i) =>
        val sh = shingles(t)
        (1000L + i) -> exSh.map(jaccard(sh, _)).max
      }.toMap

      incoming.indices.map(1000L + _).foreach { id =>
        if (!kept.contains(id))
          // dropped ⇒ genuinely over threshold (exact verification)
          assert(maxJ(id) >= threshold,
            s"false drop: doc $id maxJaccard=${maxJ(id)} < $threshold")
        if (maxJ(id) == 1.0)
          // identical shingle set ⇒ identical signature ⇒ recall 1
          assert(!kept.contains(id),
            s"doc $id has an exact shingle match but survived (threshold $threshold)")
      }
    }
  }

  test("fuzz: nearDupIncrementIndexed over a prebuilt band frame equals the per-call path") {
    import spark.implicits._
    // the standing-band contract: probing a bandIndex frame must return
    // the SAME kept set as re-signaturing the corpus per call — the two
    // paths share bandFrame, so any divergence is a refactor bug, and
    // this pins it across random token structures
    forAllSeeded(caseGen, 6) { case (corpus, incoming, _) =>
      val existing = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val batch = incoming.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select($"doc_id").as[Long].collect().toSet
      val direct = ids(Dedup.nearDupIncrement(existing, batch, "text",
        "doc_id", threshold = 0.7, numHashes = 32, bands = 8, shingleSize = 3))
      val idx = Dedup.bandIndex(existing, "text", "doc_id",
        numHashes = 32, bands = 8, shingleSize = 3)
      val viaIdx = ids(Dedup.nearDupIncrementIndexed(idx, existing, batch,
        "text", "doc_id", threshold = 0.7, numHashes = 32, bands = 8,
        shingleSize = 3))
      assert(viaIdx == direct, s"indexed=$viaIdx direct=$direct")
    }
  }
}
