package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Property-fuzz of the two round-7 text operators against naive in-memory
  * references (VERDICT r7 #5): the x41/x42 oracles check one corpus; these
  * properties pin the algebra over random token structures —
  *
  *   - `chunkDocuments`: chunk rows EXACTLY equal the naive sliding-window
  *     reference (which subsumes the individual invariants: every token
  *     index covered, consecutive chunks share exactly `overlap` tokens
  *     except the tail, count matches the ceil formula) for random
  *     (maxTokens, overlap) and adversarial separators (tabs, newlines,
  *     vertical tab U+000B, NBSP — the cross-engine whitespace set).
  *   - `dupNgramRatio`: exact value vs the naive sliding-n-gram reference,
  *     plus the range/degenerate-input contract (0 ≤ ratio < 1, 0 for
  *     fewer than n tokens).
  *
  * Tokenization in both the operator and the reference goes through the
  * SAME explicit class ([[TextAnalysis.TokenWsJava]]), so the properties
  * test the chunk/n-gram algebra, not regex-dialect luck.
  */
class TextOpsPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(40), Seed(777L + i)))
    }

  // ---- generators --------------------------------------------------------

  private val token: Gen[String] = Gen.frequency(
    6 -> Gen.choose(1, 8).flatMap(l => Gen.listOfN(l, Gen.alphaNumChar).map(_.mkString)),
    1 -> Gen.oneOf("a", "go", "go", "the")) // repeats make duplicate n-grams likely

  private val sep: Gen[String] = Gen.frequency(
    6 -> Gen.const(" "),
    1 -> Gen.oneOf("  ", "\t", "\n", " \n ", "", " ", "\r\n"))

  /** A document: tokens joined by random whitespace runs, sometimes with
    * leading/trailing whitespace, sometimes empty or whitespace-only.
    */
  private val docGen: Gen[String] = Gen.frequency(
    8 -> (for {
      n    <- Gen.frequency(4 -> Gen.choose(1, 60), 1 -> Gen.choose(61, 200))
      toks <- Gen.listOfN(n, token)
      seps <- Gen.listOfN(math.max(0, n - 1), sep)
      lead <- Gen.oneOf("", " ", "\t")
      tail <- Gen.oneOf("", " ", "\n")
    } yield lead + toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString + tail),
    1 -> Gen.oneOf("", " ", " \t\n ", ""))

  private val corpusGen: Gen[List[String]] = Gen.choose(5, 25).flatMap(Gen.listOfN(_, docGen))

  /** The SAME tokenizer both operators compile to. Two deliberate
    * Spark-isms the reference must mirror (both shared by DuckDB, so
    * oracle parity holds; Java's defaults differ on both):
    *   - Spark/DuckDB `trim` strips ONLY spaces (U+0020); Java
    *     `String.trim` strips everything ≤ U+0020.
    *   - Spark `split` keeps trailing empty tokens (limit -1); Java's
    *     1-arg `String.split` drops them.
    * So a tab-led document tokenizes with a leading "" token in every
    * engine — consistent, if surprising.
    */
  private def spaceTrim(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }
  private def toksOf(text: String): Array[String] = {
    val t = spaceTrim(text)
    if (t.isEmpty) Array.empty else t.split(TextAnalysis.TokenWsJava, -1)
  }

  // ---- chunkDocuments ----------------------------------------------------

  test("fuzz: chunkDocuments equals the naive sliding-window reference") {
    import spark.implicits._
    val paramGen = for {
      maxTokens <- Gen.choose(2, 24)
      overlap   <- Gen.choose(0, maxTokens - 1)
      docs      <- corpusGen
    } yield (maxTokens, overlap, docs)

    forAllSeeded(paramGen, 12) { case (maxTokens, overlap, docs) =>
      val stride = maxTokens - overlap
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.chunkDocuments(df, "text", "doc_id", maxTokens, overlap)
        .as[(Long, Int, String, Int)].collect().toSeq.sorted

      val want = docs.zipWithIndex.flatMap { case (text, i) =>
        val toks = toksOf(text)
        if (toks.isEmpty) Nil
        else {
          val nChunks = math.max(0,
            math.ceil((toks.length - maxTokens).toDouble / stride).toInt) + 1
          (0 until nChunks).map { c =>
            val w = toks.slice(c * stride, c * stride + maxTokens)
            (i.toLong, c, w.mkString(" "), w.length)
          }
        }
      }.sorted
      assert(got == want, s"maxTokens=$maxTokens overlap=$overlap")

      // redundant with the exact equality, but assert the headline
      // invariants explicitly so a failure names the broken contract:
      want.groupBy(_._1).foreach { case (id, chunks) =>
        val toks = toksOf(docs(id.toInt))
        // chunk count matches the ceil formula
        assert(chunks.length ==
          math.max(0, math.ceil((toks.length - maxTokens).toDouble / stride).toInt) + 1)
        // every token index is covered by at least one chunk
        val covered = chunks.map(_._2).flatMap(c =>
          c * stride until math.min(c * stride + maxTokens, toks.length))
        assert(covered.toSet == toks.indices.toSet, s"doc $id coverage")
        // consecutive chunks share EXACTLY `overlap` tokens: a non-last
        // chunk is always full (the ceil formula places the last window
        // start inside the doc), so shared = aEnd - bStart = overlap
        chunks.sortBy(_._2).sliding(2).foreach {
          case Seq(a, b) =>
            val aEnd = math.min(a._2 * stride + maxTokens, toks.length)
            val bStart = b._2 * stride
            assert(aEnd - bStart == overlap, s"doc $id chunks ${a._2}/${b._2}")
          case _ => ()
        }
      }
    }
  }

  // ---- sharedWindowFlags ---------------------------------------------------

  test("fuzz: sharedWindowFlags equals the naive min-owner reference") {
    import spark.implicits._
    val paramGen = for {
      n    <- Gen.choose(2, 6)
      docs <- corpusGen
      // planted copies guarantee real collisions beyond generator luck
      dupOf <- Gen.someOf(docs.indices)
    } yield (n, docs, dupOf.toList)

    forAllSeeded(paramGen, 10) { case (n, docs, dupOf) =>
      val all = docs ++ dupOf.map(docs)
      val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.ops.Dedup.sharedWindowFlags(df, "text", "doc_id", n)
        .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

      val windows: Seq[(Long, Seq[String])] = all.zipWithIndex.map { case (t, i) =>
        i.toLong -> toksOf(t).sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq.distinct
      }
      val owner: Map[String, Long] = windows
        .flatMap { case (id, ws) => ws.map(_ -> id) }
        .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).min }
      windows.foreach { case (id, ws) =>
        val shared = ws.count(w => owner(w) < id)
        assert(got(id) == ((shared.toLong, shared == 0)), s"doc $id n=$n")
      }
      assert(got.size == all.length)
    }
  }

  // ---- rareTokenRatio ------------------------------------------------------

  test("fuzz: rareTokenRatio equals the naive corpus-count reference") {
    import spark.implicits._
    val paramGen = for {
      minCount <- Gen.choose(1, 6)
      docs     <- corpusGen
    } yield (minCount, docs)

    forAllSeeded(paramGen, 10) { case (minCount, docs) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.rareTokenRatio(df, "text", "doc_id", minCount.toLong)
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

      // the operator's `tokens()`: lowercase, split on [^a-z0-9]+, drop empties
      def alnumToks(t: String): Seq[String] =
        t.toLowerCase.split("[^a-z0-9]+", -1).toSeq.filter(_.nonEmpty)
      val counts = docs.flatMap(alnumToks).groupBy(identity).map { case (k, v) => k -> v.size }
      docs.zipWithIndex.foreach { case (t, i) =>
        val toks = alnumToks(t)
        val rare = toks.count(tk => counts(tk) < minCount)
        val want =
          if (toks.isEmpty) (0L, 0.0)
          else (rare.toLong, rare.toDouble / toks.length)
        assert(got(i.toLong) == want, s"doc $i minCount=$minCount")
      }
    }
  }

  // ---- dupNgramRatio -----------------------------------------------------

  test("fuzz: dupNgramRatio equals the naive n-gram reference, in [0, 1)") {
    import spark.implicits._
    val paramGen = for {
      n    <- Gen.choose(2, 5)
      docs <- corpusGen
    } yield (n, docs)

    forAllSeeded(paramGen, 12) { case (n, docs) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = df.select($"doc_id", TextAnalysis.dupNgramRatio($"text", n).as("r"))
        .as[(Long, Double)].collect().toMap

      docs.zipWithIndex.foreach { case (text, i) =>
        val toks = toksOf(text)
        // same small-integer division in double → bit-identical, compare exactly
        val want =
          if (toks.length < n) 0.0
          else {
            val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
            1.0 - grams.distinct.length.toDouble / grams.length
          }
        assert(got(i.toLong) == want, s"doc $i n=$n text=${text.take(60)}")
        assert(got(i.toLong) >= 0.0 && got(i.toLong) < 1.0)
      }
    }
  }

  // ---- line ops ----------------------------------------------------------

  /** Lines drawn from a small pool per document so repeats are common;
    * punctuation endings, ban words, and leading/trailing spaces appear
    * randomly so every scrub rule fires somewhere in the corpus.
    */
  private val lineGen: Gen[String] = for {
    n    <- Gen.choose(0, 6)
    ws   <- Gen.listOfN(n, Gen.oneOf(
              "alpha", "beta", "Gamma", "the", "lorem", "ipsum",
              "JavaScript", "x1"))
    endP <- Gen.oneOf("", ".", "!", "?", "\"", ".")
    lead <- Gen.oneOf("", " ", "  ")
    tail <- Gen.oneOf("", " ")
  } yield lead + ws.mkString(" ") + endP + tail

  private val docFromPool: Gen[String] = for {
    pool <- Gen.listOfN(6, lineGen)
    n    <- Gen.choose(0, 15)
    idx  <- Gen.listOfN(n, Gen.choose(0, 5))
  } yield idx.map(pool).mkString("\n")

  test("fuzz: dedupDocLines equals the naive keep-first reference") {
    import spark.implicits._
    forAllSeeded(Gen.listOfN(15, docFromPool), 12) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df.select($"doc_id", TextAnalysis.dedupDocLines($"text").as("s"))
        .as[(Long, String)].collect().toMap
      docs.zipWithIndex.foreach { case (text, i) =>
        // Spark split keeps trailing empties (limit -1) — mirror it
        val want = text.split("\n", -1).toSeq.distinct.mkString("\n")
        assert(got(i.toLong) == want, s"doc $i: ${text.take(80)}")
      }
    }
  }

  test("fuzz: scrubLines equals the naive three-rule reference") {
    import spark.implicits._
    val minW = 3
    val banned = Seq("lorem ipsum", "javascript")
    forAllSeeded(Gen.listOfN(15, docFromPool), 12) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = df.select($"doc_id",
          graft.ops.TextFilters.scrubLines($"text").as("s"))
        .as[(Long, String)].collect().toMap
      docs.zipWithIndex.foreach { case (text, i) =>
        val want = text.split("\n", -1).toSeq.filter { l =>
          val t = spaceTrim(l)
          val words = if (t.isEmpty) 0
            else t.split(TextAnalysis.TokenWsJava, -1).count(_.nonEmpty)
          t.nonEmpty && """[.!?"]$""".r.findFirstIn(t).isDefined &&
            words >= minW && !banned.exists(t.toLowerCase.contains)
        }.mkString("\n")
        assert(got(i.toLong) == want, s"doc $i: ${text.take(80)}")
      }
    }
  }

  test("fuzz: scrubSpans equals the naive covered-union reference (n=3)") {
    import spark.implicits._
    import graft.ops.Decontaminate
    // small word alphabet → natural 3-gram overlap between random docs,
    // so spans, merges, and full-doc scrubs all occur without planting
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "x1", "x2")
    val doc = Gen.choose(0, 12).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpus = Gen.listOfN(24, doc)
    val n = 3
    forAllSeeded(corpus, 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val bench = docs.where($"doc_id" % 5 === 1).select($"text")
      // naive reference: tokens → bench gram set → covered-position union
      def toks(t: String): Array[String] =
        t.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      def gramsOf(t: String): Seq[Seq[String]] = {
        val ts = toks(t).toSeq
        if (ts.length < n) Seq.empty else ts.sliding(n).toSeq
      }
      val benchSet: Set[Seq[String]] = texts.zipWithIndex
        .filter(_._2 % 5 == 1).flatMap(x => gramsOf(x._1)).toSet
      val want = texts.zipWithIndex.map { case (t, i) =>
        val ts = toks(t)
        val covered = new Array[Boolean](ts.length)
        if (ts.length >= n)
          (0 to ts.length - n).foreach { s =>
            if (benchSet(ts.slice(s, s + n).toSeq))
              (s until s + n).foreach(covered(_) = true)
          }
        val removed = covered.count(identity)
        val spans = covered.indices.count(p => covered(p) && (p == 0 || !covered(p - 1)))
        val text = if (removed == 0) t
          else ts.indices.filterNot(covered).map(ts).mkString(" ")
        i.toLong -> ((text, spans, removed))
      }.toMap
      val got = Decontaminate.scrubSpans(docs, "text", "doc_id", bench, "text", n = n)
        .as[(Long, String, Int, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got == want)
      // Bloom prefilter path: output-identical
      val viaBloom = Decontaminate.scrubSpans(docs, "text", "doc_id", bench, "text",
          n = n, bloomFpp = 0.01)
        .as[(Long, String, Int, Int)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(viaBloom == want)
    }
  }

  // ---- tfidfTopTerms (logIdf = true, the libm-ln mode) ---------------------

  test("fuzz: tfidfTopTerms classic-idf mode equals naive reference math bit-for-bit") {
    import spark.implicits._
    // the operator's `tokens()`: lowercase, split on [^a-z0-9]+, drop empties
    def alnumToks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+", -1).toSeq.filter(_.nonEmpty)

    val paramGen = for {
      k    <- Gen.choose(1, 8)
      docs <- corpusGen
    } yield (k, docs)

    forAllSeeded(paramGen, 8) { case (k, docs) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = TextAnalysis.tfidfTopTerms(df, "text", "doc_id", k = k)
        .as[(Long, Int, String, Long, Long, Double)].collect().toSeq.sorted

      // naive reference replaying the engine's exact FP spelling:
      // score = tf.toDouble * ln(N.toDouble / df.toDouble) — Spark's
      // `log` expression computes java.lang.StrictMath.log (fdlibm, a
      // platform-stable 1 ulp from the Math.log intrinsic), so the
      // doubles must be IDENTICAL, not merely close (the x60 precedent)
      val nDocs = docs.length.toLong
      val tf: Map[(Long, String), Long] = docs.zipWithIndex
        .flatMap { case (t, i) => alnumToks(t).map(tok => (i.toLong, tok)) }
        .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      val dfDocs: Map[String, Long] = tf.keys.toSeq.map(_._2)
        .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val want = tf.toSeq
        .map { case ((id, term), c) =>
          (id, term, c, dfDocs(term),
            c.toDouble * StrictMath.log(nDocs.toDouble / dfDocs(term).toDouble))
        }
        .groupBy(_._1).toSeq
        .flatMap { case (_, rows) =>
          rows.sortWith((a, b) => a._5 > b._5 || (a._5 == b._5 && a._2 < b._2))
            .take(k).zipWithIndex
            .map { case ((id, term, c, dfd, sc), r) => (id, r + 1, term, c, dfd, sc) }
        }.sorted
      assert(got == want, s"k=$k")

      // the broadcast dial must not change a single bit of the output
      val viaBroadcast = TextAnalysis
        .tfidfTopTerms(df, "text", "doc_id", k = k, broadcastCounts = true)
        .as[(Long, Int, String, Long, Long, Double)].collect().toSeq.sorted
      assert(viaBroadcast == want, s"k=$k broadcast")
    }
  }

  // ---- bm25 (the libm-ln idf path) ----------------------------------------

  test("fuzz: bm25 ranked retrieval equals naive reference math bit-for-bit") {
    import spark.implicits._
    def alnumToks(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+", -1).toSeq.filter(_.nonEmpty)

    val paramGen = for {
      topK <- Gen.choose(1, 8)
      docs <- corpusGen
    } yield (topK, docs)

    forAllSeeded(paramGen, 8) { case (topK, docs0) =>
      // guarantee a non-empty corpus and at least one hit for the terms
      val docs = docs0 :+ "the anchor document mentions go and the again"
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val vocab = docs.flatMap(alnumToks)
      // real terms plus one absent term (exercises the coalesce-0.0 leg)
      val terms = (vocab.distinct.take(3) :+ "qqqabsentterm").distinct

      val got = TextAnalysis.bm25(df, "text", "doc_id", terms, topK = topK)
        .as[(Long, Int, Double)].collect().toSeq.sortBy(_._2)

      // naive reference with the engine's exact FP spelling: k1 = 1.5,
      // b = 0.75 → the literals 2.5 / 0.25 / 0.75 are exact; avgdl and
      // each tf_norm step is one correctly-rounded op; idf uses
      // StrictMath.log (what Spark's `log` expression computes); the
      // per-doc sum is the same sorted-term left fold with 0.0 for
      // absent terms
      val nD = docs.length.toDouble
      val dls = docs.map(t => alnumToks(t).length.toLong)
      val avgdl = dls.sum.toDouble / docs.length
      val tf: Map[(Long, String), Long] = docs.zipWithIndex
        .flatMap { case (t, i) =>
          alnumToks(t).filter(terms.contains).map(tok => (i.toLong, tok)) }
        .groupBy(identity).map { case (key, v) => key -> v.size.toLong }
      val dfDocs: Map[String, Long] = tf.keys.toSeq.map(_._2)
        .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      val sorted = terms.sorted
      val scores = docs.indices.map(_.toLong)
        .filter(id => sorted.exists(t => tf.contains((id, t))))
        .map { id =>
          val s = sorted.map { t =>
            tf.get((id, t)) match {
              case None => 0.0
              case Some(c) =>
                val tfd = c.toDouble
                val dld = dls(id.toInt).toDouble
                val tfNorm = tfd * 2.5 / (tfd + 1.5 * (0.25 + 0.75 * (dld / avgdl)))
                val dfd = dfDocs(t).toDouble
                StrictMath.log(1.0 + (nD - dfd + 0.5) / (dfd + 0.5)) * tfNorm
            }
          }.reduce(_ + _)
          (id, s)
        }
      val want = scores
        .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
        .take(topK).zipWithIndex
        .map { case ((id, s), r) => (id, r + 1, s) }
      assert(got == want, s"topK=$topK terms=$terms")
    }
  }
}
