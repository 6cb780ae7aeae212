package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Dedup, Similarity, TextAnalysis, Multimodal}
import graft.functions.{TextHash, JsonPathFilter}
import graft.operators.Evolve

/** Behavioral specs for the training-pipeline operators on synthetic data
  * with planted ground truth. */
class OpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  /** Non-overlapping occurrence count of `needle` in `hay` (plan-shape
    * assertions that pin HOW MANY times a subtree appears). */
  private def occurrences(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  private def docsDf(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val corpus = docsDf(Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy dog",          // exact dup of 1
    3L -> "the quick brown fox jumps over the lazy cat",          // near dup of 1
    4L -> "completely different text about spark query engines",
    5L -> "THE  QUICK   brown fox JUMPS over the lazy dog",       // case/ws dup of 1
    6L -> "entirely unrelated content mentioning data pipelines"))

  test("exact dedup keeps the min id per normalized text") {
    val kept = Dedup.exactDedup(corpus, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 6L)) // 2 and 5 are dups of 1
  }

  test("exact dedup groups null texts like the SQL oracle: one survivor") {
    import spark.implicits._
    // null fingerprints must still dedup together (groupBy semantics, as
    // in SQL GROUP BY) — an equi-join on a null key would keep them all
    val df = Seq((1L, "real doc"), (2L, null), (3L, null), (4L, "real doc"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactDedup(df, "text", "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("minhash near-dup finds the planted near pair and not unrelated docs") {
    val pairs = Dedup.minhashDedupPairs(corpus, "text", "doc_id",
      threshold = 0.4, numHashes = 64, bands = 32, shingleSize = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)) || pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 2L))) // identical docs always pair
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L && p._1 != 4L && false))
    assert(!pairs.contains((4L, 6L)))
  }

  test("simhash of identical docs is identical; hamming to near-dup is small") {
    val sigs = corpus.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) == sigs(5L)) // tokenization normalizes case/whitespace
    val hammingNear = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    val hammingFar  = java.lang.Long.bitCount(sigs(1L) ^ sigs(4L))
    assert(hammingNear < hammingFar)
  }

  test("ngram jaccard: identical docs score 1.0, near-dups above threshold") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
      threshold = 0.3, shingleSize = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 5L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) < 1.0)
    assert(!pairs.contains((4L, 6L)))
  }

  test("brute-force ANN: nearest neighbor of a planted duplicate vector is its twin") {
    import spark.implicits._
    val base = (0 until 50).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val planted = (1000L, base(7)._2.map(v => v * 1.01f)) // same direction as vec 7
    val emb = (base :+ planted).toDF("vec_id", "embedding")
    val res = Similarity.bruteForceTopK(emb, emb.where($"vec_id" === 1000L),
      "vec_id", "embedding", k = 1).collect()(0)
    assert(res.getAs[Long]("neighbor_id") == 7L)
    assert(res.getAs[Double]("score") > 0.999)
  }

  test("LSH ANN recalls the planted twin (same-direction vector, same bucket)") {
    import spark.implicits._
    val base = (0 until 50).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val planted = (1000L, base(7)._2.map(v => v * 1.01f))
    val emb = (base :+ planted).toDF("vec_id", "embedding")
    val res = Similarity.lshTopK(emb, emb.where($"vec_id" === 1000L),
      "vec_id", "embedding", k = 1, nBits = 8).collect()
    assert(res.nonEmpty && res(0).getAs[Long]("neighbor_id") == 7L)
  }

  test("IVF ANN recalls the planted twin (same direction ⇒ same coarse cell)") {
    import spark.implicits._
    val base = (0 until 60).map { i =>
      val rnd = new scala.util.Random(i)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val planted = (1000L, base(7)._2.map(v => v * 1.01f))
    val emb = (base :+ planted).toDF("vec_id", "embedding")
    val res = Similarity.ivfTopK(emb, emb.where($"vec_id" === 1000L),
      "vec_id", "embedding", k = 1, nlist = 8, nprobe = 2).collect()
    assert(res.nonEmpty && res(0).getAs[Long]("neighbor_id") == 7L)
    assert(res(0).getAs[Double]("score") > 0.999)
  }

  test("language ID picks the planted language") {
    val d = docsDf(Seq(
      10L -> "the cat and the dog went to the park with a ball it is fun",
      11L -> "der hund und die katze sind nicht mit mir auf das sofa",
      12L -> "le chat et le chien sont dans la maison pour une heure",
      13L -> "el perro y el gato son los animales para la casa como una familia",
      14L -> "zzz qqq xxx www"))
    val got = d.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "en"); assert(got(11L) == "de")
    assert(got(12L) == "fr"); assert(got(13L) == "es")
    assert(got(14L) == "und")
  }

  test("token counting and quality scoring behave on edge inputs") {
    val d = docsDf(Seq(1L -> "", 2L -> "   ", 3L -> "one two three", 4L -> "!!! ??? ..."))
    val rows = d.select(col("doc_id"),
      TextAnalysis.tokenCountWs(col("text")).as("ws"),
      TextAnalysis.punctRatio(col("text")).as("pr"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows(1L)._1 == 0); assert(rows(2L)._1 == 0)
    assert(rows(3L)._1 == 3)
    assert(rows(4L)._2 > 0.5)  // heavy punctuation
    assert(rows(4L)._3 < 0.5)  // low quality
  }

  test("TextHash kernel is deterministic and matches itself across calls") {
    val a = TextHash.minhash("hello world foo bar baz", 32, 2)
    val b = TextHash.minhash("hello world foo bar baz", 32, 2)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 32)
    assert(TextHash.simhash("a b c") == TextHash.simhash("a b c"))
    // buffer-growth path (tokens past the 256-byte thread-local buffer)
    // against a naive tokenize+md5 vote reference — the kernel streams
    // token bytes directly, so long tokens take the resize branch
    def naiveSimhash(text: String): Long = {
      val votes = new Array[Int](64)
      TextHash.tokenize(text).foreach { tok =>
        val h = TextHash.md5Hash64(tok)
        (0 until 64).foreach { b =>
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1 }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    Seq("short doc", ("x" * 300) + " mid " + ("y" * 1000),
        "MIXED" + ("Z" * 500) + "9 and words", "", "𐀀 🙂 …").foreach { t =>
      assert(TextHash.simhash(t) == naiveSimhash(t), s"simhash mismatch on ${t.take(40)}")
    }
  }

  test("multimodal: batched stub decode is deterministic; frame sampling plans without decoding") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "fakejpegbytes".getBytes, "s1"),
      Multimodal.MediaRow(2L, "video", "fakemp4bytes!!".getBytes, "s2"))
      .toDS()
    val feats = Multimodal.extractFeatures(media)()
    val rows = feats.collect().map(f => f.media_id -> f).toMap
    assert(rows(1L).byte_len == 13)
    assert(rows(2L).n_frames >= 1)
    val again = Multimodal.extractFeatures(media)().collect().map(f => f.media_id -> f).toMap
    assert(rows(1L).feature.toSeq == again(1L).feature.toSeq)
    val frames = Multimodal.sampleFrames(feats.toDF(), stride = 5)
    assert(frames.where($"media_id" === 2L).count() >= 1)
    assert(frames.where($"media_id" === 1L).count() == 0) // images have no frames
  }

  test("jsonpath filter: ||, &&, comparisons, bare path") {
    import spark.implicits._
    val df = Seq(("game", 5L), ("film", 9L), ("game", 20L))
      .toDF("type", "score")
    assert(JsonPathFilter(df, "$[?(@.type == 'game')]").count() == 2)
    assert(JsonPathFilter(df, "$[?(@.type == 'game' || @.type == 'film')]").count() == 3)
    assert(JsonPathFilter(df, "$[?(@.type == 'game' && @.score > 10)]").count() == 1)
    assert(JsonPathFilter(df, "$[?(@.score >= 9)]").count() == 2)
    assert(JsonPathFilter(df, "$.type").count() == 3)
  }

  test("simhash pair blocking is complete: matches brute-force hamming join") {
    // self-consistency against ground truth: every pair the brute-force
    // O(n²) hamming join finds at ≤ maxHamming must come out of the
    // chunk-blocked operator (pigeonhole completeness), and nothing extra.
    val sigs = corpus.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
    val a = sigs.select(col("doc_id").as("id_a"), col("sig").as("sa"))
    val b = sigs.select(col("doc_id").as("id_b"), col("sig").as("sb"))
    for (maxH <- Seq(0, 3, 7)) {
      val brute = a.join(b, col("id_a") < col("id_b"))
        .where(bit_count(col("sa").bitwiseXOR(col("sb"))) <= maxH)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val blocked = Dedup.simhashDedupPairs(corpus, "text", "doc_id", maxHamming = maxH)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(blocked == brute, s"maxHamming=$maxH")
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashDedupPairs(corpus, "text", "doc_id", maxHamming = 16)
    }
  }

  test("degenerate LSH bucket is dropped before any id array materializes") {
    // 3000 byte-identical one-token docs put the whole corpus in every
    // band bucket; the pre-count filter must drop those buckets (no pairs,
    // no giant collect_list buffer) while a small distinct near-pair in
    // the same corpus still comes through via its own buckets.
    import spark.implicits._
    val degenerate = (0L until 3000L).map(i => (i, "spark spark spark spark"))
    val survivors = Seq(900001L -> "a genuinely unique document about graft engines",
      900002L -> "a genuinely unique document about graft engines")
    val df = (degenerate ++ survivors).toDF("doc_id", "text")
    val pairs = Dedup.minhashDedupPairs(df, "text", "doc_id",
      threshold = 0.9, numHashes = 32, bands = 8, maxBucket = 100)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((900001L, 900002L)))
  }

  test("connected components close pair chains transitively; dedupByPairs keeps one per cluster") {
    import spark.implicits._
    // chain 1-2, 2-3 (one component, min 1); isolated pair 10-11; 99 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val corpus = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val kept = Dedup.dedupByPairs(corpus, "doc_id", pairs)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 10L, 99L))
  }

  test("semanticDecontaminate drops docs whose embedding matches a benchmark embedding") {
    import spark.implicits._
    import graft.ops.Decontaminate
    val evalEmb = Seq(
      (900L, Array(1f, 0f, 0f, 0f)),
      (901L, Array(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, Array(2f, 0f, 0f, 0f)),  // scaled copy of eval 900 → drop
      (2L, Array(0f, 0f, 3f, 0f)),  // orthogonal → keep
      (3L, Array(0f, -1f, 0f, 0f))  // cosine −1 vs 901 → keep
    ).toDF("vec_id", "embedding")
    val kept = Decontaminate.semanticDecontaminate(docs, evalEmb,
      "vec_id", "embedding").select("vec_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("dedupByPairsKeepBest keeps the highest-priority member per cluster, min id on ties") {
    import spark.implicits._
    // component {1,2,3} (chain): 2 has the best priority → keep 2;
    // component {10,11}: tied priorities → min id 10; 99 unpaired passes
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val corpus = Seq(
      (1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L), (99L, 1L)
    ).toDF("doc_id", "quality")
    val kept = Dedup.dedupByPairsKeepBest(corpus, "doc_id", pairs,
      col("quality"))
    assert(kept.columns.toSeq == Seq("doc_id", "quality"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 10L, 99L))
    // min-id priority reproduces dedupByPairs exactly
    val minIdKept = Dedup.dedupByPairsKeepBest(corpus, "doc_id", pairs,
      -col("doc_id")).select("doc_id").as[Long].collect().sorted.toSeq
    assert(minIdKept == Seq(1L, 10L, 99L))
  }

  test("connected components converge on deep chains via pointer jumping") {
    import spark.implicits._
    // a 200-hop path with the minimum id at one END — plain one-hop
    // propagation would need 200 rounds; pointer jumping must close it
    // within the default 20
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // driverMaxPairs = 0 forces the distributed loop — the default gate
    // would solve this tiny set on the driver and test nothing
    val labels = Dedup.connectedComponents(chain, maxIter = 20, driverMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 200 && labels.values.forall(_ == 1L))
  }

  test("connected components: driver union-find equals the distributed loop (longs and astral strings)") {
    import spark.implicits._
    // random pair soup with chains, cycles, self-pairs and isolated pairs
    val rnd = new scala.util.Random(0xccL)
    val longPairs = (0 until 500).map { _ =>
      (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong) } ++
      Seq((1000L, 1001L), (1001L, 1002L), (1002L, 1000L))
    val lp = longPairs.toDF("id_a", "id_b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.get(0) -> r.get(1)).toMap
    assert(asMap(Dedup.connectedComponents(lp)) ==
      asMap(Dedup.connectedComponents(lp, 20, 0L)))
    // string ids straddling U+FFFF: UTF-16 order puts "￿" AFTER the
    // astral "𐀀" (U+10000); UTF-8/code-point order puts it
    // BEFORE. The component minimum must be the ENGINE's, on both paths.
    // keep the astral pair its OWN component: any ASCII member would be
    // the minimum under both orderings and hide the disagreement
    val sp = Seq(("￿", "𐀀"),
      ("b", "a"), ("a", "c")).toDF("id_a", "id_b")
    val fromDriver = asMap(Dedup.connectedComponents(sp))
    assert(fromDriver == asMap(Dedup.connectedComponents(sp, 20, 0L)))
    assert(fromDriver("𐀀") == "￿", // the code-point minimum, not UTF-16's
      s"driver CC must label with the engine-collation minimum, got $fromDriver")
  }

  test("driver CC at rehash scale: 40k distinct sparse long ids equal an independent union-find") {
    import spark.implicits._
    // the r18 driver path stores ids in an open-addressing table
    // pre-sized 1<<16 and REHASHES past ~32k distinct ids — the small
    // soups above never reach that path. 30k random edges over sparse
    // 48-bit ids (~40k distinct) cross the rehash boundary twice; the
    // oracle is an independent in-test union-find, not the distributed
    // loop (keeps the test fast and the implementations unrelated).
    val rnd = new scala.util.Random(0x5eedL)
    def sparseId(): Long = rnd.nextLong() & 0xFFFFFFFFFFFFL
    val nodes = Array.fill(40000)(sparseId())
    val edges = (0 until 30000).map { _ =>
      (nodes(rnd.nextInt(nodes.length)), nodes(rnd.nextInt(nodes.length)))
    }
    val got = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference union-find (HashMap-based, path compression)
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    val minOf = scala.collection.mutable.HashMap[Long, Long]()
    parent.keys.foreach { id =>
      val r = find(id)
      minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), id)
    }
    val want = parent.keys.map(id => id -> minOf(find(id))).toMap
    assert(got.size == want.size, s"${got.size} vs ${want.size} labeled ids")
    assert(got == want)
  }

  test("connected components: worst-case 10k-hop path converges in ~log2 rounds, fails fast otherwise") {
    import spark.implicits._
    // a 10k-node path is the worst-case diameter for its size: one-hop
    // label propagation would need 10k rounds. Pointer jumping halves the
    // remaining path every round, so it must close within
    // ceil(log2(10000)) ≈ 14 rounds (+ the final no-change round) —
    // maxIter = 17 both converges AND proves the log-diameter bound the
    // Scaladoc claims; the default 20 is headroom, not a crutch
    val n = 10000L
    val path = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // force the loop: the driver gate would otherwise absorb this set
    val labels = Dedup.connectedComponents(path, maxIter = 17, driverMaxPairs = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == n && labels.values.forall(_ == 1L))
    // and non-convergence raises instead of returning an under-merged
    // labeling: 2 rounds can only close ~4 hops of a 10k-hop path
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(path, maxIter = 2, driverMaxPairs = 0L).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("multimodal: JDK-decoded image headers give real dimensions, other codecs fall back to the stub") {
    import spark.implicits._
    def imgBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.fillRect(0, 0, w, h)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", imgBytes("png", 37, 21), "s"),
      Multimodal.MediaRow(2L, "image", imgBytes("jpg", 640, 480), "s"),
      Multimodal.MediaRow(3L, "audio", "not an image at all".getBytes("UTF-8"), "s"))
    val out = Multimodal.extractFeatures(rows.toDS())()
      .collect().map(f => f.media_id -> f).toMap
    // planted ground truth: the JDK reader must report the true pixel dims
    assert((out(1L).width, out(1L).height, out(1L).n_frames) == ((37, 21, 1)))
    assert((out(2L).width, out(2L).height) == ((640, 480)))
    // non-image payloads keep the documented deterministic stub behavior
    val stub = Multimodal.decodeStub(rows(2))
    assert(out(3L).width == stub.width && out(3L).height == stub.height)
    assert(Multimodal.decodeImageHeader(rows(2).payload).isEmpty)
    // truncated image header: recognized magic but unreadable → stub path
    assert(Multimodal.decodeImageHeader(imgBytes("png", 5, 5).take(12)).isEmpty)
  }

  test("fingerprint whitespace class: vertical tab and NBSP normalize like space") {
    val d = docsDf(Seq(
      1L -> "a b",
      2L -> "a\u000Bb",       // java \s includes U+000B, RE2 does not — explicit class covers it
      3L -> "a\u00A0b",       // NBSP — neither engine's \s covers it
      4L -> "a  \t b"))
    val fps = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(1L) == fps(3L) && fps(1L) == fps(4L))
  }

  test("unionEvolve: integral x fractional conflict relaxes to string, ids above 2^53 survive") {
    import spark.implicits._
    val bigId = (1L << 53) + 3L // not representable as Double
    val a = Seq(Tuple1(bigId)).toDF("id")
    val b = Seq(Tuple1(1.5)).toDF("id")
    val u = Evolve.unionEvolve(Seq(a, b)).orderBy("id")
    assert(u.schema("id").dataType.typeName == "string")
    assert(u.collect().map(_.getString(0)).toSet == Set(bigId.toString, "1.5"))
    // lossless cross-kind merges still widen: every Int is exact in Double
    val c = Seq(Tuple1(7)).toDF("id")
    val d = Seq(Tuple1(2.5)).toDF("id")
    assert(Evolve.unionEvolve(Seq(c, d)).schema("id").dataType.typeName == "double")
    // ...but Int x Float is lossy (24-bit mantissa) and relaxes to string
    val e = Seq(Tuple1(2.5f)).toDF("id")
    assert(Evolve.unionEvolve(Seq(c, e)).schema("id").dataType.typeName == "string")
  }

  test("unionEvolve: missing cols NULL-fill, conflicting types relax, numerics widen") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, 3.5)).toDF("id", "w")
    val c = Seq((3, true)).toDF("id", "v") // id int (widen to long), v bool (conflict → string)
    val u = Evolve.unionEvolve(Seq(a, b, c)).orderBy("id")
    assert(u.columns.toSeq == Seq("id", "v", "w"))
    assert(u.schema("id").dataType.typeName == "long")
    assert(u.schema("v").dataType.typeName == "string")
    val rows = u.collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getDouble(2) == 3.5)
    assert(rows(2).getString(1) == "true")
  }

  test("int8 quantize: max maps to ±127, dequantize error ≤ half a step, zero vec safe") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(0.5f, -2.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "embedding")
      .select(col("vec_id"), col("q"), col("scale"))
      .as[(Long, Seq[Int], Double)].collect()
      .map { case (id, qs, sc) => id -> ((qs, sc)) }.toMap
    val (q1, s1) = out(1L)
    assert(q1(1) == -127)                   // max|x| element hits the rail
    assert(q1.forall(v => v >= -127 && v <= 127))
    // dequantized values within half a quantization step of the original
    val orig = Seq(0.5, -2.0, 1.0, 0.0)
    q1.zip(orig).foreach { case (qi, x) =>
      assert(math.abs(qi / s1 - x) <= 0.5 / s1 + 1e-12) }
    assert(out(2L)._1 == Seq(0, 0, 0, 0) && out(2L)._2 == 0.0) // zero vector
  }

  test("l2Normalize yields unit vectors; zero vector stays zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.l2Normalize(df, "embedding", "n")
      .select(col("vec_id"), col("n"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(math.abs(out(1L)(0) - 0.6) < 1e-12 && math.abs(out(1L)(1) - 0.8) < 1e-12)
    assert(out(2L) == Seq(0.0, 0.0))
  }

  test("chunkDocuments: overlapping windows cover every token, short docs stay whole") {
    import spark.implicits._
    // 10 tokens, windows of 4 overlapping by 1 → stride 3 →
    // ceil((10-4)/3)+1 = 3 chunks: [t1..t4], [t4..t7], [t7..t10]
    val long = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq(
      (1L, long),
      (2L, "a b c"),       // under maxTokens → one whole chunk
      (3L, "   "),         // no tokens → no chunks
      (4L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "text", "doc_id", maxTokens = 4, overlap = 1)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(out == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b c", 3),
      (4L, 0, "x", 1)))
    // boundary: exactly maxTokens → one chunk; maxTokens+1 → two, the
    // second carrying overlap+1 tokens
    val edge = Seq((5L, "a b c d"), (6L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(edge, "text", "doc_id", maxTokens = 4, overlap = 1)
      .orderBy($"doc_id", $"chunk_id")
      .as[(Long, Int, String, Int)].collect().toSeq
    assert(got == Seq(
      (5L, 0, "a b c d", 4),
      (6L, 0, "a b c d", 4),
      (6L, 1, "d e", 2)))
    // the plan is a pure scan: no exchange anywhere
    val plan = TextAnalysis.chunkDocuments(df, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking should not shuffle:\n$plan")
  }

  test("dupNgramRatio: repeated 3-grams score, unique text scores 0, short text safe") {
    import spark.implicits._
    val df = Seq(
      (1L, "aa bb aa bb aa"),            // 3-grams: [aa bb aa][bb aa bb][aa bb aa] → 2/3 distinct
      (2L, "one two three four"),        // all distinct → 0.0
      (3L, "x y"),                       // under 3 tokens → 0.0
      (4L, ""),                          // empty → 0.0
      (5L, "go go go go go")).toDF("doc_id", "text") // all 3-grams identical → 1 - 1/3
    val out = df.select($"doc_id",
        TextAnalysis.dupNgramRatio($"text", 3).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(out(1L) - (1.0 - 2.0 / 3)) < 1e-12)
    assert(out(2L) == 0.0)
    assert(out(3L) == 0.0)
    assert(out(4L) == 0.0)
    assert(math.abs(out(5L) - (1.0 - 1.0 / 3)) < 1e-12)
  }

  test("sharedWindowFlags: verbatim quote flags, low-jaccard overlap alone does not") {
    import spark.implicits._
    val quote = (1 to 10).map(i => s"q$i").mkString(" ") // exactly one 10-token window
    val df = Seq(
      (1L, s"alpha beta $quote gamma delta"),                 // owner of the quote window
      (2L, s"completely different text body here $quote and more words"), // shares it
      (3L, "no overlap with anything else in this corpus at all"), // clean
      (4L, "q1 q2 q3 q4 q5"),                                 // 5 tokens < n → no windows
      (5L, s"alpha beta $quote gamma delta")                  // full copy of doc 1
    ).toDF("doc_id", "text")
    val out = graft.ops.Dedup.sharedWindowFlags(df, "text", "doc_id", n = 10)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, true)))   // first owner keeps
    // doc 2 shares exactly ONE window with doc 1: the quote itself (its
    // other windows mix in its own distinct surrounding tokens)
    assert(out(2L) == ((1L, false)))
    assert(out(3L) == ((0L, true)))
    assert(out(4L) == ((0L, true)))   // too short for any window
    // doc 5 = verbatim copy of doc 1: 14 tokens → 5 windows, all owned by doc 1
    assert(out(5L) == ((5L, false)))
  }

  test("nearDupIncrement: copies and near-variants drop, disjoint docs survive") {
    import spark.implicits._
    val corpus = (1 to 30).map { i =>
      val rnd = new scala.util.Random(1000 + i)
      (i.toLong, (1 to 40).map(_ => s"w${rnd.nextInt(500)}").mkString(" "))
    }
    val existing = corpus.toDF("doc_id", "text")
    val copy = (101L, corpus(4)._2)                       // exact copy → drop
    val nearVar = (102L, corpus(7)._2 + " tail")          // 1 extra token, jaccard ≈ 38/41 > 0.7 → drop
    val fresh = (103L, "entirely disjoint vocabulary right here friends")
    val short = (104L, "ab")                              // < shingleSize tokens → no bands → keep
    val incoming = Seq(copy, nearVar, fresh, short).toDF("doc_id", "text")
    val kept = graft.ops.Dedup.nearDupIncrement(existing, incoming, "text", "doc_id",
      threshold = 0.7, numHashes = 32, bands = 8)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(103L, 104L))
  }

  test("nearDupIncrement Bloom rung: >2048 distinct probe keys, same verdicts") {
    import spark.implicits._
    // 400 distinct random-vocab docs → batch band frame carries
    // ~400 × 8 = ~3200 distinct (band, bandHash) keys, past the
    // 2048-literal rung. Run BOTH big-batch prune rungs — the default
    // semi-join and the dial-selected broadcast Bloom (far under the
    // Bloom cap) — and pin identical verdicts: exact copies and
    // near-variants of corpus docs drop, fresh docs survive. Bloom
    // false positives may only add corpus rows that die in the exact
    // candidate equi-join, never change the kept set.
    def doc(seed: Int): String = {
      val rnd = new scala.util.Random(seed)
      (1 to 40).map(_ => s"w${rnd.nextInt(2000)}").mkString(" ")
    }
    val existing = (1 to 50).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val freshIds = (1001 to 1400).map(_.toLong)
    val incoming = (
      freshIds.map(i => (i, doc(100000 + i.toInt))) ++        // fresh → keep
      Seq((2001L, doc(5)),                                    // exact copy → drop
          (2002L, doc(7) + " tail"))                          // near-var → drop
    ).toDF("doc_id", "text")
    def keptUnder(rung: String): Set[Long] = {
      System.setProperty("graft.neardup.prune", rung)
      try graft.ops.Dedup.nearDupIncrement(existing, incoming, "text",
          "doc_id", threshold = 0.7, numHashes = 32, bands = 8)
        .select($"doc_id").as[Long].collect().toSet
      finally System.clearProperty("graft.neardup.prune")
    }
    Seq("semi", "bloom").foreach { rung =>
      val kept = keptUnder(rung)
      assert(kept == freshIds.toSet,
        s"$rung-rung verdicts diverged: missing=${(freshIds.toSet -- kept).take(5)} " +
          s"extra=${(kept -- freshIds.toSet).take(5)}")
    }
  }

  test("sharedWindowIncrement: one verbatim window drops, short and disjoint pass") {
    import spark.implicits._
    val quote = (1 to 10).map(i => s"s$i").mkString(" ")
    val existing = Seq(
      (1L, s"intro words $quote closing words"),
      (2L, "other corpus doc with its own ten tokens here now yes")).toDF("doc_id", "text")
    val incoming = Seq(
      (101L, s"totally new framing but $quote hides inside this one"), // shares the quote window
      (102L, "fully disjoint vocabulary in every position of this line extended further"), // ≥10 toks, no shared window
      (103L, "too short")).toDF("doc_id", "text") // < n tokens → no windows → pass
    val kept = graft.ops.Dedup.sharedWindowIncrement(existing, incoming, "text", "doc_id", n = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(102L, 103L))
  }

  test("x43/x44 plan shape: one kernel pass, keyed window, no cartesian") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"tok$i " * 12)).toDF("doc_id", "text")
    def planOf(d: org.apache.spark.sql.DataFrame): String = {
      d.collect(); d.queryExecution.executedPlan.toString
    }
    val p43 = planOf(graft.ops.Dedup.sharedWindowFlags(df, "text", "doc_id", n = 10))
    // r21 shape: the min-owner comes from a window over the high-
    // cardinality window-key — ONE evaluation of the windowKeys kernel
    // and one exchange of the key rows by construction (the former
    // groupBy + self-join spelling consumed the kernel+explode subtree
    // twice, and unifying its two identical exchanges rode the AQE
    // reuse lottery — SCALE.md §b18-tfidf's class, measured on b7).
    // The window is KEYED (partitioned by __wh), never a serial
    // single-partition window; the per-doc re-agg stays map-side
    // partial; nothing plans a cartesian product.
    // count in the FINAL plan section only (AdaptiveSparkPlan.toString
    // appends the initial plan too, which would double-count the node)
    assert(occurrences(p43.split("== Initial Plan ==").head,
        "Generate explode") == 1,
      s"windowKeys kernel must be evaluated exactly once:\n$p43")
    assert(p43.contains("windowspecdefinition(__wh"),
      s"min-owner window must be partitioned by the window key:\n$p43")
    assert(p43.contains("partial_sum"), s"per-doc agg not partial:\n$p43")
    assert(!p43.contains("CartesianProduct"), p43)
    val p44 = planOf(TextAnalysis.rareTokenRatio(df, "text", "doc_id", 5))
    assert(p44.contains("partial_count"), s"vocab count not partial:\n$p44")
    assert(!p44.contains("Window") && !p44.contains("CartesianProduct"), p44)
  }

  test("rareTokenRatio: exact corpus-frequency fractions, empty docs score 0") {
    import spark.implicits._
    // corpus counts: "the"=4, "cat"=2, "zz"=1, "qq"=1, "sat"=2
    val df = Seq(
      (1L, "the cat sat"),     // the(4) cat(2) sat(2) → rare(<2): none → 0/3
      (2L, "the cat sat zz"),  // zz count 1 → 1/4
      (3L, "the the qq"),      // qq 1 → 1/3
      (4L, "")                 // no tokens → 0.0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.rareTokenRatio(df, "text", "doc_id", minCount = 2)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0.0)))
    assert(out(2L) == ((1L, 0.25)))
    assert(out(3L) == ((1L, 1.0 / 3)))
    assert(out(4L) == ((0L, 0.0)))
  }

  test("rareTokenRatio: broadcastCounts plans a broadcast join, results unchanged") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"common tokens here plus unique$i")).toDF("doc_id", "text")
    val slow = TextAnalysis.rareTokenRatio(df, "text", "doc_id", minCount = 5)
    val fast = TextAnalysis.rareTokenRatio(df, "text", "doc_id", minCount = 5,
      broadcastCounts = true)
    val expected = slow.as[(Long, Long, Double)].collect().toSet
    assert(fast.as[(Long, Long, Double)].collect().toSet == expected)
    // the vocabulary-join fast path must be deliberate, not an AQE accident:
    // with the hint, the token→count join back is a broadcast-hash join
    fast.collect()
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"broadcastCounts should plan a broadcast-hash vocabulary join:\n$plan")
  }

  test("groupPercentiles: exact quartiles with interpolation") {
    import spark.implicits._
    // en: values 1..5 → quartiles 2, 3, 4; fr: 10,20 → 12.5, 15, 17.5
    val df = (Seq(1, 2, 3, 4, 5).map(("en", _)) ++ Seq(("fr", 10), ("fr", 20)))
      .toDF("lang", "n_tokens")
    val out = TextAnalysis.groupPercentiles(df, "lang", "n_tokens")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out("en") == ((5L, 2.0, 3.0, 4.0)))
    assert(out("fr") == ((2L, 12.5, 15.0, 17.5)))
  }

  test("bounded top-k: integral AND string ids avoid the window plan, same rows") {
    import spark.implicits._
    val base = (0 until 40).map { i =>
      val rnd = new scala.util.Random(100 + i)
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val emb = base.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 3)
    val fast = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    // integral ids take the k-bounded aggregate: partial top-k map-side,
    // no row_number window moving the scored cross frame through an
    // exchange
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window exchange still in plan:\n$plan")
    assert(plan.contains("Aggregate"), s"expected aggregate-based top-k:\n$plan")
    // string ids now take the binary-id bounded aggregate — same rows,
    // and STILL no window (the r6 fallback is gone)
    val embS = emb.select($"vec_id".cast("string").as("vec_id"), $"embedding")
    val str = Similarity.bruteForceTopK(embS,
      embS.where($"vec_id".cast("long") < 3), "vec_id", "embedding", k = 5)
    val planS = str.queryExecution.executedPlan.toString
    assert(!planS.contains("Window"), s"string ids fell into a window plan:\n$planS")
    assert(planS.contains("Aggregate"), s"expected aggregate-based top-k:\n$planS")
    assert(str.schema("neighbor_id").dataType == org.apache.spark.sql.types.StringType)
    def keyed(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.get(0).toString, r.get(1).toString, r.getAs[Int]("rank"),
        math.round(r.getAs[Double]("score") * 1e9))).toSet
    val f = fast.collect(); val s = str.collect()
    assert(f.length == 3 * 5)
    assert(keyed(f) == keyed(s))
    // unsupported id types raise instead of silently planning a window
    val embD = emb.select($"vec_id".cast("decimal(20,0)").as("vec_id"), $"embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(embD, embD.limit(1), "vec_id", "embedding", k = 5)
    }
    assert(ex.getMessage.contains("top-k id column"))
  }

  test("string-id top-k tie-break follows UTF8 byte order, nulls are dropped") {
    import spark.implicits._
    // all scores tie at 1.0 (identical unit vectors) → ranking is purely
    // the id tie-break; ids chosen so UTF-16 order (Java String.compareTo)
    // and UTF-8 byte order DIVERGE: U+FF21 (FULLWIDTH A, 3 UTF-8 bytes
    // ef bc a1) vs U+10400 (DESERET, surrogate pair, 4 bytes f0 90 90 80).
    // UTF-8/code-point order puts U+FF21 first; UTF-16 code-unit order
    // would put the surrogate (d801) first. Spark's UTF8_BINARY = UTF-8.
    val v = Array(1.0f, 0.0f)
    val ids = Seq("b", "a", "\uFF21", "\uD801\uDC00") // U+10400 as a pair
    val corpus = ids.map(id => (id, v)).toDF("vec_id", "embedding")
    val q = Seq(("q", v)).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, q, "vec_id", "embedding", k = 4)
      .orderBy($"rank").select($"neighbor_id").as[String].collect().toSeq
    assert(got == Seq("a", "b", "\uFF21", "\uD801\uDC00"))
    // a null embedding scores null → filtered before the aggregate (the
    // typed aggregator's Double buffer would otherwise fail on it)
    val withNull = corpus.union(
      Seq(("z", null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val gotN = Similarity.bruteForceTopK(withNull, q, "vec_id", "embedding", k = 10)
      .select($"neighbor_id").as[String].collect().toSet
    assert(gotN == ids.toSet)
  }

  test("lshTopK: no Window, no exchange between scoring and the top-k aggregate") {
    import spark.implicits._
    val base = (0 until 60).map { i =>
      val rnd = new scala.util.Random(500 + i)
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val emb = base.toDF("vec_id", "embedding")
    val res = Similarity.lshTopK(emb, emb.where($"vec_id" < 2),
      "vec_id", "embedding", k = 3, nBits = 6)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window exchange in lshTopK plan:\n$plan")
    // the r6 .distinct() re-shuffled every scored candidate row between
    // the join and the bounded aggregate; prove nothing shuffles there:
    // top-down print order is final-agg, exchange, PARTIAL agg, then the
    // scoring projection and the bucket join — no Exchange may appear
    // between the partial-agg line and the join line
    val lines = plan.split("\n").toSeq
    val iPartial = lines.indexWhere(l => l.contains("Aggregate") && l.contains("partial_"))
    assert(iPartial >= 0, s"no partial aggregate found:\n$plan")
    val iJoin = lines.indexWhere(_.contains("Join"), iPartial)
    assert(iJoin > iPartial, s"no join below the partial aggregate:\n$plan")
    val between = lines.slice(iPartial + 1, iJoin)
    assert(!between.exists(_.contains("Exchange")),
      s"exchange between scoring and top-k aggregate:\n$plan")
    assert(res.select($"query_id").distinct().count() == 2)
  }

  test("cosineDedupPairs: degenerate embedding bucket is capped, small buckets pair") {
    import spark.implicits._
    // 40 exact clones share one hyperplane bucket — over the cap, dropped
    // before the self-join; the planted twin pair elsewhere must survive
    val clone = Array.fill(8)(0.5f)
    val distinct = Array(1f, -1f, 0.25f, -0.5f, 0.75f, -0.25f, 1f, -1f)
    val rows = (0 until 40).map(i => (i.toLong, clone)) ++
      Seq((100L, distinct), (101L, distinct.map(_ * 1.01f)))
    val out = Similarity.cosineDedupPairs(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.9, nBits = 8, maxBucket = 10,
      probeDepth = 0)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 101L)))
  }

  test("knnClassify: majority label of planted clusters; ties break to the smallest label") {
    import spark.implicits._
    // three tight clusters, labels 1/2/3: a perturbed center must take
    // its cluster's label with k votes
    val dim = 8
    // axis-aligned cluster directions with deterministic member noise:
    // in-cluster cosine ~1, cross-cluster ~0.1 — unambiguous vote margins
    def cvec(c: Int, m: Int): Array[Float] =
      Array.tabulate(dim) { j =>
        (if (j == c) 1f else 0.05f) +
          0.01f * (((c * 7919 + m * 131 + j) % 7).toFloat / 7f)
      }
    val corpus = (for { c <- 1 to 3; m <- 0 until 5 }
      yield ((c * 100 + m).toLong, cvec(c, m), c)).toDF("vec_id", "embedding", "label")
    val queries = (1 to 3).map(c => ((1000 + c).toLong, cvec(c, 99), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(corpus, queries, "vec_id", "embedding", "label", k = 5)
      .select($"query_id", $"label", $"votes").as[(Long, Int, Long)].collect().toSet
    assert(got == Set((1001L, 1, 5L), (1002L, 2, 5L), (1003L, 3, 5L)))
    // engineered 1-1 vote tie at k=2: identical-cosine neighbors labeled
    // 7 and 3 — the winner must be the SMALLEST label
    val v = Array(1f, 0f)
    val tieCorpus = Seq((1L, v, 7), (2L, v, 3)).toDF("vec_id", "embedding", "label")
    val tieQ = Seq((9L, v, 0)).toDF("vec_id", "embedding", "label")
    val tie = Similarity.knnClassify(tieCorpus, tieQ, "vec_id", "embedding", "label", k = 2)
      .select($"query_id", $"label", $"votes").as[(Long, Int, Long)].collect().toSeq
    assert(tie == Seq((9L, 3, 1L)))
  }

  test("groupPercentilesApprox: exact discrete percentiles when the sketch holds all values") {
    import spark.implicits._
    // n <= accuracy → the sketch retains every value, so the result is
    // the exact discrete percentile: value at rank ceil(p*n), DuckDB/
    // Postgres percentile_disc convention (the x48 oracle relies on this)
    val rows = (1 to 101).map(v => ("a", v.toLong)) ++
      (1 to 10).map(v => ("b", v.toLong))
    val got = graft.ops.TextAnalysis.groupPercentilesApprox(
      rows.toDF("g", "v"), "g", "v")
      .orderBy("g").collect()
    val a = got.find(_.getString(0) == "a").get
    assert(a.getLong(1) == 101L, s"group a count: $a")
    assert((a.getLong(2), a.getLong(3), a.getLong(4)) == ((26L, 51L, 76L)),
      s"group a quartiles: $a")
    val b = got.find(_.getString(0) == "b").get
    assert((b.getLong(2), b.getLong(3), b.getLong(4)) == ((3L, 5L, 8L)),
      s"group b quartiles: $b")
    // scale shape: one hash aggregate pair, no sort/window anywhere — the
    // reason this variant exists (the exact form buffers whole groups)
    val plan = graft.ops.TextAnalysis.groupPercentilesApprox(
      rows.toDF("g", "v"), "g", "v").queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"), s"approx percentiles must not sort:\n$plan")
    // bounded error on a big group with a coarse sketch: rank error <= n/accuracy
    val big = (1 to 20000).map(v => ("c", v.toLong)).toDF("g", "v")
    val coarse = graft.ops.TextAnalysis.groupPercentilesApprox(
      big, "g", "v", accuracy = 1000).collect()(0)
    val tol = 20000 / 1000 + 1
    assert(math.abs(coarse.getLong(3) - 10000L) <= tol, s"p50 off: $coarse")
  }

  test("cosineDedupPairsCounted: accumulator counts oversized-bucket rows once per action") {
    import spark.implicits._
    // one oversized bucket (25 exact clones, cap 10) + a surviving small
    // pair bucket + singletons: the accumulator must equal EXACTLY the
    // oversized-bucket row count after one action — the one-side marker
    // design means the self-join's two evaluations of the bucket pipeline
    // must NOT double it — and singletons (dropped too, but harmless by
    // construction) must contribute zero
    val clone = Array.fill(8)(0.5f)
    val pairVec = Array(1f, -1f, 0.25f, -0.5f, 0.75f, -0.25f, 1f, -1f)
    val singles = Seq(
      Array(-1f, 1f, -1f, 1f, -1f, 1f, -1f, 1f),
      Array(0.1f, 0.9f, -0.7f, 0.3f, -0.2f, 0.8f, -0.6f, 0.4f),
      Array(-0.9f, -0.1f, 0.6f, -0.4f, 0.2f, -0.8f, 0.7f, -0.3f))
    val rows = (0 until 25).map(i => (i.toLong, clone)) ++
      Seq((100L, pairVec), (101L, pairVec.map(_ * 1.01f))) ++
      singles.zipWithIndex.map { case (v, i) => ((200 + i).toLong, v) }
    val (pairs, acc) = Similarity.cosineDedupPairsCounted(
      rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.9, nBits = 8, maxBucket = 10,
      probeDepth = 0)
    assert(acc.value == 0L, "accumulator must start at zero (fresh per call)")
    val got = pairs.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 101L)), "planted small-bucket pair must survive the cap")
    assert(acc.value == 25L,
      s"one action must count each oversized-bucket row exactly once, got ${acc.value}")
    // a SECOND action re-evaluates the marked filter — once-per-action
    // semantics, so the count doubles (documented Spark accumulator
    // behavior in transformations; the contract is per-action exactness)
    pairs.count()
    assert(acc.value == 50L,
      s"second action must add exactly 25 again, got ${acc.value}")
  }

  test("probed cosineDedupPairsCounted keeps the accumulator contract; singletons now pair") {
    import spark.implicits._
    // the multi-probe path's cap semantics differ from the exact path in
    // ONE deliberate way: singleton-bucket rows are NOT dropped (they can
    // pair across buckets through the flip set), so only the oversized
    // bucket's rows count — and exactly once per action, through the
    // one-side marker, despite the probe side also scanning the capped
    // pipeline
    val clone = Array.fill(8)(0.5f)
    val pairVec = Array(1f, -1f, 0.25f, -0.5f, 0.75f, -0.25f, 1f, -1f)
    val singles = Seq(
      Array(-1f, 1f, -1f, 1f, -1f, 1f, -1f, 1f),
      Array(0.1f, 0.9f, -0.7f, 0.3f, -0.2f, 0.8f, -0.6f, 0.4f),
      Array(-0.9f, -0.1f, 0.6f, -0.4f, 0.2f, -0.8f, 0.7f, -0.3f))
    val rows = (0 until 25).map(i => (i.toLong, clone)) ++
      Seq((100L, pairVec), (101L, pairVec.map(_ * 1.01f))) ++
      singles.zipWithIndex.map { case (v, i) => ((200 + i).toLong, v) }
    val (pairs, acc) = Similarity.cosineDedupPairsCounted(
      rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.9, nBits = 8, maxBucket = 10,
      probeDepth = 2)
    assert(acc.value == 0L, "accumulator must start at zero (fresh per call)")
    val got = pairs.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // nothing but the planted pair clears 0.9 — the probed candidate set
    // is wider (singletons included) but exact verification filters it
    assert(got == Set((100L, 101L)), s"probed pair set: $got")
    assert(acc.value == 25L,
      s"one action must count each oversized-bucket row exactly once, got ${acc.value}")
    pairs.count()
    assert(acc.value == 50L,
      s"second action must add exactly 25 again, got ${acc.value}")
  }

  test("dedupDocLines: keep-first order-preserving line dedup, raw identity, blanks collapse") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a\nb\na\nc\nb\nd"),    // interleaved repeats
      (2L, "x\n\ny\n\nx"),          // blank lines dedup like any line
      (3L, "solo"),                  // no newline at all
      (4L, ""),                      // empty text stays empty
      (5L, "A\na\nA"))               // raw identity: case matters
      .toDF("doc_id", "text")
    val got = rows.select($"doc_id",
      TextAnalysis.dedupDocLines($"text").as("s")).as[(Long, String)]
      .collect().toMap
    assert(got(1L) == "a\nb\nc\nd")
    assert(got(2L) == "x\n\ny")
    assert(got(3L) == "solo")
    assert(got(4L) == "")
    assert(got(5L) == "A\na")
  }

  test("semanticDedupPairs: identical twins pair at 1.0 in their k-means cell; apply keeps the min id") {
    import spark.implicits._
    // identical vectors score identically against every centroid, so a
    // verbatim copy lands in its original's cell DETERMINISTICALLY —
    // the one cell-assignment invariant the contract can rely on without
    // reimplementing the quantizer
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map(i => (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
    val twins = (0 until 10).map(i => ((1000 + i).toLong, base(i)._2))
    val df = (base ++ twins).toDF("vec_id", "embedding")
    // fixture self-check: no natural pair clears the threshold, so the
    // expected pair set is exactly the planted twins
    val all = base.map(_._2)
    val maxNat = (for { i <- all.indices; j <- all.indices if i < j }
      yield Similarity.cosineArrF(all(i), all(j))).max
    assert(maxNat < 0.99, s"fixture drifted: max natural cosine $maxNat")
    val pairs = Similarity.semanticDedupPairs(df, "vec_id", "embedding",
      threshold = 0.99, nlist = 8)
    val got = pairs.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == (0 until 10).map(i => (i.toLong, (1000 + i).toLong)).toSet,
      s"twin pairs must be exactly the emitted set, got $got")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding",
      threshold = 0.99, nlist = 8).select(col("vec_id")).as[Long].collect().toSet
    assert(kept == (0 until 30).map(_.toLong).toSet,
      "apply must drop every twin (higher id) and keep every original")
  }

  test("dedupExactMedia: raw-byte identity, min-id keep, nulls group once, empty is not null") {
    import spark.implicits._
    val rows: Seq[(Long, Array[Byte])] = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array[Byte](1, 2, 3)),     // dup of 1 → drops
      (3L, Array[Byte](1, 2)),        // distinct → keeps
      (4L, null),                      // null payloads group together
      (5L, null),                      //   → only min id 4 survives
      (6L, Array.emptyByteArray),      // EMPTY is a real md5, not the null sentinel
      (7L, Array[Byte](1, 2, 3)))     // dup of 1 → drops
    val got = Multimodal.dedupExactMedia(rows.toDF("media_id", "payload"),
      "payload", "media_id").select($"media_id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L, 6L), got)
  }

  test("perceptual media near-dup: recompressed twin pairs, exact copy pairs at 0, distinct stays out") {
    import spark.implicits._
    import graft.functions.MediaHash
    // kernel pins
    assert(MediaHash.dhash64(Array(1f, 2f, 1.5f, 3f)) == 5L)   // bits 101
    assert(MediaHash.dhash64(null) == 0L)
    assert(MediaHash.ahash64(Array(0f, 10f, 0f, 10f)) == 10L)  // bits 1010
    assert(MediaHash.pooledGrid((0 until 10).map(_.toByte).toArray, 2)
      .toSeq == Seq(2.0f, 7.0f))
    assert(MediaHash.pooledGrid(null, 4) == null)

    // 65-cell payloads, 10 bytes per cell, cell value constant per cell so
    // the pooled grid IS the pattern; consecutive-cell gaps are >= 37
    // except one hairline 0.1 gap at cell 30/31 that recompression noise
    // flips — the planted twin lands at Hamming 1
    def payload(f: Int => Int, tweak: Map[Int, Byte] = Map.empty): Array[Byte] = {
      val b = new Array[Byte](650)
      (0 until 650).foreach(i => b(i) = f(i / 10).toByte)
      tweak.foreach { case (i, v) => b(i) = v }
      b
    }
    val patA: Int => Int = c =>
      if (c == 30) 100 else if (c == 31) 100 else ((c * 37 + 13) % 251)
    val a  = payload(patA, Map(319 -> 101.toByte))      // cell 31 avg 100.1
    val a2 = payload(patA)                              // "recompressed": avg 100.0
    val b  = payload(c => (c * 91 + 5) % 251)
    val c4 = payload(c => (c * 91 + 5) % 251)           // exact copy of b
    val rows = Seq((1L, a), (2L, a2), (3L, b), (4L, c4), (5L, null))
      .toDF("media_id", "payload")
    val feats = rows.select($"media_id",
      udf((p: Array[Byte]) => MediaHash.pooledGrid(p, 65)).apply($"payload").as("feature"))
    val pairs = Multimodal.nearDupMediaPairs(feats, "feature", "media_id",
      maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 1), (3L, 4L, 0)), pairs)
    // the batched decode path produces the same hashes
    val ds = Seq(
      Multimodal.MediaRow(1L, "image", a, "s"),
      Multimodal.MediaRow(2L, "image", a2, "s")).toDS()
    val hs = Multimodal.perceptualHashes(ds)().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(hs(1L) ^ hs(2L)) == 1)
    // apply form: min id survives per component, null-feature row passes
    // through (never hashed, never paired)
    val kept = Multimodal.dedupNearMedia(feats, "feature", "media_id",
      maxHamming = 3).select($"media_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L), kept)
  }

  test("clusterPrune: outlier mode keeps the central members, prototype mode the diverse tail, ceil math exact") {
    import spark.implicits._
    // two planted clusters with STRICTLY decreasing centrality (member i
    // is e_axis + i*0.05*e_other, so cosine-to-centroid strictly falls
    // with i) — rank order is fully determined without replaying the
    // quantizer, and the two modes keep opposite ends
    def member(axis: Int, other: Int, i: Int): Array[Float] = {
      val v = new Array[Float](8)
      v(axis) = 1f; v(other) = i * 0.05f
      v
    }
    val a = (0 until 10).map(i => (i.toLong, member(0, 1, i)))     // n=10
    val b = (0 until 5).map(i => ((100 + i).toLong, member(2, 3, i))) // n=5
    val df = (a ++ b).toDF("vec_id", "embedding")
    val cents = Array(
      Array(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f))
    def ids(dropProto: Boolean) = Similarity.clusterPrune(
      df, "vec_id", "embedding", cents, keepFraction = 0.6,
      dropPrototypes = dropProto).select($"vec_id").as[Long].collect().toSet
    // keep ceil(0.6*10)=6 and ceil(0.6*5)=3
    assert(ids(false) == ((0L to 5L) ++ (100L to 102L)).toSet,
      s"outlier mode keeps the most central: ${ids(false)}")
    assert(ids(true) == ((4L to 9L) ++ (102L to 104L)).toSet,
      s"prototype mode keeps the least central: ${ids(true)}")
    // null-vector rows pass through unpruned (nothing to score)
    val withNull = df.unionAll(Seq((999L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    val kept = Similarity.clusterPrune(withNull, "vec_id", "embedding",
      cents, keepFraction = 0.6).select($"vec_id").as[Long].collect().toSet
    assert(kept.contains(999L))
  }

  test("semanticDedupPairsCounted: oversized cells drop and count once; survivors match cell ground truth") {
    import spark.implicits._
    val clone = Array.fill(8)(0.5f)
    val pairVec = Array(1f, -1f, 0.25f, -0.5f, 0.75f, -0.25f, 1f, -1f)
    val rows = (0 until 25).map(i => (i.toLong, clone)) ++
      Seq((100L, pairVec), (101L, pairVec.map(_ * 1.01f))) ++
      Seq((200L, Array(-1f, 1f, -1f, 1f, -1f, 1f, -1f, 1f)))
    val df = rows.toDF("vec_id", "embedding")
    // ground-truth cells from the SAME public train+index composition the
    // operator uses (assignment itself is pinned by IvfTrainPropertySpec),
    // so the expectation covers the cap/join/accumulator logic without
    // reimplementing the quantizer
    val maxCell = 10
    val centroids = Similarity.ivfTrain(df, "vec_id", "embedding",
      nlist = 4, lloydPasses = 1)
    val cells = Similarity.ivfIndex(df, "vec_id", "embedding", centroids)
      .select(col("vec_id"), col("cell")).as[(Long, Int)].collect().toMap
    val sizes = cells.groupBy(_._2).map { case (c, m) => c -> m.size }
    val vec = rows.toMap
    val expectedDropped = cells.count { case (_, c) => sizes(c) > maxCell }
    val expectedPairs = (for {
      (i, ci) <- cells; (j, cj) <- cells
      if i < j && ci == cj && sizes(ci) >= 2 && sizes(ci) <= maxCell
      if Similarity.cosineArrF(vec(i), vec(j)) >= 0.9
    } yield (i, j)).toSet
    // fixture self-check: the clone cell is oversized, so the cap bites
    assert(expectedDropped >= 25, s"fixture drifted: cells $sizes")
    val (pairs, acc) = Similarity.semanticDedupPairsCounted(df, "vec_id",
      "embedding", threshold = 0.9, nlist = 4, lloydPasses = 1,
      maxCell = maxCell, probeCells = 1)
    assert(acc.value == 0L, "accumulator must start at zero (fresh per call)")
    val got = pairs.select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == expectedPairs, s"got $got expected $expectedPairs (sizes $sizes)")
    assert(acc.value == expectedDropped,
      s"one action must count each oversized-cell row once, got ${acc.value} " +
        s"expected $expectedDropped")
  }

  test("batched ANN query collect: over-cap query set raises an actionable error") {
    import spark.implicits._
    val emb = (0L until 20L)
      .map(i => (i, Array.tabulate(8)(j => ((i * 8 + j) % 13).toFloat / 13f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, emb.limit(5), "vec_id", "embedding",
        k = 3, maxQueryBatch = 3).collect()
    }
    assert(ex.getMessage.contains("maxQueryBatch"), ex.getMessage)
    assert(ex.getMessage.contains("5 rows"), ex.getMessage)
    // at the cap exactly: no error
    val ok = Similarity.bruteForceTopK(emb, emb.limit(3), "vec_id", "embedding",
      k = 3, maxQueryBatch = 3)
    assert(ok.count() == 9)
  }

  test("cosineDedupPairs: integral-id float corpora take the joinless bucket-batched path; string ids agree and reuse ONE exchange") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val rnd = new scala.util.Random(123 + i)
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val out = Similarity.cosineDedupPairs(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.8, nBits = 4, maxBucket = 50,
      probeDepth = 0)
    out.collect() // AQE finalizes the plan at runtime
    val got = out.select(col("id_a"), col("id_b"), col("score"))
      .as[(Long, Long, Double)].collect().toSet
    assert(!out.queryExecution.executedPlan.toString.contains("Join"),
      "batched path must not join")
    // string ids: the fallback self-join — its a/b sides share the
    // signature+window pipeline through ONE reused exchange, and (the
    // LSH signature hashes only the VECTOR, unlike the k-means seeds)
    // the pair set must equal the batched path's with bit-identical
    // scores under the zero-padded id mapping
    val sdf = rows.map { case (i, v) => (f"d$i%03d", v) }
      .toDF("vec_id", "embedding")
    val out2 = Similarity.cosineDedupPairs(sdf, "vec_id", "embedding",
      threshold = 0.8, nBits = 4, maxBucket = 50, probeDepth = 0)
    out2.collect()
    val plan2 = out2.queryExecution.executedPlan.toString
    assert(plan2.contains("ReusedExchange") || plan2.contains("ReusedQueryStage"),
      s"self-join sides should reuse one signature exchange:\n$plan2")
    val got2 = out2.select(col("id_a"), col("id_b"), col("score"))
      .as[(String, String, Double)].collect().toSet
    assert(got2 == got.map { case (a, b, s) => (f"d$a%03d", f"d$b%03d", s) },
      s"paths disagree: batched=$got joined=$got2")
  }

  test("semanticDedupPairs: integral ids take the joinless cell-batched path; string ids agree and reuse ONE exchange") {
    import spark.implicits._
    val rows = (0 until 60).map { i =>
      val rnd = new scala.util.Random(123 + i)
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    // SHARED centroids (the prebuilt overload): seeds hash the id
    // column, so the long- and string-id corpora would otherwise train
    // different quantizers and the path comparison below would be
    // meaningless
    val df = rows.toDF("vec_id", "embedding")
    val cents = Similarity.ivfTrain(df, "vec_id", "embedding",
      nlist = 4, lloydPasses = 1)
    // integral ids: one kernel call per cell — the executed plan must
    // contain NO join at all (the joined form paid per-pair row
    // machinery on every candidate)
    val out = Similarity.semanticDedupPairsCounted(df,
      "vec_id", "embedding", cents, threshold = 0.8, maxCell = 50,
      probeCells = 1)._1
    out.collect() // AQE finalizes the plan at runtime
    val got = out.select(col("id_a"), col("id_b"), col("score"))
      .as[(Long, Long, Double)].collect().toSet
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"batched path must not join:\n$plan")
    // string ids: the fallback self-join — the a/b sides share the
    // assignment+window pipeline, so Catalyst must plan ONE exchange and
    // reuse it; and the two paths must emit the SAME pairs with
    // bit-identical scores (zero-padded ids keep the < order numeric)
    val sdf = rows.map { case (i, v) => (f"d$i%03d", v) }
      .toDF("vec_id", "embedding")
    val out2 = Similarity.semanticDedupPairsCounted(sdf, "vec_id", "embedding",
      cents, threshold = 0.8, maxCell = 50, probeCells = 1)._1
    out2.collect() // AQE finalizes reuse decisions at runtime
    val got2 = out2.select(col("id_a"), col("id_b"), col("score"))
      .as[(String, String, Double)].collect().toSet
    val plan2 = out2.queryExecution.executedPlan.toString
    assert(plan2.contains("ReusedExchange") || plan2.contains("ReusedQueryStage"),
      s"fallback self-join sides should reuse one assignment exchange:\n$plan2")
    assert(got2 == got.map { case (a, b, s) => (f"d$a%03d", f"d$b%03d", s) },
      s"paths disagree: batched=$got joined=$got2")
  }

  test("IVF train/index/search split: parquet-persisted index reproduces ivfTopK") {
    import spark.implicits._
    val dim = 8
    val points = (0 until 120).map { i =>
      val rnd = new scala.util.Random(77 * i + 5)
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }
    val emb = points.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 4)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val oneShot = keyed(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 5, nlist = 8, nprobe = 3, lloydPasses = 1))
    // train once, persist the index to parquet, search the REloaded frame —
    // the standing-index workflow must reproduce the one-shot results
    val centroids = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 8, lloydPasses = 1)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.ivfIndex(emb, "vec_id", "embedding", centroids)
      .write.mode("overwrite").parquet(s"$dir/index.parquet")
    val reloaded = spark.read.parquet(s"$dir/index.parquet")
    val viaIndex = keyed(Similarity.ivfSearchIndexed(reloaded, centroids,
      queries, "vec_id", "embedding", k = 5, nprobe = 3))
    assert(viaIndex == oneShot)
    assert(oneShot.nonEmpty)
  }

  test("LSH index/search split: parquet-persisted signature frame reproduces lshTopKProbed") {
    import spark.implicits._
    val dim = 8
    val points = (0 until 120).map { i =>
      val rnd = new scala.util.Random(91 * i + 3)
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }
    val emb = points.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 4)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id", $"rank", $"score")
        .as[(Long, Long, Int, Double)].collect().toSet
    val oneShot = keyed(Similarity.lshTopKProbed(emb, queries, "vec_id", "embedding",
      k = 5, nBits = 6, probeDepth = 2))
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh").toString
    Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 6)
      .write.mode("overwrite").parquet(s"$dir/index.parquet")
    val viaIndex = keyed(Similarity.lshSearchIndexed(
      spark.read.parquet(s"$dir/index.parquet"), queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 2))
    assert(viaIndex == oneShot)
    assert(oneShot.nonEmpty)
  }

  test("nBitsFor: smallest width meeting the occupancy target, floored and capped, monotone") {
    import graft.ops.Similarity.nBitsFor
    assert(nBitsFor(600000L) == 16)   // the recall/cost tables' anchor
    assert(nBitsFor(6000000L) == 19)  // the 10x dial the vstream curve validates (±1 of 16+log2(10))
    assert(nBitsFor(0L) == 12 && nBitsFor(1L) == 12) // floor
    assert(nBitsFor(Long.MaxValue / 4) == 30)        // cap
    // smallest-satisfying: one fewer bit would overshoot the target
    val b = nBitsFor(600000L)
    assert(600000.0 / (1L << b) <= 16 && 600000.0 / (1L << (b - 1)) > 16)
    // monotone in rows, antitone in target occupancy
    assert((1 to 12).map(i => nBitsFor(1L << (i + 10))).sliding(2)
      .forall(p => p.head <= p.last))
    assert(nBitsFor(600000L, 4) >= nBitsFor(600000L, 64))
    intercept[IllegalArgumentException] { nBitsFor(-1L) }
    intercept[IllegalArgumentException] { nBitsFor(10L, 0) }
  }

  test("LSH width guard: mismatched nBits fails fast, legacy/null frames pass unchecked") {
    import spark.implicits._
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val points = (0 until 60).map { i =>
      val rnd = new scala.util.Random(17 * i + 9)
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1))
    }
    val emb = points.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 3)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshw").toString
    Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 6)
      .write.mode("overwrite").parquet(s"$dir/index.parquet")
    val stored = spark.read.parquet(s"$dir/index.parquet")
    // (a) searching with the wrong width throws the intended message —
    // and the assert survives plan optimization (nothing folds it away)
    val ex = intercept[Exception] {
      Similarity.lshSearchIndexed(stored, queries,
        "vec_id", "embedding", k = 5, nBits = 8, probeDepth = 1).collect()
    }
    assert(chain(ex).contains("built with a different width"),
      s"wrong failure: ${chain(ex)}")
    // (b) a pre-column legacy frame passes through unchecked (searched at
    // whatever nBits the caller says — same results as a fresh index)
    val legacy = stored.drop("nbits")
    val viaLegacy = Similarity.lshSearchIndexed(legacy, queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 1)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    val viaNew = Similarity.lshSearchIndexed(stored, queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 1)
      .select($"query_id", $"neighbor_id", $"rank").as[(Long, Long, Int)].collect().toSet
    assert(viaLegacy == viaNew && viaNew.nonEmpty)
    // (c) null-tolerance: a legacy half unioned under a new frame (nbits
    // null on the legacy rows) searches instead of failing the scan
    val mixed = stored.limit(30).unionByName(
      legacy.limit(30).withColumn("nbits",
        org.apache.spark.sql.functions.lit(null).cast("int")))
    Similarity.lshSearchIndexed(mixed, queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 1).collect()
  }

  test("cosineDedupIncrement over a persisted bucket-partitioned index equals the in-memory run") {
    import spark.implicits._
    val points = (0 until 200).map { i =>
      val rnd = new scala.util.Random(41 * i + 13)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val corpus = points.toDF("vec_id", "embedding")
    // batch: copies of corpus rows 0..19 (must drop) + negations of rows
    // 20..39 (fresh — |cosine| < threshold to everything — must survive)
    val copies = (0 until 20).map(i => ((10000 + i).toLong, points(i)._2.map(_ * 1.001f)))
    val fresh = (20 until 40).map(i => ((20000 + i).toLong, points(i)._2.map(x => -x)))
    val batch = (copies ++ fresh).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString + "/idx"
    Similarity.lshIndexWrite(corpus, "vec_id", "embedding", dir, nBits = 6)
    def ids(d: org.apache.spark.sql.DataFrame): Set[Long] =
      d.select("vec_id").as[Long].collect().toSet
    val viaStore = ids(Similarity.cosineDedupIncrement(
      spark.read.parquet(dir), batch, "vec_id", "embedding",
      threshold = 0.9, nBits = 6, probeDepth = 1))
    val viaMem = ids(Similarity.cosineDedupIncrement(
      Similarity.lshIndex(corpus, "vec_id", "embedding", nBits = 6), batch,
      "vec_id", "embedding", threshold = 0.9, nBits = 6, probeDepth = 1))
    assert(viaStore == viaMem)
    assert(viaStore == (20020L until 20040L).toSet, s"survivors: $viaStore")
  }

  test("PQ mis-paired codebook: wrong code length raises instead of returning empty") {
    import spark.implicits._
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val points = (0 until 80).map { i =>
      val rnd = new scala.util.Random(53 * i + 1)
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1))
    }
    val emb = points.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 2)
    val cb4 = Similarity.pqTrain(emb, "vec_id", "embedding", m = 4, ksub = 8)
    val cb8 = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 8)
    val codes4 = Similarity.pqEncode(emb, "vec_id", "embedding", cb4)
    val ex1 = intercept[Exception] {
      Similarity.pqSearch(codes4, cb8, queries, "vec_id", "embedding", k = 3).collect()
    }
    assert(chain(ex1).contains("different codebook"), s"wrong failure: ${chain(ex1)}")
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 4)
    val idx4 = Similarity.ivfPqIndex(emb, "vec_id", "embedding", cents, cb4)
    val ex2 = intercept[Exception] {
      Similarity.ivfPqSearch(idx4, cents, cb8, queries, "vec_id", "embedding",
        k = 3, nprobe = 4).collect()
    }
    assert(chain(ex2).contains("different codebook"), s"wrong failure: ${chain(ex2)}")
    // the matching codebook still searches fine
    assert(Similarity.pqSearch(codes4, cb4, queries, "vec_id", "embedding", k = 3)
      .count() == 6)
  }

  test("IVF Lloyd refinement: recall vs brute force on a clustered corpus") {
    import spark.implicits._
    val dim = 8
    val centers = (0 until 6).map { c =>
      val rnd = new scala.util.Random(9000 + c)
      Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    }
    val points = (0 until 240).map { i =>
      val c = i % 6
      val rnd = new scala.util.Random(31 * i + 7)
      (i.toLong, centers(c).map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
    }
    val emb = points.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 6) // one query per cluster
    def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val bf = topSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5))
    def recall(passes: Int): Double = {
      val got = topSet(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 2, lloydPasses = passes))
      got.intersect(bf).size.toDouble / bf.size
    }
    val refined = recall(1)
    assert(refined >= 0.8, s"recall@5 with one Lloyd pass = $refined")
    assert(refined >= recall(0), "Lloyd refinement should not lose recall here")
  }

  test("compiled cosine/signature kernels are BIT-identical to the expression forms") {
    // The kernels claim the exact IEEE operation sequence of the
    // higher-order expression trees — this pins it with raw-bit equality
    // over deterministic hash-derived vectors, float AND double, so any
    // future reordering of an accumulation (which could silently shift
    // oracle hashes) fails here first.
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val n = 400
    val emb = spark.range(n).toDF("id")
      .select(col("id"),
        transform(sequence(lit(0), lit(31)), j =>
          pmod(xxhash64(col("id"), j), lit(2000)).cast("double") / 1000.0d - 1.0d).as("vd"))
      .withColumn("vf", col("vd").cast(ArrayType(FloatType)))
    val pairs = emb.withColumn("id2", (col("id") + 7) % n).alias("a")
      .join(emb.alias("b"), col("a.id2") === col("b.id"))
    val rows = pairs.select(
      Similarity.cosineKernelF(col("a.vf"), col("b.vf")).as("kf"),
      Similarity.cosine(col("a.vf"), col("b.vf")).as("ef"),
      Similarity.cosineKernelD(col("a.vd"), col("b.vd")).as("kd"),
      Similarity.cosine(col("a.vd"), col("b.vd")).as("ed"),
      Similarity.hyperplaneKernelF(12)(col("a.vf")).as("sf"),
      Similarity.hyperplaneSignature(col("a.vf"), 12).as("xf"),
      Similarity.hyperplaneKernelD(16)(col("a.vd")).as("sd"),
      Similarity.hyperplaneSignature(col("a.vd"), 16).as("xd")).collect()
    assert(rows.length == n)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)), s"float cosine bits: $r")
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(3)), s"double cosine bits: $r")
      assert(r.getLong(4) == r.getLong(5), s"float signature: $r")
      assert(r.getLong(6) == r.getLong(7), s"double signature: $r")
    }
    // length mismatch: both forms yield null, not an arbitrary score
    val mm = emb.limit(1).select(
      Similarity.cosineKernelF(col("vf"), slice(col("vf"), 1, 30)).as("k"),
      Similarity.cosine(col("vf"), slice(col("vf"), 1, 30)).as("e")).collect()(0)
    assert(mm.isNullAt(0) && mm.isNullAt(1))
    // dims = 0: the expression null-poisons its accumulator (sequence(0,
    // dims-1) counts down to -1 and zip_with null-pads) so every bit
    // falls to otherwise(0L) — the kernels must land in the SAME bucket
    val empty = emb.limit(1).select(
      Similarity.hyperplaneKernelF(12)(slice(col("vf"), 1, 0)).as("k"),
      Similarity.hyperplaneSignature(slice(col("vf"), 1, 0), 12).as("e")).collect()(0)
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L,
      s"empty-vector signature diverged: kernel ${empty.getLong(0)} vs expression ${empty.getLong(1)}")
  }

  test("batched ANN paths drop null-embedding rows like the join form") {
    // integral ids take the corpus-row-batched scoring — a null vector
    // must be filtered (the join form scores it null and rankTopK drops
    // it), never reach the kernel's toArray
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val base = (0L until 50L).map(i => (i, Array.tabulate(8)(j => (i * 8 + j) % 13 / 13.0f)))
    val emb = (base.map { case (i, v) => (i, Option(v)) } :+ (99L, Option.empty[Array[Float]]))
      .toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" < 2)
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
    assert(bf.count() == 6) // 2 queries × 3, null row neither query nor neighbor
    assert(!bf.select("neighbor_id").as[Long].collect().contains(99L))
    val cents = Similarity.ivfTrain(emb.where($"vec_id" =!= 99L), "vec_id", "embedding",
      nlist = 4, lloydPasses = 0)
    val idx = Similarity.ivfIndex(emb.where($"vec_id" =!= 99L), "vec_id", "embedding", cents)
      .unionByName(Seq((99L, Option.empty[Array[Float]], 0))
        .toDF("vec_id", "embedding", "cell")
        .select($"vec_id", $"embedding".cast(ArrayType(FloatType)), $"cell"))
    val ivf = Similarity.ivfSearchIndexed(idx, cents, queries, "vec_id", "embedding",
      k = 3, nprobe = 4)
    assert(ivf.count() == 6)
    assert(!ivf.select("neighbor_id").as[Long].collect().contains(99L))
  }

  test("nearDupIncrement String range prefilter survives astral ids straddling U+FFFF") {
    // The mid-size (>2048 distinct old ids) rung of the verify prefilter
    // pushes a [min,max] range on the corpus id column. Java orders
    // Strings by UTF-16 code units while Spark compares UTF8String bytes
    // (code-point order): "𐀀" (U+10000, UTF-8 F0 90 80 80)
    // sorts BELOW "�…" (EF BF BD) for Java but ABOVE it for Spark,
    // so driver-computed bounds over this id set form an EMPTY range to
    // the engine and every genuine candidate silently escapes the verify
    // scan. The bounds must come from a Spark agg (engine collation).
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val astralId = "𐀀zz"                        // U+10000 'zz'
    val ids = astralId +: (1 to 2099).map(i => f"�$i%04d")
    assert(ids.length == 2100 && ids.distinct.length == 2100)
    val existing = ids.map(id => (id, text)).toDF("doc_id", "text")
    val incoming = Seq(("new1", text)).toDF("doc_id", "text")
    // identical text → every existing doc band-collides with the batch →
    // 2100 distinct old ids → the String range rung; Jaccard 1.0 ≥ 0.7 →
    // the incoming doc must be recognized as a duplicate and dropped
    val kept = Dedup.nearDupIncrement(existing, incoming, "text", "doc_id",
      threshold = 0.7)
    assert(kept.count() == 0L,
      "astral-id corpus: incoming near-dup escaped the verify prefilter")
  }
}
