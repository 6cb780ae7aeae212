package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DsirHash
import graft.ops.Dsir

/** Pins graft.ops.Dsir (hashed-ngram importance resampling): the md5
  * bucket kernel against its SQL expression spelling (the x85 oracle's
  * hash contract), the unigram+bigram feature construction, the
  * quantized-weight arithmetic against hand-replayed driver math, the
  * map-only kernel score against an independent explode-join spelling,
  * partition invariance of the exact-integer weights, and the
  * deterministic select / Gumbel-resample contracts.
  */
class DsirSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("bucket kernel is bit-identical to the SQL md5 spelling") {
    import spark.implicits._
    val grams = Seq("apples", "apples oranges", "a", "0", "zz9 zz9",
      "the cat", "sat", "", "x" * 200).toDF("g")
    val viaExpr = grams.select(col("g"),
      pmod(conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
        .cast(LongType), lit(4096L)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaExpr.foreach { case (g, b) =>
      assert(DsirHash.bucket(g, 4096) == b, s"bucket mismatch for '$g'")
    }
  }

  test("gramBuckets emits unigrams + space-joined bigrams with multiplicity") {
    val k = 1 << 20
    val bs = DsirHash.gramBuckets("The cat. THE CAT", k).toSeq
    val exp = Seq("the", "cat", "the", "cat", "the cat", "cat the",
      "the cat").map(DsirHash.bucket(_, k))
    assert(bs == exp)
    assert(DsirHash.gramBuckets("", k).isEmpty)
    assert(DsirHash.gramBuckets(null, k).isEmpty)
    assert(DsirHash.gramBuckets("solo", k).toSeq ==
      Seq(DsirHash.bucket("solo", k)))
  }

  private def corpora() = {
    import spark.implicits._
    val raw = Seq(
      (1L, "apples oranges apples"),
      (2L, "bolts nuts bolts nuts"),
      (3L, "apples bolts"),
      (4L, ""),
      (5L, "oranges oranges oranges")
    ).toDF("doc_id", "text")
    val target = Seq(
      (101L, "apples oranges"),
      (102L, "apples apples")
    ).toDF("doc_id", "text")
    (raw, target)
  }

  test("fit replays the documented weight spelling on hand-counted features") {
    val (raw, target) = corpora()
    val k = 1 << 16 // wide enough that test grams don't collide
    val m = Dsir.fit(raw, target, "text", k)
    // target grams: apples, oranges, apples oranges | apples, apples,
    // apples apples -> 6; raw grams: 3+2 + 4+3 + 2+1 + 0 + 3+2 = 20
    assert((m.nTargetGrams, m.nRawGrams) == ((6L, 20L)))
    val rows = m.buckets.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def w(ct: Long, cr: Long): Long =
      math.floor((math.log((ct + 1) / (m.nTargetGrams + k.toDouble)) -
        math.log((cr + 1) / (m.nRawGrams + k.toDouble))) * 1e6 + 0.5).toLong
    // spot-check hand counts: "apples" target 3 / raw 3; "bolts nuts"
    // target 0 / raw 2; "oranges oranges" target 0 / raw 2
    assert(rows(DsirHash.bucket("apples", k)) == ((3L, 3L, w(3, 3))))
    assert(rows(DsirHash.bucket("bolts nuts", k)) == ((0L, 2L, w(0, 2))))
    assert(rows(DsirHash.bucket("oranges oranges", k)) == ((0L, 2L, w(0, 2))))
    // TARGET-ONLY gram ("apples apples" appears in no raw doc): the
    // model must carry its target-informed weight, not defaultMicro
    assert(rows(DsirHash.bucket("apples apples", k)) == ((1L, 0L, w(1, 0))))
    rows.foreach { case (b, (ct, cr, wm)) =>
      assert(wm == w(ct, cr), s"weight mismatch in bucket $b")
    }
    assert(m.defaultMicro == w(0, 0) + 0) // same spelling at zero counts
  }

  test("kernel score equals the independent explode-join spelling; partition-invariant") {
    val (raw, target) = corpora()
    val m = Dsir.fit(raw, target, "text", 4096)
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      Dsir.score(df, "text", "doc_id", m).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val s = scores(raw)
    // independent spelling: explode the feature kernel, join the model
    // frame, sum — must land on the same exact integers
    val grams = udf((t: String) => DsirHash.gramBuckets(t, 4096))
    val joined = raw.select(col("doc_id"), explode(grams(col("text"))).as("bucket"))
      .join(m.buckets.select("bucket", "w_micro"), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("w_micro").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    joined.foreach { case (id, ns) => assert(s(id) == ns, s"doc $id") }
    assert(s(4L) == ((0L, 0L))) // gram-less doc scores zero
    assert(scores(raw.repartition(7)) == s)
    // target-speak outscores raw-only speak
    assert(s(1L)._2 > s(2L)._2)
  }

  test("out-of-corpus scoring: target-only grams keep their target weight, unseen grams take defaultMicro") {
    import spark.implicits._
    val (raw, target) = corpora()
    val k = 1 << 16
    val m = Dsir.fit(raw, target, "text", k)
    def w(ct: Long, cr: Long): Long =
      math.floor((math.log((ct + 1) / (m.nTargetGrams + k.toDouble)) -
        math.log((cr + 1) / (m.nRawGrams + k.toDouble))) * 1e6 + 0.5).toLong
    // the day-2 batch case the full-outer fit exists for: "apples
    // apples" occurs in TARGET only (ct=1, cr=0) and "zz" in NEITHER
    val fresh = Seq((201L, "apples apples"), (202L, "zz")).toDF("doc_id", "text")
    val s = Dsir.score(fresh, "text", "doc_id", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // grams of doc 201: apples (3,3), apples (3,3), "apples apples" (1,0)
    assert(s(201L) == ((3L, 2 * w(3, 3) + w(1, 0))),
      s"target-only gram must score w(1,0)=${w(1, 0)}, not defaultMicro=${m.defaultMicro}")
    assert(s(202L) == ((1L, m.defaultMicro)))
    assert(w(1, 0) != m.defaultMicro) // the bug would have conflated them
  }

  test("fuzz: kernel score ≡ explode-join spelling over random ASCII corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcdefghij0123 .,!-\n\t" // tokens + separators + edge chars
    def doc(): String =
      (1 to (1 + rnd.nextInt(30))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val raw = (1L to 60L).map(i => (i, doc())).toDF("doc_id", "text")
    val target = (101L to 115L).map(i => (i, doc())).toDF("doc_id", "text")
    val m = Dsir.fit(raw, target, "text", 256) // small k: forced collisions
    val s = Dsir.score(raw, "text", "doc_id", m).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val grams = udf((t: String) => DsirHash.gramBuckets(t, 256))
    val joined = raw.select(col("doc_id"), explode(grams(col("text"))).as("bucket"))
      .join(m.buckets.select("bucket", "w_micro"), Seq("bucket"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("w_micro").as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    (1L to 60L).foreach { id =>
      assert(s(id) == joined.getOrElse(id, (0L, 0L)), s"doc $id diverged")
    }
  }

  test("select takes the k highest weights with the id tie-break; resample is salt-deterministic") {
    val (raw, target) = corpora()
    val m = Dsir.fit(raw, target, "text", 4096)
    val top2 = Dsir.select(raw, "text", "doc_id", m, 2)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val all = Dsir.score(raw, "text", "doc_id", m).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .sortBy { case (id, s) => (-s, id) }.map(_._1).take(2).toSeq
    assert(top2 == all)
    val a = Dsir.resample(raw, "text", "doc_id", m, 3, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Dsir.resample(raw.repartition(5), "text", "doc_id", m, 3, salt = "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.size == 3 && a.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
    // resampled frames carry the score columns, no leftover key
    val cols = Dsir.resample(raw, "text", "doc_id", m, 2).columns.toSeq
    assert(cols == Seq("doc_id", "n_grams", "logw_micro"))
  }
}
