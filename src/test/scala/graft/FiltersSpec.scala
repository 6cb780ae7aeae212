package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Decontaminate, Redact, Sampling, TextFilters}

/** Quality filtering, PII redaction, decontamination, and deterministic
  * sampling (the x25–x28 operators). */
class FiltersSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val goodText = (
    "the quick brown fox jumps over the lazy dog and then runs back home " +
    "to be fed because that is what dogs have always done with great joy " +
    "and the owner of the dog was glad to see it return every single day " +
    "since nothing else in the town gave him such reliable comfort at all").trim

  test("quality filter: rules fire individually and reasons name them") {
    val df = Seq(
      (1L, goodText),                                   // passes everything
      (2L, "too short"),                                // word_count (+stopwords)
      // 8 hashes on 56 words: symbol ratio 8/64 = 0.125 > 0.1 fails, but
      // alpha ratio 56/64 = 0.875 still passes — exactly one rule fires
      (3L, goodText + " # # # # # # # #"),
      (4L, (1 to 60).map(_ => "9999").mkString(" "))    // no alpha, no stopwords
    ).toDF("doc_id", "text")
    val out = TextFilters.annotate(df, "text")
      .select("doc_id", "keep", "drop_reasons").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(out(1L) == (true, ""))
    assert(!out(2L)._1 && out(2L)._2.contains("word_count"))
    assert(!out(3L)._1 && out(3L)._2 == "symbol_ratio")
    assert(!out(4L)._1 && out(4L)._2.contains("alpha_words")
      && out(4L)._2.contains("stopword_hits"))
    // the pipeline form drops exactly the failing docs and keeps schema
    val kept = TextFilters(df, "text")
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("redact replaces emails, IPs, phones with placeholders and counts them") {
    val df = Seq(
      (1L, "mail bob.smith+x@mail-host.co.uk and 192.168.0.1 or 555-123-4567 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Redact.redact(col("text")).as("r")).as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "mail [EMAIL] and [IP] or [PHONE] now")
    assert(out(2L) == "no pii here at all")
    val (e, i, p) = Redact.counts(col("text"))
    val c = df.select(col("doc_id"), e, i, p).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(c(1L) == (1, 1, 1) && c(2L) == (0, 0, 0))
  }

  test("decontaminate flags 13-gram overlap but not 12-gram overlap") {
    val gram13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"unrelated prefix $gram13 unrelated suffix"), // contains the full 13-gram
      (2L, (2 to 13).map(i => s"w$i").mkString(" ")),     // only 12 of the tokens
      (3L, "completely different words entirely")).toDF("doc_id", "text")
    val bench = Seq(s"something $gram13 something else").toDF("text")
    val report = Decontaminate.overlapReport(docs, "text", "doc_id", bench, "text")
    val flagged = report.select("doc_id").as[Long].collect().toSet
    assert(flagged == Set(1L))
    val clean = Decontaminate.decontaminate(docs, "text", "doc_id", bench, "text")
    assert(clean.select("doc_id").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("hash sampling is deterministic, partition-independent, and salt-sensitive") {
    val df = spark.range(0, 10000).toDF("id")
    val a = Sampling.hashSample(df, "id", 0.3).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(7), "id", 0.3)
      .select("id").as[Long].collect().toSet
    assert(a == b)                      // same sample regardless of layout
    assert(math.abs(a.size - 3000) < 150, s"got ${a.size}") // ~binomial 3σ
    val other = Sampling.hashSample(df, "id", 0.3, salt = "other")
      .select("id").as[Long].collect().toSet
    assert(other != a)                  // independent draw per salt
    // nested property: a 0.1 sample is a subset of the 0.3 sample (same salt)
    val small = Sampling.hashSample(df, "id", 0.1).select("id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("stratified mix applies per-domain rates") {
    val df = spark.range(0, 9000)
      .select(col("id"), concat(lit("src"), (col("id") % 3).cast("string")).as("source"))
    val mixed = Sampling.stratifiedMix(df, "source", "id",
      rates = Map("src0" -> 1.0, "src1" -> 0.5), defaultRate = 0.0)
    val bySrc = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 3000)          // rate 1.0 keeps everything
    assert(math.abs(bySrc("src1") - 1500) < 150)
    assert(!bySrc.contains("src2"))        // default 0.0 drops the rest
  }
}
