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
      (2L, "no pii here at all"),
      // short numeric prose must survive: < 7 digits is not phone-shaped
      (3L, "see pages 100 - 104 and figures 1.2 - 3.4 from 1998"),
      (4L, "call +1 (555) 123-4567 today")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Redact.redact(col("text")).as("r")).as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "mail [EMAIL] and [IP] or [PHONE] now")
    assert(out(2L) == "no pii here at all")
    assert(out(3L) == "see pages 100 - 104 and figures 1.2 - 3.4 from 1998")
    assert(out(4L) == "call [PHONE] today")
    val (e, i, p) = Redact.counts(col("text"))
    val c = df.select(col("doc_id"), e, i, p).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(c(1L) == (1, 1, 1) && c(2L) == (0, 0, 0))
    assert(c(3L) == (0, 0, 0) && c(4L) == (0, 0, 1))
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

  test("scrubSpans removes exactly the contaminated spans; clean text is byte-identical") {
    val gram13 = (1 to 13).map(i => s"w$i").mkString(" ")
    val before = "unrelated prefix words here and more filler to pad things out nicely"
    val after = "unrelated suffix material"
    val docs = Seq(
      (1L, s"$before $gram13 $after"),  // one span mid-doc
      // two DISJOINT leaks separated by > 13 clean tokens → two spans
      (2L, s"$gram13 aa bb cc dd ee ff gg hh ii jj kk ll mm nn $gram13"),
      // overlapping windows (the 13-gram plus one extra matched token on
      // each side via a 15-token bench doc) merge into ONE span
      (3L, s"w0 $gram13 w14"),
      (4L, (2 to 13).map(i => s"w$i").mkString(" ")), // only 12 tokens: untouched
      (5L, "Completely DIFFERENT words, entirely!?")) // clean: byte-identical
      .toDF("doc_id", "text")
    val bench = Seq(s"w0 $gram13 w14").toDF("text")
    val out = Decontaminate.scrubSpans(docs, "text", "doc_id", bench, "text")
      .as[(Long, String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((s"$before $after".toLowerCase, 1, 13)))
    assert(out(2L)._2 == 2 && out(2L)._3 == 26)
    assert(out(2L)._1 == "aa bb cc dd ee ff gg hh ii jj kk ll mm nn")
    assert(out(3L) == (("", 1, 15)))     // merged single span covers all
    assert(out(4L) == (((2 to 13).map(i => s"w$i").mkString(" "), 0, 0)))
    assert(out(5L) == (("Completely DIFFERENT words, entirely!?", 0, 0)))
    // Bloom-prefiltered path is output-identical
    val viaBloom = Decontaminate.scrubSpans(docs, "text", "doc_id", bench, "text",
        bloomFpp = 0.01)
      .as[(Long, String, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(viaBloom == out)
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

  test("bloom decontaminate equals the exact path (no false negatives, FPs verified away)") {
    val gram13 = (1 to 13).map(i => s"w$i").mkString(" ")
    // 200 clean docs with distinct vocab + 5 planted contaminated ones
    val clean = (0 until 200).map(i =>
      (i.toLong, (0 until 20).map(j => s"tok${i}_$j").mkString(" ")))
    val dirty = (200 until 205).map(i =>
      (i.toLong, s"prefix $gram13 suffix of doc $i"))
    val docs = (clean ++ dirty).toDF("doc_id", "text")
    val bench = Seq(s"bench set contains $gram13 verbatim").toDF("text")
    val exact = Decontaminate.decontaminate(docs, "text", "doc_id", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    val bloom = Decontaminate.decontaminateBloom(docs, "text", "doc_id", bench, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(bloom == exact)
    assert((200L until 205L).forall(id => !bloom.contains(id))) // planted all dropped
    assert(bloom.size == 200)
  }

  test("temperature mix: alpha=1 is identity at target 1; alpha<1 boosts the tail; formula replays exactly") {
    val df = (0 until 1000).map { i =>
      val g = if (i < 900) "big" else if (i < 990) "mid" else "small"
      (i.toLong, g)
    }.toDF("id", "g")
    // alpha = 1, target = 1: every rate is exactly 1.0 — identity
    assert(Sampling.temperatureMix(df, "g", "id",
      alpha = 1.0, targetFraction = 1.0).count() == 1000)
    // alpha = 0.5: replicate the documented rate formula (sorted fold,
    // 9-dp rounding) and check the kept set IS hashUniform < rate
    val counts = Seq("big" -> 900L, "mid" -> 90L, "small" -> 10L)
    val powSum = counts.map(c => math.pow(c._2.toDouble, 0.5)).sum
    val rates = counts.map { case (g, c) =>
      val r = math.min(1.0, 0.5 * 1000.0 * (math.pow(c.toDouble, 0.5) / powSum) / c)
      g -> BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val expected = df.where(
      rates.map { case (g, r) =>
        col("g") === g && Sampling.hashUniform(col("id"), "graft") < r
      }.reduce(_ || _)).select("id").as[Long].collect().toSet
    val got = Sampling.temperatureMix(df, "g", "id",
      alpha = 0.5, targetFraction = 0.5)
      .select("id").as[Long].collect().toSet
    assert(got == expected, s"got ${got.size} expected ${expected.size}")
    // the tail keeps a LARGER fraction than the head (the point of
    // temperature flattening) and the small group caps at rate 1.0
    val keptBy = df.join(got.toSeq.toDF("id"), Seq("id"))
      .groupBy("g").count().as[(String, Long)].collect().toMap
    assert(keptBy("small") == 10L, s"capped group keeps everything: $keptBy")
    assert(keptBy("mid").toDouble / 90 > keptBy("big").toDouble / 900,
      s"tail fraction must exceed head fraction: $keptBy")
    // layout-independent: same kept set after a repartition
    val again = Sampling.temperatureMix(df.repartition(13), "g", "id",
      alpha = 0.5, targetFraction = 0.5).select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("scrubLines: terminal punctuation, word minimum, and ban list each drop their line") {
    val text = Seq(
      "This is a fine sentence.",          // keeps
      "Too short.",                        // < 3 words
      "Some JavaScript got injected here.", // banned, case-insensitive
      "ends without terminal punctuation", // no . ! ? "
      "Does a question mark count as terminal?", // keeps
      "\"A quoted ending keeps too.\"")    // keeps (quote terminal)
      .mkString("\n")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = df.select(TextFilters.scrubLines(col("text")).as("s"))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()(0)
    assert(got == Seq(
      "This is a fine sentence.",
      "Does a question mark count as terminal?",
      "\"A quoted ending keeps too.\"").mkString("\n"), got)
    // the word minimum is a live parameter, not baked in
    val loose = df.select(TextFilters.scrubLines(col("text"), minLineWords = 2).as("s"))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect()(0)
    assert(loose.contains("Too short."), loose)
  }

  test("fuzzy decontaminate: verbatim and lightly-tailed leaks drop, clean docs survive, threshold bites") {
    // 20-token docs with per-doc vocab, one shared benchmark source: the
    // verbatim leak (J = 1.0) and the lightly-tailed paraphrase
    // (J = 18/22 ≈ 0.82) drop at 0.8; the heavily-mutated one
    // (J = 18/30 = 0.6) and vocab-disjoint docs survive. The same corpus
    // at threshold 0.85 keeps the paraphrase — the threshold is live, not
    // just the LSH bands.
    val src = (1 to 20).map(i => s"bench$i").mkString(" ")
    val tail4 = " za zb zc zd"
    val tail12 = " za zb zc zd ze zf zg zh zi zj zk zl"
    val docs = (
      (0 until 50).map(i =>
        (i.toLong, (0 until 20).map(j => s"tok${i}_$j").mkString(" "))) ++
      Seq((100L, src), (101L, src + tail4), (102L, src + tail12))
    ).toDF("doc_id", "text")
    val bench = Seq(src).toDF("bench_text")
    def run(th: Double) = Decontaminate.decontaminateFuzzy(
      docs, "text", "doc_id", bench, "bench_text", threshold = th)
      .select("doc_id").as[Long].collect().toSet
    val at08 = run(0.8)
    assert(!at08.contains(100L) && !at08.contains(101L),
      "verbatim and 4-token-tail leaks must drop at 0.8")
    assert(at08.contains(102L), "12-token-tail doc (J = 0.6) must survive 0.8")
    assert((0L until 50L).forall(at08.contains), "clean docs must all survive")
    val at085 = run(0.85)
    assert(!at085.contains(100L) && at085.contains(101L),
      "at 0.85 only the verbatim leak clears the bar")
  }

  test("domain cap keeps at most K per domain, deterministically across layouts") {
    val df = spark.range(0, 3000)
      .select(col("id"), concat(lit("d"), (col("id") % 7).cast("string")).as("dom"))
    val capped = Sampling.domainCap(df, "dom", "id", maxPerDomain = 10)
    val byDom = capped.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(byDom.size == 7 && byDom.values.forall(_ == 10))
    val again = Sampling.domainCap(df.repartition(13), "dom", "id", 10)
      .select("id").as[Long].collect().toSet
    assert(again == capped.select("id").as[Long].collect().toSet)
    // a domain smaller than the cap survives whole
    val tiny = Sampling.domainCap(df.where(col("id") < 5), "dom", "id", 10)
    assert(tiny.count() == 5)
  }

  test("split assigns every row one label with ~weight fractions, stable by id") {
    val df = spark.range(0, 8000).toDF("id")
    val s = Sampling.split(df, "id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
    val byLab = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLab.keySet == Set("train", "val", "test"))
    assert(math.abs(byLab("train") - 6000) < 250)
    assert(math.abs(byLab("val") - 1000) < 150)
    // label is a pure function of (id, salt): layout-independent
    val relabeled = Sampling.split(df.repartition(11), "id",
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
      .as[(Long, String)].collect().toMap
    val first = s.as[(Long, String)].collect().toMap
    assert(relabeled == first)
  }

  test("hashTopN draws exactly n, nested across n, stable across layouts") {
    val df = spark.range(0, 5000).toDF("id")
    val d100 = Sampling.hashTopN(df, "id", 100).select("id").as[Long].collect().toSet
    assert(d100.size == 100)
    val d30 = Sampling.hashTopN(df.repartition(9), "id", 30)
      .select("id").as[Long].collect().toSet
    assert(d30.size == 30 && d30.subsetOf(d100)) // prefix property of the hash order
  }

  test("deterministicShuffle: physically hash-ordered permutation, replayable, seed-dependent") {
    val df = spark.range(0, 3000).toDF("id")
    def run(seed: Long): Seq[Long] =
      Sampling.deterministicShuffle(df, "id", seed, numShards = 8)
        .select("id").as[Long].collect().toSeq
    val s1 = run(1)
    assert(s1.toSet == (0L until 3000L).toSet) // a permutation, nothing lost
    // collect preserves partition order and range partitions are in key
    // order, so the collected sequence IS the claimed total hash order
    val expected = df.select($"id", Sampling.hashLong($"id", "shuffle:1").as("h"))
      .as[(Long, Long)].collect().sortBy { case (i, h) => (h, i) }.map(_._1).toSeq
    assert(s1 == expected, "rows not in seeded-hash total order")
    assert(run(1) == s1, "same seed must replay the same permutation")
    val s2 = run(2)
    assert(s2.toSet == s1.toSet && s2 != s1, "different seed must permute differently")
    assert(Sampling.deterministicShuffle(df, "id", 1, numShards = 8)
      .rdd.getNumPartitions == 8)
  }

  test("interleaveSources: equals the serial window at any bucketing; every prefix carries the weight mix") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 3000).map(i => (i.toLong, s"s${i % 3}")).toDF("id", "src")
    val weights = Map("s0" -> 2.0, "s1" -> 1.0)
    // independent serial reference: one window per source
    val serial = df
      .withColumn("__h", Sampling.hashLong($"id", "graft"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy($"src").orderBy($"__h", $"id")))
      .withColumn("pos", $"__rk".cast("double") /
        when($"src" === "s0", 2.0).when($"src" === "s1", 1.0).otherwise(0.5))
      .orderBy($"pos", $"__h", $"id")
      .select($"id", $"src", $"pos")
      .as[(Long, String, Double)].collect().toSeq
    for (buckets <- Seq(1, 4, 256)) {
      val got = Sampling.interleaveSources(df.repartition(7), "id", "src",
          weights, defaultWeight = 0.5, prefixBuckets = buckets)
        .select($"id", $"src", $"pos")
        .as[(Long, String, Double)].collect().toSeq
      assert(got == serial, s"bucketed rank diverged at prefixBuckets=$buckets")
    }
    // steady mixing: s0 (weight 2, 1000 rows) appears ~2x as often as
    // s1 (weight 1, 1000 rows) in every sizeable prefix until s0 runs
    // dry. Check the first 600 positions: ~400 s0 vs ~200 s1.
    val head = serial.take(600)
    val c0 = head.count(_._2 == "s0").toDouble
    val c1 = head.count(_._2 == "s1").toDouble
    assert(c0 / c1 > 1.8 && c0 / c1 < 2.2, s"prefix mix ratio ${c0 / c1}")
    // nothing dropped, pos column refused if present
    assert(serial.map(_._1).toSet == (1L to 3000L).toSet)
    intercept[IllegalArgumentException] {
      Sampling.interleaveSources(df.withColumn("pos", lit(1)), "id", "src", weights)
    }
    intercept[IllegalArgumentException] {
      Sampling.interleaveSources(df, "id", "src", Map("s0" -> 0.0))
    }
  }

  test("vocabStats: exact counts match hand truth; HLL path within tolerance; blank docs drop") {
    import graft.ops.TextAnalysis
    val docs = Seq((1L, "en", "a b a c"), (2L, "en", "a d"),
      (3L, "fr", "x  y x"), (4L, "fr", "   "), (5L, "de", ""))
      .toDF("id", "lang", "text")
    val got = TextAnalysis.vocabStats(docs, "text", "lang")
      .orderBy("lang").as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("en", 4L, 6L, 4.0 / 6), ("fr", 2L, 3L, 2.0 / 3)),
      s"exact vocabStats mismatch: $got")
    val big = spark.range(0, 20000).select(lit("g").as("lang"),
      concat_ws(" ", (col("id") % 1000).cast("string"),
        ((col("id") * 7) % 500).cast("string")).as("text"))
    val ex = TextAnalysis.vocabStats(big, "text", "lang")
      .select("vocab_size").as[Long].head()
    val ap = TextAnalysis.vocabStats(big, "text", "lang", approx = true, rsd = 0.02)
      .select("vocab_size").as[Long].head()
    assert(ex == 1000L)
    assert(math.abs(ap - ex).toDouble / ex < 0.1,
      s"HLL estimate $ap too far from exact $ex")
  }

  test("tokenBudgetMix: greedy hash-order prefix per source; approx form budgets in expectation") {
    val docs = (1 to 300).map(i => (i.toLong, s"s${i % 3}", 10L + (i % 7)))
      .toDF("id", "src", "toks")
    val budgets = Map("s0" -> 300L, "s1" -> 200L)
    def kept(d: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.tokenBudgetMix(d, "id", "toks", "src", budgets, defaultBudget = 150L)
        .select("id").as[Long].collect().toSet
    val got = kept(docs)
    // independent reference: per source, hash-order greedy prefix
    val hashes = docs.select($"id", Sampling.hashLong($"id", "graft").as("h"))
      .as[(Long, Long)].collect().toMap
    val want = (0 to 2).flatMap { s =>
      val rows = (1 to 300).filter(_ % 3 == s)
        .map(i => (i.toLong, 10L + (i % 7)))
        .sortBy { case (id, _) => (hashes(id), id) }
      val budget = budgets.getOrElse(s"s$s", 150L)
      var cum = 0L
      rows.takeWhile { case (_, t) => cum += t; cum <= budget }.map(_._1)
    }.toSet
    assert(got == want)
    assert(kept(docs.repartition(7)) == got, "selection changed under repartitioning")
    // per-source kept token mass: under budget, and within one max-doc of it
    val tokOf = (1 to 300).map(i => i.toLong -> (10L + (i % 7))).toMap
    (0 to 2).foreach { s =>
      val mass = got.filter(_ % 3 == s).toSeq.map(tokOf).sum
      val budget = budgets.getOrElse(s"s$s", 150L)
      assert(mass <= budget && mass > budget - 17, s"s$s kept $mass of $budget")
    }
    // approx form: expected-budget token mass (loose tolerance), and a
    // larger budget keeps a superset (same salt → nested hash prefixes)
    val approx = Sampling.tokenBudgetMixApprox(docs, "id", "toks", "src",
        budgets, defaultBudget = 150L)
      .select("id").as[Long].collect().toSet
    (0 to 2).foreach { s =>
      val mass = approx.filter(_ % 3 == s).toSeq.map(tokOf).sum
      val budget = budgets.getOrElse(s"s$s", 150L)
      assert(math.abs(mass - budget) <= 120, s"s$s approx mass $mass vs budget $budget")
    }
    val approxBig = Sampling.tokenBudgetMixApprox(docs, "id", "toks", "src",
        budgets.view.mapValues(_ * 2).toMap, defaultBudget = 300L)
      .select("id").as[Long].collect().toSet
    assert(approx.subsetOf(approxBig))
  }

  test("tokenBudgetMix parallel prefix-sum: bucketed result equals the serial window, nulls included") {
    import org.apache.spark.sql.expressions.Window
    // nullable tokens AND a null source — the exact corner cases of the
    // serial window's null accounting (null tokens add nothing; a row
    // whose whole inclusive prefix is null-token is dropped; a null
    // source budgets under defaultBudget as its own group)
    val docs = ((1 to 400).map { i =>
      (i.toLong, if (i % 5 == 0) null else s"s${i % 3}",
        if (i % 11 == 0) None else Some(10L + (i % 7)))
    }).toDF("id", "src", "toks")
    // the serial reference: the pre-r14 single-window spelling
    val budget2 = Map("s0" -> 300L, "s1" -> 200L).foldLeft(lit(150L)) {
      case (acc, (s, b)) => when($"src" === s, lit(b)).otherwise(acc)
    }
    val w = Window.partitionBy($"src")
      .orderBy(Sampling.hashLong($"id", "graft"), $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val serial = docs
      .withColumn("__cum", sum($"toks".cast("long")).over(w))
      .where($"__cum" <= budget2)
      .select("id").as[Long].collect().toSet
    // the parallel form at several bucket counts, including 1 (pure
    // serial) and 4 (multi-row buckets at this corpus size)
    for (buckets <- Seq(1, 4, 256)) {
      val got = Sampling.tokenBudgetMix(docs, "id", "toks", "src",
          Map("s0" -> 300L, "s1" -> 200L), defaultBudget = 150L,
          prefixBuckets = buckets)
        .select("id").as[Long].collect().toSet
      assert(got == serial, s"prefixBuckets=$buckets diverged from the serial window")
      val again = Sampling.tokenBudgetMix(docs.repartition(13), "id", "toks", "src",
          Map("s0" -> 300L, "s1" -> 200L), defaultBudget = 150L,
          prefixBuckets = buckets)
        .select("id").as[Long].collect().toSet
      assert(again == serial, s"prefixBuckets=$buckets changed under repartitioning")
    }
  }

  test("token budget forms raise on negative token counts") {
    val bad = Seq((1L, "s0", 5L), (2L, "s0", -3L), (3L, "s1", 7L))
      .toDF("id", "src", "toks")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    val e1 = intercept[Exception] {
      Sampling.tokenBudgetMix(bad, "id", "toks", "src", Map("s0" -> 100L)).collect()
    }
    assert(chain(e1).contains("negative or non-numeric token count"), chain(e1))
    val e2 = intercept[Exception] {
      Sampling.tokenBudgetMixApprox(bad, "id", "toks", "src", Map("s0" -> 100L)).collect()
    }
    assert(chain(e2).contains("negative or non-numeric token count"), chain(e2))
    // a non-numeric token VALUE must raise the same actionable error,
    // not a misleading one (the cast yields NULL; assert_true on a NULL
    // condition used to throw with the 'negative' message)
    val malformed = Seq((1L, "s0", "5"), (2L, "s0", "abc"))
      .toDF("id", "src", "toks")
    val e3 = intercept[Exception] {
      Sampling.tokenBudgetMix(malformed, "id", "toks", "src", Map("s0" -> 100L)).collect()
    }
    assert(chain(e3).contains("negative or non-numeric token count"), chain(e3))
  }

  test("mixture samplers survive 100k-group cardinality (broadcast-join path)") {
    // the r12/r13 minor carried item: per-group collect + when-chains are
    // the wrong shape for million-group columns. Above the chain
    // threshold the rates/fractions/budgets become broadcast-joined
    // lookup frames — this pins that the big-cardinality path (a) runs,
    // (b) is deterministic under repartitioning, (c) meets its mass
    // contract, on a 100k-group corpus no when-chain could survive.
    val n = 200000
    val big = spark.range(1, n + 1)
      .select($"id", concat(lit("g"), ($"id" % 100000)).as("g"),
        (lit(10L) + ($"id" % 7)).as("toks"))
      .cache()
    big.count()
    // temperatureMix: distributed rates; alpha=1 is proportional
    // sampling, so kept fraction ~ targetFraction
    val tm = Sampling.temperatureMix(big, "g", "id", alpha = 0.7,
      targetFraction = 0.5)
    val kept = tm.count()
    assert(kept > n * 0.40 && kept < n * 0.60, s"temperatureMix kept $kept of $n")
    val keptAgain = Sampling.temperatureMix(big.repartition(17), "g", "id",
      alpha = 0.7, targetFraction = 0.5).count()
    assert(keptAgain == kept, "temperatureMix not repartition-stable at 100k groups")
    // stratifiedMix with a 100k-entry rate map (join path)
    val rates = (0 until 100000).map(i => s"g$i" -> (if (i % 2 == 0) 1.0 else 0.0)).toMap
    val sm = Sampling.stratifiedMix(big, "g", "id", rates, defaultRate = 0.0)
      .select("g").distinct().collect().map(_.getString(0)).toSet
    assert(sm.nonEmpty && sm.forall(g => g.drop(1).toLong % 2 == 0),
      "stratifiedMix join path applied the wrong rates")
    // approx token budget across 100k sources (distributed fractions)
    val tb = Sampling.tokenBudgetMixApprox(big, "id", "toks", "g",
      Map.empty, defaultBudget = 7L)
    val tbN = tb.count()
    assert(tbN > 0 && tbN < n / 2, s"tokenBudgetMixApprox kept $tbN of $n")
    // exact token budget with a >chain-threshold budgets map: 500
    // budgeted sources at 0 tokens → none of their rows survive; the
    // rest budget under defaultBudget = unlimited → all survive
    val budgets = (0 until 500).map(i => s"g$i" -> 0L).toMap
    val ex = Sampling.tokenBudgetMix(big, "id", "toks", "g", budgets)
    val exG = ex.select("g").distinct().collect().map(_.getString(0)).toSet
    assert(!exG.exists(g => g.drop(1).toLong < 500) && exG.size == 100000 - 500,
      "tokenBudgetMix join-path budgets misapplied")
    // the offsets-broadcast size gate: past the bound the hint drops
    // (plain shuffle join — the driver never builds the frame) and the
    // kept set must be IDENTICAL on both sides of the gate
    val exIds = ex.select("id").as[Long].collect().toSet
    val gatedIds = Sampling.tokenBudgetMix(big, "id", "toks", "g", budgets,
        maxBroadcastOffsets = 1)
      .select("id").as[Long].collect().toSet
    assert(gatedIds == exIds, "size-gated (non-broadcast) path diverged")
    big.unpersist()
  }

  test("charClassCounts: exact per-class counts, overlapping classes, empty text") {
    import graft.ops.TextAnalysis
    // "Hello, wörld 123!" + NBSP + "中文 ok": NBSP is whitespace AND
    // non-ASCII (classes overlap by contract); ö/中/文 are non-ASCII
    val df = Seq(
      (1L, "Hello, wörld 123! 中文 ok"),
      (2L, ""),
      (3L, "only ascii words")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.charClassCounts($"text").as("c"))
      .select($"doc_id", $"c.n_chars", $"c.n_alpha", $"c.n_digit", $"c.n_ws",
        $"c.n_non_ascii")
      .as[(Long, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((23, 11, 3, 4, 4)))
    assert(got(2L) == ((0, 0, 0, 0, 0)))
    assert(got(3L) == ((16, 14, 0, 2, 0)))
  }
}
