package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-shot 10× scale-curve evidence for the dedup/sink stack (VERDICT r7
  * #2): the 100 TB claims rest on plan-shape arguments (banded equi-joins,
  * bucket caps, payload semi-joins, O(page) driver streams); this probe
  * adds ONE measured scaling point so any superlinear term that sf0.1 is
  * too small to expose (bucket caps, CC rounds, driver-side index
  * streams) shows up as a ratio well above the corpus multiple.
  *
  * Method: synthesize an N× corpus from sf0.1 lineitem (same doc shape and
  * parameters as Bench's b2-b6 — 1% planted near-dups on top), materialize
  * BOTH corpora to parquet (multi-file, so scans parallelize like real
  * storage, unlike the single-row-group test artifact), then run each
  * workload once per scale and print the time ratios. Replicas get a
  * distinct " v<rep>" suffix so the N× corpus has the same duplicate
  * STRUCTURE as the 1× one (1% planted), not N-fold duplicate text that
  * would degenerate every LSH bucket.
  *
  * The ANN family (brute-force / LSH / IVF — VERDICT r8 #4) runs over a
  * deterministic synthetic vector corpus (64-dim, hash-derived — no RNG)
  * with a FIXED 100-query batch at both scales, so the measured ratio is
  * the corpus-side scan/bucket/cell cost alone.
  *
  * Run manually (NOT part of the Bench artifact loop):
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.ScaleCurve"
  * Optional second arg selects a family: all | dedup | ann | mix |
  * band | vstream | shuffle | pipeline | model.
  */
object ScaleCurve {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val family = args.drop(1).headOption.getOrElse("all")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-curve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // band-family catalog tables live in a per-run warehouse so a
      // crashed run's orphaned directories can't fail the next one
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_scale_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_scale").toString

    /** lineitem rows → (doc_id, text) docs, replicated `m`× with distinct
      * suffixes (same doc shape as Bench.bCorpus), materialized to parquet.
      */
    def buildCorpus(dir: String, m: Int, out: String): Long = {
      val base = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"),
          col("l_suppkey"))
        .repartition(cpus.toInt)
        .select(monotonically_increasing_id().as("rid"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_partkey"), col("l_suppkey")).as("text"))
      val docs = base
        .withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
        .select((col("rid") * m + col("rep")).as("doc_id"),
          when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" v"), col("rep"))).as("text"))
      docs.write.mode("overwrite").parquet(out)
      spark.read.parquet(out).count()
    }

    def corpus(path: String): DataFrame = spark.read.parquet(path)

    /** 1% planted near-dup copies — ids offset far above any real doc_id. */
    def withPlanted(docs: DataFrame): DataFrame =
      docs.unionAll(docs.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text")))

    // workloads mirror Bench b2-b6 parameter-for-parameter
    def sb2(path: String): Unit =
      graft.ops.Dedup.minhashDedupPairs(withPlanted(corpus(path)), "text", "doc_id",
        threshold = 0.9, numHashes = 32, bands = 4, shingleSize = 3, maxBucket = 1000)
        .write.format("noop").mode("overwrite").save()

    def sb3(path: String): Unit = {
      val docs = withPlanted(corpus(path))
      val pairs = graft.ops.Dedup.minhashDedupPairs(docs, "text", "doc_id",
        threshold = 0.9, numHashes = 32, bands = 4, shingleSize = 3,
        maxBucket = 1000).select("id_a", "id_b")
      graft.ops.Dedup.dedupByPairs(docs, "doc_id", pairs)
        .write.format("noop").mode("overwrite").save()
    }

    def sb4(path: String): Unit = {
      val base = corpus(path)
      val dupes = base.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"))
      val fresh = base.where(col("doc_id") % 100 === 50)
        .select((col("doc_id") + 2000000000000L).as("doc_id"),
          concat(col("text"), lit(" appended")).as("text"))
      graft.ops.Dedup.dedupIncrement(base, dupes.unionAll(fresh), "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
    }

    def sb5(path: String, db: String): Unit =
      graft.sinks.SqliteSink.writeSpecs(Seq(graft.sinks.SqliteSink.TableSpec(
        "docs", corpus(path),
        """CREATE TABLE "docs"("doc_id" NUMERIC, "text" TEXT)""")), db)

    def sb6(path: String, db: String): Unit = {
      val docs = corpus(path).select(
        col("doc_id").cast("string").as("_link"),
        (col("doc_id") % 1000).cast("string").as("_link_parent"),
        col("text"))
      graft.sinks.SqliteSink.writeSpecs(Seq(graft.sinks.SqliteSink.TableSpec(
        "docs", docs,
        """CREATE TABLE "docs"("_link" TEXT, "_link_parent" TEXT, "text" TEXT, """ +
          """FOREIGN KEY ("_link_parent") REFERENCES "parent"("_link"))""",
        Seq(
          graft.sinks.SqliteSink.IndexSpec("idx_docs__link", "_link", unique = true,
            Some("""CREATE UNIQUE INDEX "idx_docs__link" ON "docs"("_link")""")),
          graft.sinks.SqliteSink.IndexSpec("idx_docs__link_parent", "_link_parent",
            unique = false,
            Some("""CREATE INDEX "idx_docs__link_parent" ON "docs"("_link_parent")"""))))),
        db)
    }

    def sb7(path: String): Unit =
      graft.ops.Dedup.sharedWindowFlags(withPlanted(corpus(path)), "text", "doc_id", n = 5)
        .write.format("noop").mode("overwrite").save()

    /** The shared deterministic 64-dim corpus ([[SyntheticVectors]]) —
      * same frame as Bench b8 and the shuffle-evidence specs by
      * construction, materialized to parquet for the timed scans.
      */
    def buildVecs(n: Long, out: String): Unit =
      SyntheticVectors.df(spark, n, partitions = cpus.toInt)
        .write.mode("overwrite").parquet(out)

    def vecs(path: String): org.apache.spark.sql.DataFrame = spark.read.parquet(path)

    /** The SAME 100 queries at every scale (read from the 1× corpus), so
      * the ratio isolates corpus-side cost. */
    def queries(path1: String): org.apache.spark.sql.DataFrame =
      vecs(path1).where(col("vec_id") < 100)

    def sa1(path: String, q1: String): Unit =
      graft.ops.Similarity.bruteForceTopK(vecs(path), queries(q1),
        "vec_id", "embedding", k = 10)
        .write.format("noop").mode("overwrite").save()

    def sa2(path: String, q1: String): Unit =
      graft.ops.Similarity.lshTopK(vecs(path), queries(q1),
        "vec_id", "embedding", k = 10, nBits = 12, probe1 = true)
        .write.format("noop").mode("overwrite").save()

    /** The r15 DEFAULT search config (nBits=16, depth 2), one-shot. */
    def sa2b(path: String, q1: String): Unit =
      graft.ops.Similarity.lshTopKProbed(vecs(path), queries(q1),
        "vec_id", "embedding", k = 10)
        .write.format("noop").mode("overwrite").save()

    /** Standing prefix-partitioned 16-bit LSH store, built untimed.
      * maxDirs right-sized for the curve corpora per StoreDirProbe
      * (SCALE.md §lsh-store-dirs): search overhead is ~linear in dir
      * count, so a 600k–6M store wants ~1k dirs, not the 100 TB
      * default's 4096. */
    def sa2Index(path: String, out: String): Unit =
      graft.ops.Similarity.lshIndexWrite(vecs(path), "vec_id", "embedding",
        out, nBits = 16, maxDirs = 1024)

    /** Default-config search over the standing store — probe prefixes
      * prune partitions, bucket IN skips row groups. */
    def sa2c(idx: String, q1: String): Unit =
      graft.ops.Similarity.lshSearchIndexed(spark.read.parquet(idx),
        queries(q1), "vec_id", "embedding", k = 10)
        .write.format("noop").mode("overwrite").save()

    /** The standing store's ACTUAL use case — a handful of probes
      * against a big corpus (100 queries × 137 depth-2 masks covers
      * ~85% of the 4096 prefixes, so pruning can't help the 100-query
      * rows above; 5 queries probe ≤ 685 buckets). */
    def queries5(path1: String): DataFrame =
      vecs(path1).where(col("vec_id") < 5)
    def sa2d(path: String, q1: String): Unit =
      graft.ops.Similarity.lshTopKProbed(vecs(path), queries5(q1),
        "vec_id", "embedding", k = 10)
        .write.format("noop").mode("overwrite").save()
    def sa2e(idx: String, q1: String): Unit =
      graft.ops.Similarity.lshSearchIndexed(spark.read.parquet(idx),
        queries5(q1), "vec_id", "embedding", k = 10)
        .write.format("noop").mode("overwrite").save()

    def sa3(path: String, q1: String): Unit = {
      val c = vecs(path)
      val cents = graft.ops.Similarity.ivfTrain(c, "vec_id", "embedding",
        nlist = 64, lloydPasses = 1)
      graft.ops.Similarity.ivfSearchIndexed(
        graft.ops.Similarity.ivfIndex(c, "vec_id", "embedding", cents),
        cents, queries(q1), "vec_id", "embedding", k = 10, nprobe = 8)
        .write.format("noop").mode("overwrite").save()
    }

    /** The recurring-pipeline IVF path: the standing index (train +
      * cell-assign) is built and persisted to parquet UNTIMED — that is
      * what `ivfTrain`/`ivfIndex` exist to amortize — and the timed
      * region is one query batch through [[Similarity.ivfSearchIndexed]]
      * alone.
      */
    def sa3Index(path: String, out: String): Array[Array[Float]] = {
      val c = vecs(path)
      val cents = graft.ops.Similarity.ivfTrain(c, "vec_id", "embedding",
        nlist = 64, lloydPasses = 1)
      graft.ops.Similarity.ivfIndex(c, "vec_id", "embedding", cents)
        .write.mode("overwrite").parquet(out)
      cents
    }
    def sa4(idx: String, cents: Array[Array[Float]], q1: String): Unit =
      graft.ops.Similarity.ivfSearchIndexed(spark.read.parquet(idx), cents,
        queries(q1), "vec_id", "embedding", k = 10, nprobe = 8)
        .write.format("noop").mode("overwrite").save()

    /** PQ mirror of the sa3Index/sa4 split: codebooks + code frame are
      * built and persisted UNTIMED (the compressed standing index), the
      * timed region is one ADC query batch over the parquet codes.
      */
    def sa5Index(path: String, out: String): Array[Array[Array[Float]]] = {
      val c = vecs(path)
      val cb = graft.ops.Similarity.pqTrain(c, "vec_id", "embedding",
        m = 8, ksub = 256, lloydPasses = 1)
      graft.ops.Similarity.pqEncode(c, "vec_id", "embedding", cb)
        .write.mode("overwrite").parquet(out)
      cb
    }
    def sa5(idx: String, cb: Array[Array[Array[Float]]], q1: String): Unit =
      graft.ops.Similarity.pqSearch(spark.read.parquet(idx), cb,
        queries(q1), "vec_id", "embedding", k = 10)
        .write.format("noop").mode("overwrite").save()

    /** IVFADC: coarse cells + PQ codes in one standing frame, both
      * built untimed; the timed region probes nprobe/nlist of the code
      * frame with per-query LUTs — the pruning AND the compression.
      */
    def sa6Index(path: String, out: String,
        cents: Array[Array[Float]], cb: Array[Array[Array[Float]]]): Unit =
      graft.ops.Similarity.ivfPqIndex(vecs(path), "vec_id", "embedding", cents, cb)
        .write.mode("overwrite").parquet(out)
    def sa6(idx: String, cents: Array[Array[Float]],
        cb: Array[Array[Array[Float]]], q1: String): Unit =
      graft.ops.Similarity.ivfPqSearch(spark.read.parquet(idx), cents, cb,
        queries(q1), "vec_id", "embedding", k = 10, nprobe = 8)
        .write.format("noop").mode("overwrite").save()

    /** min of two runs, each preceded by a GC + settle: six 10× workloads
      * back-to-back in ONE JVM heat the session (GC debris from earlier
      * shuffles degrades the later driver-side streams by 2-3×, measured
      * across three r8 sessions), and min-of-2 with a clean heap is the
      * statistic that survives that contamination.
      */
    def time(f: => Unit): Double =
      (1 to 2).map { _ =>
        System.gc()
        Thread.sleep(2000)
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min

    val runDedup = family == "all" || family == "dedup"
    val runAnn = family == "all" || family == "ann"
    val runMix = family == "all" || family == "mix"
    val runBand = family == "all" || family == "band"
    val runVStream = family == "all" || family == "vstream"
    val runShuffle = family == "all" || family == "shuffle"
    val runPipeline = family == "all" || family == "pipeline"
    val runModel = family == "all" || family == "model"
    require(runDedup || runAnn || runMix || runBand || runVStream ||
        runShuffle || runPipeline || runModel,
      s"unknown family '$family' (all | dedup | ann | mix | band | vstream | shuffle | pipeline | model)")

    var rows1 = 0L
    var rowsN = 0L
    var results = Seq.empty[(String, Double, Double)] // (name, t1, tN)

    if (runDedup) {
      // JIT/codegen warmup on a tiny corpus, untimed
      val warmPath = s"$work/warm"
      buildCorpus("/root/testdata/sf0.001", 1, warmPath)
      sb2(warmPath); sb3(warmPath); sb4(warmPath)
      sb5(warmPath, s"$work/warm5.db"); sb6(warmPath, s"$work/warm6.db")
      sb7(warmPath)

      val p1 = s"$work/corpus1"
      val pN = s"$work/corpus$mult"
      rows1 = buildCorpus(sfDir, 1, p1)
      rowsN = buildCorpus(sfDir, mult, pN)
      System.err.println(s"[scale] corpora ready: $rows1 rows at 1x, $rowsN rows at ${mult}x")

      val names = Seq("b2_minhash", "b3_near_dedup_apply", "b4_incremental_dedup",
        "b5_sqlite_sink", "b6_sqlite_indexed", "b7_shared_windows")
      def runAll(path: String, tag: String): Seq[(String, Double)] = {
        val ts = Seq(
          time(sb2(path)), time(sb3(path)), time(sb4(path)),
          time(sb5(path, s"$work/$tag-5.db")), time(sb6(path, s"$work/$tag-6.db")),
          time(sb7(path)))
        names.zip(ts)
      }
      val t1 = runAll(p1, "s1")
      val tN = runAll(pN, s"s$mult")
      results ++= names.indices.map(i => (names(i), t1(i)._2, tN(i)._2))
    }

    if (runAnn) {
      val warmV = s"$work/warmv"
      buildVecs(2000, warmV)
      sa1(warmV, warmV); sa2(warmV, warmV); sa3(warmV, warmV)
      sa2b(warmV, warmV)
      sa2Index(warmV, s"$work/warmv-lsh"); sa2c(s"$work/warmv-lsh", warmV)
      val wCents = sa3Index(warmV, s"$work/warmv-ivfidx")
      val wCb = sa5Index(warmV, s"$work/warmv-pq")
      sa5(s"$work/warmv-pq", wCb, warmV)
      sa6Index(warmV, s"$work/warmv-ivfpq", wCents, wCb)
      sa6(s"$work/warmv-ivfpq", wCents, wCb, warmV)

      val v1 = s"$work/vecs1"
      val vN = s"$work/vecs$mult"
      val vRows = 600000L
      buildVecs(vRows, v1)
      buildVecs(vRows * mult, vN)
      if (rows1 == 0) { rows1 = vRows; rowsN = vRows * mult }
      System.err.println(s"[scale] vector corpora ready: $vRows at 1x, ${vRows * mult} at ${mult}x")

      val names = Seq("ann_bruteforce", "ann_lsh", "ann_lsh16_default",
        "ann_lsh16_store", "ann_lsh16_probe5_oneshot", "ann_lsh16_probe5_store",
        "ann_ivf", "ann_ivf_search",
        "ann_pq_search", "ann_ivfpq_search")
      def runAll(path: String, tag: String): Seq[(String, Double)] = {
        val idx = s"$work/ivfidx-$tag"
        val cents = sa3Index(path, idx) // standing index: built untimed
        val pqIdx = s"$work/pqidx-$tag"
        val cb = sa5Index(path, pqIdx) // standing code frame: built untimed
        val ipqIdx = s"$work/ivfpqidx-$tag"
        sa6Index(path, ipqIdx, cents, cb) // standing IVFADC frame: untimed
        val lshIdx = s"$work/lshidx-$tag"
        sa2Index(path, lshIdx) // standing prefix-partitioned store: untimed
        names.zip(Seq(time(sa1(path, v1)), time(sa2(path, v1)),
          time(sa2b(path, v1)), time(sa2c(lshIdx, v1)),
          time(sa2d(path, v1)), time(sa2e(lshIdx, v1)), time(sa3(path, v1)),
          time(sa4(idx, cents, v1)), time(sa5(pqIdx, cb, v1)),
          time(sa6(ipqIdx, cents, cb, v1))))
      }
      val t1 = runAll(v1, "1")
      val tN = runAll(vN, s"$mult")
      results ++= names.indices.map(i => (names(i), t1(i)._2, tN(i)._2))
    }

    if (runMix) {
      // the ONE-GIANT-SOURCE token-budget case (the r12/r13 weak item):
      // every row in a single source, so the pre-r14 serial spelling's
      // per-source window runs as ONE task — its wall time scales with
      // the corpus no matter how many cores exist — while the r14
      // two-pass hash-keyspace prefix sum runs 256 within-bucket windows
      // in parallel. Both forms produce the byte-identical keep set
      // (FiltersSpec); this measures the wall-clock gap and its 10×
      // growth. Budgets (pipeline config) derive untimed per scale.
      def mixCols(df: DataFrame): DataFrame =
        df.select(col("doc_id"), lit("s0").as("src"),
          length(col("text")).cast("long").as("toks"))
      def budgetFor(path: String): Long =
        mixCols(corpus(path)).agg(sum("toks")).collect()(0).getLong(0) / 2
      def smixPar(path: String, budget: Long): Unit =
        graft.ops.Sampling.tokenBudgetMix(mixCols(corpus(path)),
          "doc_id", "toks", "src", Map("s0" -> budget))
          .write.format("noop").mode("overwrite").save()
      def smixSer(path: String, budget: Long): Unit = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("src"))
          .orderBy(graft.ops.Sampling.hashLong(col("doc_id"), "graft"), col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val keep = mixCols(corpus(path))
          .withColumn("__cum", sum(col("toks")).over(w))
          .where(col("__cum") <= budget)
          .select(col("doc_id"))
        mixCols(corpus(path)).join(keep, Seq("doc_id"), "left_semi")
          .write.format("noop").mode("overwrite").save()
      }
      val warmPath = s"$work/warm-mix"
      buildCorpus("/root/testdata/sf0.001", 1, warmPath)
      locally {
        val wb = budgetFor(warmPath)
        smixPar(warmPath, wb); smixSer(warmPath, wb)
      }
      val p1 = s"$work/mix1"
      val pN = s"$work/mix$mult"
      val r1 = buildCorpus(sfDir, 1, p1)
      val rN = buildCorpus(sfDir, mult, pN)
      if (rows1 == 0) { rows1 = r1; rowsN = rN }
      System.err.println(s"[scale] mix corpora ready: $r1 rows at 1x, $rN at ${mult}x")
      val b1 = budgetFor(p1)
      val bN = budgetFor(pN)
      results ++= Seq(
        ("mix_budget_serial", time(smixSer(p1, b1)), time(smixSer(pN, bN))),
        ("mix_budget_parallel", time(smixPar(p1, b1)), time(smixPar(pN, bN))))
    }

    if (runBand) {
      // the STANDING BAND TABLE case (r14 VERDICT "what's wrong" #2):
      // the per-call incremental near-dup re-signatures the whole corpus
      // every batch — per-batch cost grows with the corpus — while
      // nearDupIncrementIndexed probes a table whose MinHash pass was
      // paid once at write time, so the per-batch ratio should be far
      // below the per-call path's (the table build itself is untimed,
      // like every standing index here). The SAME fixed batch probes at
      // both scales so the ratio isolates corpus-side cost.
      val warmPath = s"$work/bwarm"
      buildCorpus("/root/testdata/sf0.001", 1, warmPath)
      val p1 = s"$work/band1"
      val pN = s"$work/band$mult"
      val r1 = buildCorpus(sfDir, 1, p1)
      val rN = buildCorpus(sfDir, mult, pN)
      if (rows1 == 0) { rows1 = r1; rowsN = rN }
      System.err.println(s"[scale] band corpora ready: $r1 rows at 1x, $rN at ${mult}x")
      def batch(): DataFrame = {
        val base = corpus(p1) // fixed 1x-derived batch at both scales
        base.where(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"))
          .unionAll(base.where(col("doc_id") % 100 === 50)
            .select((col("doc_id") + 2000000000000L).as("doc_id"),
              concat(col("text"), lit(" appended")).as("text")))
      }
      def percall(path: String): Unit =
        graft.ops.Dedup.nearDupIncrement(corpus(path), batch(),
          "text", "doc_id", threshold = 0.9, numHashes = 32, bands = 8,
          shingleSize = 3, maxBucket = 1000)
          .write.format("noop").mode("overwrite").save()
      def indexed(table: String, path: String): Unit =
        graft.ops.Dedup.nearDupIncrementIndexed(spark.table(table),
          corpus(path), batch(), "text", "doc_id", threshold = 0.9,
          numHashes = 32, bands = 8, shingleSize = 3, maxBucket = 1000)
          .write.format("noop").mode("overwrite").save()
      // warmup both paths untimed
      graft.ops.Dedup.writeBandTable(corpus(warmPath), "text", "doc_id",
        "graft_scale_bandw", numHashes = 32, bands = 8, numBuckets = 8)
      percall(warmPath); indexed("graft_scale_bandw", warmPath)
      // standing tables built untimed at each scale
      graft.ops.Dedup.writeBandTable(corpus(p1), "text", "doc_id",
        "graft_scale_band1", numHashes = 32, bands = 8, numBuckets = 32)
      graft.ops.Dedup.writeBandTable(corpus(pN), "text", "doc_id",
        s"graft_scale_band$mult", numHashes = 32, bands = 8, numBuckets = 32)
      results ++= Seq(
        ("neardup_percall", time(percall(p1)), time(percall(pN))),
        ("neardup_indexed", time(indexed("graft_scale_band1", p1)),
          time(indexed(s"graft_scale_band$mult", pN))))
      Seq("graft_scale_bandw", "graft_scale_band1", s"graft_scale_band$mult")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

    if (runVStream) {
      // the VECTOR twin (streamingCosineDedup's micro-batch) against an
      // accumulated store whose batch=0 partition carries stored LSH
      // signatures, vs a legacy store without them, vs the store at the
      // PRESCRIBED dial. Unlike the text band hashes (an effectively
      // unbounded hash space — a batch probes a vanishing corpus
      // fraction at any scale), the vector bucket space is 2^nBits, so
      // at a FIXED dial bucket occupancy — and with it the per-batch
      // candidate-verification volume, the dominant term — grows
      // linearly with the corpus: storing signatures removes only the
      // corpus-wide resign kernel (cheap on 64-dim embeddings). The
      // scale recipe (SCALE.md: RAISE nBits with the corpus so
      // occupancy stays constant) is what flattens per-batch cost; the
      // third row measures the 10x store at nBits 16+log2(10)≈20. The
      // timed batch overwrites its own batch=1 partition each run
      // (replay-idempotent, so repeated timings are legal).
      def buildVecStore(n: Long, out: String, withSig: Boolean,
          bits: Int = 16): Unit = {
        val v = SyntheticVectors.df(spark, n, partitions = cpus.toInt)
        val part =
          if (withSig) graft.ops.Similarity.lshIndex(v, "vec_id", "embedding", bits)
          else v
        part.write.mode("overwrite").parquet(s"$out/batch=0")
      }
      val vb = SyntheticVectors.df(spark, 12000L, partitions = cpus.toInt)
        .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      def streamBatch(store: String, bits: Int = 16): Unit =
        graft.streaming.StreamingFlatten.cosineDedupBatch(vb, 1L,
          "embedding", "vec_id", store, 0.95, bits, 2)
      val s1 = s"$work/vstore1"; val sN = s"$work/vstore$mult"
      val l1 = s"$work/vlegacy1"; val lN = s"$work/vlegacy$mult"
      val sD = s"$work/vstoreD"
      val dialedBits = 16 + (math.log(mult) / math.log(2)).round.toInt
      buildVecStore(600000L, s1, withSig = true)
      buildVecStore(600000L * mult, sN, withSig = true)
      buildVecStore(600000L, l1, withSig = false)
      buildVecStore(600000L * mult, lN, withSig = false)
      buildVecStore(600000L * mult, sD, withSig = true, bits = dialedBits)
      val wS = s"$work/vwarm"
      buildVecStore(2000L, wS, withSig = true); streamBatch(wS)
      results ++= Seq(
        ("cosine_stream_stored", time(streamBatch(s1)), time(streamBatch(sN))),
        ("cosine_stream_resign", time(streamBatch(l1)), time(streamBatch(lN))),
        ("cosine_stream_dialed", time(streamBatch(s1)),
          time(streamBatch(sD, dialedBits))))
    }

    if (runShuffle) {
      // the two r15 corpus-stat/permutation ops are single-pass over the
      // corpus, so the pass bar here is LINEAR (ratio ≈ mult), not flat:
      // a driver-side sort, a single-reducer range, or a skewed shard
      // would all surface as a superlinear wall ratio at 10×.
      val warmPath = s"$work/shwarm"
      buildCorpus("/root/testdata/sf0.001", 1, warmPath)
      val p1 = s"$work/sh1"
      val pN = s"$work/sh$mult"
      val r1 = buildCorpus(sfDir, 1, p1)
      val rN = buildCorpus(sfDir, mult, pN)
      if (rows1 == 0) { rows1 = r1; rowsN = rN }
      def sh(path: String): Unit =
        graft.ops.Sampling.deterministicShuffle(corpus(path), "doc_id",
            seed = 1, numShards = cpus.toInt * 2)
          .write.format("noop").mode("overwrite").save()
      def vo(path: String): Unit =
        graft.ops.TextAnalysis.vocabStats(
            corpus(path).withColumn("src", concat(lit("s"), col("doc_id") % 16)),
            "text", "src")
          .write.format("noop").mode("overwrite").save()
      sh(warmPath); vo(warmPath)
      // pcaTrain is the third single-pass r15 op: one typed-Aggregator
      // scan folding (n, Σx, upper-tri Σx⊗x) — ~2144 doubles of state
      // at d=64 — plus a driver-side 64×64 eigensolve that is
      // scale-invariant. Same LINEAR pass bar.
      val v1 = s"$work/pv1"
      val vN = s"$work/pv$mult"
      SyntheticVectors.df(spark, 600000L, partitions = cpus.toInt)
        .write.mode("overwrite").parquet(v1)
      SyntheticVectors.df(spark, 600000L * mult, partitions = cpus.toInt)
        .write.mode("overwrite").parquet(vN)
      def pt(path: String): Unit = {
        graft.ops.Pca.pcaTrain(spark.read.parquet(path), "embedding", 16); ()
      }
      val vw = s"$work/pvw"
      SyntheticVectors.df(spark, 2000L, partitions = cpus.toInt)
        .write.mode("overwrite").parquet(vw)
      pt(vw)
      // interleaveSources on ONE GIANT SOURCE — the case its bucketed
      // rank exists for: prefixBuckets=1 IS the serial single-window
      // spelling (one task owns the whole source's row_number), 256
      // buckets runs the same rank at keyspace parallelism with a
      // byte-identical result (FiltersSpec). The serial row should go
      // corpus-linear at 10×; the bucketed row should track the other
      // single-pass ops.
      def il(path: String, buckets: Int): Unit =
        graft.ops.Sampling.interleaveSources(
            corpus(path).withColumn("src", lit("s0")), "doc_id", "src",
            Map("s0" -> 1.0), prefixBuckets = buckets)
          .write.format("noop").mode("overwrite").save()
      il(warmPath, 1); il(warmPath, 256)
      results ++= Seq(
        ("shuffle_epoch", time(sh(p1)), time(sh(pN))),
        ("vocab_stats", time(vo(p1)), time(vo(pN))),
        ("pca_train", time(pt(v1)), time(pt(vN))),
        ("interleave_1src_serial", time(il(p1, 1)), time(il(pN, 1))),
        ("interleave_1src_bucketed", time(il(p1, 256)), time(il(pN, 256))))
    }

    if (runPipeline) {
      // the END-TO-END b17 pipeline at 1× vs N× STANDING CORPUS with the
      // SAME fixed daily batch: the adopter's scaling question is "what
      // happens to my daily ingest cost as the corpus grows", and the
      // answer should be ~flat — the batch-side stages scan the batch,
      // and both corpus-side probes (exact-dedup fingerprints, near-dup
      // bands) are bucketed standing tables probed in place. Standing
      // state (corpus, band + fingerprint tables, eval frame) is built
      // untimed at each scale, the b9/b10/b14 convention. Replica corpus
      // docs (rep > 0) are md5-derived filler so they cannot
      // band-collide with the batch's planted near-dups — the N× corpus
      // grows the TABLES, not the candidate volume, which is what
      // "corpus growth with a fixed batch" means.
      import graft.ops.{Dedup, TextFilters, Decontaminate, Sampling, Packing}
      def cText(ok: org.apache.spark.sql.Column, lnum: org.apache.spark.sql.Column,
          pk: org.apache.spark.sql.Column, sk: org.apache.spark.sql.Column,
          qty: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
          rf: org.apache.spark.sql.Column) =
        concat_ws(" ", lit("the record of orders"), ok, lit("item"), lnum,
          lit("holds part number"), pk, lit("from supplier code"), sk,
          lit("delivering"), qty, lit("pieces priced near"), price,
          lit("beneath flag mark"), rf)
      def bText(ok: org.apache.spark.sql.Column, lnum: org.apache.spark.sql.Column,
          pk: org.apache.spark.sql.Column, sk: org.apache.spark.sql.Column,
          qty: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
          rf: org.apache.spark.sql.Column) =
        concat_ws(" ", lit("the line"), lnum, lit("of order"), ok,
          lit("has part"), pk, lit("and supplier"), sk, lit("to ship"), qty,
          lit("units that total"), price, lit("with flag"), rf)
      // `marked` appends a bare "." to every text (corpus and batch,
      // AFTER the planted-variant choice): the hygiene variant runs the
      // C4-style scrub, which keeps only lines ending in terminal
      // punctuation — unmarked, the synthetic texts (which have none)
      // would scrub to empty and the downstream stages would measure
      // nothing. A bare "." adds no [a-z0-9] token, so shingles, gram
      // keys, and fingerprint-table consistency (tables built from the
      // marked corpus) all keep the planted per-stage work identical;
      // the scrub becomes a value-level no-op that still pays its full
      // per-document evaluation — exactly the recipe cost in question.
      def pCorpus(dir: String, m: Int, out: String,
          marked: Boolean = false): Long = {
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_returnflag"))
          .repartition(cpus.toInt)
        val base = li.select(
          (col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("rid"),
          cText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_returnflag")).as("text"))
        val body = when(col("rep") === 0, col("text"))
          // 6 md5-hex pseudo-tokens: zero shared 3-shingles with any
          // batch wording, so replicas never enter the verify tail
          .otherwise(concat_ws(" ",
            substring(md5(concat(col("text"), col("rep"))), 1, 5),
            substring(md5(concat(col("text"), col("rep"))), 6, 5),
            substring(md5(concat(col("text"), col("rep"))), 11, 5),
            substring(md5(concat(col("text"), col("rep"))), 16, 5),
            substring(md5(concat(col("text"), col("rep"))), 21, 5),
            substring(md5(concat(col("text"), col("rep"))), 26, 5)))
        base.withColumn("rep", explode(sequence(lit(0), lit(m - 1))))
          .select((col("rid") * m + col("rep")).as("doc_id"),
            (if (marked) concat(body, lit(".")) else body).as("text"))
          .write.mode("overwrite").parquet(out)
        spark.read.parquet(out).count()
      }
      def pBatch(jsonDir: String, marked: Boolean = false): DataFrame = {
        val docs = graft.sources.JsonInput.ndjson(spark, jsonDir)
        val items = graft.plan.FlattenPlanner.flatten(docs,
          graft.model.FlattenOptions(
            linkMode = graft.model.LinkMode.NaturalKey("o_orderkey"),
            dropEmptyObjects = false))("items")
        val synth = items.select(
          (col("_link_main").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
          cText(col("_link_main"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_returnflag")).as("__tc"),
          bText(col("_link_main"), col("l_linenumber"), col("l_partkey"),
            col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
            col("l_returnflag")).as("__tb"),
          concat_ws(" ", col("l_quantity"), col("l_extendedprice"),
            col("l_partkey"), col("l_suppkey")).as("__td"))
        val pm = pmod(col("doc_id"), lit(100L))
        // planted corpus dups/near-dups reference REP-0 corpus texts —
        // present identically at both scales
        val variant = when(pm === 0, col("__tc"))
          .when(pm === 2, concat(col("__tc"), lit(" plus appended tail words")))
          .when(pm === 4, col("__td"))
          .otherwise(col("__tb"))
        val b = synth.select(col("doc_id"),
          (if (marked) concat(variant, lit(".")) else variant).as("text"))
        b.unionAll(b.where(pm === 1)
          .select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
      }
      val pRules = TextFilters.Rules(minWords = 10, maxWords = 1000,
        minMeanWordLen = 1.0, maxMeanWordLen = 10.0, minAlphaWordRatio = 0.4,
        minStopwordHits = 2)
      def pEval(dir: String): DataFrame =
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select((col("l_orderkey").cast("long") * 8 + col("l_linenumber")).as("doc_id"),
            bText(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
              col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
              col("l_returnflag")).as("text"))
          .where(pmod(col("doc_id"), lit(100L)) === 3)
          .select("text")
      // the SHIPPED composition (ops/Pipeline — same entry point Bench
      // times and PipelineLoopSpec folds), so the curve measures the
      // public recipe, not a hand-copied respelling that could drift
      def pipeline(jsonDir: String, corpusDf: DataFrame, bandTable: String,
          fpTable: String, eval: DataFrame, budgets: Map[String, Long],
          hygiene: Boolean = false): Unit = {
        val res = graft.ops.Pipeline.run(pBatch(jsonDir, marked = hygiene),
          graft.ops.Pipeline.Config(
            textCol = "text", idCol = "doc_id",
            // the full published recipe: C4-style line scrub before the
            // dedup fingerprints, PII redaction after the admissions —
            // per-row stages, so the N× ratio must not move (any
            // deviation means an accidental corpus-side barrier)
            scrub = if (hygiene) Some(graft.ops.Pipeline.Scrub()) else None,
            rules = Some(pRules),
            fingerprintTable = Some(fpTable),
            bandTable = Some(bandTable),
            nearDup = graft.ops.Pipeline.NearDup(threshold = 0.7,
              numHashes = 32, bands = 8, shingleSize = 3, maxBucket = 1000),
            redactPii = hygiene,
            mix = Some(graft.ops.Pipeline.Mix(
              budgets = budgets,
              src = concat(lit("s"), pmod(col("doc_id"), lit(16L))),
              toks = length(col("text")).cast("long"),
              weights = Map("s0" -> 2.0), defaultWeight = 1.0,
              maxTokensPerBin = 4096, nShards = 32))),
          corpus = Some(corpusDf), eval = Some(eval))
        res.kept.write.format("noop").mode("overwrite").save()
        // daily-loop hygiene (the B17HygieneProbe discipline): this
        // JVM times many more rows after these runs, and a leaked
        // final-stage checkpoint per invocation is exactly the
        // storage-pool contamination §b4 documents
        if (res.ownsKept) graft.util.Checkpoints.release(res.kept)
      }
      // fixed batch at both scales (budgets derive from the BATCH mass —
      // unlike Bench's corpus-mass budgets, which at N× would stop
      // biting and change stage-6's work)
      val pJson = s"$work/pjson/docs"
      graft.SparkEntry.nestedOrders(spark, sfDir).write.mode("overwrite").json(pJson)
      val pBudgets: Map[String, Long] = {
        val mass = pBatch(pJson).agg(sum(length(col("text")).cast("long")))
          .collect()(0).getLong(0) / 16
        (0 until 16).map(i => s"s$i" -> mass / 2).toMap
      }
      // standing state per scale, untimed
      val c1 = s"$work/pcorpus1"; val cN = s"$work/pcorpus$mult"
      val r1 = pCorpus(sfDir, 1, c1)
      val rN = pCorpus(sfDir, mult, cN)
      if (rows1 == 0) { rows1 = r1; rowsN = rN }
      System.err.println(s"[scale] pipeline corpora ready: $r1 at 1x, $rN at ${mult}x")
      def standUp(path: String, tag: String): (DataFrame, String, String) = {
        val cdf = corpus(path).localCheckpoint(true)
        spark.sql(s"DROP TABLE IF EXISTS graft_scale_pband$tag")
        spark.sql(s"DROP TABLE IF EXISTS graft_scale_pfp$tag")
        Dedup.writeBandTable(cdf, "text", "doc_id", s"graft_scale_pband$tag",
          numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 32)
        Dedup.writeFingerprintTable(cdf, "text", s"graft_scale_pfp$tag",
          numBuckets = 32)
        (cdf, s"graft_scale_pband$tag", s"graft_scale_pfp$tag")
      }
      // warmup on the smallest SF, untimed
      val wJson = s"$work/pjsonw/docs"
      graft.SparkEntry.nestedOrders(spark, "/root/testdata/sf0.001")
        .write.mode("overwrite").json(wJson)
      val wC = s"$work/pcorpusw"
      pCorpus("/root/testdata/sf0.001", 1, wC)
      val (wdf, wband, wfp) = standUp(wC, "w")
      pipeline(wJson, wdf, wband, wfp,
        pEval("/root/testdata/sf0.001").localCheckpoint(true), pBudgets)
      val evalDf = pEval(sfDir).localCheckpoint(true)
      val (cdf1, band1, fp1) = standUp(c1, "1")
      val (cdfN, bandN, fpN) = standUp(cN, mult.toString)
      results ++= Seq(
        ("pipeline_daily_batch",
          time(pipeline(pJson, cdf1, band1, fp1, evalDf, pBudgets)),
          time(pipeline(pJson, cdfN, bandN, fpN, evalDf, pBudgets))))
      // the FULL hygiene recipe (scrub + redact ON) over its own marked
      // standing state — one honest N× point confirming the per-row
      // stages keep the daily-batch curve sublinear
      val c1h = s"$work/pcorpus1h"; val cNh = s"$work/pcorpus${mult}h"
      pCorpus(sfDir, 1, c1h, marked = true)
      pCorpus(sfDir, mult, cNh, marked = true)
      val (cdf1h, band1h, fp1h) = standUp(c1h, "1h")
      val (cdfNh, bandNh, fpNh) = standUp(cNh, s"${mult}h")
      pipeline(pJson, cdf1h, band1h, fp1h, evalDf, pBudgets, hygiene = true) // warm
      results ++= Seq(
        ("pipeline_daily_batch_hygiene",
          time(pipeline(pJson, cdf1h, band1h, fp1h, evalDf, pBudgets,
            hygiene = true)),
          time(pipeline(pJson, cdfNh, bandNh, fpNh, evalDf, pBudgets,
            hygiene = true))))
    }

    if (runModel) {
      // the two corpus-model ops (r20): NB classifier train+score and
      // DSIR fit+score. Both are full-corpus passes — fit/train reduces
      // the corpus to a model-sized frame (vocab rows / numBuckets
      // rows, map-side combined), scoring is a map pass against the
      // broadcast model — so the pass bar is LINEAR (ratio ≈ mult),
      // like the shuffle family: a driver-side loop, an unbroadcast
      // model join, or a skewed key would all surface as superlinear.
      val warmPath = s"$work/mwarm"
      buildCorpus("/root/testdata/sf0.001", 1, warmPath)
      def lab(df: DataFrame): DataFrame =
        df.withColumn("is_pos", pmod(col("doc_id"), lit(3L)) === 0)
      def scls(path: String): Unit = {
        val d = lab(corpus(path))
        val m = graft.ops.Classify.nbTrain(d, "text", "is_pos",
          vocabSize = 50000)
        graft.ops.Classify.nbScore(d, "text", "doc_id", m)
          .write.format("noop").mode("overwrite").save()
      }
      def sdsir(path: String): Unit = {
        val d = corpus(path)
        val m = graft.ops.Dsir.fit(d,
          d.where(pmod(col("doc_id"), lit(37L)) === 0), "text",
          numBuckets = 65536)
        graft.ops.Dsir.score(d, "text", "doc_id", m)
          .write.format("noop").mode("overwrite").save()
      }
      scls(warmPath); sdsir(warmPath)
      val p1 = s"$work/model1"
      val pN = s"$work/model$mult"
      val r1 = buildCorpus(sfDir, 1, p1)
      val rN = buildCorpus(sfDir, mult, pN)
      if (rows1 == 0) { rows1 = r1; rowsN = rN }
      System.err.println(s"[scale] model corpora ready: $r1 at 1x, $rN at ${mult}x")
      results ++= Seq(
        ("classify_train_score", time(scls(p1)), time(scls(pN))),
        ("dsir_fit_score", time(sdsir(p1)), time(sdsir(pN))))
    }

    val items = results.map { case (n, a, b) =>
      f""""$n":{"t1":$a%.2f,"t$mult%d":$b%.2f,"ratio":${b / a}%.2f}"""
    }
    println(s"""{"mult":$mult,"rows1":$rows1,"rowsN":$rowsN,""" +
      items.mkString("", ",", "}"))
    spark.stop()
  }
}
