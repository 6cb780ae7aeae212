package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.Sinks

/** Bucketed-table layout: equal bucketing on the join key must produce an
  * exchange-free join (the co-located layout repeated 100 TB joins rely
  * on).
  */
class BucketedSinkSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  test("same-bucketed tables join with zero exchange; results match the plain join") {
    import spark.implicits._
    val o = (1L to 500L).map(i => (i, s"status_${i % 3}")).toDF("okey", "status")
    val li = (1L to 500L).flatMap(i => Seq((i, i * 2.0), (i, i * 3.0))).toDF("okey", "amount")
    Sinks.parquetBucketed(o, "graft_bkt_orders", Seq("okey"), 8)
    Sinks.parquetBucketed(li, "graft_bkt_lineitem", Seq("okey"), 8)
    // tiny test tables would broadcast (which bypasses bucketing); force
    // the shuffle-join path the layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_lineitem"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join, got:\n$plan")
      assert(plan.contains("Bucketed: true"), s"bucketed scan not used:\n$plan")
      val expected = o.join(li, "okey").count()
      assert(joined.count() == expected && expected == 1000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lineitem")
    }
  }

  test("bucketed fingerprint table: incremental dedup drops the corpus-side exchange") {
    import spark.implicits._
    val corpus = (1L to 400L).map(i => (i, s"corpus document number $i body"))
      .toDF("doc_id", "text")
    val incoming = ((1L to 40L).map(i => (1000L + i, s"corpus document number $i body")) ++
      (1L to 40L).map(i => (2000L + i, s"brand new daily text $i"))).toDF("doc_id", "text")
    graft.ops.Dedup.writeFingerprintTable(corpus, "text", "graft_bkt_fp", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = graft.ops.Dedup.dedupIncrementBucketed(
        "graft_bkt_fp", incoming, "text", "doc_id")
      val plan = bucketed.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"fp table scan not bucketed:\n$plan")
      // same semantics as the per-batch-shuffle form…
      val viaShuffle = graft.ops.Dedup.dedupIncrement(corpus, incoming, "text", "doc_id")
        .select($"doc_id").as[Long].collect().toSet
      assert(bucketed.select($"doc_id").as[Long].collect().toSet == viaShuffle)
      assert(viaShuffle == (1L to 40L).map(2000L + _).toSet)
      // …with strictly fewer exchanges: the corpus fingerprints scan in
      // place instead of re-shuffling every batch
      val planShuffle = graft.ops.Dedup.dedupIncrement(corpus, incoming, "text", "doc_id")
        .queryExecution.executedPlan.toString
      def exchanges(p: String) = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(exchanges(plan) < exchanges(planShuffle),
        s"bucketed plan has no fewer exchanges:\nbucketed:\n$plan\nplain:\n$planShuffle")
      // the standing-table loop: fold the kept batch's fingerprints back
      // in via append (same writer, same layout) — a re-run of the same
      // batch must now drop everything, and the scan must stay bucketed
      val kept = incoming.join(bucketed.select($"doc_id"), Seq("doc_id"), "left_semi")
      graft.ops.Dedup.writeFingerprintTable(kept, "text", "graft_bkt_fp", 8, append = true)
      val rerun = graft.ops.Dedup.dedupIncrementBucketed(
        "graft_bkt_fp", incoming, "text", "doc_id")
      assert(rerun.count() == 0)
      assert(rerun.queryExecution.executedPlan.toString.contains("Bucketed: true"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_fp")
    }
  }

  test("standing band table: near-dup batches probe it bucketed, equal the per-call path, and fold appends") {
    import spark.implicits._
    // near-dup-rich corpus: docs 1..40 have an incoming near-copy (one
    // appended token on a 12-token body — shingle Jaccard ~0.77), the
    // 2000-block is fresh
    def body(i: Long) = s"alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu $i"
    val corpus = (1L to 400L).map(i => (i, body(i))).toDF("doc_id", "text")
    val incoming = ((1L to 40L).map(i => (1000L + i, body(i) + " tail")) ++
      (1L to 40L).map(i => (2000L + i, s"completely different daily report number $i with fresh words")))
      .toDF("doc_id", "text")
    graft.ops.Dedup.writeBandTable(corpus, "text", "doc_id", "graft_bkt_bands",
      numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select($"doc_id").as[Long].collect().toSet
      val indexed = graft.ops.Dedup.nearDupIncrementIndexed(
        spark.table("graft_bkt_bands"), corpus, incoming, "text", "doc_id",
        threshold = 0.7, numHashes = 32, bands = 8, shingleSize = 3)
      // identical kept set to the per-call corpus-signature path
      val direct = ids(graft.ops.Dedup.nearDupIncrement(corpus, incoming,
        "text", "doc_id", threshold = 0.7, numHashes = 32, bands = 8,
        shingleSize = 3))
      assert(ids(indexed) == direct, s"indexed=${ids(indexed)} direct=$direct")
      // fresh docs always survive (exact verification); near-copies at
      // J≈0.85 drop except legal banding misses (deterministic hashes —
      // this corpus has exactly one, doc 1019's copy)
      assert((1L to 40L).map(2000L + _).toSet.subsetOf(direct),
        s"fixture drifted: fresh docs must survive, got $direct")
      val survivingCopies = direct.count(_ < 2000L)
      assert(survivingCopies <= 4,
        s"fixture drifted: $survivingCopies of 40 near-copies survived banding")
      // the standing table scans bucketed — the corpus side never
      // re-shuffles band keys per batch. (The operator's FINAL plan
      // hides the scan behind the candidate localCheckpoint, so the
      // layout evidence is the probe join itself: batch bands against
      // the table on the bucketing keys.)
      val inBands = graft.ops.Dedup.bandIndex(incoming, "text", "doc_id",
        numHashes = 32, bands = 8, shingleSize = 3)
        .select(col("id").as("new_id"), col("band"), col("bandHash"))
      val probeJoin = inBands.join(spark.table("graft_bkt_bands"),
        Seq("band", "bandHash"))
      probeJoin.collect()
      val plan = probeJoin.queryExecution.executedPlan.toString
      assert(plan.contains("Bucketed: true"), s"band table scan not bucketed:\n$plan")
      // config mismatch fails fast instead of silently passing everything
      val ex = intercept[IllegalArgumentException] {
        graft.ops.Dedup.nearDupIncrementIndexed(
          spark.table("graft_bkt_bands"), corpus, incoming, "text", "doc_id",
          threshold = 0.7, numHashes = 64, bands = 16, shingleSize = 3)
      }
      assert(ex.getMessage.contains("band table"), ex.getMessage)
      // ...and so does APPENDING under a different config (a mixed-config
      // table would pass the one-row probe guard yet never collide on
      // the mismatched rows — poisoned silently)
      val exApp = intercept[IllegalArgumentException] {
        graft.ops.Dedup.writeBandTable(incoming, "text", "doc_id",
          "graft_bkt_bands", numHashes = 64, bands = 16, shingleSize = 3,
          numBuckets = 8, append = true)
      }
      assert(exApp.getMessage.contains("mixed configs"), exApp.getMessage)
      // fold the kept batch in via append: a re-run of the same batch
      // against the grown table (and corpus) now drops everything
      val kept = incoming.join(indexed.select($"doc_id"), Seq("doc_id"), "left_semi")
      graft.ops.Dedup.writeBandTable(kept, "text", "doc_id", "graft_bkt_bands",
        numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 8, append = true)
      val rerun = graft.ops.Dedup.nearDupIncrementIndexed(
        spark.table("graft_bkt_bands"), corpus.unionAll(kept), incoming,
        "text", "doc_id", threshold = 0.7, numHashes = 32, bands = 8,
        shingleSize = 3)
      assert(rerun.count() == 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_bands")
    }
  }

  test("write-time bandn: maxBucket guard exact on fresh tables AND after appends poison the stored counts") {
    import spark.implicits._
    // three identical docs → every band's (band, bandHash) group has
    // size exactly 3; the incoming doc is a fourth identical copy, so
    // whether it survives is decided ENTIRELY by the maxBucket guard:
    // groups kept → exact-verify drops it; groups dropped → it passes.
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq((1L, t), (2L, t), (3L, t),
      (10L, "totally unrelated filler words one two three four five six"))
      .toDF("doc_id", "text")
    val incoming = Seq((100L, t)).toDF("doc_id", "text")
    def probe(existing: org.apache.spark.sql.DataFrame, mb: Int): Long =
      graft.ops.Dedup.nearDupIncrementIndexed(
        spark.table("graft_bandn_t"), existing, incoming, "text", "doc_id",
        threshold = 0.7, numHashes = 32, bands = 8, shingleSize = 3,
        maxBucket = mb).count()
    def perCall(existing: org.apache.spark.sql.DataFrame, mb: Int): Long =
      graft.ops.Dedup.nearDupIncrement(existing, incoming, "text", "doc_id",
        threshold = 0.7, numHashes = 32, bands = 8, shingleSize = 3,
        maxBucket = mb).count()
    graft.ops.Dedup.writeBandTable(corpus, "text", "doc_id", "graft_bandn_t",
      numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 2)
    try {
      // fresh table: the stored bandn column is populated and null-free,
      // so the probe takes the fast filter path — results must match the
      // per-call (windowed) spelling at the guard boundary on BOTH sides
      val stored = spark.table("graft_bandn_t")
      assert(stored.columns.contains("bandn"), "write-time count column missing")
      assert(stored.where(col("bandn").isNull).isEmpty, "fresh table has null bandn")
      assert(probe(corpus, 3) == 0L, "group size 3 <= maxBucket 3: copy must drop")
      assert(probe(corpus, 2) == 1L, "group size 3 > maxBucket 2: copy must pass")
      assert(perCall(corpus, 3) == 0L && perCall(corpus, 2) == 1L,
        "per-call path disagrees — fixture drifted")
      // append a FOURTH identical doc: true group size becomes 4, but the
      // stored bandn still says 3 — the appended null rows must poison
      // the shortcut so the probe re-counts and sees 4 > 3
      graft.ops.Dedup.writeBandTable(Seq((4L, t)).toDF("doc_id", "text"),
        "text", "doc_id", "graft_bandn_t", numHashes = 32, bands = 8,
        shingleSize = 3, numBuckets = 2, append = true)
      val grown = corpus.unionAll(Seq((4L, t)).toDF("doc_id", "text"))
      assert(probe(grown, 3) == 1L,
        "appended group size 4 > maxBucket 3: copy must pass — the probe " +
          "trusted a stale write-time count")
      assert(perCall(grown, 3) == 1L, "per-call path disagrees after append")
      // and the guard still admits at the new boundary
      assert(probe(grown, 4) == 0L, "group size 4 <= maxBucket 4: copy must drop")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bandn_t")
    }
  }

  test("write-time bandn: the BIG-batch rung (>2048 distinct probe keys, unfiltered scan) equals the per-call path") {
    import spark.implicits._
    // 1000 distinct corpus texts x 8 bands (minus cross-band hash overlap) —
    // comfortably past NearDupMaxInLiterals (2048), so the fast path takes its
    // unfiltered-scan rung (no literal IN, no semi-join, no window): the
    // rung BucketedSinkSpec's boundary test above cannot reach
    def body(i: Long) = s"omega phi chi psi sigma tau upsilon rho pi omicron xi nu $i"
    val corpus = (1L to 1000L).map(i => (i, body(i))).toDF("doc_id", "text")
    // the batch probes EVERY corpus text (near-copies) plus fresh docs —
    // its distinct band keys are a superset of the corpus's
    val incoming = ((1L to 1000L).map(i => (5000L + i, body(i) + " tail")) ++
      (1L to 50L).map(i => (9000L + i, s"fresh unseen daily report words number $i entirely new")))
      .toDF("doc_id", "text")
    graft.ops.Dedup.writeBandTable(corpus, "text", "doc_id", "graft_bandn_big",
      numHashes = 32, bands = 8, shingleSize = 3, numBuckets = 4)
    try {
      val distinctKeys = graft.ops.Dedup.bandIndex(incoming, "text", "doc_id",
          numHashes = 32, bands = 8, shingleSize = 3)
        .select("bandHash").distinct().count()
      assert(distinctKeys > 2048,
        s"fixture drifted: $distinctKeys distinct probe hashes — the big-batch rung needs >2048")
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select($"doc_id").as[Long].collect().toSet
      val fast = ids(graft.ops.Dedup.nearDupIncrementIndexed(
        spark.table("graft_bandn_big"), corpus, incoming, "text", "doc_id",
        threshold = 0.7, numHashes = 32, bands = 8, shingleSize = 3))
      val perCall = ids(graft.ops.Dedup.nearDupIncrement(corpus, incoming,
        "text", "doc_id", threshold = 0.7, numHashes = 32, bands = 8,
        shingleSize = 3))
      assert(fast == perCall, s"big-batch fast rung diverged: " +
        s"fast-only=${(fast -- perCall).take(5)} percall-only=${(perCall -- fast).take(5)}")
      assert((9001L to 9050L).toSet.subsetOf(fast),
        "fixture drifted: fresh docs must survive")
      assert(fast.count(_ < 9000L) < 100,
        s"fixture drifted: most near-copies must drop, ${fast.count(_ < 9000L)} survived")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bandn_big")
    }
  }
}
