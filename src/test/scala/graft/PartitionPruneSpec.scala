package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Similarity

/** MEASURED partition-pruning evidence for the standing-index search
  * paths: the Scaladoc tells users to persist [[Similarity.ivfIndex]] /
  * [[Similarity.ivfPqIndex]] partitioned by `cell` so a probe scans only
  * its cells — this spec writes a cell-partitioned index, searches it,
  * and reads the actual scan-output row count off the executed plan. The
  * probe-union predicate (`cell IN (...)`) is what makes Catalyst prune;
  * a regression that drops it (scoring alone no-ops unprobed cells but
  * reads them) fails the row-count assert by the unpruned fraction, and
  * the results must stay identical to the unpartitioned in-memory frame.
  */
class PartitionPruneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def h(a: Long, b: Long): Double = {
    var x = a * 0x9E3779B97F4A7C15L + b * 0xD1B54A32D192ED03L + 0x2545F4914F6CDD1DL
    x ^= x >>> 30; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 27; x *= 0x94D049BB133111EBL
    x ^= x >>> 31
    (x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  private def mkVec(id: Long): Array[Float] =
    Array.tabulate(16)(j => h(id * 131 + j, 41L).toFloat)

  /** Sum of `numOutputRows` over every file-source scan in the executed
    * adaptive plan — rows actually emitted by the parquet read, i.e.
    * rows in the partitions that SURVIVED pruning.
    */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    def sum(p: SparkPlan): Long = {
      val self = p match {
        case s: FileSourceScanExec =>
          s.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
        case _ => 0L
      }
      self + unwrap(p).map(sum).sum
    }
    sum(df.queryExecution.executedPlan)
  }

  test("cell-partitioned IVFADC index: a probe reads only its cells' partitions") {
    import spark.implicits._
    val n = 2000
    val corpus = (0L until n.toLong).map(i => i -> mkVec(i)).toDF("vec_id", "embedding")
      .cache()
    corpus.count()
    val cents = Similarity.ivfTrain(corpus, "vec_id", "embedding",
      nlist = 16, lloydPasses = 1)
    val cb = Similarity.pqTrain(corpus, "vec_id", "embedding",
      m = 4, ksub = 16, lloydPasses = 1)
    val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding", cents, cb)
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString + "/idx"
    Similarity.ivfPqIndexWrite(corpus, "vec_id", "embedding", cents, cb, dir)
    // one sorted file per cell directory (the write helper's contract —
    // a plain partitionBy write would emit one per task × directory)
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty && cellDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "expected exactly one parquet file per cell directory")
    val stored = spark.read.parquet(dir)
    val queries = Seq(5000L -> mkVec(3), 5001L -> mkVec(7))
      .toDF("vec_id", "embedding")
    val res = Similarity.ivfPqSearch(stored, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
    val read = scanRows(res)
    // 2 queries × nprobe 2 → at most 4 of 16 cells survive pruning; with
    // ~uniform cells that is ~500 of 2000 rows. The assert leaves room
    // for skewed cells but fails hard if the whole frame is read.
    assert(read < n * 0.6, s"scan emitted $read of $n rows — partitions not pruned")
    assert(read > 0)
    // pruning must not change results: identical to the in-memory frame
    def rows(d: DataFrame): Set[(Long, Int, Long, Double)] =
      d.select($"query_id", $"rank", $"neighbor_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSet
    assert(rows(res) == rows(Similarity.ivfPqSearch(idx, cents, cb, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)))
    // same contract on the float-vector IVF index
    val vIdx = Similarity.ivfIndex(corpus, "vec_id", "embedding", cents)
    val vDir = java.nio.file.Files.createTempDirectory("graft_prune_v").toString + "/idx"
    Similarity.ivfIndexWrite(corpus, "vec_id", "embedding", cents, vDir)
    val vRes = Similarity.ivfSearchIndexed(spark.read.parquet(vDir), cents, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)
    val vRead = scanRows(vRes)
    assert(vRead < n * 0.6, s"IVF scan emitted $vRead of $n rows — not pruned")
    assert(rows(vRes) == rows(Similarity.ivfSearchIndexed(vIdx, cents, queries,
      "vec_id", "embedding", k = 5, nprobe = 2)))
    corpus.unpersist()
  }

  test("bucket-partitioned LSH index: a probe reads only its buckets' partitions") {
    import spark.implicits._
    val n = 2000
    val corpus = (0L until n.toLong).map(i => i -> mkVec(i)).toDF("vec_id", "embedding")
      .cache()
    corpus.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_lsh").toString + "/idx"
    // nBits = 6 → 64 bucket partitions; 2 queries at depth 1 probe at
    // most 2 × 7 = 14 of them
    Similarity.lshIndexWrite(corpus, "vec_id", "embedding", dir, nBits = 6)
    val stored = spark.read.parquet(dir)
    val queries = Seq(5000L -> mkVec(3), 5001L -> mkVec(7))
      .toDF("vec_id", "embedding")
    val res = Similarity.lshSearchIndexed(stored, queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 1)
    val read = scanRows(res)
    assert(read < n * 0.6, s"LSH scan emitted $read of $n rows — partitions not pruned")
    assert(read > 0)
    // pruning must not change results: identical to the unpartitioned
    // in-memory index frame
    def rows(d: DataFrame): Set[(Long, Int, Long, Double)] =
      d.select($"query_id", $"rank", $"neighbor_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSet
    val mem = Similarity.lshIndex(corpus, "vec_id", "embedding", nBits = 6)
    assert(rows(res) == rows(Similarity.lshSearchIndexed(mem, queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 1)))
    assert(rows(res).nonEmpty)
    // oversized probe sets skip the IN filter but return the same rows
    assert(rows(res) == rows(Similarity.lshSearchIndexed(stored, queries,
      "vec_id", "embedding", k = 5, nBits = 6, probeDepth = 1,
      maxProbeFilter = 3)))
    corpus.unpersist()
  }

  test("16-bit prefix-partitioned LSH index: ~4k directories, probes prune on the prefix") {
    import spark.implicits._
    val n = 2000
    val corpus = (0L until n.toLong).map(i => i -> mkVec(i)).toDF("vec_id", "embedding")
      .cache()
    corpus.count()
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_pfx").toString + "/idx"
    // SCALE.md's recipe raises nBits to 16 at scale — one directory per
    // bucket would be 65,536; the writer must fall back to the 12-bit
    // prefix (<= 4096 dirs) and the search must still prune at the source
    Similarity.lshIndexWrite(corpus, "vec_id", "embedding", dir, nBits = 16)
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("bucket_pfx="))
    assert(dirs.nonEmpty && dirs.length <= 4096,
      s"expected prefix directories (<= 4096), got ${dirs.length}")
    val stored = spark.read.parquet(dir)
    val queries = Seq(5000L -> mkVec(3), 5001L -> mkVec(7))
      .toDF("vec_id", "embedding")
    // depth 2 at 16 bits probes 2 × 137 buckets → <= 274 of the ~2000
    // occupied prefixes; the scan must emit only the surviving partitions
    val res = Similarity.lshSearchIndexed(stored, queries,
      "vec_id", "embedding", k = 5, nBits = 16, probeDepth = 2)
    val read = scanRows(res)
    assert(read < n * 0.6, s"prefix scan emitted $read of $n rows — not pruned")
    def rows(d: DataFrame): Set[(Long, Int, Long, Double)] =
      d.select($"query_id", $"rank", $"neighbor_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSet
    // identical to the unpartitioned in-memory index frame...
    val mem = Similarity.lshIndex(corpus, "vec_id", "embedding", nBits = 16)
    assert(rows(res) == rows(Similarity.lshSearchIndexed(mem, queries,
      "vec_id", "embedding", k = 5, nBits = 16, probeDepth = 2)))
    assert(rows(res).nonEmpty)
    // ...and with the IN filter disabled (no pruning at all)
    assert(rows(res) == rows(Similarity.lshSearchIndexed(stored, queries,
      "vec_id", "embedding", k = 5, nBits = 16, probeDepth = 2,
      maxProbeFilter = 3)))
    // width guard still fires on the prefix layout (eager, pruning path)
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshSearchIndexed(stored, queries,
        "vec_id", "embedding", k = 5, nBits = 12, probeDepth = 1).collect()
    }
    assert(ex.getMessage.contains("nBits"), ex.getMessage)
    corpus.unpersist()
  }

  test("lshIndexWrite layout edges: every (nBits, maxDirs) shape round-trips identically") {
    import spark.implicits._
    val n = 400
    val corpus = (0L until n.toLong).map(i => i -> mkVec(i)).toDF("vec_id", "embedding")
      .cache()
    corpus.count()
    val queries = Seq(5000L -> mkVec(3), 5001L -> mkVec(7))
      .toDF("vec_id", "embedding")
    def rows(d: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Double)] =
      d.select($"query_id", $"rank", $"neighbor_id", $"score")
        .as[(Long, Int, Long, Double)].collect().toSet
    // (nBits, maxDirs) → expected partition-column prefix: shift > 0
    // gives the prefix layout, shift == 0 the legacy bucket layout —
    // including maxDirs ABOVE 2^nBits (clamps to legacy) and a shift
    // of exactly nBits-1 (two-bucket prefixes)
    for (((bits, dirs), wantPrefix) <- Seq(
        (14, 4096) -> true,   // shift 2
        (16, 1024) -> true,   // shift 6
        (15, 16384) -> true,  // shift 1: two buckets per dir
        (10, 256) -> true,    // shift 2 below the 12-bit line
        (8, 4096) -> false,   // maxDirs above 2^nBits: legacy, <=256 dirs
        (12, 4096) -> false)) { // the historical 12-bit layout
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_edge_${bits}_$dirs").toString + "/idx"
      Similarity.lshIndexWrite(corpus, "vec_id", "embedding", dir,
        nBits = bits, maxDirs = dirs)
      val names = new java.io.File(dir).listFiles().map(_.getName)
      val pfx = names.count(_.startsWith("bucket_pfx="))
      val plain = names.count(_.startsWith("bucket="))
      if (wantPrefix)
        assert(pfx > 0 && plain == 0 && pfx <= dirs,
          s"nBits=$bits maxDirs=$dirs: expected prefix layout, got $pfx pfx / $plain plain")
      else
        assert(plain > 0 && pfx == 0,
          s"nBits=$bits maxDirs=$dirs: expected legacy layout, got $pfx pfx / $plain plain")
      val viaStore = rows(Similarity.lshSearchIndexed(
        spark.read.parquet(dir), queries, "vec_id", "embedding",
        k = 5, nBits = bits, probeDepth = 2))
      val viaMem = rows(Similarity.lshSearchIndexed(
        Similarity.lshIndex(corpus, "vec_id", "embedding", bits), queries,
        "vec_id", "embedding", k = 5, nBits = bits, probeDepth = 2))
      assert(viaStore == viaMem,
        s"nBits=$bits maxDirs=$dirs: store diverged from in-memory index")
      assert(viaStore.nonEmpty)
    }
    corpus.unpersist()
  }
}
