package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot measured points for the multi-probe near-dup dial at fact
  * scale — what the `probeDepth` recall (NearDupRecallSpec: 0.419 →
  * 0.962 at 12-bit depth 2) COSTS at 600k × 64-dim, and how raising
  * nBits alongside the depth keeps the candidate volume bounded (the
  * same raise-bits-and-probe-deeper recipe the ANN table documents:
  * a 16-bit bucket holds 1/16th of a 12-bit one, so 17 probe masks at
  * 16 bits scan about the same volume as ONE exact 12-bit bucket).
  *
  * Not part of the Bench artifact loop: the interesting axis is the
  * (nBits, depth) trade at one scale, not a per-round regression row.
  * SCALE.md records the measured table.
  *
  * Run manually:
  *   sbt "runMain graft.tools.ProbedPairsProbe [n]"
  */
object ProbedPairsProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(600000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probed-pairs-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = SyntheticVectors.df(spark, n, dims = 64,
      partitions = cpus.toInt).localCheckpoint(true)

    def run(label: String, nBits: Int, depth: Int): Unit = {
      val t0 = System.nanoTime()
      val c = graft.ops.Similarity.cosineDedupPairs(corpus,
        "vec_id", "embedding", threshold = 0.9, nBits = nBits,
        probeDepth = depth).count()
      println(f"[probed-pairs] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.1f s  ($c pairs)")
    }

    // warmup at a small n pays codegen/classloading before timing
    val warm = SyntheticVectors.df(spark, 2000L, dims = 64,
      partitions = cpus.toInt).localCheckpoint(true)
    Seq((12, 0), (16, 1), (16, 2)).foreach { case (b, d) =>
      graft.ops.Similarity.cosineDedupPairs(warm, "vec_id", "embedding",
        threshold = 0.9, nBits = b, probeDepth = d).count()
    }

    run("nBits=12 depth=0 (old)", 12, 0)
    run("nBits=16 depth=1", 16, 1)
    run("nBits=16 depth=2", 16, 2)
    run("nBits=12 depth=1", 12, 1)
    spark.stop()
  }
}
