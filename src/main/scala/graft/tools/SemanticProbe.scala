package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot measured point for the cluster-driven curation ops
  * (semanticDedupPairs / clusterPrune) at fact scale — 600k × 64-dim
  * synthetic vectors, the same corpus construction as the ANN family.
  *
  * Not part of the Bench artifact loop: the flat-quantizer assignment
  * term is O(N × nlist × dim) and nlist must grow with N to hold the
  * per-cell candidate volume, so a 10× ratio curve would measure the
  * (documented) flat-k-means scaling wall rather than a regression.
  * SCALE.md records the single 600k point and the scaling argument.
  *
  * Run manually:
  *   sbt "runMain graft.tools.SemanticProbe [n] [nlist]"
  */
object SemanticProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(600000L)
    val nlist = args.drop(1).headOption.map(_.toInt).getOrElse(2048)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-semantic-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = SyntheticVectors.df(spark, n, dims = 64,
      partitions = cpus.toInt).localCheckpoint(true)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semantic-probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val centroids = time(s"ivfTrain nlist=$nlist") {
      graft.ops.Similarity.ivfTrain(corpus, "vec_id", "embedding",
        nlist = nlist, lloydPasses = 1)
    }
    time(s"semanticDedupPairs (prebuilt)") {
      val (pairs, acc) = graft.ops.Similarity.semanticDedupPairsCounted(
        corpus, "vec_id", "embedding", centroids, threshold = 0.9,
        maxCell = 5000)
      val c = pairs.count()
      println(s"[semantic-probe]   pairs=$c droppedCellRows=${acc.value}")
    }
    time(s"clusterPrune keep=0.9") {
      val kept = graft.ops.Similarity.clusterPrune(corpus, "vec_id",
        "embedding", centroids, keepFraction = 0.9).count()
      println(s"[semantic-probe]   kept=$kept of $n")
    }
    spark.stop()
  }
}
