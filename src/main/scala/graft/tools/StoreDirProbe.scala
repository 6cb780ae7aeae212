package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Directory-count sensitivity of the prefix-partitioned LSH store
  * (r15): every probed directory costs a file open and every search
  * action re-lists the store, so the dir count trades pruning
  * granularity against fixed I/O overhead. Builds a 600k 16-bit store
  * at maxDirs ∈ {256, 1024, 4096} and times 5-query and 100-query
  * default-config searches on each; findings go to SCALE.md
  * §lsh-store-dirs.
  */
object StoreDirProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-store-dir-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("graft_dirs").toString

    val n = 600000L
    val corpus = SyntheticVectors.df(spark, n, partitions = cpus.toInt)
      .localCheckpoint(true)
    val q5 = corpus.where(col("vec_id") < 5).localCheckpoint(true)
    val q100 = corpus.where(col("vec_id") < 100).localCheckpoint(true)

    def time(f: => Unit): Double = {
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    // warmup: codegen + classloading on a tiny store
    val warm = SyntheticVectors.df(spark, 2000L, partitions = 4)
    graft.ops.Similarity.lshIndexWrite(warm, "vec_id", "embedding",
      s"$work/warm", maxDirs = 256)
    graft.ops.Similarity.lshSearchIndexed(spark.read.parquet(s"$work/warm"),
      warm.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .write.format("noop").mode("overwrite").save()

    Seq(256, 1024, 4096).foreach { dirs =>
      val path = s"$work/store$dirs"
      val tBuild = time(graft.ops.Similarity.lshIndexWrite(
        corpus, "vec_id", "embedding", path, maxDirs = dirs))
      def search(q: org.apache.spark.sql.DataFrame): Unit =
        graft.ops.Similarity.lshSearchIndexed(spark.read.parquet(path), q,
          "vec_id", "embedding", k = 10)
          .write.format("noop").mode("overwrite").save()
      val t5 = time(search(q5))
      val t100 = time(search(q100))
      println(f"[store-dirs] maxDirs=$dirs%-5d build $tBuild%5.1f s  " +
        f"search5q $t5%5.2f s  search100q $t100%5.2f s")
    }
    // baseline: the one-shot (in-memory signatures) at both batch sizes
    val o5 = time(graft.ops.Similarity.lshTopKProbed(corpus, q5,
      "vec_id", "embedding", k = 10)
      .write.format("noop").mode("overwrite").save())
    val o100 = time(graft.ops.Similarity.lshTopKProbed(corpus, q100,
      "vec_id", "embedding", k = 10)
      .write.format("noop").mode("overwrite").save())
    println(f"[store-dirs] one-shot             search5q $o5%5.2f s  search100q $o100%5.2f s")
    spark.stop()
  }
}
