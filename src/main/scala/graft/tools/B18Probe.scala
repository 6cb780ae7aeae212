package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolation probe for the b18 TF-IDF bench row: two clean recorded
  * runs disagreed 2.89 s vs 5.56 s (spreads [2.3, 4.2] and [4.4, 8.1])
  * on the default shuffle-join dial while the broadcast probe held
  * steady at 3.75 s, so either the row is bimodal under the bench
  * JVM's heap pressure or the dial default is mis-measured. Replicates
  * Bench's b18 exactly (600k-doc corpus, k=5, noop sink), runs each
  * dial several times on an otherwise idle JVM, and attributes stages
  * so the variance pins to a phase (tf aggregate / df join / top-k
  * window).
  */
object B18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b18probe_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = Runtime.getRuntime.availableProcessors

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.add((si.stageId, wall, si.numTasks,
          si.name.takeWhile(_ != '\n').take(70)))
      }
    })

    // Bench's bCorpus + lmDocs, verbatim shape
    val docs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_partkey"),
        col("l_suppkey"))
      .repartition(cpus)
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_partkey"), col("l_suppkey")).as("text"))
      .localCheckpoint(true)
    println(s"corpus rows: ${docs.count()}")

    def run(bc: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 5,
        broadcastCounts = bc)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // inlined tfidf with the tf aggregate persisted once — tests whether
    // the shuffle-dial variance is the ReuseExchange lottery on the
    // twice-consumed tf frame
    def runPersist(): Double = {
      val t0 = System.nanoTime()
      val nDocs = docs.count()
      val tok = docs.select(col("doc_id"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf")).localCheckpoint(false)
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      val out = tf.join(dfreq, Seq("term"))
        .withColumn("score",
          (col("tf") * nDocs).cast(org.apache.spark.sql.types.DoubleType) / col("df_docs"))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
      out.write.format("noop").mode("overwrite").save()
      tf.unpersist()
      (System.nanoTime() - t0) / 1e9
    }
    // warm all dials
    run(bc = false); run(bc = true); runPersist()

    def series(name: String, f: () => Double): Unit = {
      val times = (1 to reps).map { i =>
        Thread.sleep(300); stages.clear()
        val s = f()
        println(f"$name run $i: $s%.2f s")
        if (i == reps) { // attribute the last rep
          Thread.sleep(400)
          stages.toArray(Array.empty[(Int, Long, Int, String)])
            .sortBy(_._1)
            .foreach { case (id, wall, n, nm) =>
              println(f"  stage $id%4d ${wall / 1e3}%6.2f s  $n%3d tasks  $nm") }
        }
        s
      }
      println(f"$name: min ${times.min}%.2f  median ${times.sorted.apply(reps / 2)}%.2f  max ${times.max}%.2f")
    }
    series("bc=false", () => run(bc = false))
    series("bc=true", () => run(bc = true))
    series("persist-tf", () => runPersist())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    series("bc=false,aqe=off", () => run(bc = false))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    series("bc=false,skewjoin=off", () => run(bc = false))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    series("bc=false,coalesce=off", () => run(bc = false))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.stop()
  }
}
