package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Stage-level attribution of the b2/b3 bench pipelines: a SparkListener
  * logs every completed stage's wall time, task time, and name so the
  * expensive stages are identifiable without the UI.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // listener events arrive asynchronously on the listener bus — collect
    // into a concurrent queue and drain the bus before reading, so late
    // stage-completed events are neither dropped nor attributed to the
    // next t() block
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add((si.stageId, wall, si.taskMetrics.executorRunTime,
          si.numTasks, si.name.takeWhile(_ != '\n').take(90)))
      }
    })

    // listenerBus.waitUntilEmpty is private[spark]; a short sleep after the
    // action returns is enough for a dev-only probe (events are in-process)
    def drainBus(): Unit = Thread.sleep(300)

    def t[A](name: String)(f: => A): A = {
      drainBus(); stages.clear()
      val t0 = System.nanoTime(); val r = f
      println(f"===== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s =====")
      drainBus()
      import scala.jdk.CollectionConverters._
      stages.asScala.toList.sortBy(_._1).foreach { case (id, wall, run, nt, nm) =>
        println(f"  stage $id%4d wall=${wall / 1e3}%6.2fs taskTime=${run / 1e3}%7.2fs tasks=$nt%3d  $nm")
      }
      r
    }

    def docs = {
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(monotonically_increasing_id().as("doc_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_partkey"), col("l_suppkey")).as("text"))
      val planted = base.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      base.unionAll(planted).repartition(32)
    }

    // warmup
    Dedup.minhashDedupPairs(docs.limit(2000), "text", "doc_id", 0.9, 32, 4, 3, 1000)
      .write.format("noop").mode("overwrite").save()

    t("b2 pairs") {
      Dedup.minhashDedupPairs(docs, "text", "doc_id", 0.9, 32, 4, 3, 1000)
        .write.format("noop").mode("overwrite").save()
    }
    t("b3 full") {
      val pairs = Dedup.minhashDedupPairs(docs, "text", "doc_id", 0.9, 32, 4, 3, 1000)
        .select("id_a", "id_b")
      Dedup.dedupByPairs(docs, "doc_id", pairs)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
