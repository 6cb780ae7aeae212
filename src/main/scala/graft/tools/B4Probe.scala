package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Isolation probe for the b4 incremental-dedup bench row, which the r17
  * judge found BIMODAL PER JVM: the committed clean artifact recorded
  * 8.87 s (all three runs ≥ 4.3 s) while the judge's idle re-run of the
  * same commit recorded 1.95 s (all three ≤ 3.1 s) — within each JVM the
  * runs agree, so some once-per-JVM decision picks the mode. Prime
  * suspects from the §b18-tfidf playbook: the anti-join's build-side
  * broadcast decision (600k 16-byte fingerprints sit near the 10 MB
  * autoBroadcastJoinThreshold), AQE replanning, and storage-memory
  * pressure from earlier bench rows' localCheckpoint blocks (the
  * ContextCleaner is GC-driven — a JVM that happens not to collect keeps
  * superseded blocks resident, and b17's standing state raised exactly
  * that occupancy in r17's bench JVM).
  *
  * Replicates Bench's runB4 verbatim, prints the final ADAPTIVE plan's
  * join strategy per run, per-stage attribution for the last rep, and
  * the lingering persistent-RDD count before/after each rep. A
  * `pressure` arg first fills storage memory with checkpointed frames
  * (held referenced, like a bench JVM mid-flight) to try to force the
  * slow mode on demand.
  */
object B4Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val pressure = args.contains("pressure")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b4probe_wh").toString)
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
    // capture every executed (adaptive-final) plan's join lines
    val joins = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val plan = qe.executedPlan.toString
        plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Exchange"))
          .foreach(l => joins.add(l.trim.take(110)))
      }
      override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
    })

    def bCorpus(dir: String) = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_partkey"),
        col("l_suppkey"))
      .repartition(cpus)
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_partkey"), col("l_suppkey")).as("text"))

    // Bench's runB4, verbatim
    def runB4(unpersistAfter: Boolean): Double = {
      val t0 = System.nanoTime()
      val base = bCorpus(sfDir).localCheckpoint(true)
      val dupes = base.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      val fresh = base.where(col("doc_id") % 100 === 50)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat(col("text"), lit(" appended")).as("text"))
      val incoming = dupes.unionAll(fresh).localCheckpoint(true)
      graft.ops.Dedup.dedupIncrement(base, incoming, "text", "doc_id")
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      if (unpersistAfter) { base.unpersist(); incoming.unpersist() }
      s
    }

    if (pressure) {
      // hold ~40 checkpointed corpus copies referenced — a deliberately
      // mean stand-in for a bench JVM's accumulated standing state
      val held = (1 to 40).map(_ => bCorpus(sfDir).localCheckpoint(true))
      held.foreach(df => println(s"pressure frame rows: ${df.count()}"))
    }
    if (args.contains("benchlike")) {
      // replicate the state the real bench JVM carries into b4's timed
      // runs (r17 added exactly this before the slow committed row):
      // the b17 standing corpus checkpoint HELD for the rest of the JVM,
      // its bucketed band + fingerprint tables in the catalog, and a
      // round of warmup bodies at sf0.001
      val std = bCorpus(sfDir).localCheckpoint(true)
      println(s"benchlike standing corpus: ${std.count()} rows")
      graft.ops.Dedup.writeBandTable(std, "text", "doc_id",
        "b4probe_bands", numHashes = 32, bands = 8, shingleSize = 3,
        numBuckets = 32)
      graft.ops.Dedup.writeFingerprintTable(std, "text", "b4probe_fp",
        numBuckets = 32)
      val warm = bCorpus("/root/testdata/sf0.001").localCheckpoint(true)
      graft.ops.Dedup.minhashDedupPairs(warm, "text", "doc_id",
        threshold = 0.9, numHashes = 32, bands = 4, shingleSize = 3,
        maxBucket = 1000).write.format("noop").mode("overwrite").save()
      println(s"benchlike warm: ${warm.count()} rows  ${storageInfo()}")
    }

    def storageInfo(): String = {
      val rdds = spark.sparkContext.getPersistentRDDs
      val (maxMem, remaining) = spark.sparkContext.getExecutorMemoryStatus
        .values.foldLeft((0L, 0L)) { case ((m, r), (em, er)) => (m + em, r + er) }
      f"persistentRDDs=${rdds.size} storageUsed=${(maxMem - remaining) / 1e6}%.0fMB of ${maxMem / 1e6}%.0fMB"
    }

    def series(name: String, unpersistAfter: Boolean): Unit = {
      val times = (1 to reps).map { i =>
        Thread.sleep(300); stages.clear(); joins.clear()
        val s = runB4(unpersistAfter)
        println(f"$name run $i: $s%.2f s   ${storageInfo()}")
        if (i == reps) {
          Thread.sleep(400)
          println("  final-plan join/exchange lines:")
          joins.toArray(Array.empty[String]).distinct.foreach(l => println(s"    $l"))
          stages.toArray(Array.empty[(Int, Long, Int, String)])
            .sortBy(_._1)
            .foreach { case (id, wall, n, nm) =>
              println(f"  stage $id%4d ${wall / 1e3}%6.2f s  $n%3d tasks  $nm") }
        }
        s
      }
      println(f"$name: min ${times.min}%.2f  median ${times.sorted.apply(reps / 2)}%.2f  max ${times.max}%.2f")
    }

    runB4(unpersistAfter = false) // warm (codegen, parquet footer)
    series("bench-verbatim", unpersistAfter = false)
    // force each join mode: the fast plan broadcasts the 600k-fingerprint
    // anti-join build side at AQE time — measure what the row costs when
    // that conversion does NOT happen (the suspected slow mode)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    series("smj-forced", unpersistAfter = false)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (200L << 20).toString)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", (200L << 20).toString)
    series("bhj-forced", unpersistAfter = false)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", (10L << 20).toString)
    series("unpersist-after", unpersistAfter = true)
    System.gc(); Thread.sleep(500)
    println(s"after explicit GC: ${storageInfo()}")
    series("post-gc", unpersistAfter = false)
    spark.stop()
  }
}
