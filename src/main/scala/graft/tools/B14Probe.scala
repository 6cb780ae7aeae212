package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level attribution of the b14 standing-band probe (VERDICT r15
  * Next #2): replicates Bench's b14 exactly — a 600k-doc standing band
  * table probed by a 12k-doc daily batch — and logs every completed
  * stage's wall time so the 7.6 s splits into signature pass /
  * probe-set collect / bucketed probe join + cap window / candidate
  * verification / final anti-join.
  */
object B14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("b14probe_wh").toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cpus = Runtime.getRuntime.availableProcessors.toString

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, Int, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.add((si.stageId, wall, si.taskMetrics.executorRunTime,
          si.numTasks, si.name.takeWhile(_ != '\n').take(90)))
      }
    })
    def drainBus(): Unit = Thread.sleep(400)
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

    // Bench's bCorpus / b14Batch, verbatim shape
    def bCorpus: org.apache.spark.sql.DataFrame =
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"),
          col("l_suppkey"))
        .repartition(cpus.toInt)
        .select(monotonically_increasing_id().as("doc_id"),
          concat_ws(" ", col("l_returnflag"), col("l_linestatus"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"),
            col("l_partkey"), col("l_suppkey")).as("text"))
    val lmDocs = bCorpus.localCheckpoint(true)
    def b14Batch: org.apache.spark.sql.DataFrame =
      lmDocs.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
        .unionAll(lmDocs.where(col("doc_id") % 100 === 50)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            concat(col("text"), lit(" appended")).as("text")))

    t("writeBandTable (untimed in bench)") {
      graft.ops.Dedup.writeBandTable(lmDocs, "text", "doc_id",
        "b14probe_bands", numHashes = 32, bands = 8, shingleSize = 3,
        numBuckets = 32)
    }

    (1 to 3).foreach { i =>
      t(s"full probe run $i") {
        graft.ops.Dedup.nearDupIncrementIndexed(spark.table("b14probe_bands"),
            lmDocs, b14Batch, "text", "doc_id", threshold = 0.9,
            numHashes = 32, bands = 8, shingleSize = 3, maxBucket = 1000)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // cardinality attribution: how big is each intermediate frame the
    // probe pays for? (re-derives the pipeline's public pieces)
    val in = graft.ops.Dedup.bandIndex(b14Batch, "text", "doc_id",
        numHashes = 32, bands = 8, shingleSize = 3)
      .select(col("id").as("new_id"), col("band"), col("bandHash"))
      .localCheckpoint(true)
    println(s"[b14probe] batch band rows: ${in.count()}")
    println(s"[b14probe] batch distinct (band,bandHash): " +
      in.select("band", "bandHash").distinct().count())
    println(s"[b14probe] batch distinct bandHash: " +
      in.select("bandHash").distinct().count())
    val probed = spark.table("b14probe_bands")
      .join(in.select("band", "bandHash").distinct(), Seq("band", "bandHash"), "left_semi")
      .localCheckpoint(true)
    println(s"[b14probe] probed corpus slice rows: ${probed.count()}")
    val bucketSizes = probed.groupBy("band", "bandHash").count()
    println(s"[b14probe] probed buckets: ${bucketSizes.count()}, " +
      s"oversized(>1000): ${bucketSizes.where(col("count") > 1000).count()}")
    val cands = in.join(probed.select(col("id").as("old_id"), col("band"), col("bandHash")),
        Seq("band", "bandHash"))
      .select("new_id", "old_id").distinct()
    println(s"[b14probe] candidate pairs: ${cands.count()}")
    println(s"[b14probe] distinct old ids: ${cands.select("old_id").distinct().count()}")

    // phase timings: replicate nearDupVerify's pipeline piecewise (same
    // shapes, public kernels) to attribute the steady-state seconds
    import graft.functions.TextHash
    (1 to 2).foreach { round =>
      val in2 = t(s"[$round] phase A: batch bands + checkpoint + 65537-collect") {
        val f = graft.ops.Dedup.bandIndex(b14Batch, "text", "doc_id", 32, 8, 3)
          .select(col("id").as("new_id"), col("band"), col("bandHash"))
          .localCheckpoint(false)
        val got = f.select(col("bandHash")).where(col("bandHash").isNotNull)
          .distinct().limit(65537).collect()
        println(s"  got ${got.length} hashes (cap 65536 -> semi-join path)")
        f
      }
      val cands2 = t(s"[$round] phase B: semi-join prune + window cap + cands checkpoint") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bandHash"))
        val cb = spark.table("b14probe_bands")
          .select(col("id"), col("band"), col("bandHash"))
          .join(in2.select(col("band"), col("bandHash")).distinct(),
            Seq("band", "bandHash"), "left_semi")
          .withColumn("__n", count(lit(1)).over(w))
          .where(col("__n") <= 1000)
          .select(col("id").as("old_id"), col("band"), col("bandHash"))
        val c = in2.join(cb, Seq("band", "bandHash"))
          .select(col("new_id"), col("old_id")).distinct()
          .localCheckpoint(false)
        c.count()
        c
      }
      val oldKeys = t(s"[$round] phase C: oldKeys collect") {
        cands2.select(col("old_id")).where(col("old_id").isNotNull)
          .distinct().limit(65537).collect().map(_.get(0))
      }
      t(s"[$round] phase D: shingle + exact-verify + anti-join write") {
        def sh(df: org.apache.spark.sql.DataFrame, ids: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id").as("id"), col("text"))
          .join(ids, Seq("id"), "left_semi")
          .select(col("id"), array_distinct(TextHash.shingleHashesUdf(3)(col("text"))).as("sh"))
        val shNew = sh(b14Batch, cands2.select(col("new_id").as("id")).distinct())
        val exVerify = lmDocs.where(col("doc_id").isin(oldKeys.toIndexedSeq: _*))
        val shOld = sh(exVerify, cands2.select(col("old_id").as("id")).distinct())
        val dupIds = cands2
          .join(shNew.withColumnsRenamed(Map("id" -> "new_id", "sh" -> "sh_a")), Seq("new_id"))
          .join(shOld.withColumnsRenamed(Map("id" -> "old_id", "sh" -> "sh_b")), Seq("old_id"))
          .where(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))) >= 0.9)
          .select(col("new_id").as("doc_id")).distinct()
        b14Batch.join(dupIds, Seq("doc_id"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$round] phase D'': kernel tail, NO isin prefilter (plain semi-join)") {
        def sh(df: org.apache.spark.sql.DataFrame, ids: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id").as("id"), col("text"))
          .join(ids, Seq("id"), "left_semi")
          .select(col("id"), TextHash.shingleHashesUdf(3)(col("text")).as("sh"))
        val shNew = sh(b14Batch, cands2.select(col("new_id").as("id")).distinct())
        val shOld = sh(lmDocs, cands2.select(col("old_id").as("id")).distinct())
        val dupIds = cands2
          .join(shNew.withColumnsRenamed(Map("id" -> "new_id", "sh" -> "sh_a")), Seq("new_id"))
          .join(shOld.withColumnsRenamed(Map("id" -> "old_id", "sh" -> "sh_b")), Seq("old_id"))
          .where(TextHash.jaccardDistinctUdf(col("sh_a"), col("sh_b")) >= 0.9)
          .select(col("new_id").as("doc_id")).distinct()
        b14Batch.join(dupIds, Seq("doc_id"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      t(s"[$round] phase D': same tail, compiled jaccardDistinct kernel") {
        def sh(df: org.apache.spark.sql.DataFrame, ids: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id").as("id"), col("text"))
          .join(ids, Seq("id"), "left_semi")
          .select(col("id"), TextHash.shingleHashesUdf(3)(col("text")).as("sh"))
        val shNew = sh(b14Batch, cands2.select(col("new_id").as("id")).distinct())
        val exVerify = lmDocs.where(col("doc_id").isin(oldKeys.toIndexedSeq: _*))
        val shOld = sh(exVerify, cands2.select(col("old_id").as("id")).distinct())
        val dupIds = cands2
          .join(shNew.withColumnsRenamed(Map("id" -> "new_id", "sh" -> "sh_a")), Seq("new_id"))
          .join(shOld.withColumnsRenamed(Map("id" -> "old_id", "sh" -> "sh_b")), Seq("old_id"))
          .where(TextHash.jaccardDistinctUdf(col("sh_a"), col("sh_b")) >= 0.9)
          .select(col("new_id").as("doc_id")).distinct()
        b14Batch.join(dupIds, Seq("doc_id"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
