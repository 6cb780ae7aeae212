package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase-timed probe of the INDEXED SQLite export (the b6 path): replays
  * `writeSpecs`' indexed branch with a timer around each phase so the
  * K+1-pass cost split is visible — zipWithIndex materialization, table
  * stream, per-index Spark sort, per-index driver stream. Drives the
  * "measure first" decision for overlapping/merging the index passes.
  *
  *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.sinks.SqliteIdxProbe"
  */
object SqliteIdxProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-sqlite-idx-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_partkey"), col("l_suppkey"))
      .repartition(cpus.toInt)
      .select(monotonically_increasing_id().as("doc_id"),
        concat_ws(" ", col("l_returnflag"), col("l_linestatus"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"), col("l_partkey"),
          col("l_suppkey")).as("text"))
      .select(col("doc_id").cast("string").as("_link"),
        (col("doc_id") % 1000).cast("string").as("_link_parent"), col("text"))

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[idxprobe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // `ab` mode (r22): interleaved A/B of the prefetch depth over the
    // FULL b6-shaped writeSpecs export (table + unique _link index +
    // _link_parent index), one JVM, alternating arms so box drift hits
    // both. Decides the graft.sqlite.prefetch default — the r22 per-rep
    // attribution showed the one-ahead pipeline producer-limited.
    if (args.contains("ab")) {
      val reps = 3
      val dir = java.nio.file.Files.createTempDirectory("graft_idxab").toString
      def spec() = Seq(SqliteSink.TableSpec(
        "docs", docs,
        """CREATE TABLE "docs"("_link" TEXT, "_link_parent" TEXT, "text" TEXT)""",
        indexes = Seq(
          SqliteSink.IndexSpec("idx_docs__link", "_link", unique = true,
            Some("""CREATE UNIQUE INDEX "idx_docs__link" ON "docs"("_link")""")),
          SqliteSink.IndexSpec("idx_docs__link_parent", "_link_parent",
            unique = false,
            Some("""CREATE INDEX "idx_docs__link_parent" ON "docs"("_link_parent")""")))))
      def arm(depth: Int, tag: String): Double = {
        System.setProperty("graft.sqlite.prefetch", depth.toString)
        val t0 = System.nanoTime()
        try SqliteSink.writeSpecs(spec(), s"$dir/$tag.db")
        finally System.clearProperty("graft.sqlite.prefetch")
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[idxprobe] ab depth=$depth%-2d $w%6.2f s  " +
          SqliteSink.lastStats.map(_.line).getOrElse(""))
        w
      }
      arm(1, "w1"); arm(4, "w4") // warm both
      (1 to reps).foreach { r => arm(1, s"d1r$r"); arm(4, s"d4r$r"); arm(8, s"d8r$r") }
      spark.stop()
      return
    }

    // one untimed warmup of the whole pipeline at tiny scale is skipped on
    // purpose: phase splits, not absolute numbers, are the point here
    val db = java.nio.file.Files.createTempDirectory("graft_idxprobe").toString + "/p.db"
    val pf = new SqliteSink.PageFile(db)
    pf.reservePage1()

    val level = if (args.contains("deser")) StorageLevel.MEMORY_AND_DISK
                else StorageLevel.MEMORY_AND_DISK_SER
    println(s"[idxprobe] storage level: $level")
    val withId = docs.rdd.zipWithIndex().persist(level)
    t("zipWithIndex materialize (count)") { withId.count() }
    val root = t("table stream (toLocalIterator -> b-tree)") {
      val it = withId.toLocalIterator.map(_._1)
      val b = new SqliteSink.BTreeBuilder(pf, None)
      var rowid = 0L
      it.foreach { row => rowid += 1
        b.add(rowid, SqliteSink.record(Seq.tabulate(row.length)(row.get))) }
      b.finish()
    }
    Seq("_link", "_link_parent").foreach { c =>
      val fi = docs.schema.fieldIndex(c)
      val sorted = withId.map { case (row, i) =>
        (if (row.isNullAt(fi)) null else SqliteSink.utf8Clean(row.getString(fi)), i + 1L)
      }.sortBy(identity)(SqliteSink.IdxKeyOrdering, scala.reflect.classTag[(String, Long)])
        .persist(StorageLevel.MEMORY_AND_DISK_SER)
      t(s"index $c: Spark sort materialize") { sorted.count() }
      t(s"index $c: driver stream -> index b-tree") {
        val ib = sorted.toLocalIterator
        // reuse the real builder via a fresh IndexBuilder is private —
        // approximate with record() + a table b-tree to keep driver-side
        // work realistic (same record assembly + page render volume)
        val b = new SqliteSink.BTreeBuilder(pf, None)
        var rid = 0L
        ib.foreach { case (k, r) => rid += 1; b.add(rid, SqliteSink.record(Seq(k, r))) }
        b.finish()
      }
      sorted.unpersist()
    }
    withId.unpersist()
    pf.finishHeader()
    pf.close()
    println(s"[idxprobe] table root $root, db $db")
    spark.stop()
  }
}
