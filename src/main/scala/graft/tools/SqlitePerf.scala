package graft.sinks

/** No-Spark micro-profile of the SQLite sink's per-row path: synthetic
  * rows through record() and BTreeBuilder so sink-internal cost is
  * separated from the Spark drain (see tools.SqliteProbe for the
  * end-to-end split).
  */
object SqlitePerf {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(600000)
    val rows: IndexedSeq[Seq[Any]] = (1 to n).map { i =>
      Seq[Any](i.toLong, s"R F 17.0 33078.76 0.04 $i ${i % 1000}")
    }
    // warmup
    rows.take(50000).foreach(SqliteSink.record)
    var t0 = System.nanoTime()
    var bytes = 0L
    rows.foreach(r => bytes += SqliteSink.record(r).length)
    println(f"[perf] record only: ${(System.nanoTime() - t0) / 1e9}%.2f s ($bytes bytes)")

    val pf = new SqliteSink.PageFile("/tmp/sqlite_perf.db")
    pf.reservePage1()
    t0 = System.nanoTime()
    val b = new SqliteSink.BTreeBuilder(pf, None)
    var rid = 0L
    rows.foreach { r => rid += 1; b.add(rid, SqliteSink.record(r)) }
    val tAdd = System.nanoTime()
    println(f"[perf] add loop: ${(tAdd - t0) / 1e9}%.2f s")
    val root = b.finish()
    println(f"[perf] finish(): ${(System.nanoTime() - tAdd) / 1e9}%.2f s")
    println(f"[perf] record + tree build/write: ${(System.nanoTime() - t0) / 1e9}%.2f s (root $root)")
    println(f"[perf]   of which page-file io: ${pf.ioNanos / 1e9}%.2f s")
    pf.close()
  }
}
