package graft.sinks

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StringType
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable.ArrayBuffer

/** Dependency-free SQLite 3 database writer — the reference's direct
  * `sqlite.db` load (K3): "A `sqlite.db` is created in the output
  * directory where each csv file is put in its own table"
  * (`/root/reference/docs/outputs.md:42`, CLI `--sqlite`), including the
  * indexes and foreign-key constraints the reference's export carries
  * ("SQLite export has indexes and foreign key contraints",
  * `/root/reference/docs/changelog.md:222`).
  *
  * Implements the subset of the public SQLite file format
  * (sqlite.org/fileformat2.html) a table forest needs: rowid table
  * b-trees (leaf type 0x0d, interior type 0x05), index b-trees (leaf
  * type 0x0a, interior type 0x02 — interior index pages carry REAL
  * entries, unlike table interiors), record serial types, payload
  * overflow chains, the lock-byte page gap, and the `sqlite_master`
  * catalog rooted on page 1. No journals, freelists, or vacuum state —
  * the file is written once, linearly, and opens in any SQLite client.
  *
  * Scale posture: SQLite is a single-file driver-side interchange format
  * by nature (the reference also streams into one .db). Rows stream to
  * the driver one partition at a time (with one-partition-ahead
  * prefetch, so the Spark fetch hides behind the driver's page
  * building), leaf pages flush as they fill, and driver memory is
  * O(partition buffer) + O(one (page, rowid) entry per flushed page) for
  * the interior levels. Index b-trees need their entries in key order;
  * that sort runs IN SPARK (`sortBy` over a persisted `zipWithIndex` of
  * the table, so rowids stay consistent between the table pass and the
  * index passes) and the sorted pairs stream the same way — the driver
  * never sorts. All index sorts are submitted CONCURRENTLY before the
  * table streams, so their shuffle wall time overlaps the table pass
  * instead of adding K sequential waits. The distributed layouts remain
  * parquet / CSV-dir; this sink serves the reference's primary export
  * format.
  *
  * Value affinity mirrors the CSV renderer and SQLite NUMERIC affinity:
  * whole doubles land as INTEGER (JSON `1.0` → `1`), booleans as 0/1,
  * everything non-numeric as TEXT.
  */
object SqliteSink {

  /** One secondary index over a single TEXT column. `sql` is the CREATE
    * INDEX text stored in sqlite_master (None → NULL, the autoindex
    * convention). Uniqueness is a property of the SQL text; the b-tree
    * layout is identical either way (key + rowid records).
    */
  final case class IndexSpec(name: String, column: String, unique: Boolean,
      sql: Option[String])

  /** One table: sqlite_master name, data, stored CREATE TABLE text
    * (which may carry FOREIGN KEY clauses), and its indexes.
    */
  final case class TableSpec(name: String, df: DataFrame, ddl: String,
      indexes: Seq[IndexSpec] = Nil)

  private val PageSize = 4096
  private val Usable = PageSize // reserved-space byte in the header is 0
  private val MaxLocal = Usable - 35 // leaf table cell local-payload cap
  private val MinLocal = (Usable - 12) * 32 / 255 - 23
  /** Index pages keep less payload local (format's 64/255 fraction). */
  private val MaxLocalIdx = (Usable - 12) * 64 / 255 - 23
  /** Page overlapping file offset 2^30 is the lock-byte page — must stay unused. */
  private val LockBytePage = 1073741824 / PageSize + 1

  private val LeafTable = 0x0d
  private val InteriorTable = 0x05
  private val LeafIndex = 0x0a
  private val InteriorIndex = 0x02

  /** Back-compat form: tables without indexes, DDL via callback. */
  def write(tables: Seq[(String, DataFrame)], path: String,
      ddlFor: String => String): Unit =
    writeSpecs(tables.map { case (n, df) => TableSpec(n, df, ddlFor(n)) }, path)

  /** Test-only fault-injection seam, called once per streamed table row
    * (`("table", rowIdx)`) and once per streamed index entry
    * (`("index", rowid)`) on the INDEXED export path. The concurrent
    * export materializes the corpus fully (persist + count) before any
    * stream runs, so its driver-side failure paths — table stream dying
    * with index sorts in flight, an index stream dying with later sorts
    * pending — are unreachable from data alone; specs throw from here to
    * pin the cancel/unpersist/shutdown behavior deterministically
    * (SqliteFaultSpec). No-op in production; the per-row call is noise
    * next to record building.
    */
  private[sinks] var faultInjection: (String, Long) => Unit = (_, _) => ()

  /** Wall-time attribution of the most recent [[writeSpecs]] call, for
    * slow-mode self-diagnosis (the b6 bench row): BENCH_r19 recorded b6
    * at 19-29 s on all three reps while per-row host CPU load matched a
    * clean 6 s run — the driver-streamed single-file writer's slow mode
    * is I/O-shaped (page-cache/writeback contention), which load_avg
    * only partially reflects, and a plan dump says nothing about a
    * driver-side writer. The split separates where a slow rep spent its
    * wall time: `ioNanos` is raw `RandomAccessFile.write` (the
    * disk-facing syscalls — these BLOCK when the kernel throttles dirty
    * pages, so writeback contention lands here), `tableFetchWaitNanos` /
    * `indexFetchWaitNanos` are driver waits on Spark partition fetches,
    * `indexSortWaitNanos` is the residual wait for the concurrent index
    * sorts after the table pass, and the remainder is driver CPU
    * (record/b-tree building). Single-writer by design (one bench rep /
    * one export at a time); concurrent writeSpecs calls would race the
    * field, harmlessly, to one of their stats.
    */
  final case class WriteStats(rows: Long, indexEntries: Long,
      wallNanos: Long, ioNanos: Long, tableFetchWaitNanos: Long,
      indexFetchWaitNanos: Long, indexSortWaitNanos: Long) {
    def line: String = {
      def s(n: Long) = n / 1e9
      val wall = s(wallNanos)
      val other =
        wall - s(ioNanos) - s(tableFetchWaitNanos) - s(indexFetchWaitNanos) -
          s(indexSortWaitNanos)
      f"rows=$rows (${rows / math.max(wall, 1e-9)}%.0f rows/s) " +
        f"idx_entries=$indexEntries wall=$wall%.2f s: raf.write=${s(ioNanos)}%.2f " +
        f"table_fetch_wait=${s(tableFetchWaitNanos)}%.2f " +
        f"index_fetch_wait=${s(indexFetchWaitNanos)}%.2f " +
        f"index_sort_wait=${s(indexSortWaitNanos)}%.2f cpu_build=$other%.2f"
    }
  }
  @volatile var lastStats: Option[WriteStats] = None

  /** Write `specs` into a single SQLite database file at `path`. */
  def writeSpecs(specs: Seq[TableSpec], path: String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).toAbsolutePath.getParent)
    specs.foreach { s =>
      s.indexes.foreach { ix =>
        require(s.df.schema(ix.column).dataType == StringType,
          s"index ${ix.name}: only TEXT columns are indexable, " +
            s"${ix.column} is ${s.df.schema(ix.column).dataType}")
      }
    }
    val wallT0 = System.nanoTime()
    val rowCount = new java.util.concurrent.atomic.AtomicLong
    val idxCount = new java.util.concurrent.atomic.AtomicLong
    val tableFetchWait = new java.util.concurrent.atomic.AtomicLong
    val idxFetchWait = new java.util.concurrent.atomic.AtomicLong
    val idxSortWait = new java.util.concurrent.atomic.AtomicLong
    val pf = new PageFile(path)
    try {
      pf.reservePage1()
      // master rows: (type, name, tbl_name, rootpage, sql) — table row
      // then its index rows, in creation order like SQLite itself
      val master = ArrayBuffer.empty[Seq[Any]]
      specs.foreach { spec =>
        if (spec.indexes.isEmpty) {
          import scala.jdk.CollectionConverters._
          val root = writeTable(pf, spec.df.toLocalIterator().asScala
            .map { r => rowCount.incrementAndGet(); r })
          master += Seq("table", spec.name, spec.name, root, spec.ddl)
        } else {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration._
          import scala.jdk.CollectionConverters._
          // dedicated cached pool for the sort futures and partition
          // prefetch: they BLOCK on Spark job waits, and blocking the
          // shared global fork-join pool can starve it (K indexes ≥ its
          // parallelism would queue the prefetch behind the sorts and
          // serialize the very work the futures exist to overlap)
          val pool = java.util.concurrent.Executors.newCachedThreadPool(
            (r: Runnable) => { val t = new Thread(r, "sqlite-sink"); t.setDaemon(true); t })
          implicit val sinkEc: ExecutionContext = ExecutionContext.fromExecutorService(pool)
          val sc = spec.df.sparkSession.sparkContext
          // all of this spec's jobs (sorts, prefetch) run under one job
          // group, so the error path can CANCEL them instead of letting K
          // corpus-scale sorts run to completion after the export already
          // failed. Pool threads inherit the group (thread-locals copy at
          // thread creation, and the pool is created after setJobGroup).
          val group = s"sqlite-sink-${spec.name}-${java.util.UUID.randomUUID().toString.take(8)}"
          val prevGroup = sc.getLocalProperty("spark.jobGroup.id")
          val prevDesc = sc.getLocalProperty("spark.job.description")
          sc.setJobGroup(group, s"sqlite export of ${spec.name}", interruptOnCancel = false)
          // rowids must be identical between the table pass and every
          // index pass → pin them with one persisted zipWithIndex.
          // Deserialized cache: the table pass and K index passes all
          // re-read it, and Row java-serialization measured ~35% of the
          // 600k table stream; under memory pressure Spark spills the
          // cold partitions to disk (serialized) as usual.
          val withId = spec.df.rdd.zipWithIndex()
            .persist(StorageLevel.MEMORY_AND_DISK)
          // every RDD a sort future persists is registered here the moment
          // persist() is called — even when the future later dies mid-sort,
          // the cleanup in `finally` can still reach and unpersist it
          val persisted =
            new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()
          val sortedF = scala.collection.mutable.ArrayBuffer
            .empty[(IndexSpec, Future[org.apache.spark.rdd.RDD[(String, Long)]])]
          try {
            withId.count() // materialize ONCE before concurrent consumers
            // kick every index sort off NOW — Spark computes the shuffles
            // while the driver streams the table b-tree, so the sort wall
            // time hides behind the table pass instead of adding to it
            spec.indexes.foreach { ix =>
              val fi = spec.df.schema.fieldIndex(ix.column)
              sortedF += (ix -> Future {
                // Spark sorts (key, rowid) in SQLite's index order: NULL
                // first, TEXT by BINARY collation (= UTF-8 bytes = code
                // points), rowid ascending — the driver only streams
                val s = withId
                  .map { case (row, i) =>
                    (if (row.isNullAt(fi)) null else utf8Clean(row.getString(fi)), i + 1L)
                  }
                  .sortBy(identity)(IdxKeyOrdering,
                    scala.reflect.classTag[(String, Long)])
                s.persist(StorageLevel.MEMORY_AND_DISK)
                persisted.add(s)
                s.count()
                s
              })
            }
            val root = writeTable(pf,
              prefetchedLocalIterator(withId, tableFetchWait)
                .map { case (row, i) =>
                  faultInjection("table", i); rowCount.incrementAndGet(); row
                })
            master += Seq("table", spec.name, spec.name, root, spec.ddl)
            sortedF.foreach { case (ix, f) =>
              val sorted = {
                val t0 = System.nanoTime()
                val s = Await.result(f, Duration.Inf)
                idxSortWait.addAndGet(System.nanoTime() - t0)
                s
              }
              try {
                val ib = new IndexBuilder(pf)
                prefetchedLocalIterator(sorted, idxFetchWait).foreach { case (k, rid) =>
                  faultInjection("index", rid)
                  idxCount.incrementAndGet()
                  ib.add(record(Seq(k, rid)))
                }
                master += Seq("index", ix.name, spec.name, ib.finish(), ix.sql.orNull)
              } finally { sorted.unpersist(false); () }
            }
          } catch {
            case e: Throwable =>
              // fail fast AND clean: cancel this spec's in-flight jobs,
              // then bound-wait for the (now cancelled) futures to settle
              // so the finally below finds every persisted RDD; the wait
              // is bounded so a wedged job cannot delay the error forever
              try sc.cancelJobGroup(group) catch { case _: Throwable => () }
              sortedF.foreach { case (_, f) =>
                try { Await.ready(f, 30.seconds); () } catch { case _: Throwable => () }
              }
              throw e
          } finally {
            sc.setLocalProperty("spark.jobGroup.id", prevGroup)
            sc.setLocalProperty("spark.job.description", prevDesc)
            withId.unpersist()
            persisted.asScala.foreach(r =>
              try r.unpersist(false) catch { case _: Throwable => () })
            // safe now: every future has settled (success, or awaited in
            // the catch), so no completion callback can be stranded
            pool.shutdown()
          }
        }
      }
      writeMaster(pf, master.toSeq)
      pf.finishHeader()
      lastStats = Some(WriteStats(rowCount.get, idxCount.get,
        System.nanoTime() - wallT0, pf.ioNanos, tableFetchWait.get,
        idxFetchWait.get, idxSortWait.get))
    } finally pf.close()
  }

  /** Prefetch depth of [[prefetchedLocalIterator]] — how many
    * single-partition fetch jobs may be in flight while the driver packs
    * pages. Dial: `graft.sqlite.prefetch` (JVM property) /
    * `SPARK_GRAFT_SQLITE_PREFETCH` (env). Driver memory is O(depth + 1
    * partition arrays) — still the O(partition) class, scaled by a small
    * constant the deployment controls via its partition sizing.
    *
    * DEFAULT = 4, by measurement (r22, `SqliteIdxProbe ab` interleaved
    * A/B at the 600k-row b6 shape): the r22 per-rep attribution showed
    * the one-ahead pipeline PRODUCER-limited — table fetch-wait ~3.3 s
    * vs ~3.0 s of driver encode it was supposed to hide behind — because
    * each single-partition fetch job (cache read + task-result transfer)
    * takes longer than the driver's encode of the previous partition.
    * With depth 4 the independent partition jobs overlap each other as
    * well as the encode; see OPTIMIZATION_r22.md §b6 for the arm table.
    */
  private[sinks] def prefetchDepth: Int = {
    val raw = System.getProperty("graft.sqlite.prefetch",
      sys.env.getOrElse("SPARK_GRAFT_SQLITE_PREFETCH", "4"))
    // a malformed dial value must not kill an export mid-pipeline —
    // fall back to the measured default and say so once
    try math.max(1, raw.trim.toInt)
    catch { case _: NumberFormatException =>
      System.err.println(
        s"[sqlite-sink] ignoring malformed prefetch depth '$raw' — using 4")
      4
    }
  }

  /** Ordered local iterator with `depth`-partition-ahead prefetch: while
    * the driver packs partition i into b-tree pages, the jobs fetching
    * partitions i+1 .. i+depth already run (each is one independent
    * single-partition job, so production parallelizes across executor
    * cores instead of serializing behind the encode). Order is preserved
    * by awaiting futures in submission order. `RDD.toLocalIterator`
    * materializes one partition at a time with dead time between
    * partitions; this keeps O(partition)-class driver memory (at most
    * depth + 1 partition arrays in flight) and hides the fetch latency
    * behind the driver-side page building.
    */
  private[sinks] def prefetchedLocalIterator[T: scala.reflect.ClassTag](
      rdd: org.apache.spark.rdd.RDD[T],
      fetchWaitAcc: java.util.concurrent.atomic.AtomicLong = null)(
      implicit ec: scala.concurrent.ExecutionContext): Iterator[T] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    val sc = rdd.sparkContext
    val depth = prefetchDepth
    val order = rdd.partitions.indices.iterator
    def submit(p: Int): Future[Array[T]] =
      Future(sc.runJob(rdd, (it: Iterator[T]) => it.toArray, Seq(p)).head)
    new Iterator[T] {
      private val inFlight = scala.collection.mutable.Queue.empty[Future[Array[T]]]
      private def fill(): Unit =
        while (inFlight.size < depth && order.hasNext)
          inFlight.enqueue(submit(order.next()))
      fill()
      private var cur: Array[T] = Array.empty[T]
      private var i = 0
      private def advance(): Unit =
        while (i >= cur.length && inFlight.nonEmpty) {
          val t0 = System.nanoTime()
          cur = Await.result(inFlight.dequeue(), Duration.Inf)
          if (fetchWaitAcc != null)
            fetchWaitAcc.addAndGet(System.nanoTime() - t0)
          i = 0
          fill()
        }
      def hasNext: Boolean = { advance(); i < cur.length }
      def next(): T = {
        advance()
        if (i >= cur.length) throw new NoSuchElementException
        val v = cur(i); i += 1; v
      }
    }
  }

  /** Normalize a key string the way UTF-8 encoding will: `getBytes(UTF_8)`
    * encodes an unpaired surrogate as '?' (0x3F), so a key containing one
    * would sort (by code point, 0xD800-0xDFFF) differently from its stored
    * bytes and corrupt index binary-search order. Round-tripping through
    * UTF-8 applies the same replacement up front; valid UTF-16 — the only
    * thing parquet/JSON sources can produce — passes through untouched
    * (paired surrogates survive the round-trip losslessly, and the
    * surrogate scan is a cheap char-range check).
    */
  private[sinks] def utf8Clean(s: String): String = {
    var i = 0
    var hasSurrogate = false
    while (!hasSurrogate && i < s.length) {
      if (Character.isSurrogate(s.charAt(i))) hasSurrogate = true
      i += 1
    }
    if (!hasSurrogate) s else new String(s.getBytes(UTF_8), UTF_8)
  }

  /** SQLite index-record order over (key, rowid): NULLs first, then the
    * TEXT keys by BINARY collation — memcmp of the UTF-8 bytes, which
    * equals code-point order — then rowid. Code-point compare works
    * char-wise because equal prefixes keep `codePointAt` aligned.
    * Precondition: keys are valid UTF-16 (callers run [[utf8Clean]]
    * first), otherwise code-point order diverges from stored-byte order.
    */
  private[sinks] object IdxKeyOrdering extends Ordering[(String, Long)] {
    override def compare(a: (String, Long), b: (String, Long)): Int = {
      val c = (a._1, b._1) match {
        case (null, null) => 0
        case (null, _)    => -1
        case (_, null)    => 1
        case (x, y) =>
          val n = math.min(x.length, y.length)
          var i = 0
          var r = 0
          while (r == 0 && i < n) {
            if (x.charAt(i) != y.charAt(i))
              // equal prefix keeps codePointAt aligned for both strings,
              // and code-point order == UTF-8 byte order
              r = Integer.compare(x.codePointAt(i), y.codePointAt(i))
            i += 1
          }
          if (r != 0) r else Integer.compare(x.length, y.length)
      }
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  // ---- page-level file plumbing ---------------------------------------

  private[sinks] final class PageFile(path: String) {
    private val raf = new RandomAccessFile(path, "rw")
    raf.setLength(0)
    private var pages = 0
    private[sinks] var ioNanos = 0L

    def reservePage1(): Unit = { require(pages == 0); pages = 1 }

    /** Allocate the next page number, skipping the lock-byte page. */
    def allocate(): Int = {
      pages += 1
      if (pages == LockBytePage) { writePage(pages, new Array[Byte](PageSize)); pages += 1 }
      pages
    }

    def writePage(no: Int, data: Array[Byte]): Unit = {
      require(data.length == PageSize, s"page must be $PageSize bytes")
      val t0 = System.nanoTime()
      raf.seek((no - 1).toLong * PageSize)
      raf.write(data)
      ioNanos += System.nanoTime() - t0
    }

    /** Database header into the first 100 bytes of page 1 (page 1's
      * b-tree content was already written with a 100-byte hole).
      */
    def finishHeader(): Unit = {
      val h = java.nio.ByteBuffer.allocate(100)
      h.put("SQLite format 3\u0000".getBytes(UTF_8)) // 0..15
      h.putShort(PageSize.toShort)                   // 16 page size
      h.put(1.toByte).put(1.toByte)                  // 18/19 write/read version (legacy)
      h.put(0.toByte)                                // 20 reserved per page
      h.put(64.toByte).put(32.toByte).put(32.toByte) // 21-23 payload fractions
      h.putInt(1)                                    // 24 change counter
      h.putInt(pages)                                // 28 size in pages
      h.putInt(0).putInt(0)                          // 32/36 freelist
      h.putInt(1)                                    // 40 schema cookie
      h.putInt(1)                                    // 44 schema format 1
      h.putInt(0)                                    // 48 default cache
      h.putInt(0)                                    // 52 largest root (no vacuum)
      h.putInt(1)                                    // 56 text encoding UTF-8
      h.putInt(0).putInt(0).putInt(0)                // 60/64/68 user/incr-vacuum/app-id
      h.position(92)
      h.putInt(1)                                    // 92 version-valid-for = change counter
      h.putInt(3039000)                              // 96 writer library version
      raf.seek(0)
      raf.write(h.array())
    }

    def close(): Unit = raf.close()
  }

  // ---- varints, records, cells -----------------------------------------

  private def varint(v0: Long): Array[Byte] = {
    var v = v0
    if (v >= 0 && v < 128) return Array(v.toByte)
    if (v < 0 || (v >>> 56) != 0) { // 9-byte form: 8 high bytes of 7 bits + 1 low byte of 8
      val out = new Array[Byte](9)
      out(8) = (v & 0xFF).toByte
      v >>>= 8
      var i = 7
      while (i >= 0) { out(i) = ((v & 0x7F) | 0x80).toByte; v >>>= 7; i -= 1 }
      return out
    }
    val buf = ArrayBuffer.empty[Byte]
    while (v != 0) { buf.prepend((v & 0x7F).toByte); v >>>= 7 }
    var i = 0
    while (i < buf.length - 1) { buf(i) = (buf(i) | 0x80).toByte; i += 1 }
    buf.toArray
  }

  /** Spark value → (serial type, body bytes). NUMERIC-affinity parity
    * with the CSV renderer: whole doubles store as INTEGER.
    */
  private def serial(v: Any): (Long, Array[Byte]) = v match {
    case null                 => (0L, Array.empty)
    case b: Boolean           => intSerial(if (b) 1L else 0L)
    case b: Byte              => intSerial(b.toLong)
    case s: Short             => intSerial(s.toLong)
    case i: Int               => intSerial(i.toLong)
    case l: Long              => intSerial(l)
    case f: Float             => serial(f.toDouble)
    case d: Double =>
      if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) intSerial(d.toLong)
      else (7L, java.nio.ByteBuffer.allocate(8).putDouble(d).array())
    case bd: java.math.BigDecimal =>
      val stripped = bd.stripTrailingZeros
      if (stripped.scale <= 0 && stripped.precision - stripped.scale <= 18)
        intSerial(stripped.longValueExact)
      else (7L, java.nio.ByteBuffer.allocate(8).putDouble(bd.doubleValue).array())
    case bd: BigDecimal       => serial(bd.underlying)
    case s: String            => textSerial(s)
    case b: Array[Byte]       => (12L + 2L * b.length, b)
    case other                => textSerial(other.toString)
  }

  private def textSerial(s: String): (Long, Array[Byte]) = {
    val b = s.getBytes(UTF_8)
    (13L + 2L * b.length, b)
  }

  private def intSerial(v: Long): (Long, Array[Byte]) = {
    if (v == 0L) return (8L, Array.empty)
    if (v == 1L) return (9L, Array.empty)
    val width =
      if (v >= -128 && v < 128) 1
      else if (v >= -32768 && v < 32768) 2
      else if (v >= -8388608 && v < 8388608) 3
      else if (v >= Int.MinValue && v <= Int.MaxValue) 4
      else if (v >= -140737488355328L && v < 140737488355328L) 6
      else 8
    val out = new Array[Byte](width)
    var x = v
    var i = width - 1
    while (i >= 0) { out(i) = (x & 0xFF).toByte; x >>= 8; i -= 1 }
    (Seq(0, 1, 2, 3, 4, 0, 5, 0, 6)(width).toLong, out)
  }

  /** SQLite record: header (self-inclusive length varint + serial types)
    * then the value bodies. Assembled with raw arrays + arraycopy — this
    * is the per-row hot path of the whole sink, and an ArrayBuffer[Byte]
    * here boxes every payload byte (measured 2-3× the write time).
    */
  private[sinks] def record(values: Seq[Any]): Array[Byte] = {
    val parts = values.map(serial)
    val typeVarints = parts.map(p => varint(p._1))
    var tvLen = 0
    typeVarints.foreach(tvLen += _.length)
    // header length varint includes itself — fixpoint (stable in ≤ 2 steps)
    var hdrLen = tvLen + 1
    while (varint(hdrLen.toLong).length + tvLen != hdrLen)
      hdrLen = varint(hdrLen.toLong).length + tvLen
    val hv = varint(hdrLen.toLong)
    var total = hdrLen
    parts.foreach(total += _._2.length)
    val out = new Array[Byte](total)
    var off = 0
    System.arraycopy(hv, 0, out, off, hv.length); off += hv.length
    typeVarints.foreach { tv =>
      System.arraycopy(tv, 0, out, off, tv.length); off += tv.length
    }
    parts.foreach { p =>
      System.arraycopy(p._2, 0, out, off, p._2.length); off += p._2.length
    }
    out
  }

  /** How many payload bytes stay on the b-tree page (the format's K
    * formula — the reader recomputes it, so the split is not a choice).
    */
  private def localSize(p: Int, maxLocal: Int): Int =
    if (p <= maxLocal) p
    else {
      val k = MinLocal + (p - MinLocal) % (Usable - 4)
      if (k <= maxLocal) k else MinLocal
    }

  /** Local payload bytes, plus the 4-byte first-overflow-page pointer if
    * the payload spills — allocating and writing the overflow chain now
    * (page order is free). Returns `payload` itself when nothing spills
    * (the common case) — callers only read it.
    */
  private def payloadBody(pf: PageFile, payload: Array[Byte],
      maxLocal: Int): Array[Byte] = {
    val p = payload.length
    val local = localSize(p, maxLocal)
    if (local == p) return payload
    val out = new Array[Byte](local + 4)
    System.arraycopy(payload, 0, out, 0, local)
    var off = local
    var firstPage = 0
    var prev: (Int, Array[Byte]) = null
    while (off < p) {
      val no = pf.allocate()
      if (prev == null) firstPage = no
      else { // back-patch previous page's next pointer
        putInt(prev._2, 0, no); pf.writePage(prev._1, prev._2)
      }
      val page = new Array[Byte](PageSize)
      val n = math.min(Usable - 4, p - off)
      System.arraycopy(payload, off, page, 4, n)
      off += n
      prev = (no, page)
    }
    pf.writePage(prev._1, prev._2)
    putInt(out, local, firstPage)
    out
  }

  /** Leaf-table cell: varint(payload) + varint(rowid) + local payload. */
  private def leafCell(pf: PageFile, rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val v1 = varint(payload.length.toLong)
    val v2 = varint(rowid)
    val body = payloadBody(pf, payload, MaxLocal)
    val out = new Array[Byte](v1.length + v2.length + body.length)
    System.arraycopy(v1, 0, out, 0, v1.length)
    System.arraycopy(v2, 0, out, v1.length, v2.length)
    System.arraycopy(body, 0, out, v1.length + v2.length, body.length)
    out
  }

  private def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def putShort(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 8).toByte; a(off + 1) = v.toByte
  }

  private def isInterior(pageType: Int) =
    pageType == InteriorTable || pageType == InteriorIndex

  /** Render a b-tree page: cells pack downward from the page end, the
    * cell-pointer array grows up from the header. `headerAt` is 100 on
    * page 1 (database header hole), 0 elsewhere.
    */
  private def renderPage(pageType: Int, cells: Seq[Array[Byte]],
      rightMost: Int, headerAt: Int): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val interior = isInterior(pageType)
    val hdrSize = if (interior) 12 else 8
    page(headerAt) = pageType.toByte
    putShort(page, headerAt + 1, 0) // first freeblock
    putShort(page, headerAt + 3, cells.length)
    var content = PageSize
    val ptrBase = headerAt + hdrSize
    cells.zipWithIndex.foreach { case (c, i) =>
      content -= c.length
      System.arraycopy(c, 0, page, content, c.length)
      putShort(page, ptrBase + 2 * i, content)
    }
    putShort(page, headerAt + 5, content) // ≤ 4096 always fits (0⇔65536 is for 64 KiB pages)
    page(headerAt + 7) = 0 // fragmented free bytes
    if (interior) putInt(page, headerAt + 8, rightMost)
    page
  }

  // ---- table b-tree assembly -------------------------------------------

  /** Streamed rowid-table b-tree builder. Leaves flush to allocated pages
    * as they fill; `finish` stacks interior levels and places the root —
    * into `fixedRoot` (page 1 for sqlite_master, with its 100-byte
    * reserve) when given, else on a fresh page.
    */
  private[sinks] final class BTreeBuilder(pf: PageFile, fixedRoot: Option[Int]) {
    private val rootReserve = if (fixedRoot.isDefined) 100 else 0
    private var cells = ArrayBuffer.empty[Array[Byte]]
    private var rowids = ArrayBuffer.empty[Long]
    private var cellBytes = 0
    private val flushed = ArrayBuffer.empty[(Int, Long)] // (page, max rowid)

    private def leafCapacity(reserve: Int) = Usable - reserve - 8
    private def interiorCapacity(reserve: Int) = Usable - reserve - 12

    def add(rowid: Long, payload: Array[Byte]): Unit = {
      val cell = leafCell(pf, rowid, payload)
      if (cells.nonEmpty && cellBytes + 2 * cells.length + cell.length + 2 > leafCapacity(0))
        flushLeaf()
      cells += cell
      rowids += rowid
      cellBytes += cell.length
    }

    private def flushLeaf(): Unit = {
      val no = pf.allocate()
      pf.writePage(no, renderPage(LeafTable, cells.toSeq, 0, headerAt = 0))
      flushed += ((no, rowids.last))
      cells = ArrayBuffer.empty
      rowids = ArrayBuffer.empty
      cellBytes = 0
    }

    /** @return the root page number */
    def finish(): Int = {
      // root-resident leaf when everything fits one (possibly reserved) page
      if (flushed.isEmpty && cellBytes + 2 * cells.length <= leafCapacity(rootReserve)) {
        val root = fixedRoot.getOrElse(pf.allocate())
        pf.writePage(root,
          renderPage(LeafTable, cells.toSeq, 0, headerAt = rootReserve))
        return root
      }
      if (flushed.isEmpty && fixedRoot.isDefined && cells.length >= 2) {
        // narrow page-1 window: the cells fit ONE unreserved leaf but not
        // the 100-byte-reserved root. Split the last cell onto its own
        // leaf so the interior root above carries a real cell — a
        // zero-cell interior root (right-most pointer only) is what a
        // single-leaf child would force, and validators may reject it.
        val (lastCell, lastRid) = (cells.last, rowids.last)
        val headRid = rowids(rowids.length - 2)
        val n1 = pf.allocate()
        pf.writePage(n1, renderPage(LeafTable, cells.init.toSeq, 0, headerAt = 0))
        flushed += ((n1, headRid))
        val n2 = pf.allocate()
        pf.writePage(n2, renderPage(LeafTable, Seq(lastCell), 0, headerAt = 0))
        flushed += ((n2, lastRid))
        cells = ArrayBuffer.empty; rowids = ArrayBuffer.empty; cellBytes = 0
      } else if (cells.nonEmpty) flushLeaf()
      // IndexedSeq, not Seq: the chunking below indexes into the level,
      // and a List here made finish() quadratic in the leaf count
      // (measured 5.8 s of a 6.1 s 300k-row write before the fix)
      var level: IndexedSeq[(Int, Long)] = flushed.toIndexedSeq
      while (true) {
        // interior cells: 4-byte child + varint(max rowid of its subtree);
        // the level's last child rides the right-most pointer
        val interior = level.init.map { case (child, key) =>
          val v = varint(key)
          val c = new Array[Byte](4 + v.length)
          putInt(c, 0, child)
          System.arraycopy(v, 0, c, 4, v.length)
          c
        }
        val rightMost = level.last._1
        val size = interior.map(_.length + 2).sum
        if (size <= interiorCapacity(rootReserve)) {
          val root = fixedRoot.getOrElse(pf.allocate())
          pf.writePage(root,
            renderPage(InteriorTable, interior, rightMost, headerAt = rootReserve))
          return root
        }
        // chunk this level into full interior pages and stack another
        // level: group consecutive children so that each page holds all
        // of its group's cells except the last child, which rides the
        // right-most pointer
        val cellLen = level.map { case (child, key) => 4 + varint(key).length + 2 }
        val groups = ArrayBuffer.empty[Vector[Int]]
        var g = Vector.empty[Int]
        var gSum = 0 // running Σ cellLen over g — no per-element re-summation
        level.indices.foreach { i =>
          if (g.nonEmpty && gSum > interiorCapacity(0)) {
            groups += g
            g = Vector(i)
            gSum = cellLen(i)
          } else {
            g = g :+ i
            gSum += cellLen(i)
          }
        }
        groups += g
        // a trailing singleton group would render a 0-cell interior page
        // (legal only as a root) — steal the previous group's last child
        if (groups.length >= 2 && groups.last.length == 1 &&
            groups(groups.length - 2).length >= 3) {
          val prev = groups(groups.length - 2)
          groups(groups.length - 1) = Vector(prev.last, groups.last.head)
          groups(groups.length - 2) = prev.init
        }
        level = groups.toIndexedSeq.map { grp =>
          val cs = grp.init.map { j =>
            val v = varint(level(j)._2)
            val c = new Array[Byte](4 + v.length)
            putInt(c, 0, level(j)._1)
            System.arraycopy(v, 0, c, 4, v.length)
            c
          }
          val (rightPage, rightKey) = level(grp.last)
          val no = pf.allocate()
          pf.writePage(no, renderPage(InteriorTable, cs, rightPage, headerAt = 0))
          (no, rightKey)
        }
      }
      -1 // unreachable
    }
  }

  // ---- index b-tree assembly -------------------------------------------

  /** Streamed index b-tree bulk loader. Entries MUST arrive in index
    * order ((key, rowid) under the indexed column's collation — the
    * caller sorts in Spark). Unlike table b-trees, interior index pages
    * hold real entries: when a page fills, its LAST buffered entry is
    * promoted to the parent as the separator (left child = the flushed
    * page), so every entry lives on exactly one page and the tree has
    * uniform depth. Buffers hold payload records, not rendered cells, so
    * overflow chains are only allocated for the page an entry finally
    * lands on — nothing is orphaned. Driver memory: O(page) per level.
    */
  private final class IndexBuilder(pf: PageFile) {
    // level 0 = leaves; item = (left-child page (unused at leaf), payload)
    private val levels = ArrayBuffer(ArrayBuffer.empty[(Int, Array[Byte])])
    private val levelBytes = ArrayBuffer(0)

    private def cellLen(interior: Boolean, p: Int): Int = {
      val local = localSize(p, MaxLocalIdx)
      (if (interior) 4 else 0) + varint(p.toLong).length + local +
        (if (local < p) 4 else 0)
    }
    private def capacity(interior: Boolean) = Usable - (if (interior) 12 else 8)

    def add(payload: Array[Byte]): Unit = insert(0, 0, payload)

    private def insert(li: Int, child: Int, payload: Array[Byte]): Unit = {
      if (li == levels.length) { levels += ArrayBuffer.empty; levelBytes += 0 }
      val interior = li > 0
      val cl = cellLen(interior, payload.length)
      val items = levels(li)
      if (items.nonEmpty &&
          levelBytes(li) + cl + 2 * (items.length + 1) > capacity(interior)) {
        // flush all but the last buffered entry; the last entry becomes
        // the parent separator (its child, if interior, becomes the
        // flushed page's right-most pointer)
        require(items.length >= 2, "index cell too large for a page pair")
        val (promChild, promPayload) = items.remove(items.length - 1)
        val page = writeLevelPage(items.toSeq, interior,
          rightMost = if (interior) promChild else 0)
        items.clear()
        levelBytes(li) = 0
        items += ((child, payload))
        levelBytes(li) += cl
        insert(li + 1, page, promPayload)
      } else {
        items += ((child, payload))
        levelBytes(li) += cl
      }
    }

    private def writeLevelPage(items: Seq[(Int, Array[Byte])],
        interior: Boolean, rightMost: Int): Int = {
      val cells = items.map { case (ch, p) =>
        val v = varint(p.length.toLong)
        val body = payloadBody(pf, p, MaxLocalIdx)
        val childLen = if (interior) 4 else 0
        val c = new Array[Byte](childLen + v.length + body.length)
        if (interior) putInt(c, 0, ch)
        System.arraycopy(v, 0, c, childLen, v.length)
        System.arraycopy(body, 0, c, childLen + v.length, body.length)
        c
      }
      val no = pf.allocate()
      pf.writePage(no, renderPage(
        if (interior) InteriorIndex else LeafIndex, cells, rightMost, headerAt = 0))
      no
    }

    /** @return the root page number */
    def finish(): Int = {
      // bottom-up: the finished page at each level rides the level
      // above's right-most pointer; every level buffer holds ≥ 1 entry
      // by construction (a level only exists once something promoted
      // into it, and flushes refill immediately)
      var child = writeLevelPage(levels(0).toSeq, interior = false, rightMost = 0)
      var li = 1
      while (li < levels.length) {
        child = writeLevelPage(levels(li).toSeq, interior = true, rightMost = child)
        li += 1
      }
      child
    }
  }

  /** Stream rows into a fresh table b-tree; returns its root. */
  private def writeTable(pf: PageFile, rows: Iterator[org.apache.spark.sql.Row]): Int = {
    val b = new BTreeBuilder(pf, fixedRoot = None)
    var rowid = 0L
    while (rows.hasNext) {
      val row = rows.next()
      rowid += 1
      b.add(rowid, record(Seq.tabulate(row.length)(row.get)))
    }
    b.finish()
  }

  /** sqlite_master rooted on page 1: one row per table/index —
    * (type, name, tbl_name, rootpage, sql).
    */
  private def writeMaster(pf: PageFile, rows: Seq[Seq[Any]]): Unit = {
    val b = new BTreeBuilder(pf, fixedRoot = Some(1))
    rows.zipWithIndex.foreach { case (r, i) => b.add(i + 1L, record(r)) }
    b.finish()
  }
}
