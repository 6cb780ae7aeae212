package graft.sinks

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Dependency-free SQLite 3 database writer — the reference's direct
  * `sqlite.db` load (K3): "A `sqlite.db` is created in the output
  * directory where each csv file is put in its own table"
  * (`/root/reference/docs/outputs.md:42`, CLI `--sqlite`).
  *
  * Implements the subset of the public SQLite file format
  * (sqlite.org/fileformat2.html) a table forest needs: rowid table
  * b-trees (leaf type 0x0d, interior type 0x05), record serial types,
  * payload overflow chains, the lock-byte page gap, and the
  * `sqlite_master` catalog rooted on page 1. No journals, freelists,
  * indexes, or vacuum state — the file is written once, linearly, and
  * opens in any SQLite client.
  *
  * Scale posture: SQLite is a single-file driver-side interchange format
  * by nature (the reference also streams into one .db). Rows stream
  * through `toLocalIterator` one partition at a time, leaf pages flush
  * as they fill, and driver memory is O(one page) + O(one (page, rowid)
  * entry per flushed page) for the interior levels — a 100 GB export
  * never holds more than a page of row data. The distributed layouts
  * remain parquet / CSV-dir; this sink serves the reference's primary
  * export format.
  *
  * Value affinity mirrors the CSV renderer and SQLite NUMERIC affinity:
  * whole doubles land as INTEGER (JSON `1.0` → `1`), booleans as 0/1,
  * everything non-numeric as TEXT.
  */
object SqliteSink {

  private val PageSize = 4096
  private val Usable = PageSize // reserved-space byte in the header is 0
  private val MaxLocal = Usable - 35 // leaf table cell local-payload cap
  private val MinLocal = (Usable - 12) * 32 / 255 - 23
  /** Page overlapping file offset 2^30 is the lock-byte page — must stay unused. */
  private val LockBytePage = 1073741824 / PageSize + 1

  /** Write `tables` (name → DataFrame, plus the CREATE TABLE text stored
    * in sqlite_master) into a single SQLite database file at `path`.
    */
  def write(tables: Seq[(String, DataFrame)], path: String,
      ddlFor: String => String): Unit = {
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(path).toAbsolutePath.getParent)
    val pf = new PageFile(path)
    try {
      pf.reservePage1()
      val entries = tables.map { case (name, df) =>
        val root = writeTable(pf, df)
        (name, root, ddlFor(name))
      }
      writeMaster(pf, entries)
      pf.finishHeader()
    } finally pf.close()
  }

  // ---- page-level file plumbing ---------------------------------------

  private final class PageFile(path: String) {
    private val raf = new RandomAccessFile(path, "rw")
    raf.setLength(0)
    private var pages = 0

    def reservePage1(): Unit = { require(pages == 0); pages = 1 }

    /** Allocate the next page number, skipping the lock-byte page. */
    def allocate(): Int = {
      pages += 1
      if (pages == LockBytePage) { writePage(pages, new Array[Byte](PageSize)); pages += 1 }
      pages
    }

    def writePage(no: Int, data: Array[Byte]): Unit = {
      require(data.length == PageSize, s"page must be $PageSize bytes")
      raf.seek((no - 1).toLong * PageSize)
      raf.write(data)
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
    * then the value bodies.
    */
  private[sinks] def record(values: Seq[Any]): Array[Byte] = {
    val parts = values.map(serial)
    val typeVarints = parts.map(p => varint(p._1))
    val tvLen = typeVarints.map(_.length).sum
    // header length varint includes itself — fixpoint (stable in ≤ 2 steps)
    var hdrLen = tvLen + 1
    while (varint(hdrLen.toLong).length + tvLen != hdrLen)
      hdrLen = varint(hdrLen.toLong).length + tvLen
    val out = ArrayBuffer.empty[Byte]
    out ++= varint(hdrLen.toLong)
    typeVarints.foreach(out ++= _)
    parts.foreach(out ++= _._2)
    out.toArray
  }

  /** Leaf-table cell for (rowid, payload), spilling to overflow pages per
    * the format's K formula (the reader recomputes K from the payload
    * size, so the local/overflow split is not a choice).
    */
  private def leafCell(pf: PageFile, rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val p = payload.length
    val local =
      if (p <= MaxLocal) p
      else {
        val k = MinLocal + (p - MinLocal) % (Usable - 4)
        if (k <= MaxLocal) k else MinLocal
      }
    val cell = ArrayBuffer.empty[Byte]
    cell ++= varint(p.toLong)
    cell ++= varint(rowid)
    cell ++= payload.take(local)
    if (local < p) {
      // overflow chain: allocate and write pages now (page order is free)
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
      cell ++= java.nio.ByteBuffer.allocate(4).putInt(firstPage).array()
    }
    cell.toArray
  }

  private def putInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def putShort(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 8).toByte; a(off + 1) = v.toByte
  }

  /** Render a b-tree page: cells pack downward from the page end, the
    * cell-pointer array grows up from the header. `headerAt` is 100 on
    * page 1 (database header hole), 0 elsewhere.
    */
  private def renderPage(leaf: Boolean, cells: Seq[Array[Byte]],
      rightMost: Int, headerAt: Int): Array[Byte] = {
    val page = new Array[Byte](PageSize)
    val hdrSize = if (leaf) 8 else 12
    page(headerAt) = if (leaf) 0x0d else 0x05
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
    if (!leaf) putInt(page, headerAt + 8, rightMost)
    page
  }

  // ---- b-tree assembly --------------------------------------------------

  /** Streamed rowid-table b-tree builder. Leaves flush to allocated pages
    * as they fill; `finish` stacks interior levels and places the root —
    * into `fixedRoot` (page 1 for sqlite_master, with its 100-byte
    * reserve) when given, else on a fresh page.
    */
  private final class BTreeBuilder(pf: PageFile, fixedRoot: Option[Int]) {
    private val rootReserve = if (fixedRoot.isDefined) 100 else 0
    private var cells = ArrayBuffer.empty[Array[Byte]]
    private var cellBytes = 0
    private var maxRowid = 0L
    private val flushed = ArrayBuffer.empty[(Int, Long)] // (page, max rowid)

    private def leafCapacity(reserve: Int) = Usable - reserve - 8
    private def interiorCapacity(reserve: Int) = Usable - reserve - 12

    def add(rowid: Long, payload: Array[Byte]): Unit = {
      val cell = leafCell(pf, rowid, payload)
      if (cells.nonEmpty && cellBytes + 2 * cells.length + cell.length + 2 > leafCapacity(0))
        flushLeaf()
      cells += cell
      cellBytes += cell.length
      maxRowid = rowid
    }

    private def flushLeaf(): Unit = {
      val no = pf.allocate()
      pf.writePage(no, renderPage(leaf = true, cells.toSeq, 0, headerAt = 0))
      flushed += ((no, maxRowid))
      cells = ArrayBuffer.empty
      cellBytes = 0
    }

    /** @return the root page number */
    def finish(): Int = {
      // root-resident leaf when everything fits one (possibly reserved) page
      if (flushed.isEmpty && cellBytes + 2 * cells.length <= leafCapacity(rootReserve)) {
        val root = fixedRoot.getOrElse(pf.allocate())
        pf.writePage(root,
          renderPage(leaf = true, cells.toSeq, 0, headerAt = rootReserve))
        return root
      }
      if (cells.nonEmpty) flushLeaf()
      var level: Seq[(Int, Long)] = flushed.toSeq
      while (true) {
        // interior cells: 4-byte child + varint(max rowid of its subtree);
        // the level's last child rides the right-most pointer
        val interior = level.init.map { case (child, key) =>
          val c = ArrayBuffer.empty[Byte]
          c ++= java.nio.ByteBuffer.allocate(4).putInt(child).array()
          c ++= varint(key)
          c.toArray
        }
        val rightMost = level.last._1
        val size = interior.map(_.length + 2).sum
        if (size <= interiorCapacity(rootReserve)) {
          val root = fixedRoot.getOrElse(pf.allocate())
          pf.writePage(root,
            renderPage(leaf = false, interior, rightMost, headerAt = rootReserve))
          return root
        }
        // chunk this level into full interior pages and stack another
        // level: group consecutive children so that each page holds all
        // of its group's cells except the last child, which rides the
        // right-most pointer
        val cellLen = level.map { case (child, key) => 4 + varint(key).length + 2 }
        val groups = ArrayBuffer.empty[Vector[Int]]
        var g = Vector.empty[Int]
        level.indices.foreach { i =>
          val cand = g :+ i
          if (cand.length >= 2 &&
              cand.init.map(cellLen).sum > interiorCapacity(0)) {
            groups += g
            g = Vector(i)
          } else g = cand
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
        level = groups.toSeq.map { grp =>
          val cs = grp.init.map { j =>
            val c = ArrayBuffer.empty[Byte]
            c ++= java.nio.ByteBuffer.allocate(4).putInt(level(j)._1).array()
            c ++= varint(level(j)._2)
            c.toArray
          }
          val (rightPage, rightKey) = level(grp.last)
          val no = pf.allocate()
          pf.writePage(no, renderPage(leaf = false, cs, rightPage, headerAt = 0))
          (no, rightKey)
        }
      }
      -1 // unreachable
    }
  }

  /** Stream one DataFrame into a fresh table b-tree; returns its root. */
  private def writeTable(pf: PageFile, df: DataFrame): Int = {
    val b = new BTreeBuilder(pf, fixedRoot = None)
    var rowid = 0L
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      rowid += 1
      b.add(rowid, record(Seq.tabulate(row.length)(row.get)))
    }
    b.finish()
  }

  /** sqlite_master rooted on page 1: one row per table —
    * (type, name, tbl_name, rootpage, sql).
    */
  private def writeMaster(pf: PageFile, entries: Seq[(String, Int, String)]): Unit = {
    val b = new BTreeBuilder(pf, fixedRoot = Some(1))
    entries.zipWithIndex.foreach { case ((name, root, sql), i) =>
      b.add(i + 1L, record(Seq("table", name, name, root, sql)))
    }
    b.finish()
  }
}
