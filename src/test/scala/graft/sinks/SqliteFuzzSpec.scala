package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.{Row, types => T}
import scala.sys.process._
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

/** Property-fuzz of the hand-rolled SQLite record / varint / overflow /
  * b-tree layer: random typed rows (unicode incl. astral planes, NaN/±Inf
  * doubles, huge/negative decimals, nulls, payload sizes straddling the
  * MaxLocal/MinLocal overflow boundaries) are written through the sink
  * and read back through Python's stdlib `sqlite3` — the real SQLite C
  * library — value by value, with `PRAGMA integrity_check` on every file
  * (which also verifies every index entry against its table row, i.e.
  * the Spark-side key sort matches SQLite's own record comparator).
  */
class SqliteFuzzSpec extends AnyFunSuite {

  lazy val spark = graft.TestSpark.spark

  private def py(db: String, code: String): String =
    Seq("python3", "-c",
      s"""import sqlite3, base64, struct\ncon = sqlite3.connect("$db")\n$code""").!!.trim

  private def integrityOk(db: String): Unit =
    assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok")

  /** Drive scalacheck Gens with fixed seeds (deterministic, no bridge). */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(30), Seed(4242L + i)))
    }

  // ---- value generators -------------------------------------------------

  private val weirdChar: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("é", "Ａ", "中", "🎉", "ß", " ", "\t", "\"", "\\", "'"),
    2 -> Gen.chooseNum(0x10000, 0x10FFF).map(cp => new String(Character.toChars(cp))))

  private val strGen: Gen[String] = for {
    len <- Gen.frequency(
      4 -> Gen.chooseNum(0, 40),
      1 -> Gen.oneOf(488, 489, 490, 4055, 4060, 4061, 4062, 4090, 4093, 8185, 9000))
    pre <- Gen.listOfN(math.min(len, 12), weirdChar)
  } yield pre.mkString + ("x" * math.max(0, len - pre.length))

  private val longGen: Gen[Long] = Gen.frequency(
    3 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
    2 -> Gen.oneOf(0L, 1L, -1L, 2L, 127L, 128L, -128L, -129L, 32767L, 32768L,
      8388607L, 8388608L, Int.MaxValue.toLong, Int.MaxValue + 1L,
      140737488355327L, 140737488355328L, Long.MinValue, Long.MaxValue))

  private val doubleGen: Gen[Double] = Gen.frequency(
    3 -> Gen.chooseNum(-1e9, 1e9),
    2 -> Gen.oneOf(0.0, -0.0, 1.5, -2.25, math.Pi, 1e15, -1e15, 999999999999999.0,
      1e16, -1e300, Double.MinPositiveValue, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.NaN))

  private val blobGen: Gen[Array[Byte]] = for {
    len <- Gen.frequency(3 -> Gen.chooseNum(0, 60), 1 -> Gen.oneOf(489, 4061, 4070))
    b <- Gen.listOfN(math.min(len, 16), Gen.chooseNum(-128, 127).map(_.toByte))
  } yield (b ++ Seq.fill(math.max(0, len - b.length))(0x5a.toByte)).toArray

  private val decGen: Gen[java.math.BigDecimal] = Gen.oneOf(
    "0", "42", "-7", "1.23", "-99999999999999999999.5",
    "1234567890123456789012345678.123", "-0.0000000001", "999999999999999999",
    "0.5000000000").map(s => new java.math.BigDecimal(s).setScale(10))

  private case class ColSpec(dt: T.DataType, gen: Gen[Any])
  private val colSpecs: Seq[ColSpec] = Seq(
    ColSpec(T.StringType, strGen),
    ColSpec(T.LongType, longGen),
    ColSpec(T.DoubleType, doubleGen),
    ColSpec(T.BinaryType, blobGen),
    ColSpec(T.BooleanType, Gen.oneOf(true, false)),
    ColSpec(T.IntegerType, Gen.chooseNum(Int.MinValue, Int.MaxValue)),
    ColSpec(T.DecimalType(38, 10), decGen))

  private def nullable(g: Gen[Any]): Gen[Any] =
    Gen.frequency(1 -> Gen.const(null), 5 -> g)

  // ---- the exact affinity contract `serial` implements ------------------

  private def hexBits(d: Double): String =
    f"${java.lang.Double.doubleToLongBits(d)}%016x"

  private def canon(v: Any): String = v match {
    case null       => "N"
    case b: Boolean => "I" + (if (b) 1 else 0)
    case i: Int     => "I" + i.toLong
    case l: Long    => "I" + l
    case d: Double =>
      if (d.isNaN) "NaN"
      else if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15) "I" + d.toLong
      else "F" + hexBits(d)
    case bd: java.math.BigDecimal =>
      val s = bd.stripTrailingZeros
      if (s.scale <= 0 && s.precision - s.scale <= 18) "I" + s.longValueExact
      else "F" + hexBits(bd.doubleValue)
    case s: String      => "S" + s
    case b: Array[Byte] => "B" + b.map(x => f"${x & 0xff}%02x").mkString
    case other          => fail(s"unexpected generated type $other")
  }

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(UTF_8))

  test("fuzz: random typed rows + a string index round-trip through real sqlite3") {
    val tableGen: Gen[(Seq[ColSpec], Seq[Seq[Any]])] = for {
      nExtra <- Gen.chooseNum(0, 5)
      extras <- Gen.listOfN(nExtra, Gen.oneOf(colSpecs))
      cols = colSpecs.head +: extras // c0 is always the indexed TEXT column
      nRows <- Gen.chooseNum(1, 35)
      rows <- Gen.listOfN(nRows, Gen.sequence[Seq[Any], Any](cols.map(c => nullable(c.gen))))
    } yield (cols, rows)

    forAllSeeded(tableGen, 6) { case (cols, rows) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_fuzz").toString
      val db = s"$dir/f.db"
      val schema = T.StructType(cols.zipWithIndex.map { case (c, i) =>
        T.StructField(s"c$i", c.dt, nullable = true)
      })
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row.fromSeq(r)): _*), schema)
      val colList = cols.indices.map(i => s""""c$i"""").mkString(", ")
      SqliteSink.writeSpecs(Seq(SqliteSink.TableSpec(
        "t", df, s"""CREATE TABLE "t"($colList)""",
        Seq(SqliteSink.IndexSpec("idx_t_c0", "c0", unique = false,
          Some("""CREATE INDEX "idx_t_c0" ON "t"("c0")"""))))), db)
      // integrity_check probes every index entry against its table row —
      // a mis-sorted index or broken record fails here
      integrityOk(db)
      // cell-by-cell value parity, base64-armored so unicode never goes
      // through shell or JSON escaping
      val got = py(db,
        """
          |def canon(v):
          |    if v is None: return "N"
          |    if isinstance(v, bytes): return "B" + v.hex()
          |    if isinstance(v, int): return "I" + str(v)
          |    if isinstance(v, float):
          |        if v != v: return "NaN"
          |        return "F" + struct.pack('>d', v).hex()
          |    return "S" + v
          |rows = con.execute('SELECT * FROM "t" ORDER BY rowid').fetchall()
          |print("|".join(",".join(base64.b64encode(canon(v).encode()).decode() for v in r) for r in rows))
          |""".stripMargin)
      val want = rows.map(r => r.map(v => b64(canon(v))).mkString(",")).mkString("|")
      assert(got == want)
      // an exact-key probe rides the index (binary-searching the b-tree we
      // laid out) and must agree with a driver-side count
      rows.flatMap(r => Option(r.head)).headOption.foreach { k =>
        val kStr = k.asInstanceOf[String]
        val n = rows.count(r => r.head == kStr)
        val viaIdx = py(db,
          s"""key = base64.b64decode("${b64(kStr)}").decode()
             |print(con.execute('SELECT count(*) FROM "t" INDEXED BY idx_t_c0 WHERE c0 = ?', (key,)).fetchone()[0])
             |""".stripMargin)
        assert(viaIdx == n.toString, s"index probe for $kStr")
      }
    }
  }

  test("payload sizes straddling every local/overflow boundary round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzz_bound").toString
    val db = s"$dir/b.db"
    // single-column records put the payload length in direct control:
    // table-leaf MaxLocal is 4061, MinLocal 489, overflow stride 4092 —
    // cover ± a few bytes around each, plus multi-overflow-page sizes
    val lens = (Seq(0, 1, 2, 487, 488, 489, 490, 491) ++
      (4055 to 4070) ++ (4085 to 4098) ++ (8145 to 8160) ++ Seq(12270, 12285, 20000)).distinct
    val text = lens.zipWithIndex.map { case (l, i) => (i + 1L, "x" * l) }.toDF("id", "s")
    val blob = lens.zipWithIndex.map { case (l, i) =>
      (i + 1L, Array.fill[Byte](l)(0x42.toByte)) }.toDF("id", "b")
    SqliteSink.write(Seq("t" -> text, "bl" -> blob), db,
      n => s"""CREATE TABLE "$n"("id" NUMERIC, "v")""")
    integrityOk(db)
    val gotT = py(db, """print(",".join(str(r[0]) for r in con.execute('SELECT length(v) FROM "t" ORDER BY rowid')))""")
    val gotB = py(db, """print(",".join(str(r[0]) for r in con.execute('SELECT length(v) FROM "bl" ORDER BY rowid')))""")
    assert(gotT == lens.mkString(","))
    assert(gotB == lens.mkString(","))
    // content, not just length: deep bytes of the longest overflow chain
    assert(py(db, """print(con.execute('SELECT substr(v, 19990, 11) FROM "t" WHERE id = %d').fetchone()[0])""".format(lens.length))
      == "x" * 11)
  }

  test("zero-column record is the 1-byte header sqlite expects") {
    assert(SqliteSink.record(Nil).toSeq == Seq(1.toByte))
  }

  test("utf8Clean pins index-key order to the stored UTF-8 bytes (lone surrogates)") {
    // valid UTF-16 passes through by reference — no allocation on the hot path
    val plain = "ordinary key"
    assert(SqliteSink.utf8Clean(plain) eq plain)
    val paired = "emoji 😀 pair" // U+1F600, survives the round-trip
    assert(SqliteSink.utf8Clean(paired) == paired)
    // a lone surrogate encodes as '?' (0x3F) in UTF-8; the clean applies
    // the same replacement up front so compare order == stored-byte order
    val lone = "a\uD800b"
    assert(SqliteSink.utf8Clean(lone) == "a?b")
    // without the clean, U+D800 would sort AFTER 'z' by code point while
    // its stored byte 0x3F sorts BEFORE — the corruption the guard
    // prevents. With it, ordering and stored bytes agree:
    val keys = Seq(lone, "az", "a!", "a~", paired, plain).map(SqliteSink.utf8Clean)
    val byOrdering = keys.map((_, 1L)).sorted(SqliteSink.IdxKeyOrdering).map(_._1)
    val byBytes = keys.sortWith { (x, y) =>
      val a = x.getBytes(UTF_8); val b = y.getBytes(UTF_8)
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n && a(i) == b(i)) i += 1
      if (i < n) (a(i) & 0xFF) < (b(i) & 0xFF) else a.length < b.length
    }
    assert(byOrdering == byBytes)
  }

  test("index key ordering matches SQLite BINARY collation on adversarial strings") {
    // U+FF21 (3 UTF-8 bytes) vs U+10400 (4 bytes, UTF-16 surrogates sort
    // LOWER than U+FF21 in code-unit order — the classic divergence)
    val keys = Seq("𐐀", "Ａ", "b", "a", "", "aa", "é", "z", null)
    val sorted = keys.map(k => (k, 1L)).sorted(SqliteSink.IdxKeyOrdering).map(_._1)
    assert(sorted == Seq(null, "", "a", "aa", "b", "z", "é", "Ａ", "𐐀"))
  }
}
