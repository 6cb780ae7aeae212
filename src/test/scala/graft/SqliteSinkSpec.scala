package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.sys.process._
import graft.sinks.SqliteSink

/** The dependency-free SQLite writer is validated by an INDEPENDENT
  * reader: every assertion goes through Python's stdlib `sqlite3` (the
  * real SQLite C library), including `PRAGMA integrity_check` — so the
  * specs prove the emitted bytes are a database any SQLite client opens,
  * not merely something our own code can round-trip.
  */
class SqliteSinkSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Run a python snippet against `db` and return its stdout, trimmed. */
  private def py(db: String, code: String): String =
    Seq("python3", "-c",
      s"""import sqlite3, json\ncon = sqlite3.connect("$db")\n$code""").!!.trim

  test("basic.json flattens into a valid sqlite.db matching the reference goldens") {
    val out = java.nio.file.Files.createTempDirectory("graft_sqlite").toString
    val docs = graft.sources.JsonInput.jsonArray(spark,
      "/root/reference/fixtures/basic.json")
    graft.api.Flatten.flattenToDir(docs, out, graft.model.FlattenOptions(),
      csv = false, sqliteDb = true)
    val db = s"$out/sqlite.db"
    assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok")
    assert(py(db, """print(json.dumps(sorted(r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='table'"))))""")
      == """["developer", "main", "platforms"]""")
    // row contents match fixtures/basic_expected/csv/*.csv (golden parity);
    // NUMERIC affinity: JSON 1.0 ids land as INTEGER 1
    assert(py(db, """print(json.dumps(con.execute('SELECT "_link","id","title","releaseDate","rating_code","rating_name" FROM "main" ORDER BY rowid').fetchall()))""")
      == """[["0", 1, "A Game", "2015-01-01", "E", "Everyone"], ["1", 2, "B Game", "2016-01-01", "E", "Everyone"]]""")
    assert(py(db, """print(json.dumps(con.execute('SELECT "_link","_link_main","name" FROM "platforms" ORDER BY rowid').fetchall()))""")
      == """[["0.platforms.0", "0", "PC"], ["1.platforms.0", "1", "Xbox"], ["1.platforms.1", "1", "Playstation"]]""")
    assert(py(db, """print(json.dumps(con.execute('SELECT "_link","_link_main","name" FROM "developer" ORDER BY rowid').fetchall()))""")
      == """[["0.developer.0", "0", "deva"], ["1.developer.0", "1", "devb"]]""")
    // the stored CREATE text is executable DDL (sqlite itself parsed it to
    // answer the queries above) and names the lowercased columns
    assert(py(db, """print(con.execute("SELECT sql FROM sqlite_master WHERE name='main'").fetchone()[0].splitlines()[0])""")
      == """CREATE TABLE "main"(""")
    // FK constraints: child tables declare _link_main → main(_link)
    // (reference: "SQLite export has indexes and foreign key contraints",
    // docs/changelog.md:222) and the data satisfies them
    assert(py(db, """print(json.dumps(con.execute("PRAGMA foreign_key_list('platforms')").fetchall()))""")
      == """[[0, 0, "main", "_link_main", "_link", "NO ACTION", "NO ACTION", "NONE"]]""")
    assert(py(db, """print(json.dumps(con.execute("PRAGMA foreign_key_check").fetchall()))""") == "[]")
    // indexes: unique on each table's _link (the FK parent key) + one per
    // _link_<t> column, present in sqlite_master and actually used
    assert(py(db, """print(json.dumps(sorted(r[0] for r in con.execute("SELECT name FROM sqlite_master WHERE type='index'"))))""")
      == """["idx_developer__link", "idx_developer__link_main", "idx_main__link", "idx_platforms__link", "idx_platforms__link_main"]""")
    assert(py(db, """print(con.execute('EXPLAIN QUERY PLAN SELECT name FROM "platforms" WHERE "_link_main" = \'1\'').fetchone()[3])""")
      .contains("USING INDEX idx_platforms__link_main"))
    assert(py(db, """print(con.execute('EXPLAIN QUERY PLAN SELECT * FROM "main" WHERE "_link" = \'0\'').fetchone()[3])""")
      .contains("USING INDEX idx_main__link"))
    // indexed lookups return the right rows (the b-tree content is sorted
    // the way SQLite's binary search expects)
    assert(py(db, """print(json.dumps(sorted(r[0] for r in con.execute('SELECT name FROM "platforms" WHERE "_link_main" = \'1\''))))""")
      == """["Playstation", "Xbox"]""")
  }

  test("multi-level index b-trees: 20k keyed rows, lookups and full scans agree") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite_idx").toString
    val db = s"$dir/idx.db"
    // zero-padded keys so string order == numeric order; ~40-byte index
    // records → far more than one leaf, at least one interior index level
    val rows = (1 to 20000).map(i => (f"key_$i%08d", s"payload_$i", i.toLong))
    val docs = rows.toDF("k", "p", "n")
    SqliteSink.writeSpecs(Seq(SqliteSink.TableSpec(
      "docs", docs,
      """CREATE TABLE "docs"("k" TEXT, "p" TEXT, "n" NUMERIC)""",
      Seq(SqliteSink.IndexSpec("idx_docs_k", "k", unique = true,
        Some("""CREATE UNIQUE INDEX "idx_docs_k" ON "docs"("k")"""))))), db)
    assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok")
    // integrity_check already probes every table row against the index;
    // also drive real queries through it
    assert(py(db, """print(con.execute('SELECT p FROM "docs" WHERE k = \'key_00013579\'').fetchone()[0])""")
      == "payload_13579")
    assert(py(db, """print(con.execute('SELECT count(*) FROM "docs" WHERE k BETWEEN \'key_00010000\' AND \'key_00010999\'').fetchone()[0])""")
      == "1000")
    assert(py(db, """print(con.execute('EXPLAIN QUERY PLAN SELECT p FROM "docs" WHERE k = \'x\'').fetchone()[3])""")
      .contains("USING INDEX idx_docs_k"))
    // the index b-tree really has interior pages (0x02), not one giant leaf
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(db))
    val pageTypes = (1 until bytes.length / 4096).map(p => bytes(p * 4096) & 0xff)
    assert(pageTypes.contains(0x02), "expected an interior index page")
  }

  test("deep index b-trees: long keys force multi-level interior promotion") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite_deep").toString
    val db = s"$dir/deep.db"
    // ~300-byte keys → ~12 entries per index leaf and ~12 per interior
    // page → 20k entries need 3+ levels, so entries promote through an
    // interior level into a higher one (the 20k short-key test only ever
    // builds one interior level)
    val rows = (1 to 20000).map(i => (f"k$i%08d" + "x" * 290, i.toLong))
    val docs = rows.toDF("k", "n")
    SqliteSink.writeSpecs(Seq(SqliteSink.TableSpec(
      "d", docs, """CREATE TABLE "d"("k" TEXT, "n" NUMERIC)""",
      Seq(SqliteSink.IndexSpec("idx_d_k", "k", unique = true,
        Some("""CREATE UNIQUE INDEX "idx_d_k" ON "d"("k")"""))))), db)
    assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok")
    assert(py(db, """print(con.execute('SELECT n FROM "d" WHERE k = ?', ("k00000042" + "x"*290,)).fetchone()[0])""")
      == "42")
    assert(py(db, """print(con.execute('SELECT count(*) FROM "d" WHERE k BETWEEN \'k00010000\' AND \'k00010999z\'').fetchone()[0])""")
      == "1000")
    // ≥ 2 interior index levels really exist: at 12-ish fanout the root
    // cannot sit directly over the leaves
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(db))
    val interiorIdx = (1 until bytes.length / 4096)
      .count(p => (bytes(p * 4096) & 0xff) == 0x02)
    assert(interiorIdx > 20, s"expected a deep interior index layer, got $interiorIdx pages")
  }

  test("page-1 master b-tree sizes across the reserved-root boundary stay valid") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite_p1").toString
    val one = Seq((1L, "v")).toDF("id", "v")
    // two master rows whose total lands below, inside, and above the
    // 100-byte-reserved page-1 window (~3989..4088 content bytes): below
    // → root-resident leaf, inside → the split path (two leaves + a real
    // interior cell — never a zero-cell interior root), above → normal
    // multi-leaf build. DDL stays valid SQL via a trailing -- comment.
    for (pad <- Seq(1500, 1900, 1950, 1980, 2000, 2020, 2060, 2400)) {
      val db = s"$dir/p$pad.db"
      def ddl(n: String) =
        s"""CREATE TABLE "$n"("id" NUMERIC, "v" TEXT) -- ${"x" * pad}"""
      SqliteSink.write(Seq("a" -> one, "b" -> one), db, ddl)
      assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok",
        s"pad=$pad")
      assert(py(db, """print(con.execute('SELECT count(*) FROM "b"').fetchone()[0])""") == "1",
        s"pad=$pad")
      assert(py(db, s"""print(len(con.execute("SELECT sql FROM sqlite_master WHERE name='b'").fetchone()[0]))""")
        == ddl("b").length.toString, s"pad=$pad")
    }
    // single giant master row (one table, DDL local payload in the window
    // where even alone it cannot fit the reserved root): the root becomes
    // an interior page with only a right-most child — SQLite's own
    // balance_deeper produces the same shape — and must still verify
    for (pad <- Seq(3940, 3980, 4010)) {
      val db = s"$dir/g$pad.db"
      SqliteSink.write(Seq("a" -> one), db,
        n => s"""CREATE TABLE "$n"("id" NUMERIC, "v" TEXT) -- ${"x" * pad}""")
      assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok",
        s"giant pad=$pad")
      assert(py(db, """print(con.execute('SELECT count(*) FROM "a"').fetchone()[0])""") == "1",
        s"giant pad=$pad")
    }
  }

  test("overflow payloads, multi-level interior b-trees, and empty tables round-trip") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlite2").toString
    val db = s"$dir/big.db"
    val bigText = "x" * 10000 // >> max local payload: forces an overflow chain
    // ~400-byte rows → ~9 cells/leaf → ~2200 leaves → two interior levels
    val rows = (1 to 20000).map { i =>
      (i.toLong, if (i == 7) bigText else ("t" * 400) + i, i * 0.5)
    }
    val docs = rows.toDF("id", "t", "half")
    val empty = docs.where($"id" < 0)
    SqliteSink.write(Seq("docs" -> docs, "nothing" -> empty), db,
      n => s"""CREATE TABLE "$n"(\n    "id" NUMERIC,\n    "t" TEXT,\n    "half" NUMERIC)""")
    assert(py(db, """print(con.execute("PRAGMA integrity_check").fetchone()[0])""") == "ok")
    assert(py(db, """print(con.execute('SELECT count(*), sum(id) FROM "docs"').fetchone())""")
      == s"(20000, ${20000L * 20001 / 2})")
    assert(py(db, """print(con.execute('SELECT length(t) FROM "docs" WHERE id = 7').fetchone()[0])""")
      == "10000")
    // whole doubles store as INTEGER (NUMERIC affinity), halves as REAL
    assert(py(db, """print(json.dumps(con.execute('SELECT half, typeof(half) FROM "docs" WHERE id IN (2, 3) ORDER BY id').fetchall()))""")
      == """[[1, "integer"], [1.5, "real"]]""")
    assert(py(db, """print(con.execute('SELECT count(*) FROM "nothing"').fetchone()[0])""") == "0")
    // rowid-ordered scans agree with the insert order end to end
    assert(py(db, """print(con.execute('SELECT id FROM "docs" ORDER BY rowid DESC LIMIT 1').fetchone()[0])""")
      == "20000")
  }

}
