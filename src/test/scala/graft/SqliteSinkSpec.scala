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
