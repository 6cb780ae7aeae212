package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Joins, Packing}

/** As-of join, salted join, corpus line dedup, and token packing
  * (the x29–x32 operators). */
class JoinsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asof join: backward pick, inclusive ties, tolerance, unmatched nulls") {
    val quotes = Seq( // (sym, q_t, px)
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 100L, 9.0)).toDF("sym", "q_t", "px")
    val trades = Seq( // (sym, t, qty)
      ("A", 25L, 10L),  // latest quote ≤ 25 is t=20 → px 2.0
      ("A", 20L, 11L),  // exact-time quote counts (≤, not <) → px 2.0
      ("A", 5L, 12L),   // before any quote → null
      ("B", 500L, 13L), // matched at 100, but gap 400 > tolerance → null
      ("C", 50L, 14L)   // key with no quotes at all → null
    ).toDF("sym", "t", "qty")
    val out = Joins.asofJoin(trades, quotes, Seq("sym"), "t", "q_t",
        tolerance = Some(lit(200L)))
      .select($"sym", $"t", $"qty", $"q_t", $"px")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    assert(out(("A", 25L)) == Some((20L, 2.0)))
    assert(out(("A", 20L)) == Some((20L, 2.0)))
    assert(out(("A", 5L)) == None)
    assert(out(("B", 500L)) == None)
    assert(out(("C", 50L)) == None)
  }

  test("asof join: equal-instant right duplicates break ties deterministically") {
    val right = Seq(("A", 10L, 1L), ("A", 10L, 2L), ("A", 10L, 3L))
      .toDF("k", "rt", "rid")
    val left = Seq(("A", 15L)).toDF("k", "t")
    // greatest right payload wins — stable across layouts
    val pick = Joins.asofJoin(left, right, Seq("k"), "t", "rt")
      .select($"rid").as[Long].collect().toSeq
    val pickRepart = Joins.asofJoin(left, right.repartition(5), Seq("k"), "t", "rt")
      .select($"rid").as[Long].collect().toSeq
    assert(pick == Seq(3L) && pickRepart == Seq(3L))
  }

  test("salted join equals the plain join and is layout-independent") {
    val big = spark.range(0, 2000)
      .select(($"id" % 7).as("k"), $"id".as("v"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (9L, "zz"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"v", $"name")
    val salted = Joins.saltedJoin(big, small, Seq("k"), nSalts = 16)
      .select($"k", $"v", $"name")
    assert(salted.collect().toSet == plain.collect().toSet)
    assert(salted.count() == plain.count()) // no dup/lost rows from the explode
    val saltedRepart = Joins.saltedJoin(big.repartition(13), small, Seq("k"), 16)
    assert(saltedRepart.count() == plain.count())
  }

  test("dedupLines scrubs corpus-wide boilerplate, keeps order, empties all-dup docs") {
    val boiler = "SUBSCRIBE NOW"
    val docs = Seq(
      (1L, s"alpha\n$boiler\nbravo"),
      (2L, s"$boiler\ncharlie"),
      (3L, s"delta\necho\n$boiler"),
      (4L, boiler),               // only the boilerplate → becomes empty
      (5L, "foxtrot\ngolf")       // untouched
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLines(docs, "text", "doc_id", minDupCount = 4)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(out(1L) == "alpha\nbravo")
    assert(out(2L) == "charlie")
    assert(out(3L) == "delta\necho")
    assert(out(4L) == "")
    assert(out(5L) == "foxtrot\ngolf")
    // below the threshold nothing is scrubbed
    val keep = Dedup.dedupLines(docs, "text", "doc_id", minDupCount = 5)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(keep(4L) == boiler)
  }

  test("packing: id-ordered cumsum per shard, bins overflow by at most one doc") {
    val docs = spark.range(0, 500)
      .select($"id".as("doc_id"), (($"id" % 97) + 10).as("n_tokens"))
    val packed = Packing.packByTokenBudget(docs, "doc_id", "n_tokens",
      maxTokensPerBin = 300, nShards = 4)
    val rows = packed.select($"shard", $"bin", $"doc_id", $"n_tokens", $"start_tok")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.length == 500)
    // start_tok is the shard's id-ordered running sum; bin = floor(start/300)
    rows.groupBy(_._1).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._3).foreach { case (_, bin, _, n, start) =>
        assert(start == cum)
        assert(bin == start / 300)
        cum += n
      }
    }
    // every bin's token total < budget + max doc size (one-doc overflow)
    val maxDoc = 97 + 10
    packed.groupBy($"shard", $"bin").agg(sum($"n_tokens").as("tot"))
      .as[(Int, Long, Long)].collect()
      .foreach { case (_, _, tot) => assert(tot < 300 + maxDoc) }
    // layout-independent
    val again = Packing.packByTokenBudget(docs.repartition(11), "doc_id",
      "n_tokens", 300, 4)
      .select($"doc_id", $"bin").as[(Long, Long)].collect().toMap
    assert(rows.map(r => r._3 -> r._2).toMap == again)
  }

  test("packing: a document larger than the bin budget overflows its bin whole") {
    // one shard so the id-ordered layout is fully determined
    val docs = Seq((1L, 50L), (2L, 1000L), (3L, 50L), (4L, 80L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packByTokenBudget(docs, "doc_id", "n_tokens",
      maxTokensPerBin = 100, nShards = 1)
      .select($"doc_id", $"start_tok", $"bin")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // doc 2 (1000 tokens > 100 budget) starts at offset 50 → bin 0, never
    // split; its full size advances the offset, so doc 3 starts at 1050
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 0L, 0L), (2L, 50L, 0L), (3L, 1050L, 10L), (4L, 1100L, 11L)))
  }

  test("packing: more shards than documents still packs every doc") {
    val docs = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_tokens")
    val out = Packing.packByTokenBudget(docs, "doc_id", "n_tokens",
      maxTokensPerBin = 100, nShards = 64)
      .select($"shard", $"doc_id", $"n_tokens", $"start_tok", $"bin")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out.length == 3)
    assert(out.forall { case (shard, _, _, _, _) => shard >= 0 && shard < 64 })
    // per-shard id-ordered cumsum still holds with mostly-empty shards
    out.groupBy(_._1).foreach { case (_, shardRows) =>
      var cum = 0L
      shardRows.sortBy(_._2).foreach { case (_, _, n, start, bin) =>
        assert(start == cum && bin == start / 100)
        cum += n
      }
    }
  }
}
