package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Classify

/** Pins graft.ops.Classify (the model-based quality-filter stage): the
  * integer-quantized model arithmetic against hand-replayed driver math
  * (the libm-ln half the x84 oracle can only probabilistically cover —
  * the x60/x78 split), Bernoulli presence semantics, partitioning
  * invariance of the exact-integer scores, and the separable-classes
  * filter contract.
  */
class ClassifySpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def corpus() = {
    import spark.implicits._
    // positive class speaks apples/oranges, negative speaks bolts/nuts;
    // "shared" appears in both, "apples" repeats within doc 1 (presence
    // must count it once)
    Seq(
      (1L, "apples apples oranges shared", true),
      (2L, "apples shared", true),
      (3L, "oranges apples", true),
      (4L, "bolts nuts shared", false),
      (5L, "bolts shared", false)
    ).toDF("doc_id", "text", "is_pos")
  }

  test("model counts, quantized weights, and bias replay the documented spelling") {
    val m = Classify.nbTrain(corpus(), "text", "is_pos", vocabSize = 100)
    assert((m.nPos, m.nNeg) == ((3L, 2L)))
    val rows = m.weights.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // presence document frequencies (doc 1's repeated "apples" counts once)
    assert(rows("apples")._1 == 3L && rows("apples")._2 == 0L)
    assert(rows("oranges")._1 == 2L && rows("oranges")._2 == 0L)
    assert(rows("shared")._1 == 2L && rows("shared")._2 == 2L)
    assert(rows("bolts")._1 == 0L && rows("bolts")._2 == 2L)
    assert(rows("nuts")._1 == 0L && rows("nuts")._2 == 1L)
    // the documented weight spelling, replayed with driver math
    def w(dfPos: Long, dfNeg: Long): Long =
      math.floor((math.log((dfPos + 1) / (m.nPos + 2.0)) -
        math.log((dfNeg + 1) / (m.nNeg + 2.0))) * 1e6 + 0.5).toLong
    rows.foreach { case (t, (dp, dn, wm)) =>
      assert(wm == w(dp, dn), s"weight mismatch for '$t'")
    }
    assert(m.biasMicro ==
      math.floor(math.log(3.0 / 2.0) * 1e6 + 0.5).toLong)
  }

  test("scores are exact integer sums: presence semantics, OOV prior, partition invariance") {
    import spark.implicits._
    val docs = corpus()
    val m = Classify.nbTrain(docs, "text", "is_pos", vocabSize = 100)
    val wm = m.weights.collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val probe = Seq(
      (10L, "apples apples apples"), // repetition: one presence feature
      (11L, "unseen words only zz"), // fully OOV -> bare prior
      (12L, "bolts nuts")
    ).toDF("doc_id", "text")
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Boolean)] =
      Classify.nbScore(df, "text", "doc_id", m).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
    val s = scores(probe)
    assert(s(10L) == ((1L, m.biasMicro + wm("apples"), true)))
    assert(s(11L) == ((0L, m.biasMicro, m.biasMicro > 0)))
    assert(s(12L)._2 == m.biasMicro + wm("bolts") + wm("nuts"))
    assert(!s(12L)._3)
    // exact-integer scores cannot move under repartitioning
    assert(scores(probe.repartition(7)) == s)
  }

  test("vocabSize cap keeps the top tokens by df with the token tie-break") {
    val m = Classify.nbTrain(corpus(), "text", "is_pos", vocabSize = 2)
    // df totals: apples 3, shared 4, oranges 2, bolts 2, nuts 1 ->
    // top-2 = shared(4), apples(3)
    assert(m.weights.select("token").collect().map(_.getString(0)).toSet ==
      Set("shared", "apples"))
  }

  test("pipeline stage 2b: classifier filters the batch through Pipeline.run") {
    import spark.implicits._
    import graft.ops.Pipeline
    val m = Classify.nbTrain(corpus(), "text", "is_pos", vocabSize = 100)
    val batch = Seq(
      (30L, "apples oranges fresh"),
      (31L, "bolts nuts rusty"),
      (32L, "unseen gibberish zz")
    ).toDF("doc_id", "text")
    val res = Pipeline.run(batch, Pipeline.Config(rules = None,
      classifier = Some(Pipeline.Classifier(model = Some(m)))),
      countStages = true)
    val kept = res.kept.select("doc_id").as[Long].collect().toSet
    // 30 scores positive; 31 negative; 32 is fully OOV -> bare prior
    // (bias > 0 with 3 pos / 2 neg) -> kept
    assert(kept == Set(30L, 32L))
    assert(res.stageCounts == Seq("classify" -> 2L))
    assert(res.ownsKept) // the stage materialized, so kept is releasable
    // train-at-run-time form: same labeled frame, same decision
    val res2 = Pipeline.run(batch, Pipeline.Config(rules = None,
      classifier = Some(Pipeline.Classifier(labeled = Some(corpus()),
        labelCol = "is_pos", vocabSize = 100))))
    assert(res2.kept.select("doc_id").as[Long].collect().toSet == kept)
    // no model and no labeled frame fails fast
    intercept[IllegalArgumentException] {
      Pipeline.run(batch, Pipeline.Config(rules = None,
        classifier = Some(Pipeline.Classifier())))
    }
  }

  test("nbFilter keeps the documents the model calls positive") {
    import spark.implicits._
    val fresh = Seq(
      (20L, "apples oranges galore"),
      (21L, "bolts nuts again")
    ).toDF("doc_id", "text")
    val kept = Classify.nbFilter(fresh, "text", "doc_id",
      corpus(), "is_pos", vocabSize = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(20L))
  }
}
