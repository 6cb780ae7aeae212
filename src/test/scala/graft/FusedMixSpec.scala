package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the r21 fused mix path of [[graft.ops.Pipeline.run]] (budget
  * keep-set + interleave positions + pack bins computed on slim
  * (id, src, toks) rows, ONE payload join) against the staged spelling
  * (per-stage payload semi-join / join / shard exchange): identical
  * rows, identical column order, for the full upTo = 8 recipe. Since
  * r22 each arm is FORCED through the `graft.pipeline.mix` dial — not
  * inferred from the default — so both physical forms stay exercised
  * whatever [[graft.ops.Pipeline.MixPathDefault]] is set to; the
  * countStages = true spelling (the attribution probes' switch, always
  * staged) is pinned as a third arm.
  */
class FusedMixSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  private def runPipeline(path: String, countStages: Boolean = false) = {
    import spark.implicits._
    import graft.ops.{Pipeline, TextFilters}
    // 200 docs over 4 sources; budgets bite (~half of each source's
    // token mass), weights reorder, bins pack several docs each; a few
    // short docs exercise the quality stage so the fused gate's
    // prevStage requirement holds on a materialized stage
    val batch = (1L to 200L).map { i =>
      val body =
        if (i % 50 == 0) "tiny"
        else s"the document number $i carries enough plain words to pass " +
          s"the quality rule and about part ${i * 3} supplier ${i % 7}"
      (i, body)
    }.toDF("doc_id", "text")
    val budgets = (0 until 4).map { i =>
      s"s$i" -> 700L // roughly half of a source's ~1400 token-chars
    }.toMap
    val cfg = Pipeline.Config(
      rules = Some(TextFilters.Rules(minWords = 5, maxWords = 1000,
        minMeanWordLen = 0.0, maxMeanWordLen = 1e9,
        maxSymbolWordRatio = 1e9, maxBulletLineRatio = 1.0,
        maxEllipsisLineRatio = 1.0, minAlphaWordRatio = 0.0,
        minStopwordHits = 0)),
      mix = Some(Pipeline.Mix(
        budgets = budgets,
        src = concat(lit("s"), pmod(col("doc_id"), lit(4L))),
        toks = length(col("text")).cast("long"),
        weights = Map("s0" -> 2.0, "s1" -> 0.5), defaultWeight = 1.0,
        maxTokensPerBin = 512, nShards = 4)))
    System.setProperty("graft.pipeline.mix", path)
    val res =
      try Pipeline.run(batch, cfg, countStages = countStages)
      finally System.clearProperty("graft.pipeline.mix")
    val cols = res.kept.columns.toSeq
    val rows = res.kept.collect().map(_.toSeq).toSet
    graft.util.Checkpoints.release(res.kept)
    (cols, rows)
  }

  test("fused mix path: identical rows and column order to the staged path") {
    val (stagedCols, stagedRows) = runPipeline("staged")
    val (countedCols, countedRows) = runPipeline("fused", countStages = true)
    val (fusedCols, fusedRows) = runPipeline("fused")
    assert(fusedCols == stagedCols,
      s"column order diverged: fused=$fusedCols staged=$stagedCols")
    assert(countedCols == stagedCols,
      s"column order diverged: counted=$countedCols staged=$stagedCols")
    assert(fusedRows.nonEmpty && fusedRows.size < 200,
      s"vacuous pin: kept ${fusedRows.size} of 200 — budgets/rules must bite")
    assert(fusedRows == stagedRows,
      s"row sets diverged; fused-only=${(fusedRows -- stagedRows).take(3)} " +
        s"staged-only=${(stagedRows -- fusedRows).take(3)}")
    assert(countedRows == stagedRows,
      "countStages spelling diverged from the staged dial arm")
  }
}
