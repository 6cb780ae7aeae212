package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** MEASURED shuffle-volume evidence for the dedup scale claims: SCALE.md
  * says exact dedup moves fingerprints, never documents — this spec reads
  * the actual `shuffle bytes written` metrics off the executed plan and
  * asserts the total is a small fraction of the text volume. A regression
  * that drags the payload through an exchange (e.g. reverting the
  * dropped-ids anti-join to a keep-ids semi-join) fails this spec by an
  * order of magnitude, not a flaky margin.
  */
class ShuffleEvidenceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark

  /** Sum of "shuffle bytes written" over every exchange in the executed
    * (adaptive) plan. Accumulator-backed metrics are final once the
    * triggering action returns.
    */
  private def shuffleBytesWritten(df: DataFrame): Long = {
    // collect(), not a write: a write runs its OWN QueryExecution, and
    // the metrics on df.queryExecution would stay untouched (zero)
    df.collect()
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    def sum(p: SparkPlan): Long = {
      val self = p match {
        case s: ShuffleExchangeLike =>
          s.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L)
        case _ => 0L
      }
      self + unwrap(p).map(sum).sum
    }
    sum(df.queryExecution.executedPlan)
  }

  test("exactDedup shuffles fingerprints, not documents (measured bytes)") {
    import spark.implicits._
    // ~2 KB docs, ~10% exact duplicates — the realistic corpus shape the
    // "~2% of the text volume shuffles" claim is about
    val docs = (1 to 4000).map { i =>
      val body = s"doc body $i " * 150 // ~1.8 KB
      (i.toLong, if (i % 10 == 0) s"doc body ${i - 1} " * 150 else body)
    }
    val df = docs.toDF("doc_id", "text")
    val textBytes = docs.map(_._2.length.toLong).sum
    val out = graft.ops.Dedup.exactDedup(df, "text", "doc_id")
    val shuffled = shuffleBytesWritten(out)
    assert(out.count() >= 3500) // sanity: dedup actually ran
    assert(shuffled > 0, "expected the fingerprint aggregation to shuffle something")
    assert(shuffled < textBytes / 10,
      f"exact dedup shuffled $shuffled bytes vs $textBytes text bytes " +
        f"(${100.0 * shuffled / textBytes}%.1f%%) — the payload is leaking into an exchange")
  }
}
