package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget document packing: assign every document to a training
  * bin (output shard / sequence bundle) holding ~`maxTokensPerBin`
  * tokens, deterministically.
  *
  * Documents are first sharded by an md5-derived hash of their id (so
  * the layout is a pure function of the data — stable across runs,
  * partitionings, and engines), then packed greedily in id order within
  * each shard: a document's bin is the bin its starting token offset
  * falls in, so each bin holds at least `maxTokensPerBin` tokens and
  * overflows by at most one document — the standard streaming
  * approximation of bin packing, and the only one that's expressible as
  * a window function instead of a sequential fold.
  *
  * Overflow bound: a bin's token total is < `maxTokensPerBin` + the
  * largest document's token count. Documents are never split, so a
  * single document larger than `maxTokensPerBin` lands whole in the bin
  * its start offset falls in (overflowing it by up to its own size) and
  * the next document starts a later bin — the running offset still
  * counts the oversized document in full. Callers that need a hard
  * per-bin cap must chunk oversized documents upstream.
  *
  * Scale shape: one shuffle on the shard key + an in-partition sort.
  * Parallelism is `nShards` — size it to the cluster (e.g. one shard
  * per output file), never 1 (that would serialize the cumsum through a
  * single partition).
  */
object Packing {

  def packByTokenBudget(docs: DataFrame, idCol: String, tokenCol: String,
      maxTokensPerBin: Long, nShards: Int, salt: String = "graft"): DataFrame = {
    require(nShards > 0 && maxTokensPerBin > 0)
    val sharded = docs.withColumn("shard",
      pmod(Sampling.hashLong(col(idCol), salt), lit(nShards.toLong)).cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("start_tok", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("start_tok") / maxTokensPerBin).cast("long"))
  }
}
