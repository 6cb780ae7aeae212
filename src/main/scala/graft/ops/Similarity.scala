package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a production pipeline needs both:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline and
  *     the right choice when the query set is small (broadcast queries ×
  *     scan corpus; no shuffle of the corpus at all).
  *   - [[lshTopK]]: random-hyperplane LSH bucketing — the scale path. The
  *     corpus is bucketed once (deterministic signs, seeded hashes), queries
  *     probe only their own bucket: the join is an equi-join on the bucket
  *     key instead of a cross product.
  *
  * Dot products are `aggregate(zip_with(...))` higher-order expressions —
  * codegen'd, no UDF, no MLlib model state.
  */
object Similarity {

  /** Cosine similarity between two array<float/double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot  = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na   = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb   = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * `queries` is expected to be small (it is broadcast — the corpus is
    * scanned once, never shuffled); `corpus` can be arbitrarily large.
    * Excludes self-matches when ids collide.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits, hyperplane j's
    * i-th coordinate derived from xxhash64(j, i) mapped to [-1, 1] —
    * deterministic, identical on every executor, no model object to ship.
    */
  def hyperplaneSignature(vec: Column, nBits: Int = 16): Column = {
    val dims = size(vec)
    val bits = (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), dims - 1),
          (v, i) => v * (xxhash64(lit(j), i).cast(DoubleType) / lit(Long.MaxValue.toDouble))),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: bucket corpus and queries by hyperplane signature,
    * equi-join on the bucket, rank within. `nBits` trades recall for
    * bucket size (2^nBits buckets). Multi-probe: also joins buckets at
    * Hamming distance 1 when `probe1 = true` to recover near-boundary
    * neighbors (standard multi-probe LSH).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 10, nBits: Int = 12,
      probe1: Boolean = true): DataFrame = {
    val sig = hyperplaneSignature(col(vecCol), nBits)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), sig.as("bucket"))
    val qSig = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"), sig.as("qsig"))
    val probes =
      if (!probe1) qSig.withColumn("bucket", col("qsig"))
      else qSig.select(col("query_id"), col("qv"),
        explode(concat(array(col("qsig")),
          transform(sequence(lit(0), lit(nBits - 1)),
            i => col("qsig").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("bucket"))
    val scored = probes.join(c, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("score"))
      .distinct()
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: corpus self-join via LSH buckets,
    * cosine ≥ threshold. The embedding analog of MinHash near-dup.
    */
  def cosineDedupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, nBits: Int = 12): DataFrame = {
    val sig = hyperplaneSignature(col(vecCol), nBits)
    val c = df.select(col(idCol).as("id"), col(vecCol).as("v"), sig.as("bucket"))
    val a = c.alias("a")
    val b = c.alias("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("score"))
      .where(col("score") >= threshold)
  }
}
