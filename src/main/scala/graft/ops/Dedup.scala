package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextHash

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Design for 100 TB:
  *   - Exact dedup groups by an 8-byte hash of the normalized text, not the
  *     text itself — the shuffle moves 8-byte keys, not documents.
  *   - Near-dup never compares all pairs: MinHash signatures are banded
  *     (LSH) so the only join is an equi-join on (band, bandHash) — a plain
  *     shuffle join Catalyst can plan, with AQE handling skewed buckets.
  *   - All hashing is deterministic (seeded xxhash64), so signatures are
  *     reproducible across runs and cluster sizes — no `Math.random`
  *     coefficients baked into a model object.
  */
object Dedup {

  /** Exact dedup: keep the row with the minimum `idCol` per distinct
    * (whitespace-normalized) text. Shuffles only (hash, id) pairs.
    */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val key = TextAnalysis.fingerprint(col(textCol))
    val keep = df.select(key.as("__k"), col(idCol))
      .groupBy("__k").agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // left_semi on the id — document payload never shuffles
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Exact-dup groups: fingerprint → member count + kept id. */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"))
      .agg(count(lit(1)).as("n_members"), min(col(idCol)).as("keep_id"))

  /** MinHash signature as a column: `numHashes` minima over the shingle
    * hash set, computed by the compiled kernel ([[TextHash.minhash]] — see
    * there for why this is not an expression tree). Deterministic.
    */
  def minhashSignature(text: Column, numHashes: Int = 64, shingleSize: Int = 3): Column =
    TextHash.minhashUdf(numHashes, shingleSize)(text)

  /** LSH banding: candidate near-dup pairs via equality of any band of the
    * MinHash signature. `bands` × `rowsPerBand` must equal the signature
    * length. Returns distinct (id_a, id_b) candidate pairs with id_a < id_b.
    *
    * Plan shape: project signature → explode bands (numBands× row growth of
    * 16-byte rows, not documents) → shuffle on (band, hash) → self-join
    * within buckets. No cross join anywhere.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sig = minhashSignature(col(textCol), numHashes, shingleSize)
    val banded = df
      .select(col(idCol).as("id"), sig.as("sig"))
      .select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)).cast(StringType)))
      ).as(Seq("band", "bandHash")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bandHash") === col("b.bandHash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with their estimated AND exact Jaccard: LSH
    * candidates verified by exact shingle-set Jaccard, thresholded.
    */
  def minhashDedupPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, numHashes, bands, shingleSize)
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextHash.shingleHashesUdf(shingleSize)(col(textCol))).as("sh"))
    cands
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash of the token stream: per-token hash, each bit votes
    * ±1, sign wins ([[TextHash.simhash]] compiled kernel). */
  def simhash64(text: Column): Column = TextHash.simhashUdf(text)

  /** SimHash near-dup candidate pairs: block on 4×16-bit chunks (two docs
    * within Hamming distance ≤ 3 of a 64-bit fingerprint must share at
    * least one 16-bit chunk — pigeonhole), verify exact Hamming distance.
    */
  def simhashDedupPairs(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    val chunked = withSig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => call_function("shiftright", col("sig"), i * 16).bitwiseAND(0xFFFFL))).as(Seq("chunk", "chunkVal")))
    val a = chunked.alias("a")
    val b = chunked.alias("b")
    val popcountXor = bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
    a.join(b, col("a.chunk") === col("b.chunk") && col("a.chunkVal") === col("b.chunkVal") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        popcountXor.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity for all pairs above `threshold`,
    * using shared-shingle blocking (a pair with Jaccard ≥ t shares ≥ 1
    * shingle): explode shingles → equi-join on shingle → verify exactly.
    * For corpora where documents share near-universal shingles, prefer
    * [[minhashDedupPairs]] — this operator is exact but its blocking join
    * grows with shingle document-frequency. `maxDf` drops shingles seen in
    * more than that many docs (stopword-shingle guard, the standard trick).
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.5, shingleSize: Int = 3, maxDf: Int = 1000): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextHash.shingleHashesUdf(shingleSize)(col(textCol))).as("sh"))
    val posting = sh.select(col("id"), explode(col("sh")).as("shingle"))
    val rare = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf && col("df") >= 2)
    val filtered = posting.join(rare, Seq("shingle"), "left_semi")
    val a = filtered.alias("a")
    val b = filtered.alias("b")
    val cands = a.join(b, col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    cands
      .join(sh.withColumnsRenamed(Map("id" -> "id_a", "sh" -> "sh_a")), Seq("id_a"))
      .join(sh.withColumnsRenamed(Map("id" -> "id_b", "sh" -> "sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
