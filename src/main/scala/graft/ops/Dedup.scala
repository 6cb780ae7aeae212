package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextHash

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard.
  *
  * Caching note: the near-dup operators persist their signature/shingle
  * intermediates (MEMORY_AND_DISK) because they feed multiple join sides;
  * the cache is session-scoped and LRU-evicted. Long-lived sessions
  * running dedup over many corpora should `spark.catalog.clearCache()`
  * between runs (or unpersist via the returned plan's dependencies).
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
    *
    * `maxBucket` is the skew guard: a band bucket with more than that many
    * members generates |bucket|² candidate pairs while carrying almost no
    * signal (it is dominated by near-universal shingles — on short texts a
    * handful of ubiquitous shingles can put half the corpus in one bucket,
    * turning the join quadratic). Oversized buckets are dropped before the
    * self-join; recall for genuinely similar pairs survives via their other
    * bands. Same idea as the `maxDf` guard in [[ngramJaccardPairs]].
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleSize: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val banded = df
      .select(col(idCol).as("id"),
        TextHash.minhashBandsUdf(numHashes, bands, shingleSize)(col(textCol)).as("bh"))
      .select(col("id"), posexplode(col("bh")).as(Seq("band", "bandHash")))
    // ONE shuffle: group each bucket, then emit its pairs directly from the
    // collected id array (the cap bounds both memory and pair count — a
    // bucket of n ids emits n·(n-1)/2 pairs, so ≤ maxBucket²/2). This
    // replaces the bucket-count + semi-join + sorted self-join shape (4
    // shuffles of the banded set) with groupBy + explode + distinct.
    bucketPairs(banded.groupBy("band", "bandHash")
      .agg(collect_list(col("id")).as("ids")), maxBucket)
  }

  /** Emit all ordered id pairs from per-bucket id arrays, dropping buckets
    * larger than `maxBucket` (skew guard) or smaller than 2. */
  private def bucketPairs(buckets: DataFrame, maxBucket: Int): DataFrame = {
    val ids = sort_array(col("ids"))
    val pairs = flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, greatest(size(ids) - i - 1, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))
    buckets
      .where(size(col("ids")).between(2, maxBucket))
      .select(explode(pairs).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with their estimated AND exact Jaccard: LSH
    * candidates verified by exact shingle-set Jaccard, thresholded.
    */
  def minhashDedupPairs(df: DataFrame, textCol: String, idCol: String,
      threshold: Double = 0.7, numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val cands = minhashCandidates(df, textCol, idCol, numHashes, bands, shingleSize, maxBucket)
    val sh = df.select(col(idCol).as("id"),
      array_distinct(TextHash.shingleHashesUdf(shingleSize)(col(textCol))).as("sh"))
      .persist(StorageLevel.MEMORY_AND_DISK) // reused on both join sides
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
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
      .persist(StorageLevel.MEMORY_AND_DISK) // chunk explode + 2 verify joins
    val chunked = withSig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(3)),
        i => call_function("shiftright", col("sig"), i * 16).bitwiseAND(0xFFFFL))).as(Seq("chunk", "chunkVal")))
    val cands = bucketPairs(chunked.groupBy("chunk", "chunkVal")
      .agg(collect_list(col("id")).as("ids")), maxBucket)
    val sigA = withSig.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a"))
    val sigB = withSig.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b"))
    cands.join(sigA, Seq("id_a")).join(sigB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
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
      .persist(StorageLevel.MEMORY_AND_DISK) // posting list + both verify sides
    val posting = sh.select(col("id"), explode(col("sh")).as("shingle"))
    val cands = bucketPairs(posting.groupBy("shingle")
      .agg(collect_list(col("id")).as("ids")), maxDf)
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
