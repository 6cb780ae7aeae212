package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in partition-sized
  * batches.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`decodeStub`) — but
  * everything Spark-side is real and tested: the schema convention, the
  * batched `mapPartitions` execution (the Scala analog of `mapInPandas` —
  * one iterator per partition, amortizing per-batch setup like model
  * loading), partition sizing, and the typed output surface.
  *
  * Swap `decodeStub` for a real JNI/ffmpeg/jpeg decoder without touching
  * the plumbing: the contract is `Array[Byte] => MediaFeatures`.
  */
object Multimodal {

  /** Schema convention for a multimodal row: id + opaque payload + typed
    * metadata the pipeline can partition/filter on WITHOUT decoding.
    */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      source: String)

  /** Decoded/extracted features. Fixed-width so downstream is columnar. */
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Header-only image decode through the JDK's OWN codecs
    * (`javax.imageio` — PNG/JPEG/GIF/BMP readers ship in every JVM):
    * `ImageReader.getWidth/getHeight(0)` parse just the header, never the
    * pixel data, so this is metadata-extraction cheap even on megabyte
    * payloads. Returns None when no installed reader recognizes the
    * payload (wav/mp4/webp — codecs a stock JVM lacks; those fall back
    * to [[decodeStub]] in [[decodeAuto]]).
    */
  def decodeImageHeader(payload: Array[Byte]): Option[(Int, Int)] = {
    if (payload == null || payload.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getWidth(0), r.getHeight(0)))
        } catch {
          // recognized magic bytes but truncated/corrupt header
          case _: java.io.IOException => None
        } finally r.dispose()
      }
    } finally iis.close()
  }

  /** Default decoder: REAL dimensions where the JDK has a codec (image
    * headers via [[decodeImageHeader]]), deterministic [[decodeStub]]
    * features elsewhere — swap in a JNI/ffmpeg decoder for the rest
    * without touching the plumbing.
    */
  def decodeAuto(r: MediaRow): MediaFeatures =
    decodeImageHeader(r.payload) match {
      case Some((w, h)) => decodeStub(r).copy(width = w, height = h, n_frames = 1)
      case None         => decodeStub(r)
    }

  /** STUB decoder — deterministic fake standing in for the real codec.
    * Real implementation would decode `payload` (wav/mp4 — codecs the
    * JVM lacks; real IMAGE headers decode via [[decodeImageHeader]]).
    * The fake derives stable pseudo-dimensions and a pseudo-feature vector
    * from the payload bytes so tests are reproducible.
    */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val h = java.util.Arrays.hashCode(r.payload)
    val rnd = new scala.util.Random(h) // seeded by content → deterministic
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = r.payload.length,
      width = 16 + math.abs(h % 1024),
      height = 16 + math.abs((h / 1024) % 1024),
      n_frames = if (r.kind == "video") 1 + math.abs(h % 300) else 1,
      feature = Array.fill(8)(rnd.nextFloat()))
  }

  /** Batched feature extraction over a multimodal Dataset.
    *
    * `mapPartitions` (not `map`): per-partition setup (decoder init, model
    * load) happens once per task, mirroring `mapInPandas` batch semantics.
    * Partition size is the memory knob — media payloads are large, so
    * repartition upstream such that (rows per partition × payload size)
    * fits the executor (e.g. `spark.sql.files.maxPartitionBytes` for file
    * sources, or an explicit `repartition(n)` after a filter).
    */
  def extractFeatures(ds: Dataset[MediaRow])(
      decode: MediaRow => MediaFeatures = decodeAuto): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder/model initialization would go here (once)
      it.map(decode)
    }
  }

  /** Frame sampling plan for video rows: returns (media_id, frame_idx)
    * pairs for every `stride`-th frame, WITHOUT decoding — demonstrates
    * metadata-only planning over multimodal tables.
    */
  def sampleFrames(features: DataFrame, stride: Int = 10): DataFrame =
    features.where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** Exact media dedup: keep the minimum-id row per distinct payload —
    * [[graft.ops.Dedup.exactDedup]]'s shape for opaque binary columns.
    * The fingerprint is a raw md5 over the payload BYTES (no text
    * normalization — media bytes are exact or different), so the shuffle
    * moves 16-byte keys + ids, never the media; the dropped-id set is
    * the duplicate fraction only, so the anti-join broadcasts and the
    * payload stays where it was scanned. Null payloads group together
    * under a zero-length sentinel (a real md5 is always 16 bytes — no
    * collision), matching groupBy/SQL semantics.
    */
  def dedupExactMedia(df: DataFrame, payloadCol: String,
      idCol: String): DataFrame = {
    val key = coalesce(unhex(md5(col(payloadCol))), lit(Array.emptyByteArray))
    val keyed = df.select(key.as("__k"), col(idCol))
    val keep = keyed.groupBy("__k").agg(min(col(idCol)).as("__keep"))
    val dropped = keyed.join(keep, Seq("__k"))
      .where(col(idCol) =!= col("__keep"))
      .select(idCol)
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** Perceptual hashes for a multimodal Dataset through the batched
    * decode path: payload → pooled feature grid (the codec-free
    * decode+resize stand-in, [[graft.functions.MediaHash.pooledGrid]] —
    * swap the grid fn for a real decoder's luminance grid without
    * touching anything else) → 64-bit dHash. Returns (media_id, phash).
    * Null/empty payloads are dropped (no decodable signal — the ANN
    * null-embedding convention).
    */
  def perceptualHashes(ds: Dataset[MediaRow], cells: Int = 65)(
      grid: MediaRow => Array[Float] =
        r => graft.functions.MediaHash.pooledGrid(r.payload, cells)): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here (once)
      it.flatMap { r =>
        val g = grid(r)
        if (g == null) None
        else Some((r.media_id, graft.functions.MediaHash.dhash64(g)))
      }
    }.toDF("media_id", "phash")
  }

  /** Near-dup MEDIA candidate pairs over a decoded feature column —
    * the capability one recompression defeats in [[dedupExactMedia]]:
    * dHash the features ([[graft.functions.MediaHash.dhash64]], sign
    * of each consecutive difference — stable under the small
    * perturbations a re-encode introduces), then find every pair
    * within `maxHamming` bits using the SimHash pigeonhole blocking
    * (`maxHamming + 1` bit chunks: two hashes within the distance must
    * agree on at least one chunk, so recall is complete BY
    * CONSTRUCTION — [[Dedup.simhashDedupPairs]]'s machinery over a
    * different signature). Verification is `bit_count(xor)` in
    * expression space — no per-pair kernel. Null features drop.
    *
    * Returns (id_a, id_b, hamming), id_a < id_b. Feed to
    * [[Dedup.dedupByPairs]] to actually drop the losers.
    *
    * 100 TB shape: one UDF call per row, then equi-joins on (chunk,
    * 16-bit chunkVal) — fixed-width keys, candidate-bounded by
    * `maxBucket` exactly like the text LSH paths.
    */
  def nearDupMediaPairs(df: DataFrame, featureCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 100000,
      hash: String = "dhash"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15] for complete >=4-bit chunk blocking, got $maxHamming")
    val hashUdf = hash match {
      case "dhash" => graft.functions.MediaHash.dhashUdf
      case "ahash" => graft.functions.MediaHash.ahashUdf
      case other => throw new IllegalArgumentException(
        s"nearDupMediaPairs: hash must be dhash or ahash, got $other")
    }
    val chunks = maxHamming + 1
    val widths  = Array.tabulate(chunks)(i => 64 / chunks + (if (i < 64 % chunks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val withSig = df
      .where(col(featureCol).isNotNull)
      .select(col(idCol).as("id"), hashUdf(col(featureCol)).as("sig"))
    val chunkVals = (0 until chunks).map { i =>
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1
      struct(lit(i).as("chunk"),
        shiftright(col("sig"), offsets(i)).bitwiseAND(lit(mask)).as("chunkVal"))
    }
    val chunked = withSig
      .select(col("id"), explode(array(chunkVals: _*)).as("c"))
      .select(col("id"), col("c.chunk"), col("c.chunkVal"))
    // candidate-driven verify (the jaccardVerify convention): re-hash
    // only ids that appear in a candidate pair; both candidate-bounded
    // frames checkpoint lazily because AQE does not reuse exchanges
    // across their multiple consumers
    val cands = Dedup.bucketPairs(chunked, Seq("chunk", "chunkVal"), maxBucket)
      .localCheckpoint(false)
    val candIds = cands
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val sigSmall = df.select(col(idCol).as("id"), col(featureCol))
      .join(candIds, Seq("id"), "left_semi")
      .select(col("id"), hashUdf(col(featureCol)).as("sig"))
      .localCheckpoint(false)
    val sigA = sigSmall.withColumnsRenamed(Map("id" -> "id_a", "sig" -> "sig_a"))
    val sigB = sigSmall.withColumnsRenamed(Map("id" -> "id_b", "sig" -> "sig_b"))
    cands.join(sigA, Seq("id_a")).join(sigB, Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Apply media near-dup: connected components over
    * [[nearDupMediaPairs]], keep the minimum id per component —
    * [[Dedup.dedupByPairs]] on perceptual pairs.
    */
  def dedupNearMedia(df: DataFrame, featureCol: String, idCol: String,
      maxHamming: Int = 3, maxBucket: Int = 100000): DataFrame =
    Dedup.dedupByPairs(df, idCol,
      nearDupMediaPairs(df, featureCol, idCol, maxHamming, maxBucket)
        .select("id_a", "id_b"))

  /** Build a synthetic multimodal Dataset from the documents table (the
    * test environment has no real media files): payload = utf-8 bytes of
    * the text, kind round-robins image/audio/video. Deterministic.
    */
  def syntheticFromDocuments(spark: SparkSession, documentsParquet: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(documentsParquet)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast(IntegerType)).as("kind"),
        col("text").cast(BinaryType).as("payload"),
        col("source"))
      .as[MediaRow]
  }
}
