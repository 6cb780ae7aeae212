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
