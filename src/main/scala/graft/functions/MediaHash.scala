package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Perceptual-hash kernels for media near-dup — the compiled per-row
  * convention of SCALE.md §kernel-allocation: index scans over the input,
  * no per-call garbage beyond the returned primitive.
  *
  * The hashes operate on a DECODED FEATURE VECTOR (a luminance grid for
  * images, a downsampled envelope for audio — whatever the
  * [[graft.ops.Multimodal]] decode stage produced), NOT on payload
  * bytes: that is the point of a perceptual hash — one recompression
  * changes every payload byte but barely moves the decoded signal, so
  * md5-style exact dedup ([[graft.ops.Multimodal.dedupExactMedia]]) is
  * defeated while the difference/average structure below survives.
  */
object MediaHash {

  /** Difference hash (dHash, the classic perceptual image hash): bit i
    * is set iff `v(i+1) > v(i)` — the SIGN of each consecutive
    * difference, which recompression noise almost never flips unless
    * the two cells were near-equal. Up to 64 bits (bit i from elements
    * i, i+1); shorter vectors fill low bits only, so a 64-element grid
    * yields 63 meaningful bits. Returns 0 for null/sub-2-element input
    * (callers drop null-feature rows before hashing, like the ANN
    * paths).
    */
  def dhash64(v: Array[Float]): Long = {
    if (v == null || v.length < 2) return 0L
    val n = math.min(64, v.length - 1)
    var h = 0L
    var i = 0
    while (i < n) {
      if (v(i + 1) > v(i)) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Average hash (aHash): bit i set iff `v(i)` exceeds the vector
    * mean. Cheaper discrimination than [[dhash64]] but flips more bits
    * near the mean; shipped as the standard alternative.
    */
  def ahash64(v: Array[Float]): Long = {
    if (v == null || v.length == 0) return 0L
    val n = math.min(64, v.length)
    var sum = 0.0
    var i = 0
    while (i < v.length) { sum += v(i); i += 1 }
    val mean = sum / v.length
    var h = 0L
    i = 0
    while (i < n) {
      if (v(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Average-pool a raw byte payload into a `cells`-element float grid —
    * the stand-in for a real decode+resize (average pooling IS what
    * thumbnail resampling does to pixels; here it runs over payload
    * bytes so the plumbing is testable without codecs). Cell c averages
    * the byte range [c*len/cells, (c+1)*len/cells), bytes read unsigned.
    * Deterministic; returns null for null/empty payloads.
    */
  def pooledGrid(payload: Array[Byte], cells: Int): Array[Float] = {
    if (payload == null || payload.isEmpty || cells <= 0) return null
    val out = new Array[Float](cells)
    val len = payload.length
    var c = 0
    while (c < cells) {
      val start = (c.toLong * len / cells).toInt
      val end = math.max(((c + 1).toLong * len / cells).toInt, start + 1)
      var sum = 0
      var i = start
      while (i < end && i < len) { sum += payload(i) & 0xFF; i += 1 }
      out(c) = sum.toFloat / math.max(math.min(end, len) - start, 1)
      c += 1
    }
    out
  }

  private def toFloatArray(v: Seq[Float]): Array[Float] = v match {
    case null => null
    // Spark hands a primitive-backed immutable ArraySeq — no copy
    case w: scala.collection.immutable.ArraySeq.ofFloat => w.unsafeArray
    case other => other.toArray
  }

  /** [[dhash64]] as a column (UDF over the feature array). */
  def dhashUdf: Column => Column = {
    val f = udf((v: Seq[Float]) => dhash64(toFloatArray(v)))
    c => f(c)
  }

  /** [[ahash64]] as a column. */
  def ahashUdf: Column => Column = {
    val f = udf((v: Seq[Float]) => ahash64(toFloatArray(v)))
    c => f(c)
  }
}
