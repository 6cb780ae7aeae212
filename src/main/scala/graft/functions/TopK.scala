package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate flowing through [[TopKAgg]]. */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k aggregation by (score desc, id asc) — the partial-
  * aggregation replacement for a `row_number` window over a scored
  * frame.
  *
  * Why this exists: ranking N scored rows per query with a window means
  * ALL N rows flow through the window's exchange before `rank <= k`
  * drops them — at corpus scale that exchange is the bottleneck. As a
  * typed aggregate the buffer is a k-bounded list, Spark runs it
  * map-side first (ObjectHashAggregate partial), and only ~k rows per
  * (query, partition) reach the exchange; the final merge per query is
  * a fold over those survivors.
  *
  * Ordering matches Spark's `orderBy(score.desc, id.asc)` total order
  * exactly — comparisons go through `java.lang.Double.compare`, so NaN
  * ranks above every finite score and -0.0 < 0.0, bit-identical to the
  * window form it replaces.
  *
  * The buffer is kept sorted better-first, so insertion is O(k) and
  * `finish` is free; k is small by top-k semantics. Object aggregation
  * is the right tool here (unlike the bucket-capping case in
  * `Dedup.bucketPairs`, where millions of mostly-singleton groups made
  * it lose): group count = |queries|, tiny, and every buffer is
  * bounded by k.
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, s"k must be positive, got $k")

  /** a strictly precedes b in (score desc, id asc) order. */
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  /** Insert keeping the better-first sort. O(k). */
  private def insert(buf: List[ScoredId], in: ScoredId): List[ScoredId] = {
    val (pre, post) = buf.span(e => better(e, in))
    pre ::: (in :: post)
  }

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    if (buf.lengthCompare(k) < 0) insert(buf, in)
    else if (better(in, buf.last)) insert(buf, in).init // last == current worst
    else buf

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}

/** One (score, id) candidate with an opaque binary id, for
  * [[TopKBinAgg]]. */
final case class ScoredBin(score: Double, id: Array[Byte])

/** [[TopKAgg]] for non-integral ids carried as binary. Ids compare by
  * unsigned lexicographic byte order — for strings cast to binary this
  * is exactly Spark's default UTF8_BINARY string order (UTF8String
  * compares its UTF-8 bytes unsigned), so `(score desc, id asc)` here
  * is bit-identical to `orderBy(score.desc, id)` over the string
  * column. Same bounded-buffer / map-side-partial shape as
  * [[TopKAgg]].
  */
class TopKBinAgg(k: Int) extends Aggregator[ScoredBin, List[ScoredBin], Seq[ScoredBin]] {
  require(k > 0, s"k must be positive, got $k")

  /** Unsigned lexicographic byte compare (UTF8_BINARY order). */
  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  private def better(a: ScoredBin, b: ScoredBin): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && cmpBytes(a.id, b.id) < 0)
  }

  private def insert(buf: List[ScoredBin], in: ScoredBin): List[ScoredBin] = {
    val (pre, post) = buf.span(e => better(e, in))
    pre ::: (in :: post)
  }

  override def zero: List[ScoredBin] = Nil

  override def reduce(buf: List[ScoredBin], in: ScoredBin): List[ScoredBin] =
    if (buf.lengthCompare(k) < 0) insert(buf, in)
    else if (better(in, buf.last)) insert(buf, in).init
    else buf

  override def merge(a: List[ScoredBin], b: List[ScoredBin]): List[ScoredBin] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[ScoredBin]): Seq[ScoredBin] = buf

  override def bufferEncoder: Encoder[List[ScoredBin]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredBin]] = ExpressionEncoder()
}

object TopK {
  /** `topK(k)(score, id)` → `array<struct<score,id>>` of the k best rows
    * per group, best-first. Ids must be integral (cast to long).
    */
  def topK(k: Int): UserDefinedFunction = udaf(new TopKAgg(k), Encoders.product[ScoredId])

  /** [[topK]] with binary ids (string/binary columns cast to binary);
    * tie-break order is unsigned lexicographic = UTF8_BINARY.
    */
  def topKBin(k: Int): UserDefinedFunction = udaf(new TopKBinAgg(k), Encoders.product[ScoredBin])
}
