package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Compiled per-row hashing kernels for dedup signatures: shingle hashes,
  * MinHash, SimHash.
  *
  * Why UDFs and not column expressions: a MinHash signature is `numHashes`
  * minima over the shingle set. Expressed as a Catalyst expression tree,
  * each of the N signature elements embeds its own copy of the whole
  * tokenize→shingle→hash pipeline (Catalyst's CollapseProject inlines every
  * intermediate projection), which blows the generated code up by N× and
  * measured 300+ seconds for 500 documents. A single JIT-compiled Scala
  * function computes the same signature in one pass over the tokens —
  * microseconds per row. This is the documented "genuine per-row imperative
  * kernel" exception to the functions-over-UDFs rule; everything around it
  * (banding, joins, jaccard verification) stays declarative DataFrame ops.
  *
  * All hashing is deterministic (FNV-1a 64 + splitmix64 finalizer — public
  * constants), so signatures are reproducible across runs and executors.
  */
object TextHash {

  def tokenize(text: String): Array[String] = {
    if (text == null) return Array.empty
    // manual scan — no regex compilation, no intermediate empty tokens
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c0 = text.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length() > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length() > 0) out += sb.toString
    out.toArray
  }

  /** FNV-1a 64-bit over UTF-8 bytes, finalized with splitmix64. */
  def hashString(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mix(h)
  }

  /** splitmix64 finalizer — full avalanche. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Exact Jaccard similarity over the DISTINCT values of two hash
    * arrays — the compiled per-PAIR verify kernel (project rule: join
    * scoring never runs as an expression tree; `array_intersect` /
    * `array_union` build a hash set per ROW with boxed elements, and
    * this runs once per candidate pair — measured 5.1 s → ~2 s on the
    * b14 verify tail). Inputs need not be sorted or deduplicated: each
    * is copy-sorted (bounded by shingle count) and the merge counts the
    * intersection over unique values.
    *
    * FP contract: the result is `intersect.toDouble / union.toDouble` —
    * two exact int-to-double conversions and ONE correctly-rounded IEEE
    * division, bit-identical to the
    * `size(array_intersect(a,b)).cast(double) / size(array_union(a,b))`
    * spelling it replaces (sizes are exact ints; the oracles replay the
    * same division). Both-empty inputs return NaN, like 0.0/0 did —
    * NaN >= threshold is false in both engines.
    */
  def jaccardDistinct(a: Array[Long], b: Array[Long]): Double = {
    val sa = java.util.Arrays.copyOf(a, a.length)
    val sb = java.util.Arrays.copyOf(b, b.length)
    java.util.Arrays.sort(sa)
    java.util.Arrays.sort(sb)
    var i = 0; var j = 0; var inter = 0; var na = 0; var nb = 0
    while (i < sa.length && j < sb.length) {
      // step past duplicates so counts are over the distinct sets
      while (i + 1 < sa.length && sa(i + 1) == sa(i)) i += 1
      while (j + 1 < sb.length && sb(j + 1) == sb(j)) j += 1
      if (sa(i) == sb(j)) { inter += 1; na += 1; nb += 1; i += 1; j += 1 }
      else if (sa(i) < sb(j)) { na += 1; i += 1 }
      else { nb += 1; j += 1 }
    }
    while (i < sa.length) {
      while (i + 1 < sa.length && sa(i + 1) == sa(i)) i += 1
      na += 1; i += 1
    }
    while (j < sb.length) {
      while (j + 1 < sb.length && sb(j + 1) == sb(j)) j += 1
      nb += 1; j += 1
    }
    val union = na + nb - inter
    if (union == 0) Double.NaN else inter.toDouble / union.toDouble
  }

  /** 64-bit hash per n-token shingle (whole text if shorter than n).
    * Shingle hash = mixed combination of the token hashes — no shingle
    * string is ever materialized (each token hashed exactly once).
    */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val toks = tokenize(text)
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { th(i) = hashString(toks(i)); i += 1 }
    combineShingles(th, n)
  }

  private def combineShingles(th: Array[Long], n: Int): Array[Long] = {
    if (th.length <= n) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < th.length) { h = mix(h ^ th(i)); i += 1 }
      return Array(h)
    }
    val out = new Array[Long](th.length - n + 1)
    var i = 0
    while (i < out.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < n) { h = mix(h ^ th(i + j)); j += 1 }
      out(i) = h
      i += 1
    }
    out
  }

  /** MinHash signature: per seed, min over shingles of mix(h ^ seed'). */
  def minhash(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val sh = shingleHashes(text, shingleSize)
    val sig = new Array[Long](numHashes)
    var s = 0
    while (s < numHashes) {
      val seed = mix(s.toLong)
      var m = Long.MaxValue
      var i = 0
      while (i < sh.length) { val v = mix(sh(i) ^ seed); if (v < m) m = v; i += 1 }
      sig(s) = m
      s += 1
    }
    sig
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(UTF-8 bytes), big-endian — the SimHash token
    * hash. md5-derived (instead of FNV like the shingle hashes) so the
    * whole SimHash pipeline is reproducible by ANY engine with an md5
    * function: `('0x' || substr(md5(tok),1,16))::UBIGINT` in DuckDB is
    * bit-identical, which is what lets the x7 correctness oracle compute
    * the exact pair ground truth in SQL. Hashing cost is ~2× FNV, but
    * SimHash is dominated by the 64 vote updates per token anyway.
    */
  def md5Hash64(s: String): Long = {
    val d = md5Digest.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (h(i) & 0xffL); i += 1 }
    out
  }

  /** 64-bit SimHash over md5 token hashes: each bit votes ±1, sign wins. */
  def simhash(text: String): Long = {
    val toks = tokenize(text)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = md5Hash64(toks(i))
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Band hashes of the MinHash signature in one pass: `bands` values,
    * each hashing `numHashes / bands` consecutive signature minima —
    * what LSH banding actually joins on. Avoids re-hashing signature
    * slices in expression space (array→string casts per row).
    */
  def minhashBands(text: String, numHashes: Int, bands: Int, shingleSize: Int): Array[Long] = {
    val sig = minhash(text, numHashes, shingleSize)
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < rows) { h = mix(h ^ sig(b * rows + j)); j += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  // --- Column-level wrappers -------------------------------------------

  def shingleHashesUdf(n: Int): Column => Column = {
    val f = udf((t: String) => shingleHashes(t, n)); c => f(c)
  }
  def minhashUdf(numHashes: Int, shingleSize: Int): Column => Column = {
    val f = udf((t: String) => minhash(t, numHashes, shingleSize)); c => f(c)
  }
  def minhashBandsUdf(numHashes: Int, bands: Int, shingleSize: Int): Column => Column = {
    val f = udf((t: String) => minhashBands(t, numHashes, bands, shingleSize)); c => f(c)
  }
  val simhashUdf: Column => Column = {
    val f = udf((t: String) => simhash(t)); c => f(c)
  }
  /** [[jaccardDistinct]] as a two-column UDF. Spark hands array<bigint>
    * UDF args as primitive-backed ArraySeq — `toArray` is one flat copy
    * (never index a UDF Seq directly: a linked List makes loops
    * quadratic, the project's standing gotcha). A null array on either
    * side yields SQL NULL — the same semantics as the
    * `size(array_intersect)/size(array_union)` spelling this kernel
    * replaced (null ≥ threshold filters false, the row drops).
    */
  val jaccardDistinctUdf: (Column, Column) => Column = {
    val f = udf((a: Seq[Long], b: Seq[Long]) =>
      if (a == null || b == null) None
      else Some(jaccardDistinct(a.toArray, b.toArray)))
    (a, b) => f(a, b)
  }

  /** The integer stats behind the Gopher quality rules
    * ([[graft.ops.TextFilters]]), in one compiled pass — the per-row
    * imperative-kernel exception again: the expression spelling walks
    * seven interpreted higher-order functions over the split arrays per
    * document (measured ~75 µs/doc — the most expensive stage of the
    * b17 pipeline bench by far), this kernel is one scan.
    *
    * PARITY BY CONSTRUCTION with the expression spelling (pinned by
    * GopherParitySpec fuzz + the x25 oracle): character counts use
    * Spark's own code-point semantics (`codePointCount`, matching
    * `length()`), line trim and lowercasing go through Spark's
    * `UTF8String` (whatever `trim()`/`lower()` do, this does), and the
    * rlike patterns run as the same java.util.regex `find()` Spark's
    * RLike executes — including `$`-before-final-line-terminator
    * subtleties a hand-rolled endsWith would miss. Only the integer
    * stats live here; the ratio divisions and threshold comparisons
    * stay in identical Column expressions, so the rule booleans are
    * bit-for-bit the old ones.
    */
  final case class GopherStats(nWords: Int, sumWordLen: Long, nSymbols: Int,
      nLines: Int, nBulletLines: Int, nEllipsisLines: Int, nAlphaWords: Int,
      stopHits: Int)

  private val GopherWs = java.util.regex.Pattern.compile(
    graft.ops.TextAnalysis.FingerprintWsJava)
  private val GopherEllipsis = java.util.regex.Pattern.compile("\\.\\.\\.|…")
  private val GopherBulletLine = java.util.regex.Pattern.compile("^[-*•‣◦]")
  private val GopherEllipsisLine = java.util.regex.Pattern.compile("(\\.\\.\\.|…)$")
  private val GopherTok = java.util.regex.Pattern.compile("[^a-z0-9]+")
  private val GopherStopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherStats(text: String): GopherStats = {
    val words = GopherWs.split(text, -1)
    var nWords = 0; var sumLen = 0L; var nAlpha = 0
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.length > 0) {
        nWords += 1
        sumLen += w.codePointCount(0, w.length)
        var j = 0; var alpha = false
        while (!alpha && j < w.length) {
          val c = w.charAt(j)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha = true
          j += 1
        }
        if (alpha) nAlpha += 1
      }
      wi += 1
    }
    var nSymbols = 0
    var si = 0
    while (si < text.length) {
      if (text.charAt(si) == '#') nSymbols += 1
      si += 1
    }
    val em = GopherEllipsis.matcher(text)
    while (em.find()) nSymbols += 1
    var nLines = 0; var nBullet = 0; var nEll = 0
    val rawLines = text.split("\n", -1)
    var li = 0
    while (li < rawLines.length) {
      val l = org.apache.spark.unsafe.types.UTF8String
        .fromString(rawLines(li)).trim().toString
      if (l.length > 0) {
        nLines += 1
        if (GopherBulletLine.matcher(l).find()) nBullet += 1
        if (GopherEllipsisLine.matcher(l).find()) nEll += 1
      }
      li += 1
    }
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val toks = GopherTok.split(lowered, -1)
    val tokSet = new java.util.HashSet[String](Math.max(16, toks.length * 2))
    var ti = 0
    while (ti < toks.length) {
      if (toks(ti).length > 0) tokSet.add(toks(ti))
      ti += 1
    }
    var stopHits = 0
    var sw = 0
    while (sw < GopherStopwords.length) {
      if (tokSet.contains(GopherStopwords(sw))) stopHits += 1
      sw += 1
    }
    GopherStats(nWords, sumLen, nSymbols, nLines, nBullet, nEll, nAlpha, stopHits)
  }

  /** [[gopherStats]] as a struct column; null text yields a null struct,
    * so every derived rule boolean is NULL — exactly the expression
    * spelling's null propagation. */
  val gopherStatsUdf: Column => Column = {
    val f = udf((t: String) => Option(t).map(gopherStats))
    c => f(c)
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  /** First 8 bytes of md5(UTF-8 bytes) as 16 lowercase hex chars — the
    * decontamination gram key, value-identical to Spark's
    * `substring(md5(s.cast(binary)), 1, 16)`. */
  def md5Hex16(s: String): String = {
    val d = md5Digest.get()
    d.reset()
    val h = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = HexDigits((h(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(h(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Distinct n-gram md5-prefix keys of a document in one compiled pass
    * — the kernel behind [[graft.ops.Decontaminate]]'s gram extraction
    * (the expression spelling built every gram through an interpreted
    * `transform`/`slice`/`concat_ws`/`md5` tree — per GRAM, the
    * decontamination stage was the most expensive step of the b17
    * pipeline bench after the quality kernel landed). Parity by
    * construction with `Decontaminate.gramKeysExpr`, which
    * GopherParitySpec fuzz-pins: tokens are Spark's
    * `split(lower(text), "[^a-z0-9]+")` (lowercase via UTF8String, the
    * engine's own casing), grams join with single spaces, keys are
    * [[md5Hex16]], distinct keeps first-occurrence order
    * (`array_distinct` semantics), and a document with fewer than `n`
    * tokens (or null text) yields an EMPTY array — the expression's
    * null-predicate `when` falls to the empty `otherwise` branch.
    */
  def gramKeys(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val lowered = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).toLowerCase.toString
    val parts = GopherTok.split(lowered, -1)
    var nToks = 0
    var i = 0
    while (i < parts.length) { if (parts(i).length > 0) nToks += 1; i += 1 }
    if (nToks < n) return Array.empty
    val toks = new Array[String](nToks)
    var j = 0
    i = 0
    while (i < parts.length) {
      if (parts(i).length > 0) { toks(j) = parts(i); j += 1 }
      i += 1
    }
    val seen = new java.util.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder(64)
    i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(md5Hex16(sb.toString))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  def gramKeysUdf(n: Int): Column => Column = {
    val f = udf((t: String) => gramKeys(t, n)); c => f(c)
  }
}
