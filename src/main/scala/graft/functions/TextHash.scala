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

  /** [[hashString]] of every [[tokenize]] token, with neither the token
    * strings nor the token array ever materialized: tokens are
    * `[a-z0-9]+` runs (pure ASCII, so their UTF-8 bytes ARE their
    * chars), which lets the FNV-1a accumulate per char in the same scan
    * that finds the boundaries. Bit-identical to
    * `tokenize(text).map(hashString)` (OpsSpec pins signature parity).
    * Two passes (count, fill) so the single allocation is the exact-size
    * output array — the per-row allocation discipline of
    * SCALE.md §kernel-allocation.
    */
  def tokenHashes(text: String): Array[Long] = {
    if (text == null) return Array.empty
    val n = text.length
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val c0 = text.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum && !inTok) { count += 1; inTok = true }
      else if (!alnum) inTok = false
      i += 1
    }
    val out = new Array[Long](count)
    var j = 0
    var h = 0xcbf29ce484222325L
    inTok = false
    i = 0
    while (i < n) {
      val c0 = text.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (!inTok) { h = 0xcbf29ce484222325L; inTok = true }
        h ^= c.toLong // ASCII char == its UTF-8 byte
        h *= 0x100000001b3L
      } else if (inTok) { out(j) = mix(h); j += 1; inTok = false }
      i += 1
    }
    if (inTok) { out(j) = mix(h); j += 1 }
    out
  }

  /** 64-bit hash per n-token shingle (whole text if shorter than n).
    * Shingle hash = mixed combination of the token hashes — no shingle
    * string (or token string: [[tokenHashes]]) is ever materialized.
    */
  def shingleHashes(text: String, n: Int): Array[Long] =
    combineShingles(tokenHashes(text), n)

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

  /** 64-bit SimHash over md5 token hashes: each bit votes ±1, sign wins.
    * Tokens stream as lowered-ASCII byte ranges into a reused buffer for
    * the md5 (never materialized as strings — [[tokenHashes]]'s
    * observation again: `[a-z0-9]+` runs ARE their UTF-8 bytes), so the
    * per-call allocations are just the vote array
    * (SCALE.md §kernel-allocation). Bit-identical to
    * `tokenize(text).map(md5Hash64)` voting — the x7 DuckDB oracle
    * replays the hashes from the same token strings.
    */
  def simhash(text: String): Long = {
    val votes = new Array[Int](64)
    if (text != null) {
      val d = md5Digest.get()
      val len = text.length
      @inline def lowAlnum(p: Int): Char = {
        val c0 = text.charAt(p)
        val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) c else 0
      }
      var i = 0
      while (i < len) {
        if (lowAlnum(i) != 0) {
          var j = i + 1
          while (j < len && lowAlnum(j) != 0) j += 1
          var buf = gramBuf.get()
          if (j - i > buf.length) {
            buf = new Array[Byte](Integer.highestOneBit(j - i) * 2)
            gramBuf.set(buf)
          }
          var q = i
          while (q < j) { buf(q - i) = lowAlnum(q).toByte; q += 1 }
          d.reset()
          d.update(buf, 0, j - i)
          val h = first8BE(d.digest())
          var b = 0
          while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
          i = j
        } else i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  @inline private def first8BE(h: Array[Byte]): Long = {
    var out = 0L
    var i = 0
    while (i < 8) { out = (out << 8) | (h(i) & 0xffL); i += 1 }
    out
  }

  /** The exact-substring-window keys of [[graft.ops.Dedup]]'s window
    * family ([[graft.ops.Dedup.sharedWindowFlags]] /
    * `sharedWindowIncrement`): the DISTINCT md5 digests (16 raw bytes,
    * first-occurrence order — `array_distinct` semantics) of every
    * n-token window of the trimmed text, windows joined with single
    * spaces. Replaces the interpreted per-gram expression tree
    * (`transform(sequence(...), i => unhex(md5(array_join(slice(...)`
    * — `transform` is CodegenFallback, so every gram paid an
    * interpreter round-trip plus a slice array, a join string, and a
    * getBytes; the most expensive projection of the b7 bench row).
    *
    * Parity by construction with that spelling, which the x43/x46
    * DuckDB oracles replay in SQL and WindowKeysParity pins by fuzz:
    * the leading trim strips ASCII 0x20 only (Spark `trim`), tokens
    * split on the engine-portable whitespace class with Java
    * `split(_, -1)` field semantics (a leading/trailing non-space ws
    * char yields an EMPTY token that joins as a bare separator), the
    * gram string is UTF-8 (tokens here are arbitrary non-ws runs, NOT
    * lowercased [a-z0-9] — full encoding, surrogate pairs included),
    * and fewer than n tokens (or null/space-only text) yields an empty
    * array, which `explode` drops like the old `where` guard did.
    *
    * Allocation discipline (SCALE.md §kernel-allocation): the text is
    * UTF-8-encoded ONCE into a reused thread-local buffer with token
    * byte offsets recorded in passing; each window then md5-updates
    * straight over the token byte ranges (separator bytes between) —
    * no per-gram string or array ever exists. Per-call allocations are
    * the offset arrays and the output digests themselves.
    */
  def windowKeys(text: String, n: Int): Array[Array[Byte]] = {
    if (text == null) return WindowKeysEmpty
    // Spark trim(): ASCII spaces only
    var s = 0
    var e = text.length
    while (s < e && text.charAt(s) == ' ') s += 1
    while (e > s && text.charAt(e - 1) == ' ') e -= 1
    if (e == s) return WindowKeysEmpty
    // one pass: UTF-8-encode into the reused buffer, recording token
    // field boundaries with Java split(-1) semantics (fields between
    // maximal ws runs; leading/trailing empties when the trimmed text
    // starts/ends with a ws char)
    var buf = gramBuf.get()
    var bi = 0
    @inline def ensure(k: Int): Unit =
      if (bi + k > buf.length) {
        buf = java.util.Arrays.copyOf(buf, Math.max(bi + k, buf.length * 2))
        gramBuf.set(buf)
      }
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var nToks = 0
    @inline def openTok(at: Int): Unit = {
      if (nToks == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nToks * 2)
        ends = java.util.Arrays.copyOf(ends, nToks * 2)
      }
      starts(nToks) = at
    }
    var inTok = false
    var i = s
    while (i < e) {
      val c = text.charAt(i)
      if (isGopherWs(c)) {
        if (inTok) { ends(nToks) = bi; nToks += 1; inTok = false }
        else if (i == s) { openTok(0); ends(nToks) = 0; nToks += 1 } // leading empty field
        i += 1
      } else {
        if (!inTok) { openTok(bi); inTok = true }
        // manual UTF-8 encode (tokens are arbitrary chars)
        val cp =
          if (Character.isHighSurrogate(c) && i + 1 < e &&
              Character.isLowSurrogate(text.charAt(i + 1))) {
            i += 1
            Character.toCodePoint(c, text.charAt(i))
          } else if (Character.isSurrogate(c)) 0x3F // unpaired surrogate →
            // '?', matching String.getBytes(UTF_8) / UTF8String (the
            // expression spelling this kernel must hash identically to);
            // a CESU-style 3-byte sequence here would fork the window key
          else c.toInt
        if (cp < 0x80) { ensure(1); buf(bi) = cp.toByte; bi += 1 }
        else if (cp < 0x800) {
          ensure(2)
          buf(bi) = (0xC0 | (cp >> 6)).toByte
          buf(bi + 1) = (0x80 | (cp & 0x3F)).toByte
          bi += 2
        } else if (cp < 0x10000) {
          ensure(3)
          buf(bi) = (0xE0 | (cp >> 12)).toByte
          buf(bi + 1) = (0x80 | ((cp >> 6) & 0x3F)).toByte
          buf(bi + 2) = (0x80 | (cp & 0x3F)).toByte
          bi += 3
        } else {
          ensure(4)
          buf(bi) = (0xF0 | (cp >> 18)).toByte
          buf(bi + 1) = (0x80 | ((cp >> 12) & 0x3F)).toByte
          buf(bi + 2) = (0x80 | ((cp >> 6) & 0x3F)).toByte
          buf(bi + 3) = (0x80 | (cp & 0x3F)).toByte
          bi += 4
        }
        i += 1
      }
    }
    if (inTok) { ends(nToks) = bi; nToks += 1 }
    else { openTok(bi); ends(nToks) = bi; nToks += 1 } // trailing empty field
    val total = nToks - (n - 1)
    if (total <= 0) return WindowKeysEmpty
    val d = md5Digest.get()
    val seen = new java.util.LinkedHashSet[java.nio.ByteBuffer]
    var w = 0
    while (w < total) {
      d.reset()
      var k = 0
      while (k < n) {
        if (k > 0) d.update(' '.toByte)
        d.update(buf, starts(w + k), ends(w + k) - starts(w + k))
        k += 1
      }
      seen.add(java.nio.ByteBuffer.wrap(d.digest()))
      w += 1
    }
    val out = new Array[Array[Byte]](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().array(); o += 1 }
    out
  }

  private val WindowKeysEmpty = new Array[Array[Byte]](0)

  def windowKeysUdf(n: Int): Column => Column = {
    val f = udf((t: String) => windowKeys(t, n)); c => f(c)
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
    * `length()`), line trim and lowercasing follow Spark's
    * `UTF8String` exactly (trim strips ASCII 0x20 only; the lowercase
    * fast path below IS `toLowerCaseAscii`), and the rlike tests
    * replicate java.util.regex `find()` — including the
    * `$`-before-final-line-terminator subtlety a naive endsWith would
    * miss. Only the integer stats live here; the ratio divisions and
    * threshold comparisons stay in identical Column expressions, so the
    * rule booleans are bit-for-bit the old ones.
    *
    * ALLOCATION-FREE BY DESIGN (r17): the first kernel spelled these
    * stats through `Pattern.split` + `String.split` + a per-call
    * HashSet + per-line `UTF8String` round-trips — ~50 short-lived
    * objects per document. Correct and 14 µs/doc single-threaded, but
    * on 32 executor threads the allocation rate hit the GC/memory
    * wall: measured 164–182 µs/call inside Spark (B17IngestProbe, an
    * in-UDF nano accumulator over the 600k-doc b17 batch) — a 12×
    * thread-scaling collapse that made the quality stage ~6 s of the
    * pipeline even though the arithmetic is trivial. This rewrite is
    * pure index scans over the original string (the only allocation is
    * the non-ASCII lowercase fallback, rare in practice), restoring
    * near-linear thread scaling. The lesson generalizes: a per-row
    * kernel that allocates does not scale to full executor
    * parallelism, no matter how fast it is single-threaded —
    * SCALE.md §kernel-allocation. [[gopherStatsRef]] keeps the
    * original regex spelling as the readable reference;
    * GopherParitySpec fuzzes new ≡ ref ≡ expression on the edge and
    * random corpora.
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

  /** Membership test for [[graft.ops.TextAnalysis.WsCharsJava]] — the
    * explicit engine-portable whitespace class, inlined. */
  @inline private def isGopherWs(c: Char): Boolean =
    c match {
      case ' ' | '\t' | '\n' | '\u000B' | '\f' | '\r' | '\u0085' |
           '\u00A0' | '\u1680' | '\u2028' | '\u2029' | '\u202F' |
           '\u205F' | '\u3000' => true
      case _ => c >= '\u2000' && c <= '\u200A'
    }

  /** `$`'s "before a final line terminator" set (java.util.regex default
    * mode), minus '\n' which cannot appear inside a split line. */
  @inline private def isDollarTerm(c: Char): Boolean =
    c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  def gopherStats(text: String): GopherStats = {
    val len = text.length
    // words: maximal runs of non-ws chars; per word count code points
    // (surrogate pairs count once, like codePointCount) and flag ASCII
    // alpha presence
    var nWords = 0; var sumLen = 0L; var nAlpha = 0
    var nSymbols = 0
    var i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (!isGopherWs(c)) {
        nWords += 1
        var alpha = false
        var j = i
        while (j < len && !isGopherWs(text.charAt(j))) {
          val cj = text.charAt(j)
          sumLen += 1
          if (Character.isHighSurrogate(cj) && j + 1 < len &&
              Character.isLowSurrogate(text.charAt(j + 1)) &&
              !isGopherWs(text.charAt(j + 1))) {
            j += 1 // one code point, two chars — the pair stays in-word
          }
          if (!alpha && ((cj >= 'A' && cj <= 'Z') || (cj >= 'a' && cj <= 'z')))
            alpha = true
          j += 1
        }
        if (alpha) nAlpha += 1
        i = j
      } else i += 1
    }
    // symbols: '#' chars plus non-overlapping leftmost (...|…) matches
    i = 0
    while (i < len) {
      val c = text.charAt(i)
      if (c == '#') { nSymbols += 1; i += 1 }
      else if (c == '.' && i + 2 < len && text.charAt(i + 1) == '.' &&
               text.charAt(i + 2) == '.') { nSymbols += 1; i += 3 }
      else if (c == '…') { nSymbols += 1; i += 1 }
      else i += 1
    }
    // lines: segments between '\n', trimmed of ASCII spaces only
    // (UTF8String.trim semantics); bullet = first trimmed char in the
    // class; ellipsis = (...|…) at trimmed end OR before one final
    // $-terminator char
    var nLines = 0; var nBullet = 0; var nEll = 0
    var ls = 0
    while (ls <= len) {
      var le = text.indexOf('\n', ls)
      if (le < 0) le = len
      var s = ls; var e = le
      while (s < e && text.charAt(s) == ' ') s += 1
      while (e > s && text.charAt(e - 1) == ' ') e -= 1
      if (e > s) {
        nLines += 1
        val c0 = text.charAt(s)
        if (c0 == '-' || c0 == '*' || c0 == '•' || c0 == '‣' ||
            c0 == '◦') nBullet += 1
        @inline def ellAt(p: Int): Boolean =
          (p - s >= 3 && text.charAt(p - 1) == '.' && text.charAt(p - 2) == '.' &&
            text.charAt(p - 3) == '.') ||
          (p - s >= 1 && text.charAt(p - 1) == '…')
        if (ellAt(e) || (isDollarTerm(text.charAt(e - 1)) && ellAt(e - 1)))
          nEll += 1
      }
      ls = le + 1
    }
    // stopword presence over distinct [a-z0-9]+ tokens of the LOWERED
    // text. ASCII fast path lowers per char (exactly
    // UTF8String.toLowerCaseAscii); any non-ASCII char falls back to the
    // engine's own full lowering, then the same inline token scan.
    var stopMask = 0
    var ascii = true
    i = 0
    while (ascii && i < len) { if (text.charAt(i) >= 0x80) ascii = false; i += 1 }
    val lowered: String =
      if (ascii) null // scan `text` lowering on the fly
      else org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
    val src = if (ascii) text else lowered
    val slen = src.length
    @inline def low(c: Char): Char =
      if (ascii && c >= 'A' && c <= 'Z') (c + 32).toChar else c
    i = 0
    while (i < slen && stopMask != 0xFF) {
      val c = low(src.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        while (j < slen && {
          val cj = low(src.charAt(j))
          (cj >= 'a' && cj <= 'z') || (cj >= '0' && cj <= '9')
        }) j += 1
        val tl = j - i
        if (tl >= 2 && tl <= 4) {
          var sw = 0
          while (sw < GopherStopwords.length) {
            if ((stopMask & (1 << sw)) == 0) {
              val w = GopherStopwords(sw)
              if (w.length == tl) {
                var k = 0
                while (k < tl && low(src.charAt(i + k)) == w.charAt(k)) k += 1
                if (k == tl) stopMask |= 1 << sw
              }
            }
            sw += 1
          }
        }
        i = j
      } else i += 1
    }
    val stopHits = Integer.bitCount(stopMask)
    GopherStats(nWords, sumLen, nSymbols, nLines, nBullet, nEll, nAlpha, stopHits)
  }

  /** The original regex/split spelling of [[gopherStats]] — kept as the
    * readable reference implementation the allocation-free kernel is
    * fuzzed against (GopherParitySpec: ref ≡ kernel ≡ expression). */
  private[graft] def gopherStatsRef(text: String): GopherStats = {
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
    *
    * Allocation discipline (SCALE.md §kernel-allocation): tokens are
    * index ranges, never strings — they are `[a-z0-9]+` runs of the
    * LOWERED text, pure ASCII, so each gram's UTF-8 bytes stream
    * straight from the chars into a reused thread-local buffer the md5
    * digests from. The ASCII-only fast path skips the `UTF8String`
    * lowering round-trip entirely (per-char `A-Z`+32 IS
    * `toLowerCaseAscii`); only genuinely non-ASCII documents pay it.
    * Remaining per-call allocations are the outputs themselves (one
    * 16-char key per distinct gram + the dedup set).
    */
  def gramKeys(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    var ascii = true
    var p = 0
    val rawLen = text.length
    while (ascii && p < rawLen) { if (text.charAt(p) >= 0x80) ascii = false; p += 1 }
    val src =
      if (ascii) text
      else org.apache.spark.unsafe.types.UTF8String
        .fromString(text).toLowerCase.toString
    val len = src.length
    @inline def low(c: Char): Char =
      if (ascii && c >= 'A' && c <= 'Z') (c + 32).toChar else c
    @inline def alnum(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
    // token boundaries as index pairs, one pass
    var nToks = 0
    var i = 0
    while (i < len) {
      if (alnum(low(src.charAt(i)))) {
        nToks += 1
        while (i < len && alnum(low(src.charAt(i)))) i += 1
      } else i += 1
    }
    if (nToks < n) return Array.empty
    val starts = new Array[Int](nToks)
    val ends = new Array[Int](nToks)
    var j = 0
    i = 0
    while (i < len) {
      if (alnum(low(src.charAt(i)))) {
        starts(j) = i
        while (i < len && alnum(low(src.charAt(i)))) i += 1
        ends(j) = i
        j += 1
      } else i += 1
    }
    val seen = new java.util.LinkedHashSet[String]
    var buf = gramBuf.get()
    val d = md5Digest.get()
    i = 0
    while (i + n <= nToks) {
      var bi = 0
      var k = 0
      while (k < n) {
        val s = starts(i + k); val e = ends(i + k)
        val need = bi + (e - s) + 1
        if (need > buf.length) {
          buf = java.util.Arrays.copyOf(buf, Math.max(need, buf.length * 2))
          gramBuf.set(buf)
        }
        if (k > 0) { buf(bi) = ' '.toByte; bi += 1 }
        var q = s
        while (q < e) { buf(bi) = low(src.charAt(q)).toByte; bi += 1; q += 1 }
        k += 1
      }
      d.reset()
      d.update(buf, 0, bi)
      val h = d.digest()
      val out = new Array[Char](16)
      var hi = 0
      while (hi < 8) {
        out(2 * hi) = HexDigits((h(hi) >> 4) & 0xf)
        out(2 * hi + 1) = HexDigits(h(hi) & 0xf)
        hi += 1
      }
      seen.add(new String(out))
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  private val gramBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  def gramKeysUdf(n: Int): Column => Column = {
    val f = udf((t: String) => gramKeys(t, n)); c => f(c)
  }
}
