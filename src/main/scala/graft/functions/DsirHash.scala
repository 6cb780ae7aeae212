package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Hashed n-gram feature kernel for DSIR-style importance resampling
  * (Xie et al. 2023, "Data Selection for Language Models via Importance
  * Resampling" — reimplemented from the paper's prose: bag-of-hashed-
  * n-gram features, unigrams + bigrams, hashed into a fixed bucket
  * space).
  *
  * ENGINE-PORTABLE BUCKET CONTRACT: a gram's bucket is the first 60
  * bits of `md5(gram)` modulo `numBuckets` — bit-identical to the SQL
  * spelling `('0x' || substr(md5(g), 1, 15))::UBIGINT % numBuckets`
  * (the [[graft.ops.Sampling.hashLong]] primitive, applied to the gram
  * text instead of a row id). 15 hex chars = 60 bits always fits a
  * signed long, and md5 is the one hash every engine spells the same,
  * so the whole feature space — hence the fitted model and every
  * document score — is replayable in DuckDB/Postgres for oracle checks.
  *
  * Per the project's kernel rule (SCALE.md §kernel-allocation) this is
  * compiled per-row Scala (one MessageDigest reused across the
  * document's grams; `digest()` resets it), not an expression-tree
  * HOF: gram construction + hashing is a per-row × per-token loop,
  * exactly the shape that must not be interpreted per element.
  *
  * Tokenization is [[TextHash.tokenize]] — the canonical lowercased
  * `[a-z0-9]+` runs every other text operator uses (ASCII contract;
  * see TextHash Scaladoc).
  */
object DsirHash {

  /** First 60 bits of md5(gram) mod numBuckets, via a caller-supplied
    * (reused) MD5 instance. The first 15 hex chars of the digest are
    * the high 60 bits of its first 8 bytes. */
  private def bucketWith(md: MessageDigest, gram: String,
      numBuckets: Int): Long = {
    val d = md.digest(gram.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h >>> 4) % numBuckets
  }

  /** Bucket of a single gram — the SQL-parity primitive (DsirSpec pins
    * it against the expression spelling). */
  def bucket(gram: String, numBuckets: Int): Long =
    bucketWith(MessageDigest.getInstance("MD5"), gram, numBuckets)

  /** Hashed feature-bucket ids, WITH multiplicity, for one document:
    * every unigram then every space-joined bigram over
    * [[TextHash.tokenize]]. Empty/null text → empty array. */
  def gramBuckets(text: String, numBuckets: Int): Array[Long] = {
    val toks = TextHash.tokenize(text)
    val nUni = toks.length
    val nBi = if (nUni > 1) nUni - 1 else 0
    val out = new Array[Long](nUni + nBi)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < nUni) { out(i) = bucketWith(md, toks(i), numBuckets); i += 1 }
    i = 0
    while (i < nBi) {
      out(nUni + i) = bucketWith(md, toks(i) + " " + toks(i + 1), numBuckets)
      i += 1
    }
    out
  }

  /** Document importance score against a broadcast weight table:
    * `Σ weights(bucket(gram))` over the document's grams, an exact
    * long sum (order-free). Returns (nGrams, scoreMicro). `weights`
    * has length numBuckets. */
  def score(text: String, weights: Array[Long]): (Int, Long) = {
    val toks = TextHash.tokenize(text)
    val k = weights.length
    val md = MessageDigest.getInstance("MD5")
    var s = 0L
    var n = 0
    var i = 0
    while (i < toks.length) {
      s += weights(bucketWith(md, toks(i), k).toInt)
      n += 1
      i += 1
    }
    i = 0
    while (i < toks.length - 1) {
      s += weights(bucketWith(md, toks(i) + " " + toks(i + 1), k).toInt)
      n += 1
      i += 1
    }
    (n, s)
  }
}
