package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark decontamination: flag training documents that share any
  * `n`-token gram with a benchmark/eval set — the published GPT-3/PaLM
  * method (13-gram overlap) reimplemented Spark-first.
  *
  * Plan shape at 100 TB: both sides explode to n-gram postings; the
  * benchmark side is tiny (an eval set), so after its `distinct` the
  * join broadcasts under AQE and the corpus postings NEVER shuffle — the
  * whole check is a map-side semi-join at scan speed. Corpus text is not
  * carried through the explode (only ids and 16-char keys), and the
  * result is a per-doc overlap count the caller anti-joins on.
  *
  * Gram keys are `substr(md5(gram_text), 1, 16)` — 64 bits of md5, the
  * same engine-replicable trick as the SimHash oracle, so a SQL engine
  * can recompute the exact same contamination verdicts.
  */
object Decontaminate {

  /** Distinct n-gram keys of `text` as an array column; empty when the
    * document has fewer than `n` tokens. */
  private def gramKeys(text: Column, n: Int): Column = {
    val toks = TextAnalysis.tokens(text)
    array_distinct(when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => substring(md5(concat_ws(" ", slice(toks, i + 1, lit(n))).cast(BinaryType)), 1, 16)))
      .otherwise(array().cast(ArrayType(StringType))))
  }

  /** Per-document contamination report against `bench`: (idCol,
    * n_overlap_grams, contaminated). Only documents with ≥ 1 overlapping
    * gram appear; the caller treats absence as clean (or left-joins).
    */
  def overlapReport(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val docGrams = docs.select(col(idCol).as("id"),
      explode(gramKeys(col(textCol), n)).as("gram"))
    val benchGrams = bench
      .select(explode(gramKeys(col(benchTextCol), n)).as("gram")).distinct()
    docGrams.join(benchGrams, Seq("gram")) // broadcasts: bench is small
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_overlap_grams"))
      .withColumn("contaminated", lit(true))
  }

  /** Drop contaminated documents from the corpus — payload anti-joined,
    * never shuffled. */
  def decontaminate(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    val bad = overlapReport(docs, textCol, idCol, bench, benchTextCol, n)
      .select(idCol)
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** Bloom-prefiltered decontamination — same exact result as
    * [[decontaminate]], cheaper at corpus scale. The benchmark's distinct
    * gram keys fold into a `BloomFilter` built DISTRIBUTED
    * (`stat.bloomFilter` merges per-partition filters — no driver
    * collect of the gram set) and broadcast once. The corpus then tests
    * gram membership in-place at scan speed; only documents with a
    * possible hit (true positives + an fpp-bounded sliver) explode into
    * postings for the exact verify join. False negatives are impossible
    * (Bloom guarantees), and the verify join eliminates false positives
    * — so the output is EXACTLY [[decontaminate]]'s, but the per-doc
    * posting explode+shuffle that dominates the exact path now touches
    * ~0.1% of a clean corpus instead of all of it.
    */
  def decontaminateBloom(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, n: Int = 13,
      fpp: Double = 0.001): DataFrame = {
    val benchGrams = bench
      .select(explode(gramKeys(col(benchTextCol), n)).as("gram")).distinct()
    val expected = math.max(benchGrams.count(), 1L)
    val bf = benchGrams.stat.bloomFilter("gram", expected, fpp)
    val bfB = docs.sparkSession.sparkContext.broadcast(bf)
    val mightHit = udf { (gs: Seq[String]) =>
      gs != null && gs.exists(bfB.value.mightContainString)
    }
    val candidates = docs.where(mightHit(gramKeys(col(textCol), n)))
    val confirmed = overlapReport(candidates, textCol, idCol,
      bench, benchTextCol, n).select(idCol)
    docs.join(confirmed, Seq(idCol), "left_anti")
  }

  /** Fuzzy decontamination: drop corpus documents whose exact shingle-set
    * Jaccard against ANY benchmark document clears `threshold` — the
    * near-duplicate complement to the exact n-gram paths above, for eval
    * sets that leak into training data lightly paraphrased or with
    * boilerplate attached (where no verbatim 13-gram survives but the
    * document is still the benchmark item).
    *
    * Composition, not new machinery: the benchmark plays the standing
    * corpus of [[graft.ops.Dedup.nearDupIncrement]] and the training
    * corpus is the incoming batch — MinHash-banded LSH proposes
    * (corpus doc, bench doc) candidates through an equi-join on
    * (band, bandHash), and exact Jaccard over candidate shingle sets
    * confirms, so false band collisions can never drop a clean document.
    * The benchmark side is keyed internally by `xxhash64` of its text
    * (deterministic across re-evaluations of the plan's two benchmark
    * scans; identical benchmark rows collapsing to one key only dedups
    * the candidate set).
    *
    * Scale shape: the corpus is scanned once for band keys and once more
    * (candidates only, semi-joined ids) for verification shingles — text
    * never shuffles, band rows are fixed-width (id, band, hash), and the
    * benchmark side is an eval set, so its banded frame broadcasts under
    * AQE. Same `maxBucket` degenerate-bucket guard and
    * `neardup_dropped_bucket_rows` accumulator as the incremental path.
    */
  def decontaminateFuzzy(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String, threshold: Double = 0.8,
      numHashes: Int = 64, bands: Int = 32, shingleSize: Int = 3,
      maxBucket: Int = 10000): DataFrame = {
    val benchKeyed = bench
      .select(col(benchTextCol).as(textCol))
      .withColumn(idCol, xxhash64(col(textCol)))
    Dedup.nearDupIncrement(benchKeyed, docs, textCol, idCol, threshold,
      numHashes, bands, shingleSize, maxBucket)
  }
}
