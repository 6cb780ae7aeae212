package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based quality/domain classification — the published pretraining
  * stage the heuristic filters ([[TextFilters]]) precede: GPT-3/PaLM
  * train a small linear classifier on a trusted positive corpus and
  * keep web documents the model scores highly (reimplemented from the
  * papers' prose as the Bernoulli-presence Naive-Bayes form — counts
  * and a log-odds sum — not any codebase). One aggregation pass trains
  * it, one broadcast join scores at scan speed, and the model is
  * exactly engine-replayable.
  *
  * EXACTNESS DESIGN (the x76 "oracle the model" pattern): the model's
  * per-token weights are QUANTIZED to integer micro-units
  * (`floor(1e6 * (ln a - ln b) + 0.5)`), so a document's score is an
  * exact INTEGER sum — order-independent across partitions and
  * bit-identical in any SQL engine. Every count feeding the weights
  * (class document frequencies, class sizes, vocabulary ranks) is an
  * exact integer; the only doubles live inside the one quantized
  * expression, where a last-ulp libm-ln disagreement between engines
  * can flip the floor only when `(ln a - ln b)·1e6` lands within ~1e-9
  * of an integer — ~2e-7 probability across a 100-term vocabulary
  * (ClassifySpec pins the arithmetic; the x84 oracle replays the whole
  * model AND the scores in SQL).
  *
  * Scale shape at 100 TB: training is one explode→groupBy over
  * (token, class) counts — fixed-width postings, map-side combined —
  * plus a vocabulary-sized sort-limit; scoring joins the postings to
  * the vocabulary-sized weight frame (broadcasts under AQE) and
  * aggregates one (id, long) pair per document. Corpus text never
  * shuffles.
  */
object Classify {

  /** Trained model: `weights` is (token, df_pos, df_neg, w_micro) —
    * vocabulary-sized; `biasMicro` the quantized log prior ratio;
    * `nPos`/`nNeg` the class document counts the weights were smoothed
    * with (kept for audit/replay).
    */
  final case class NbModel(weights: DataFrame, biasMicro: Long,
      nPos: Long, nNeg: Long)

  /** Per-document distinct-token postings — Bernoulli presence features
    * over the canonical [[TextAnalysis.tokens]] (lowercased [a-z0-9]+
    * runs, the same token boundary every other text operator uses). */
  private def postings(docs: DataFrame, textCol: String,
      keyCols: Seq[String]): DataFrame =
    docs.select(keyCols.map(col) :+
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"): _*)

  /** Train a binary Bernoulli-presence NB model.
    *
    * @param labelCol BOOLEAN column: true = positive class (e.g. the
    *                 trusted/reference corpus)
    * @param vocabSize keep the top `vocabSize` tokens by total document
    *                  frequency (ties broken by token ascending — pure
    *                  ASCII tokens, so the order is engine-portable);
    *                  out-of-vocabulary tokens score 0
    *
    * Weight spelling (replayed verbatim by the x84 oracle):
    * `a = (df_pos+1)/(n_pos+2)`, `b = (df_neg+1)/(n_neg+2)`,
    * `w_micro = floor((ln(a) - ln(b)) * 1e6 + 0.5)` — Laplace-smoothed
    * presence likelihood ratio in integer micro-nats. `floor(x + 0.5)`
    * rather than `round`: Java and SQL engines disagree on negative
    * round-half cases, floor+0.5 is one spelling everywhere.
    */
  def nbTrain(docs: DataFrame, textCol: String, labelCol: String,
      vocabSize: Int = 50000): NbModel = {
    val counts = postings(docs, textCol, Seq(labelCol))
      .groupBy("token")
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("df_pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("df_neg"))
    // coalesce: an empty frame sums to NULL, which would NPE at
    // getLong before the diagnostic require below can fire
    val sizes = docs.agg(
      coalesce(sum(when(col(labelCol), 1L).otherwise(0L)), lit(0L)),
      coalesce(sum(when(col(labelCol), 0L).otherwise(1L)), lit(0L))).head()
    val (nPos, nNeg) = (sizes.getLong(0), sizes.getLong(1))
    require(nPos > 0 && nNeg > 0,
      s"nbTrain: both classes must be non-empty (pos=$nPos, neg=$nNeg)")
    val vocab = counts
      .orderBy(col("df_pos").plus(col("df_neg")).desc, col("token").asc)
      .limit(vocabSize)
    val w = floor((log((col("df_pos") + 1L) / lit(nPos + 2.0)) -
      log((col("df_neg") + 1L) / lit(nNeg + 2.0))) * 1e6 + 0.5)
      .cast("long")
    val biasMicro =
      math.floor(math.log(nPos.toDouble / nNeg) * 1e6 + 0.5).toLong
    // materialize the vocabulary-sized weight frame ONCE (≤ vocabSize
    // rows): every nbScore call broadcasts it, and an unmaterialized
    // frame would re-run the full labeled-corpus postings aggregation
    // per scoring batch in a train-once/score-daily loop (the Dsir.fit
    // r21 finding applied to the classifier)
    NbModel(vocab.select(col("token"), col("df_pos"), col("df_neg"),
      w.as("w_micro")).localCheckpoint(true), biasMicro, nPos, nNeg)
  }

  /** Score documents against a trained model: (idCol, n_vocab_tokens,
    * score_micro, predicted) — `score_micro = biasMicro + Σ w_micro`
    * over the document's distinct in-vocabulary tokens (an exact long
    * sum), `predicted = score_micro > 0`. Documents with no vocabulary
    * token score the bare prior. The weight frame is vocabulary-sized
    * and broadcasts; the only shuffle is the per-document (id, long)
    * aggregation.
    */
  def nbScore(docs: DataFrame, textCol: String, idCol: String,
      model: NbModel): DataFrame = {
    val matched = postings(docs, textCol, Seq(idCol))
      .join(broadcast(model.weights.select("token", "w_micro")), Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_vocab_tokens"), sum(col("w_micro")).as("__s"))
    docs.select(col(idCol))
      .join(matched, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_vocab_tokens"), lit(0L)).as("n_vocab_tokens"),
        (coalesce(col("__s"), lit(0L)) + model.biasMicro).as("score_micro"))
      .withColumn("predicted", col("score_micro") > 0L)
  }

  /** Keep the documents a PRETRAINED model scores above
    * `minScoreMicro` (default 0 = the `predicted` boundary) — the
    * daily-loop form: train once, filter every batch against the same
    * broadcastable model. Original columns survive (id semi-join).
    *
    * NOTE `docs` is scanned three times (postings, id projection, the
    * semi-join): inside [[Pipeline.run]] the input is a checkpointed
    * stage frame so those are block reads, but a standalone caller with
    * an expensive upstream plan should cache/checkpoint `docs` first —
    * the same discipline [[TextAnalysis.lmScore]]'s docs spell out. */
  def nbKeep(docs: DataFrame, textCol: String, idCol: String,
      model: NbModel, minScoreMicro: Long = 0L): DataFrame =
    docs.join(nbScore(docs, textCol, idCol, model)
        .where(col("score_micro") > minScoreMicro).select(idCol),
      Seq(idCol), "left_semi")

  /** Train-and-keep form: classify `docs` with a model trained on
    * `labeled`, keeping documents predicted positive — the published
    * "classifier-filtered web corpus" recipe as one call. */
  def nbFilter(docs: DataFrame, textCol: String, idCol: String,
      labeled: DataFrame, labelCol: String,
      vocabSize: Int = 50000): DataFrame =
    nbKeep(docs, textCol, idCol, nbTrain(labeled, textCol, labelCol, vocabSize))
}
