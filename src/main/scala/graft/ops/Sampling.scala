package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic sampling and corpus mixing for training-data pipelines.
  *
  * Spark's `sample()` is seed-dependent per partition SPLIT, so the same
  * row can be kept in one run and dropped after a repartition — useless
  * for resumable 100 TB pipelines. These operators derive a uniform in
  * [0,1) from `md5(id || salt)` instead: the keep decision is a pure
  * function of the row, stable across runs, partitionings, cluster
  * sizes, AND engines (any SQL engine with md5 can reproduce the exact
  * sample — same trick as the SimHash oracle). Changing `salt` draws an
  * independent sample.
  */
object Sampling {

  /** The first 60 bits of md5(id || salt) as a non-negative long — the
    * engine-replicable hash primitive behind [[hashUniform]] and
    * [[graft.ops.Packing]]'s sharding (DuckDB spelling:
    * `('0x' || substr(md5(id || salt), 1, 15))::UBIGINT`). 15 hex chars
    * = 60 bits always fits a signed long in every engine.
    */
  def hashLong(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast(StringType), lit(salt)).cast(BinaryType)), 1, 15),
      16, 10).cast(LongType)

  /** Uniform [0,1) from [[hashLong]] — a single IEEE division, so the
    * value is bit-identical everywhere. */
  def hashUniform(id: Column, salt: String): Column =
    hashLong(id, salt).cast(DoubleType) / lit(math.pow(2, 60))

  /** Keep each row with probability `fraction`, deterministically. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = "graft"): DataFrame =
    df.where(hashUniform(col(idCol), salt) < fraction)

  /** Domain-weighted corpus mixing: per-domain keep rates (e.g. upsample
    * curated sources, downsample web crawl), unknown domains get
    * `defaultRate`. One scan, no shuffle — the mix decision is a
    * codegen'd projection.
    */
  def stratifiedMix(df: DataFrame, domainCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (dom, r)) =>
      when(col(domainCol) === dom, r).otherwise(acc)
    }
    df.where(hashUniform(col(idCol), salt) < rate)
  }

  /** Temperature-flattened corpus mixing — the multilingual rebalancing
    * standard (the mC4/XLM-R sampling rule, re-expressed from the
    * published formula): group g's share of the output follows
    * c_g^alpha renormalized, flattening the head and boosting the tail
    * as alpha → 0; alpha = 1 is proportional sampling (a plain
    * [[hashSample]] at `targetFraction`). `targetFraction` sets the
    * output size relative to the input; a group whose boosted demand
    * exceeds its supply caps at rate 1.0 — this operator only DROPS
    * rows (repeat-epoch upsampling is a training-loop concern, not a
    * corpus transform). Rows whose group is null drop (no demand).
    *
    * Determinism across runs AND engines: the per-group rates come off
    * the tiny groupBy-count frame on the driver with a SORTED fold
    * order, then round to 9 decimals — a 1-ulp `pow`/division
    * difference between engines cannot move a 9-dp-rounded rate except
    * on a measure-zero grid boundary — and the keep decision is
    * [[hashUniform]] < rate, a pure function of the row. Scale shape:
    * one count aggregation (bytes: one row per group), then one
    * codegen'd scan; the payload never shuffles.
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, targetFraction: Double,
      salt: String = "graft"): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 1,
      s"targetFraction must be in (0, 1], got $targetFraction")
    val counts = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast(StringType).as("g"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    if (counts.isEmpty) return df.where(lit(false))
    val total = counts.map(_._2).sum.toDouble
    val powSum = counts.foldLeft(0.0) { case (a, (_, c)) =>
      a + math.pow(c.toDouble, alpha)
    }
    val rates = counts.map { case (g, c) =>
      val share = math.pow(c.toDouble, alpha) / powSum
      val r = math.min(1.0, targetFraction * total * share / c)
      g -> BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    stratifiedMix(df.where(col(groupCol).isNotNull), groupCol, idCol,
      rates, defaultRate = 0.0, salt)
  }

  /** Per-domain document cap (the C4/RefinedWeb "max pages per domain"
    * rule): keep at most `maxPerDomain` rows per domain, chosen by
    * deterministic hash order so the kept subset is a fair random-like
    * draw that is stable across runs, partitionings, and cluster sizes.
    *
    * Scale shape: only (domain, id, hash) fixed-width rows go through
    * the window shuffle+sort; the document payload is semi-joined back
    * by id, never sorted. A mega-domain sorts within one partition —
    * at 100 TB pair `maxPerDomain` with an upstream [[hashSample]]
    * pre-thin if single domains exceed a partition.
    */
  def domainCap(df: DataFrame, domainCol: String, idCol: String,
      maxPerDomain: Int, salt: String = "graft"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(hashLong(col(idCol), salt), col(idCol))
    val keep = df.select(col(domainCol), col(idCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPerDomain)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Deterministic train/val/test split: label each row by where its
    * md5-uniform falls in the cumulative weight intervals. Weights are
    * normalized (need not sum to 1). Pure projection — no shuffle, no
    * state — and engine-replicable like every operator here.
    *
    * Pick weights whose normalized cumulative sums are exact binary
    * fractions (0.75/0.125/0.125, not 0.8/0.1/0.1) when an external
    * system must reproduce the thresholds digit-for-digit.
    */
  def split(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      salt: String = "graft", splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "split weights must be non-empty and positive")
    val total = weights.map(_._2).sum
    val cum = weights.map(_._2).scanLeft(0.0)(_ + _).tail
    val u = hashUniform(col(idCol), salt)
    val label = weights.zip(cum).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), c), acc) => when(u < lit(c / total), lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** Exactly-n deterministic draw: the n rows with the smallest hash —
    * a fixed-size engine-replicable sample (holdout/eval sets need exact
    * sizes, which probabilistic [[hashSample]] can't give). Executes as
    * TakeOrdered (per-partition top-n, then a driver merge of n-row
    * heaps) — no full sort, no shuffle of the corpus.
    */
  def hashTopN(df: DataFrame, idCol: String, n: Int,
      salt: String = "graft"): DataFrame =
    df.orderBy(hashLong(col(idCol), salt), col(idCol)).limit(n)

  /** Per-source TOKEN-budget selection — the mixture-building step that
    * caps each source by token mass, not row count ([[domainCap]]'s
    * sibling; published mixture recipes specify sources in tokens):
    * within each source, rows are taken in the deterministic
    * [[hashLong]] order (a uniform interleave, not corpus order) while
    * the running token total stays ≤ the source's budget. Greedy prefix
    * semantics: the first row that would overflow stops the source (no
    * knapsack backfill), so the kept set is a hash-order PREFIX —
    * stable under repartitioning and replayable by any SQL engine.
    * Unlisted sources get `defaultBudget` (default: unlimited).
    *
    * Scale shape: the running sum windows over fixed-width (source,
    * hash, id, tokens) rows — the payload joins back by id semi-join,
    * never entering the window exchange. The window partitions by
    * SOURCE, so one giant source serializes its (fixed-width) cumsum in
    * one task: that is inherent to an exact sequential budget; use
    * [[tokenBudgetMixApprox]] at the scale where it bites.
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, salt: String = "graft"): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "token budgets must be >= 0")
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(hashLong(col(idCol), salt), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val keep = df.select(col(sourceCol), col(idCol), col(tokenCol))
      .withColumn("__cum", sum(col(tokenCol).cast(LongType)).over(w))
      .where(col("__cum") <= budget)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** The scale form of [[tokenBudgetMix]]: instead of an exact
    * sequential cumsum, each source keeps the hash-fraction
    * `min(1, budget / total_tokens(source))` of its rows — in
    * EXPECTATION the token budget (hash order is independent of token
    * length), within ±O(√n) token noise, with no window at all: one
    * aggregation for the per-source totals (collected driver-side —
    * source cardinality is assumed bounded, the [[temperatureMix]]
    * precedent) and then a stateless codegen'd filter. Deterministic
    * and engine-replayable: the fraction is one IEEE division from two
    * exact integers, and the keep test is the [[hashUniform]]
    * comparison every sampler here uses.
    */
  def tokenBudgetMixApprox(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, salt: String = "graft"): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "token budgets must be >= 0")
    val totals: Seq[(String, Long)] = df
      .where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol))
      .agg(coalesce(sum(col(tokenCol).cast(LongType)), lit(0L)).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val frac = totals.foldLeft(lit(0.0)) { case (acc, (s, tot)) =>
      val b = budgets.getOrElse(s, defaultBudget)
      val f = if (tot <= 0) 1.0 else math.min(1.0, b.toDouble / tot.toDouble)
      when(col(sourceCol) === s, lit(f)).otherwise(acc)
    }
    df.where(hashUniform(col(idCol), salt) < frac)
  }
}
