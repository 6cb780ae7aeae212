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

  /** Keys above this, and a driver-side map stops being a `when`-chain:
    * a million-entry map must not become a million-node expression tree
    * (Catalyst analysis is superlinear in tree size and codegen falls
    * over long before that). Below it, the chain spelling is kept
    * byte-identical to the historical plans; above it, the map becomes
    * a BROADCAST-JOINED lookup frame — same values (the chain and the
    * join both resolve a key to exactly its mapped value), one extra
    * broadcast of |map| rows, still zero shuffle of the payload.
    */
  private val WhenChainMax = 256

  /** The per-row value of `keyCol` under a driver-side map, as a
    * (frame, valueColumn) pair: `when`-chain below [[WhenChainMax]]
    * (frame unchanged), broadcast-joined lookup frame above it. Keys
    * compare as STRINGS in BOTH spellings — the key column is cast to
    * string before comparing, so a numeric key column matches exactly
    * like the join path ("05" ≠ "5"; previously the chain used numeric
    * coercion and the two paths silently disagreed when a map crossed
    * [[WhenChainMax]]). For string key columns — every current caller —
    * the cast is a no-op Catalyst folds away, so plans are unchanged.
    * Long values stay exact (budgets above 2^53 must not round through
    * a double). Callers drop `__kv` when done.
    */
  private def lookup[V: scala.reflect.runtime.universe.TypeTag](
      df: DataFrame, keyCol: String, m: Map[String, V], default: V)
      : (DataFrame, Column) = {
    val key = col(keyCol).cast(StringType)
    if (m.size <= WhenChainMax)
      (df, m.foldLeft(lit(default)) { case (acc, (k, v)) =>
        when(key === k, v).otherwise(acc)
      })
    else {
      require(!df.columns.contains("__lk") && !df.columns.contains("__kv"),
        "column names __lk and __kv are reserved")
      val spark = df.sparkSession
      import spark.implicits._
      val kv = spark.createDataset(m.toSeq).toDF("__lk", "__kv")
      (df.join(broadcast(kv), key === col("__lk"), "left").drop("__lk"),
        coalesce(col("__kv"), lit(default)))
    }
  }

  /** Domain-weighted corpus mixing: per-domain keep rates (e.g. upsample
    * curated sources, downsample web crawl), unknown domains get
    * `defaultRate`. One scan, no shuffle — the mix decision is a
    * codegen'd projection (or a broadcast-joined lookup above
    * [[WhenChainMax]] domains — million-domain rate maps are legal).
    */
  def stratifiedMix(df: DataFrame, domainCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "graft"): DataFrame = {
    val (framed, rate) = lookup(df, domainCol, rates, defaultRate)
    framed.where(hashUniform(col(idCol), salt) < rate)
      .drop("__kv")
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
    val countsDf = df.where(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast(StringType).as("g"))
      .agg(count(lit(1)).as("c"))
    val nGroups = countsDf.count()
    if (nGroups == 0) return df.where(lit(false))
    if (nGroups <= WhenChainMax) {
      // historical driver-side path, byte-identical plans and rates
      val counts = countsDf
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy(_._1)
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
    } else {
      // cardinality-proof path: a million-group column must not become a
      // driver-side map + million-node when-chain. The rates stay IN the
      // counts frame (one row per group) and broadcast-join onto the
      // payload. total is exact (sum of longs); powSum reduces
      // distributed, whose summation ORDER differs from the driver
      // fold's — a ≤ few-ulp difference the 9-dp rounding absorbs
      // everywhere except a measure-zero grid boundary (the same
      // argument that already covers cross-ENGINE replay, Scaladoc
      // above). Per-group arithmetic mirrors the driver expression tree
      // exactly: ((tf * total) * (pow(c, α) / powSum)) / c, then
      // HALF_UP round to 9 — Spark's pow and round are Math.pow and
      // HALF_UP, the driver's own operations.
      val g = countsDf.agg(
        sum(col("c")).as("t"),
        sum(call_function("power", col("c").cast(DoubleType), lit(alpha))).as("p"))
        .collect()(0)
      val total = g.getLong(0).toDouble
      val powSum = g.getDouble(1)
      val rates = countsDf.select(col("g").as("__k"),
        round(least(lit(1.0),
          (lit(targetFraction) * lit(total) *
            (call_function("power", col("c").cast(DoubleType), lit(alpha)) / lit(powSum))) /
            col("c").cast(DoubleType)), 9).as("__kv"))
      require(!df.columns.contains("__k") && !df.columns.contains("__kv"),
        "column names __k and __kv are reserved")
      df.where(col(groupCol).isNotNull)
        .join(broadcast(rates), col(groupCol).cast(StringType) === col("__k"), "left")
        .where(hashUniform(col(idCol), salt) < coalesce(col("__kv"), lit(0.0)))
        .drop("__k", "__kv")
    }
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

  /** Deterministic pseudo-random corpus shuffle — the "shuffle before
    * sharding" step of a training-data pipeline (reading a corpus in
    * storage order trains on its source/time clustering; a global
    * random permutation is the published fix): a total order by the
    * seeded [[hashLong]] of the id, hash ties broken by the id itself
    * so the permutation is total and replayable. A different `seed` is
    * an independent permutation — a fresh data order per epoch without
    * rewriting anything.
    *
    * Scale shape: a RANGE repartition on the hash key + per-partition
    * sort (what `orderBy` plans, with explicit shard control): Spark
    * samples the key distribution, hands each of `numShards` tasks a
    * contiguous key range, and each task sorts locally — one pass +
    * one shuffle, no single-task total sort, no driver involvement.
    * The keys are uniform on [0, 2^60) by construction, so the range
    * bounds are balanced regardless of id skew. Parquet/text writers
    * preserve row order per file and number files by partition, so a
    * write of the result is a sharded shuffled corpus whose
    * CONCATENATED (file-number-order) row sequence is the deterministic
    * global permutation. The per-shard SPLIT POINTS are not themselves
    * replayable: `repartitionByRange` samples the key distribution with
    * a seed derived from the underlying RDD id, so which boundary rows
    * land in shard k vs k+1 can differ across sessions — only the
    * concatenated order is contract. Pipelines that need bit-stable
    * shard CONTENTS (e.g. resumable per-shard checkpointing) should
    * derive the shard explicitly from the uniform key space — a
    * power-of-two shard count makes it `shiftright(hashLong(id, salt),
    * 60 - log2(n))`, a pure function of the row — and group by that
    * column instead of relying on sampled range bounds.
    *
    * `numShards` ≤ 0 leaves the partition count to
    * `spark.sql.shuffle.partitions`; at 100 TB set it so a shard fits
    * a downstream reader (e.g. total_tokens / tokens_per_shard).
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long = 0L,
      numShards: Int = 0): DataFrame = {
    val key = hashLong(col(idCol), s"shuffle:$seed")
    val ranged =
      if (numShards > 0) df.repartitionByRange(numShards, key, col(idCol))
      else df.repartitionByRange(key, col(idCol))
    ranged.sortWithinPartitions(key, col(idCol))
  }

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
    * Negative token counts would break the prefix semantics (the cumsum
    * could dip back under budget mid-source) — they raise; null token
    * counts contribute nothing to the sum, as before.
    *
    * Scale shape — a PARALLEL two-pass prefix sum, not one window per
    * source: [[hashLong]] is uniform on [0, 2^60), so slicing its
    * keyspace into `prefixBuckets` equal ranges splits each source's
    * hash order into contiguous chunks at deterministic, DATA-INDEPENDENT
    * boundaries. Pass 1 aggregates per-(source, bucket) token subtotals
    * (map-side combined; the frame is |sources| × buckets rows) and a
    * tiny window turns them into per-bucket OFFSETS; pass 2 windows only
    * WITHIN (source, bucket) — so a single giant source runs as
    * `prefixBuckets` parallel sort tasks instead of one serialized
    * cumsum (the r12/r13 "single-reducer sort" weak item, closed). The
    * kept set is byte-identical to the serial single-window spelling:
    * bucket id is a monotone prefix of the hash, so bucket-then-(hash,
    * id) IS the (hash, id) order, and offset + within-bucket sum IS the
    * global running sum (null accounting matched exactly via non-null
    * counts). The payload still joins back by id semi-join — only
    * fixed-width (source, id, tokens, hash) rows enter any exchange.
    *
    * The offsets frame is |distinct (source, bucket) present| rows —
    * tiny under any human-written mixture config, so it broadcast-joins
    * onto the slim rows. The hint is SIZE-GATED at
    * `maxBroadcastOffsets` rows (counted off the materialized frame, so
    * the aggregation is paid once either way): at extreme source
    * cardinality (millions of sources × buckets) a forced broadcast
    * would OOM the driver where a plain shuffle join succeeds, so above
    * the gate the hint is dropped and AQE still broadcasts when the
    * runtime size fits. The kept set is identical on both sides of the
    * gate (FiltersSpec pins it).
    */
  def tokenBudgetMix(df: DataFrame, idCol: String, tokenCol: String,
      sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, salt: String = "graft",
      prefixBuckets: Int = 256, maxBroadcastOffsets: Long = 4000000L): DataFrame =
    df.join(tokenBudgetKeepIds(df, idCol, tokenCol, sourceCol, budgets,
      defaultBudget, salt, prefixBuckets, maxBroadcastOffsets),
      Seq(idCol), "left_semi")

  /** The decision core of [[tokenBudgetMix]]: the kept ids as a
    * one-column frame, WITHOUT the payload semi-join — what
    * [[graft.ops.Pipeline.run]]'s fused mix path composes on slim
    * (id, src, toks) rows so the payload moves once (guide-§8 shape).
    * Same rungs, same values; [[tokenBudgetMix]] is exactly
    * `df semi-join this`. */
  private[graft] def tokenBudgetKeepIds(df: DataFrame, idCol: String,
      tokenCol: String, sourceCol: String, budgets: Map[String, Long],
      defaultBudget: Long = Long.MaxValue, salt: String = "graft",
      prefixBuckets: Int = 256, maxBroadcastOffsets: Long = 4000000L): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "token budgets must be >= 0")
    require(prefixBuckets >= 1 && (prefixBuckets & (prefixBuckets - 1)) == 0 &&
      prefixBuckets <= (1 << 20),
      s"prefixBuckets must be a power of two in [1, 2^20], got $prefixBuckets")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(prefixBuckets)
    import org.apache.spark.sql.expressions.Window
    val slim = df
      // the cast-failure branch is explicit: a non-numeric token value
      // try_casts to NULL (a plain cast would either throw Spark's
      // generic ANSI error or, pre-ANSI, turn assert_true(NULL) into
      // the misleading "negative" message) — the isNotNull conjunct
      // makes the condition FALSE there, with a message covering both
      .where(assert_true(col(tokenCol).isNull ||
          (col(tokenCol).try_cast(LongType).isNotNull &&
            col(tokenCol).try_cast(LongType) >= 0),
        lit(s"tokenBudgetMix: negative or non-numeric token count in " +
          s"column $tokenCol — the greedy-prefix budget semantics require " +
          "non-negative numeric token counts; clean or clamp them " +
          "upstream")).isNull)
      .select(col(sourceCol).as("__src"), col(idCol).as("__id"),
        col(tokenCol).cast(LongType).as("__tok"))
      .withColumn("__h", hashLong(col("__id"), salt))
      .withColumn("__b", shiftright(col("__h"), shift))
    // pass 1: per-(source, bucket) subtotal and non-null count → offsets
    val offW = Window.partitionBy("__src").orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = slim.groupBy("__src", "__b")
      .agg(sum("__tok").as("__st"), count(col("__tok")).as("__sc"))
      .select(col("__src"), col("__b"),
        coalesce(sum(col("__st")).over(offW), lit(0L)).as("__off"),
        coalesce(sum(col("__sc")).over(offW), lit(0L)).as("__offc"))
    // pass 2: within-bucket running sum, shifted by the bucket's offset.
    // cum must be NULL exactly when the whole inclusive prefix is null
    // (the serial window's semantics — such rows never pass `<= budget`)
    val cumW = Window.partitionBy("__src", "__b")
      .orderBy(col("__h"), col("__id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe on the source key: a null-source group budgets under
    // defaultBudget like any other (the serial window partitioned nulls
    // together; a plain equi-join would silently drop them)
    // materialize the offsets once (candidate-bounded frame, the
    // localCheckpoint convention) — the row count gates the broadcast
    // hint and the join reuses the same blocks instead of re-running
    // the aggregation as the build side
    val offsCk = offs
      .withColumnRenamed("__src", "__osrc").withColumnRenamed("__b", "__ob")
      .localCheckpoint(false)
    val offsSide =
      if (offsCk.count() <= maxBroadcastOffsets) broadcast(offsCk) else offsCk
    val withOff = slim.join(offsSide,
        col("__src") <=> col("__osrc") && col("__b") === col("__ob"))
      .drop("__osrc", "__ob")
      .withColumn("__cum",
        when(col("__offc") + count(col("__tok")).over(cumW) > 0,
          col("__off") + coalesce(sum(col("__tok")).over(cumW), lit(0L))))
    val (framed, budget) = lookup(withOff, "__src", budgets, defaultBudget)
    framed
      .where(col("__cum") <= budget)
      .select(col("__id").as(idCol))
  }

  /** Weighted deterministic interleave — the ORDERING member of the
    * mixing family ([[stratifiedMix]] drops, [[temperatureMix]]
    * samples, [[tokenBudgetMix]] caps; this one reorders WITHOUT
    * dropping): each source's rows are ranked in their deterministic
    * [[hashLong]] order, given position rank / weight, and the corpus
    * is sorted by position — so a weight-2 source surfaces twice as
    * often as a weight-1 source in EVERY prefix of the output, not
    * just on average. That is the steady-mixing-rate property mixture
    * recipes want at read time: a training loop consuming the output
    * sequentially sees the target mix in every window, instead of the
    * source/time clustering of storage order. Compose with
    * [[deterministicShuffle]]'s sharded write for the materialized
    * form.
    *
    * Output = the input columns + `posCol` (rank / weight — keep for
    * diagnostics or drop). Unlisted sources get `defaultWeight`; a
    * null source groups under the default like any other group; ties
    * in position (exact rational collisions across sources) break by
    * (hash, id), so the order is total and replayable.
    *
    * Scale shape — the [[tokenBudgetMix]] two-pass prefix trick
    * applied to pure RANK: a serial `row_number` per source would
    * serialize a giant source onto one task, so rank = per-(source,
    * keyspace-bucket) count offsets (a tiny aggregate + a window over
    * |sources| × `prefixBuckets` rows) plus a within-bucket
    * `row_number` at bucket-way parallelism — byte-identical to the
    * serial spelling because the bucket id is a monotone prefix of
    * the hash. The final sort is a range partition on (pos, hash,
    * id); uniform hash keys make within-source spacing uniform, so
    * the range bounds stay balanced. The offsets broadcast is
    * size-gated exactly like [[tokenBudgetMix]]'s.
    */
  def interleaveSources(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0,
      salt: String = "graft", posCol: String = "pos",
      prefixBuckets: Int = 256, maxBroadcastOffsets: Long = 4000000L,
      sorted: Boolean = true): DataFrame = {
    require(!df.columns.contains(posCol),
      s"interleaveSources: output column $posCol already exists on the input")
    // the final join brings __h back onto the outer frame (and lookup's
    // fallback join would bring __lk/__kv) — reserve them like
    // tokenBudgetMix does, instead of failing later with an
    // ambiguous-reference error
    Seq("__h", "__lk", "__kv").foreach(c => require(!df.columns.contains(c),
      s"interleaveSources: column name $c is reserved"))
    val posFrame = interleavePositionsFrame(df, idCol, sourceCol, weights,
      defaultWeight, salt, posCol, prefixBuckets, maxBroadcastOffsets)
    val attached = df.join(posFrame, Seq(idCol))
    // `sorted = false` skips the physical range sort (sampling pass +
    // one full-payload exchange) for callers that immediately
    // re-partition the output anyway — [[graft.ops.Pipeline.run]]'s
    // pack stage hash-shards it — where the sort buys nothing: `posCol`
    // carries the interleave order as DATA either way, and every value
    // is identical on both settings.
    (if (sorted) attached.orderBy(col(posCol), col("__h"), col(idCol))
     else attached)
      .drop("__h")
  }

  /** The rank core of [[interleaveSources]]: the (idCol, posCol, __h)
    * position frame WITHOUT the payload join or the physical sort —
    * what [[graft.ops.Pipeline.run]]'s fused mix path composes on slim
    * rows (guide-§8 shape: the payload attaches once, at the end).
    * Callers drop `__h` unless they sort on it. Same rungs, same
    * values; [[interleaveSources]] is exactly `df join this` (+ sort).
    */
  private[graft] def interleavePositionsFrame(df: DataFrame, idCol: String,
      sourceCol: String, weights: Map[String, Double],
      defaultWeight: Double = 1.0, salt: String = "graft",
      posCol: String = "pos", prefixBuckets: Int = 256,
      maxBroadcastOffsets: Long = 4000000L): DataFrame = {
    require(weights.values.forall(_ > 0) && defaultWeight > 0,
      "interleave weights must be positive")
    require(prefixBuckets >= 1 && (prefixBuckets & (prefixBuckets - 1)) == 0 &&
      prefixBuckets <= (1 << 20),
      s"prefixBuckets must be a power of two in [1, 2^20], got $prefixBuckets")
    val shift = 60 - java.lang.Integer.numberOfTrailingZeros(prefixBuckets)
    import org.apache.spark.sql.expressions.Window
    val slim = df.select(col(sourceCol).as("__src"), col(idCol).as("__id"))
      .withColumn("__h", hashLong(col("__id"), salt))
      .withColumn("__b", shiftright(col("__h"), shift))
    val offs = slim.groupBy("__src", "__b").agg(count(lit(1)).as("__sc"))
      .select(col("__src").as("__osrc"), col("__b").as("__ob"),
        coalesce(sum(col("__sc")).over(
          Window.partitionBy("__src").orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__off"))
      .localCheckpoint(false)
    val offsSide =
      if (offs.count() <= maxBroadcastOffsets) broadcast(offs) else offs
    val rkW = Window.partitionBy("__src", "__b").orderBy(col("__h"), col("__id"))
    val ranked = slim.join(offsSide,
        col("__src") <=> col("__osrc") && col("__b") === col("__ob"))
      .drop("__osrc", "__ob")
      .withColumn("__rk", col("__off") + row_number().over(rkW))
    val (framed, w) = lookup(ranked, "__src", weights, defaultWeight)
    framed.select(col("__id").as(idCol),
      (col("__rk").cast(DoubleType) / w).as(posCol), col("__h"))
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
    // negative token counts corrupt the per-source totals (hence every
    // fraction) silently — raise, like the exact form
    val checked = df.where(assert_true(
      col(tokenCol).isNull ||
        (col(tokenCol).try_cast(LongType).isNotNull &&
          col(tokenCol).try_cast(LongType) >= 0),
      lit(s"tokenBudgetMixApprox: negative or non-numeric token count in " +
        s"column $tokenCol — totals and keep fractions would be silently " +
        "wrong; clean or clamp them upstream")).isNull)
    val totalsDf = checked
      .where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).cast(StringType).as("__k"))
      .agg(coalesce(sum(col(tokenCol).cast(LongType)), lit(0L)).as("__t"))
    val nSources = totalsDf.count()
    if (nSources <= WhenChainMax) {
      // historical driver-side path, byte-identical plans and fractions
      val totals: Seq[(String, Long)] =
        totalsDf.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
      val frac = totals.foldLeft(lit(0.0)) { case (acc, (s, tot)) =>
        val b = budgets.getOrElse(s, defaultBudget)
        val f = if (tot <= 0) 1.0 else math.min(1.0, b.toDouble / tot.toDouble)
        when(col(sourceCol) === s, lit(f)).otherwise(acc)
      }
      checked.where(hashUniform(col(idCol), salt) < frac)
    } else {
      // cardinality-proof path (the temperatureMix argument): fractions
      // stay in the totals frame and broadcast-join onto the payload.
      // Unlike temperatureMix there is no cross-path ulp concern at all:
      // each fraction is ONE IEEE division of two exact longs followed
      // by min — bit-identical wherever it's computed.
      val (withBudget, budget) = lookup(totalsDf, "__k", budgets, defaultBudget)
      val fracs = withBudget.select(col("__k"),
        when(col("__t") <= 0, lit(1.0))
          .otherwise(least(lit(1.0),
            budget.cast(DoubleType) / col("__t").cast(DoubleType))).as("__f"))
      require(!df.columns.contains("__f") && !df.columns.contains("__k"),
        "column names __k and __f are reserved")
      checked
        .join(broadcast(fracs), col(sourceCol).cast(StringType) === col("__k"), "left")
        .where(hashUniform(col(idCol), salt) < coalesce(col("__f"), lit(0.0)))
        .drop("__k", "__f")
    }
  }
}
