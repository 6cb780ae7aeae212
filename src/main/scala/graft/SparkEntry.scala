package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window
import scala.collection.immutable.ListMap

import graft.api.Flatten
import graft.model._
import graft.plan.FlattenPlanner
import graft.sources.JsonInput
import graft.functions.JsonPathFilter
import graft.meta.{Metadata, SchemaFields}
import graft.operators.Evolve
import graft.ops.{Decontaminate, Dedup, Joins, Multimodal, Packing, Redact, Sampling, Similarity, TextAnalysis, TextFilters}

/** Driver contract — one named query per implemented operator (SURVEY.md §2),
  * each with a DuckDB oracle in [[oracleSql]] where SQL-expressible.
  *
  * Numeric discipline for oracle parity: aggregates over doubles go through
  * DECIMAL (exact, order-independent) and are cast to DOUBLE at the end;
  * per-row double arithmetic (products, divisions) is identical IEEE ops on
  * identical inputs in both engines. Every query is deterministically
  * ordered.
  */
object SparkEntry {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** RE2 spellings of the shared regex classes, for DuckDB oracles. */
  private val FpWs = TextAnalysis.FingerprintWsRe2
  private val TokWs = TextAnalysis.TokenWsRe2
  private val WsChars = TextAnalysis.WsCharsRe2
  private val PunctEx = TextAnalysis.PunctExcludeRe2

  /** Offset added to planted-copy ids in the x-series queries — far above
    * any natural id at any scale factor (documents grow ~50k rows per SF,
    * so 10^8 is safe beyond SF 1000; the old 10^4 collided from SF 0.2).
    * Must match the literal `100000000` in the planted oracles.
    */
  private val PlantedOffset = 100000000L

  /** Cap on documents staged into x40's driver-resident MemoryStream feed
    * (the feed is harness plumbing; the operator under test is the
    * streaming state). 200k covers every oracle SF (sf0.1 has ~60k docs)
    * while keeping a misdirected big-SF Verify run from collecting an
    * unbounded corpus to the driver. The x40 oracle SQL applies the same
    * `ORDER BY doc_id LIMIT` cap.
    */
  private val StreamDocCap = 200000

  /** events.parquet's `ts` column has shipped in two layouts: legacy
    * TIMESTAMP(NANOS) (which Spark's parquet reader rejects, so we read
    * nanos as long and truncate to micros — integer division, since ns
    * values exceed 2^53 and double math would lose precision) and, since
    * the 2026-08 testdata regen, a plain TIMESTAMP(MICROS). Dispatch on
    * the decoded type so both layouts work; the DuckDB oracles already
    * read `ts` generically.
    */
  private[graft] def rdEvents(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = rd(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other (expected int64 nanos or timestamp)")
    }
  }

  /** lineitems nested under orders — the engine's "documents": one nested
    * record per order with an `items` array, built deterministically
    * (sorted by l_linenumber). Exercises the flatten planner on real data.
    */
  private[graft] def nestedOrders(s: SparkSession, dir: String): DataFrame = {
    val o = rd(s, dir, "orders")
    val li = rd(s, dir, "lineitem")
    val items = li.groupBy(col("l_orderkey")).agg(
      sort_array(collect_list(struct(
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag")))).as("items"))
    o.join(items, o("o_orderkey") === items("l_orderkey"), "left")
      .select(o("o_orderkey"), o("o_custkey"), o("o_orderstatus"),
        o("o_totalprice"), o("o_orderpriority"), col("items"))
  }

  private val flattenOpts = FlattenOptions(
    linkMode = LinkMode.NaturalKey("o_orderkey"), dropEmptyObjects = false)

  /** Flagship: full flatten of the nested order documents — returns the
    * exploded items child table. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val tables = FlattenPlanner.flatten(nestedOrders(spark, "/root/testdata/sf0.001"), flattenOpts)
    tables("items")
  }

  // ----------------------------------------------------------------- //
  // queries
  // ----------------------------------------------------------------- //

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(

    // --- relational core ------------------------------------------- //
    "q1_pricing_summary" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(25, 6))).cast(DoubleType).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    "q2_filter_project" -> ((s, dir) => {
      rd(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1995-04-01").cast(TimestampType) &&
          col("l_discount") >= 0.05 && col("l_quantity") < 10.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    "q3_join_revenue" -> ((s, dir) => {
      val c = rd(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = rd(s, dir, "orders")
      val li = rd(s, dir, "lineitem")
      // dimension side broadcast; fact table never shuffled before the agg
      broadcast(c).join(o, col("c_custkey") === col("o_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_totalprice"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(25, 6))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }),

    "q4_top_orders" -> ((s, dir) =>
      rd(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    "q5_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rd(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType).as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q6_group_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      rd(s, dir, "customer")
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 3)
        .select(col("c_mktsegment"), col("rnk"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_mktsegment"), col("rnk"))
    }),

    "q9_distinct_agg" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .orderBy(col("l_suppkey"))),

    "q10_above_avg" -> ((s, dir) => {
      // orders above their customer's average — decorrelated as an
      // aggregate + re-join (what Catalyst does to the correlated form)
      val o = rd(s, dir, "orders")
      // exact average: decimal sum / count, both to double — identical in
      // DuckDB regardless of accumulation order
      val avgByCust = o.groupBy(col("o_custkey").as("ck"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avg_price"))
      o.join(avgByCust, o("o_custkey") === col("ck"))
        .where(col("o_totalprice") > col("avg_price") * 1.5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    "q11_top_parts" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val p = rd(s, dir, "part")
      li.groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(25, 6))).cast(DoubleType).as("revenue"))
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("p_partkey")).limit(25)
    }),

    // --- flatten operator family (P1-P8, S3/S4, A1/A4, U1/U2, F1/F2) -- //
    "f1_flatten_main" -> ((s, dir) => {
      FlattenPlanner.flatten(nestedOrders(s, dir), flattenOpts)("main")
        .select(col("_link"), col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "f2_flatten_child" -> ((s, dir) => {
      FlattenPlanner.flatten(nestedOrders(s, dir), flattenOpts)("items")
        .orderBy(col("_link"))
    }),

    "f3_subobject_promote" -> ((s, dir) => {
      val c = rd(s, dir, "customer")
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("acctbal")).as("profile"),
          col("c_mktsegment"))
      FlattenPlanner.flatten(c, FlattenOptions(linkMode = LinkMode.NaturalKey("c_custkey")))("main")
        .select(col("c_custkey"), col("profile_name"), col("profile_acctbal"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),

    "f4_pushdown" -> ((s, dir) => {
      FlattenPlanner.flatten(nestedOrders(s, dir),
        flattenOpts.copy(pushdown = Seq("o_orderstatus")))("items")
        .select(col("_link"), col("_link_main"), col("l_linenumber"), col("main_o_orderstatus"))
        .orderBy(col("_link"))
    }),

    "f5_scalar_array_json" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val nested = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("linenumbers"))
      FlattenPlanner.flatten(nested, FlattenOptions(linkMode = LinkMode.NaturalKey("l_orderkey")))("main")
        .select(col("l_orderkey"), col("linenumbers"))
        .orderBy(col("l_orderkey"))
    }),

    "f6_arrays_new_table" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val nested = li.groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_linenumber"))).as("nums"))
      FlattenPlanner.flatten(nested,
        FlattenOptions(linkMode = LinkMode.NaturalKey("l_orderkey"), arraysNewTable = true))("nums")
        .orderBy(col("_link"))
    }),

    "f7_field_control" -> ((s, dir) => {
      val fields = Seq(
        FieldSpec("main", "o_orderkey", Some("order_id")),
        FieldSpec("main", "o_totalprice", Some("total")))
      FlattenPlanner.flatten(
        rd(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        FlattenOptions(linkMode = LinkMode.NaturalKey("o_orderkey"),
          noLink = true, onlyFields = true, fields = fields))("main")
        .orderBy(col("order_id"))
    }),

    "f8_preview_limit" -> ((s, dir) =>
      FlattenPlanner.flatten(nestedOrders(s, dir), flattenOpts)("main")
        .orderBy(col("o_orderkey")).limit(20)
        .select(col("o_orderkey"), col("o_totalprice"))),

    "f9_field_counts" -> ((s, dir) => {
      import s.implicits._
      val metas = Metadata.analyze("orders", rd(s, dir, "orders"))
      metas.map(m => (m.fieldName, m.fieldType, m.count))
        .toDF("field_name", "field_type", "cnt")
        .orderBy(col("field_name"))
    }),

    "f10_union_evolve" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val part1 = o.where(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val part2 = o.where(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"))
      Evolve.unionEvolve(Seq(part1, part2)).orderBy(col("o_orderkey"))
    }),

    "f11_jsonpath_filter" -> ((s, dir) => {
      val ev = rdEvents(s, dir)
        .select(col("event_id"), col("event_type"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType)))).as("props"))
      JsonPathFilter(ev, "$[?(@.props.k >= 50 && @.event_type == 'click')]")
        .select(col("event_id"), col("props").getField("k").as("k"))
        .orderBy(col("event_id"))
    }),

    "f12_ndjson_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ndjson").toString
      rd(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .write.mode("overwrite").json(tmp)
      JsonInput.ndjson(s, tmp)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // --- training-data pipeline ops -------------------------------- //
    // x1/x2 fan the raw columns out before the per-row kernels: the test
    // documents.parquet is a single file with a single row group —
    // unsplittable, so its scan is one task however Spark splits the byte
    // range (same artifact the b2-b4 bench corpus works around, see
    // Bench.bCorpus). A real corpus arrives in many row groups and scans
    // in parallel; the repartition keeps the kernels, not a serial test-
    // artifact decode, on the clock.
    "x1_exact_dedup" -> ((s, dir) => {
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
      Dedup.exactDupGroups(docs, "text", "doc_id")
        .select(col("fingerprint"), col("n_members"), col("keep_id"))
        .orderBy(col("fingerprint"))
    }),

    "x2_token_stats" -> ((s, dir) => {
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
      d.select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_tokens_ws"),
        TextAnalysis.tokenCountRegex(col("text")).as("n_tokens_re"),
        length(col("text")).as("n_chars"))
        .orderBy(col("doc_id"))
    }),

    "x41_chunk_docs" -> ((s, dir) => {
      // overlapping token-window chunking — maxTokens=64 / overlap=16 so
      // the sf corpus produces a healthy multi-chunk tail (long docs) plus
      // plenty of single-chunk short docs
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
      TextAnalysis.chunkDocuments(d, "text", "doc_id", maxTokens = 64, overlap = 16)
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    "x42_dup_ngrams" -> ((s, dir) =>
      // Gopher repetition signal: fraction of duplicate 3-grams per doc
      rd(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.dupNgramRatio(col("text"), 3).as("dup_3gram_ratio"))
        .orderBy(col("doc_id"))),

    "x43_shared_windows" -> ((s, dir) => {
      // exact substring-dedup signal (doc-level Lee-et-al): plant verbatim
      // copies of every 10th doc; the copies (higher ids) must flag, and
      // every natural window collision scores too — the oracle replays
      // the identical window pipeline in SQL
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      Dedup.sharedWindowFlags(d.unionAll(copies), "text", "doc_id", n = 10)
        .withColumn("keep", col("keep").cast("int"))
        .orderBy(col("doc_id"))
    }),

    "x44_rare_tokens" -> ((s, dir) =>
      // rare-token quality filter: fraction of token occurrences whose
      // corpus frequency is under 5 — integer-exact across engines
      TextAnalysis.rareTokenRatio(
        rd(s, dir, "documents").select(col("doc_id"), col("text")),
        "text", "doc_id", minCount = 5)
        .orderBy(col("doc_id"))),

    "x46_window_increment" -> ((s, dir) => {
      // incremental substring dedup: a copy drops iff it has at least one
      // 10-token window (all its windows exist in the corpus original);
      // short copies and the 3-token fresh docs have no windows and pass
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      val fresh = d.select((col("doc_id") + 2 * PlantedOffset).as("doc_id"),
        concat(lit("qqzx"), col("doc_id"), lit(" wwvk"), col("doc_id"),
          lit(" jjpm"), col("doc_id")).as("text"))
      Dedup.sharedWindowIncrement(d, copies.unionAll(fresh), "text", "doc_id", n = 10)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x45_neardup_increment" -> ((s, dir) => {
      // incremental near-dup, daily-batch shape: exact copies of every
      // corpus doc must drop (jaccard 1.0 ⇒ identical signatures ⇒ every
      // band collides ⇒ recall 1 at any threshold), token-disjoint fresh
      // docs must survive (exact verification kills even a freak band
      // collision), so the output is exactly the fresh set
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      val fresh = d.select((col("doc_id") + 2 * PlantedOffset).as("doc_id"),
        concat(lit("zzqx"), col("doc_id"), lit(" vvwk"), col("doc_id"),
          lit(" ppmj"), col("doc_id")).as("text"))
      Dedup.nearDupIncrement(d, copies.unionAll(fresh), "text", "doc_id",
        threshold = 0.9, numHashes = 32, bands = 8)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x71_neardup_increment_indexed" -> ((s, dir) => {
      // the x45 contract routed through the STANDING band table: the
      // corpus' MinHash bands persist once (writeBandTable, bucketed
      // catalog table) and the daily batch probes them
      // (nearDupIncrementIndexed) with no corpus-side MinHash pass —
      // identical semantics to the per-call path by construction
      // (IncrementalDedupPropertySpec parity fuzz), so x45's oracle
      // applies: exact copies drop, token-disjoint fresh docs survive.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      val fresh = d.select((col("doc_id") + 2 * PlantedOffset).as("doc_id"),
        concat(lit("zzqx"), col("doc_id"), lit(" vvwk"), col("doc_id"),
          lit(" ppmj"), col("doc_id")).as("text"))
      Dedup.writeBandTable(d, "text", "doc_id", "graft_x71_bands",
        numHashes = 32, bands = 8, numBuckets = 8)
      Dedup.nearDupIncrementIndexed(s.table("graft_x71_bands"), d,
          copies.unionAll(fresh), "text", "doc_id",
          threshold = 0.9, numHashes = 32, bands = 8)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x47_neardup_threshold" -> ((s, dir) => {
      // near-THRESHOLD replay (the computed complement to x45's planted
      // extremes): incoming docs are corpus docs with k = doc_id % 4 junk
      // tokens appended, so their exact 3-shingle Jaccard vs the source,
      // (m-2)/(m+k-2) for an m-token doc, straddles 0.9 with the corpus'
      // natural length spread — m=20,k=2 lands EXACTLY on the threshold —
      // and banding recall + exact verification are tested where they
      // interact. 32 bands × 4 rows: P(all bands miss | j ≥ 0.9) < 2e-15,
      // and seeded hashing makes the outcome fixed. The oracle recomputes
      // the exact shingle-set Jaccard truth in SQL (the x8 pattern) and
      // keeps exactly the incoming ids whose max Jaccard vs ANY corpus
      // doc stays under the threshold.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val k = col("doc_id") % 4
      val junk = Seq("a", "b", "c").zipWithIndex.map { case (tag, j) =>
        when(k >= j + 1, concat(lit(s" zq$tag"), col("doc_id"))).otherwise(lit(""))
      }
      val inc = d.select((col("doc_id") + 2 * PlantedOffset).as("doc_id"),
        concat(col("text") +: junk: _*).as("text"))
      Dedup.nearDupIncrement(d, inc, "text", "doc_id",
        threshold = 0.9, numHashes = 128, bands = 32)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x3_fingerprint" -> ((s, dir) =>
      rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    "x4_quality" -> ((s, dir) =>
      rd(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.stopwordRatio(col("text"), TextAnalysis.EnglishStopwords).as("stopword_ratio"),
          TextAnalysis.meanWordLen(col("text")).as("mean_word_len"))
        .orderBy(col("doc_id"))),

    "x5_lang_id" -> ((s, dir) =>
      rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "x6_minhash_pairs" -> ((s, dir) => {
      // Near-dup (not identical) positives: every doc plus a mutated copy
      // with a 4-token tail, so planted pairs land at shingle-Jaccard
      // (m-2)/(m+2) ∈ [0.67, 0.97] and only docs with ≥ 18 tokens clear
      // the 0.8 bar — the SAME truth the DuckDB oracle computes exactly
      // over all pairs. 32 bands × 4 rows: P(miss | j ≥ 0.8) < 5e-8, and
      // deterministic seeded hashing makes the outcome fixed, so this
      // checks signature, banding, and verify end-to-end against ground
      // truth (not just planted identity like x16).
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val mutated = d.select((col("doc_id") + PlantedOffset).as("doc_id"),
        concat(col("text"), lit(" graft appended tail marker")).as("text"))
      // fan out first: the test parquet is one row group (one scan task),
      // and 128 minhashes/doc is the CPU-heavy step — without this the
      // kernel runs on the scan's 2-task parallelism
      Dedup.minhashDedupPairs(
        d.unionAll(mutated).repartition(s.sessionState.conf.numShufflePartitions),
        "text", "doc_id", threshold = 0.8, numHashes = 128, bands = 32)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x7_simhash_pairs" -> ((s, dir) => {
      // maxHamming = 3 ⇒ 4-chunk pigeonhole blocking with complete recall
      // (chunk count is derived from maxHamming since round 3). The oracle
      // recomputes the md5-token-hash SimHash in SQL and takes the exact
      // full-pairs Hamming truth — including the natural vote-tie pairs
      // this tiny-vocabulary corpus produces (3 pairs at Hamming 0 that
      // are NOT identical texts), which a planted-only oracle would miss.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      Dedup.simhashDedupPairs(d.unionAll(copies), "text", "doc_id", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x8_ngram_jaccard" -> ((s, dir) =>
      // Posting-list blocking is exact (a pair with j > 0 shares a
      // shingle, and the default maxDf exceeds the doc count at this SF so
      // nothing is dropped), so DuckDB all-pairs Jaccard is the precise
      // oracle.
      Dedup.ngramJaccardPairs(rd(s, dir, "documents"), "text", "doc_id",
        threshold = 0.2, shingleSize = 2)
        .orderBy(col("id_a"), col("id_b"))),

    "x16_minhash_planted" -> ((s, dir) => {
      // Exact copies (jaccard 1.0, identical signatures ⇒ recall 1): the
      // pipeline must return exactly the planted pairs — no distinct
      // natural doc pair reaches jaccard ≥ 0.99 (one differing token drops
      // shingle jaccard to ≈0.9).
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      Dedup.minhashDedupPairs(d.unionAll(copies), "text", "doc_id",
        threshold = 0.99, numHashes = 32, bands = 8)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jac_r"))
        .orderBy(col("id_a"))
    }),

    "x17_ngram_planted" -> ((s, dir) => {
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      Dedup.ngramJaccardPairs(d.unionAll(copies), "text", "doc_id",
        threshold = 0.99, shingleSize = 3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jac_r"))
        .orderBy(col("id_a"))
    }),

    "x9_ann_bruteforce" -> ((s, dir) => {
      // double-precision vectors so the oracle's math is comparable
      val emb = rd(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast(ArrayType(DoubleType)).as("embedding"))
      val queries = emb.where(col("vec_id") < 5)
      Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 4).as("score_r"))
        .orderBy(col("query_id"), col("rank"))
    }),

    "x10_ann_lsh" -> ((s, dir) => {
      // Planted twins (same direction ⇒ identical hyperplane signature ⇒
      // same bucket): LSH must return the twin as rank-1 with cosine 1.0,
      // making the approximate path oracle-checkable on its guarantees.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionAll(planted)
      Similarity.lshTopK(corpus, planted, "vec_id", "embedding", k = 1, nBits = 8)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 4).as("score_r"))
        .orderBy(col("query_id"))
    }),

    "x72_ann_lsh_store" -> ((s, dir) => {
      // x10's planted-twin contract through the PERSISTED standing index
      // at the r15 defaults (lshIndexWrite → read → lshSearchIndexed,
      // 16-bit prefix-partitioned layout): identical-direction twins
      // share signatures at any width, so the store search must return
      // each original at rank 1 / cosine 1.0 — and the answer rides the
      // exact scale path (prefix partition pruning + bucket IN + eager
      // width guard) the 100 TB recipe prescribes.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionAll(planted)
      val store = java.nio.file.Files.createTempDirectory("x72").toString + "/idx"
      Similarity.lshIndexWrite(corpus, "vec_id", "embedding", store)
      Similarity.lshSearchIndexed(s.read.parquet(store), planted,
          "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 4).as("score_r"))
        .orderBy(col("query_id"))
    }),

    "x18_ann_ivf" -> ((s, dir) => {
      // IVF path on the same planted-twin contract as x10: a scaled twin
      // shares its original's direction, hence its coarse cell, and the
      // probe set always contains the query's own cell — so IVF must
      // return the original as rank-1 with cosine 1.0.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionAll(planted)
      Similarity.ivfTopK(corpus, planted, "vec_id", "embedding", k = 1, nlist = 16, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 4).as("score_r"))
        .orderBy(col("query_id"))
    }),

    "x73_ann_ivf_store" -> ((s, dir) => {
      // x18's planted contract through the PERSISTED cell-partitioned
      // standing index (ivfIndexWrite → reload → ivfSearchIndexed):
      // the twin shares its original's cell, the probe set contains the
      // query's own cell, and the answer rides the cell-pruned store
      // scan — one sorted file per cell directory (the write-helper
      // layout the 100 TB recipe prescribes).
      val emb = rd(s, dir, "embeddings")
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      val corpus = emb.select("vec_id", "embedding").unionAll(planted)
      val cents = Similarity.ivfTrain(corpus, "vec_id", "embedding",
        nlist = 16, lloydPasses = 1)
      val store = java.nio.file.Files.createTempDirectory("x73").toString + "/idx"
      Similarity.ivfIndexWrite(corpus, "vec_id", "embedding", cents, store)
      Similarity.ivfSearchIndexed(s.read.parquet(store), cents, planted,
          "vec_id", "embedding", k = 1, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("score"), 4).as("score_r"))
        .orderBy(col("query_id"))
    }),

    "x74_shuffle" -> ((s, dir) => {
      // deterministic epoch shuffle: the op totally orders the corpus by
      // a seeded uniform hash (range repartition + local sort — no
      // single-task sort). The driver's compare sorts rows, so row ORDER
      // itself is invisible to the oracle; the query materializes the
      // sort KEY so the permutation both engines would read back is the
      // checked value (FiltersSpec pins the physical ordering and the
      // seed-independence of the permutations).
      val d = rd(s, dir, "documents").select(col("doc_id"), col("source"))
      Sampling.deterministicShuffle(d, "doc_id", seed = 7, numShards = 8)
        .withColumn("shuffle_key", Sampling.hashLong(col("doc_id"), "shuffle:7"))
    }),

    "x75_vocab_stats" -> ((s, dir) => {
      // per-language vocabulary size / token mass / type-token ratio —
      // exact path (the oracle-checked one; the HLL path is specced
      // against it at rsd tolerance in FiltersSpec)
      val d = rd(s, dir, "documents").select(col("lang"), col("text"))
        .repartition(s.sparkContext.defaultParallelism)
      TextAnalysis.vocabStats(d, "text", "lang").orderBy(col("lang"))
    }),

    "x77_interleave" -> ((s, dir) => {
      // weighted deterministic interleave: positions are rank/weight
      // with exactly-representable binary weights, so the doubles are
      // bit-identical across engines and the oracle replays the whole
      // ordering as data (pos IS the order; FiltersSpec pins the
      // physical sort and the every-prefix mixing-rate property)
      Sampling.interleaveSources(
          rd(s, dir, "documents").select(col("doc_id"), col("source")),
          "doc_id", "source",
          Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0),
          defaultWeight = 0.5)
        .orderBy(col("pos"), col("doc_id"))
    }),

    "x76_pca_model" -> ((s, dir) => {
      import s.implicits._
      // 2-d integer-feature PCA with a closed-form SQL oracle: integer
      // moments are EXACT in IEEE doubles (sums < 2^53), so both
      // engines build bit-identical covariance matrices; the oracle
      // then solves the 2x2 eigenproblem in closed form (+,-,*,/,sqrt
      // only — all correctly-rounded IEEE ops) while the engine uses
      // the general symmetric solver — they agree to ~1e-13, compared
      // at 6dp (unit components) / 2dp (variance). The output is the
      // MODEL (4 scalars), not per-row projections: 60k projected
      // values would each roll dice against a rounding boundary; the
      // model cannot. Projection round-trips are PcaPropertySpec's job.
      val d = rd(s, dir, "documents")
        .select(array(col("n_chars").cast("double"),
          (col("doc_id") % 97).cast("double")).as("vec"))
      val m = graft.ops.Pca.pcaTrain(d, "vec", k = 1)
      val n = rd(s, dir, "documents").count()
      Seq((n, m.components(0)(0), m.components(0)(1), m.explainedVariance(0)))
        .toDF("n", "c0", "c1", "var1")
        .select(col("n"), round(col("c0"), 6).as("c0_r"),
          round(col("c1"), 6).as("c1_r"), round(col("var1"), 2).as("var1_r"))
    }),

    "x78_tfidf" -> ((s, dir) => {
      // TF-IDF top terms in the linear-idf mode built for oracle replay:
      // score = (tf · N) / df is one exact long product and ONE
      // correctly-rounded double division, so rank, tf, df_docs AND the
      // double score are bit-identical in any IEEE engine. The libm-ln
      // classic mode (logIdf = true) is pinned by TextOpsPropertySpec
      // instead — the x60 split.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      TextAnalysis.tfidfTopTerms(d, "text", "doc_id", k = 5, logIdf = false)
        .orderBy(col("doc_id"), col("rank"))
    }),

    "x79_bm25" -> ((s, dir) => {
      // the engine-portable BM25 core: exact integer evidence (tf, dl,
      // df_docs) plus tf_norm evaluated in the Scaladoc's spelled
      // operation order — every input exact, every step one
      // correctly-rounded IEEE op, so the double replays exactly. The
      // libm-ln idf (full bm25 ranking) is TextOpsPropertySpec's pin.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      TextAnalysis.bm25Components(d, "text", "doc_id",
          Seq("spark", "window", "vector"))
        .orderBy(col("term"), col("doc_id"))
    }),

    "x84_nb_classifier" -> ((s, dir) => {
      // Model-based quality/domain classification (the GPT-3/PaLM
      // classifier-filter stage): Bernoulli-presence NB trained on
      // lang=='en' vs rest, scored over the same corpus. The model's
      // weights are integer micro-nats (floor(1e6·Δln + 0.5)), so
      // score_micro is an exact long SUM — partition-order-free and
      // SQL-replayable; every other column is an exact integer/boolean
      // (Classify.scala EXACTNESS DESIGN; the oracle replays model AND
      // scores).
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"),
        (col("lang") === "en").as("is_en"))
      val model = graft.ops.Classify.nbTrain(d, "text", "is_en",
        vocabSize = 100)
      graft.ops.Classify.nbScore(d, "text", "doc_id", model)
        .orderBy(col("doc_id"))
    }),

    "x85_dsir_select" -> ((s, dir) => {
      // DSIR importance resampling (hashed unigram+bigram md5-bucket
      // features): target = the lang=='en' slice, raw = the full
      // corpus. Bucket weights are integer micro-nats over exact gram
      // counts, so logw_micro is an exact long SUM and the top-200
      // `selected` flag is pure integer ordering (weight desc, doc_id
      // asc) — the whole pipeline (features, fit, weights, scores,
      // selection) replays in SQL (Dsir.scala EXACTNESS DESIGN).
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"),
        col("lang"))
      val model = graft.ops.Dsir.fit(d, d.where(col("lang") === "en"),
        "text", numBuckets = 4096)
      val top = graft.ops.Dsir.select(d, "text", "doc_id", model, 200)
        .select(col("doc_id")).withColumn("selected", lit(true))
      graft.ops.Dsir.score(d, "text", "doc_id", model)
        .join(top, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_grams"), col("logw_micro"),
          coalesce(col("selected"), lit(false)).as("selected"))
        .orderBy(col("doc_id"))
    }),

    "x87_dedup_keep_best" -> ((s, dir) => {
      // keep-best cluster representatives on REAL duplicate structure:
      // the pair set is every same-fingerprint pair (x15's
      // normalized-text groups — sf0.1 has 8 natural ones), the keep
      // rule is highest n_chars then lowest doc_id
      // (Dedup.dedupByPairsKeepBest — the published "keep the best
      // cluster member" nuance). CC labels and the per-component rank
      // are integer-deterministic, so the kept id set replays in SQL.
      val d = rd(s, dir, "documents")
      val fp = d.select(col("doc_id"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      val pairs = fp.select(col("fp"), col("doc_id").as("id_a"))
        .join(fp.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
      graft.ops.Dedup.dedupByPairsKeepBest(d, "doc_id", pairs,
          col("n_chars"))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x86_pipeline_classify" -> ((s, dir) => {
      // The classifier-filter stage THROUGH the public Pipeline.run
      // entry point (stage 2b, pretrained-model daily-loop shape):
      // kept = documents the x84 model scores strictly positive. The
      // oracle replays the x84 model and keeps predicted rows — exact
      // integer scores, so the kept id set is engine-identical.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"),
        (col("lang") === "en").as("is_en"))
      val model = graft.ops.Classify.nbTrain(d, "text", "is_en",
        vocabSize = 100)
      val res = graft.ops.Pipeline.run(d.select("doc_id", "text"),
        graft.ops.Pipeline.Config(rules = None,
          classifier = Some(graft.ops.Pipeline.Classifier(
            model = Some(model)))))
      res.kept.select("doc_id").orderBy(col("doc_id"))
    }),

    "x59_pq_ann" -> ((s, dir) => {
      // Product-quantization/ADC path on the planted-twin contract: the
      // scaled twin shares its original's direction, so after
      // l2-normalization their subvectors — hence their PQ codes —
      // coincide; the ADC score of the twin's query against the
      // original's codes is then the corpus maximum, and the (score
      // desc, id asc) ranking puts the ORIGINAL (smallest same-coded
      // id) at rank-1. Scores are quantized inner products, not exact
      // cosines, so the oracle checks the ids, not the score.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      def norm(df: DataFrame): DataFrame =
        Similarity.l2Normalize(df, "embedding")
          .select(col("vec_id"), col("normalized").as("embedding"))
      val corpus = norm(emb.select("vec_id", "embedding").unionAll(planted))
      // the contract rests on the twins SHARING their originals' codes:
      // normalization of 1.001×x is only ulp-identical to x's, so a
      // Voronoi-boundary code flip at some SF would silently void the
      // rank-1 guarantee and surface as an undiagnosable oracle hash
      // mismatch. Check the precondition EAGERLY and raise a named
      // error instead (r13 ADVICE 5).
      val cb = Similarity.pqTrain(corpus, "vec_id", "embedding",
        m = 16, ksub = 64, lloydPasses = 1)
      val codes = Similarity.pqEncode(corpus, "vec_id", "embedding", cb)
      val twinCodes = codes.where(col("vec_id") >= PlantedOffset)
        .select((col("vec_id") - PlantedOffset).as("vec_id"),
          col("codes").as("__tc"))
      val flipped = codes.join(twinCodes, "vec_id")
        .where(not(col("codes") === col("__tc"))).count()
      require(flipped == 0,
        s"x59 planted-twin precondition violated: $flipped twin(s) PQ-code " +
          "differently from their originals (Voronoi-boundary flip at this " +
          "SF) — the rank-1 oracle contract is void; adjust the plant")
      Similarity.pqSearch(codes, cb, norm(planted), "vec_id", "embedding", k = 1)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"))
    }),

    "x63_ivfpq_ann" -> ((s, dir) => {
      // IVFADC (coarse cells + PQ codes) on the planted-twin contract:
      // the normalized twin shares its original's direction — hence its
      // coarse cell and its PQ codes — the probe set always contains
      // the query's own cell, and the (score desc, id asc) rank breaks
      // the shared-codes tie to the ORIGINAL. Approximate scores, so
      // the oracle checks ids only, like x59.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.where(col("vec_id") < 5)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      def norm(df: DataFrame): DataFrame =
        Similarity.l2Normalize(df, "embedding")
          .select(col("vec_id"), col("normalized").as("embedding"))
      val corpus = norm(emb.select("vec_id", "embedding").unionAll(planted))
      val cb = Similarity.pqTrain(corpus, "vec_id", "embedding",
        m = 16, ksub = 64, lloydPasses = 1)
      val cents = Similarity.ivfTrain(corpus, "vec_id", "embedding",
        nlist = 16, lloydPasses = 1)
      val idx = Similarity.ivfPqIndex(corpus, "vec_id", "embedding", cents, cb)
      // same eager planted-twin precondition as x59, over BOTH dials: a
      // twin must share its original's coarse cell AND its PQ codes, or
      // the rank-1 contract is void — raise a named error, not an
      // undiagnosable oracle hash mismatch (r13 ADVICE 5)
      val twinIdx = idx.where(col("vec_id") >= PlantedOffset)
        .select((col("vec_id") - PlantedOffset).as("vec_id"),
          col("cell").as("__tcell"), col("codes").as("__tc"))
      val flipped = idx.join(twinIdx, "vec_id")
        .where(col("cell") =!= col("__tcell") ||
          not(col("codes") === col("__tc"))).count()
      require(flipped == 0,
        s"x63 planted-twin precondition violated: $flipped twin(s) land in " +
          "a different cell or PQ-code differently from their originals " +
          "(boundary flip at this SF) — the rank-1 oracle contract is void")
      Similarity.ivfPqSearch(idx, cents, cb, norm(planted),
          "vec_id", "embedding", k = 1, nprobe = 4)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
        .orderBy(col("query_id"))
    }),

    "x60_lm_score" -> ((s, dir) => {
      // bigram-LM scoring, integer evidence only: the cross-entropy the
      // filter thresholds is computed FROM these counts, but libm log
      // differs across engines in the last ulp (the rareTokenRatio
      // precedent), so the oracle pins n_tokens / n_oov /
      // n_known_bigrams exactly and LmPropertySpec pins the entropy
      // math against a naive reference. Small caps (vocab 500, bigrams
      // 2000) so BOTH cap boundaries bite at every SF.
      val docs = rd(s, dir, "documents")
      val (uni, bi) = TextAnalysis.bigramModel(docs, "text",
        vocabSize = 500, maxBigrams = 2000)
      TextAnalysis.lmScore(docs, "text", "doc_id", uni, bi)
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          col("n_known_bigrams"))
        .orderBy(col("doc_id"))
    }),

    "x19_quality_score" -> ((s, dir) =>
      rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))),

    "x21_dup_lines" -> ((s, dir) =>
      // every 5th document gets its text duplicated onto a second line —
      // planted repetition the ratio must flag at exactly 0.5
      rd(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.dupLineRatio(
            when(col("doc_id") % 5 === 0, concat(col("text"), lit("\n"), col("text")))
              .otherwise(col("text"))).as("dup_line_ratio"))
        .orderBy(col("doc_id"))),

    "x22_top_tokens" -> ((s, dir) =>
      TextAnalysis.topTokens(rd(s, dir, "documents"), "text", k = 50)),

    "x24_incremental_dedup" -> ((s, dir) => {
      // daily-batch shape: the incoming batch carries (a) copies of docs
      // the corpus already holds — all dropped, (b) genuinely new docs —
      // all kept, (c) an in-batch duplicate of each new doc — min id wins
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      val fresh = d.select((col("doc_id") + 2 * PlantedOffset).as("doc_id"),
        concat(col("text"), lit(" graft increment marker")).as("text"))
      val freshDup = d.select((col("doc_id") + 3 * PlantedOffset).as("doc_id"),
        concat(col("text"), lit(" graft increment marker")).as("text"))
      val incoming = copies.unionAll(fresh).unionAll(freshDup)
      Dedup.dedupIncrement(d, incoming, "text", "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x23_near_dedup_apply" -> ((s, dir) => {
      // the full near-dedup pipeline end-to-end: find pairs (planted
      // exact copies), close them into components, drop non-representative
      // members — exactly the natural corpus must survive
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val copies = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      val corpus = d.unionAll(copies)
      val pairs = Dedup.minhashDedupPairs(corpus, "text", "doc_id",
        threshold = 0.99, numHashes = 32, bands = 8)
      Dedup.dedupByPairs(corpus, "doc_id", pairs)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x25_quality_filter" -> ((s, dir) => {
      // Gopher-rule annotate with planted variety: every 3rd doc gets the
      // required stopwords appended (passes that rule), every 7th gets a
      // hash run (fails symbol ratio) — so each rule fires both ways and
      // the oracle recomputes every rule in SQL
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val t0 = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" the be to of and that have with")))
        .otherwise(col("text"))
      val t = when(col("doc_id") % 7 === 0,
        concat(t0, lit(" # # # # # # # # # # # #"))).otherwise(t0)
      TextFilters.annotate(d.select(col("doc_id"), t.as("text")), "text")
        .select(col("doc_id"), col("ok_word_count"), col("ok_mean_word_len"),
          col("ok_symbol_ratio"), col("ok_bullet_lines"), col("ok_ellipsis_lines"),
          col("ok_alpha_words"), col("ok_stopword_hits"), col("keep"),
          col("drop_reasons"))
        .orderBy(col("doc_id"))
    }),

    "x26_redact" -> ((s, dir) => {
      // plant one email, one IPv4, one phone per doc (deterministic from
      // doc_id); the oracle applies the same RE2-safe patterns in DuckDB
      val d = rd(s, dir, "documents")
      val t = concat(col("text"),
        lit(" contact user"), col("doc_id").cast(StringType),
        lit("@example.com on 10.0."),
        (col("doc_id") % 256).cast(StringType), lit(".1 or call 555-123-"),
        lpad((col("doc_id") % 10000).cast(StringType), 4, "0"))
      val doc = d.select(col("doc_id"), t.as("text"))
      val (e, i, p) = Redact.counts(col("text"))
      doc.select(col("doc_id"), Redact.redact(col("text")).as("redacted"),
          e.as("n_emails"), i.as("n_ips"), p.as("n_phones"))
        .orderBy(col("doc_id"))
    }),

    "x27_decontaminate" -> ((s, dir) => {
      // every doc_id % 10 == 3 doc doubles as the "benchmark" set: those
      // docs (and any doc naturally sharing a 13-gram) must be flagged
      // with their exact distinct-overlap count; docs under 13 tokens
      // produce no grams and stay clean
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 10 === 3).select(col("text"))
      Decontaminate.overlapReport(d, "text", "doc_id", bench, "text", n = 13)
        .orderBy(col("doc_id"))
    }),

    "x61_scrub_spans" -> ((s, dir) => {
      // surgical decontamination on the x27 contract (bench = every
      // doc_id % 10 == 3 doc): span/token removal counts replay
      // integer-exact in SQL, and n_tokens_after re-tokenizes the
      // SCRUBBED text — so the surgery output itself is checked through
      // the shared tokenizer, not just the bookkeeping. Benchmark docs
      // scrub to nothing (one span covering every token); clean and
      // sub-13-token docs report zeros with their text untouched.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 10 === 3).select(col("text"))
      Decontaminate.scrubSpans(d, "text", "doc_id", bench, "text", n = 13)
        .select(col("doc_id"),
          col("n_spans_removed").cast(LongType).as("n_spans_removed"),
          col("n_tokens_removed").cast(LongType).as("n_tokens_removed"),
          size(TextAnalysis.tokens(col("text"))).cast(LongType).as("n_tokens_after"))
        .orderBy(col("doc_id"))
    }),

    "x64_token_budget" -> ((s, dir) =>
      // exact per-source token-budget mixture: hash-order prefix under a
      // running n_chars budget, replayed by the oracle's identical
      // windowed cumsum — budgets sized to bite mid-source at every SF
      Sampling.tokenBudgetMix(rd(s, dir, "documents"), "doc_id", "n_chars",
          "source", budgets = Map("src0" -> 60000L, "src1" -> 25000L),
          defaultBudget = 12000L)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    "x65_token_budget_approx" -> ((s, dir) =>
      // the windowless scale form: keep the hash-fraction budget/total
      // per source — fraction is one IEEE division from two exact
      // integers, so the keep set replays bit-identically in SQL
      Sampling.tokenBudgetMixApprox(rd(s, dir, "documents"), "doc_id", "n_chars",
          "source", budgets = Map("src0" -> 60000L, "src1" -> 25000L),
          defaultBudget = 12000L)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    "x62_char_mix" -> ((s, dir) =>
      // charset-level QC counts, integer-exact in both engines (each
      // class = length minus length-with-class-deleted over EXPLICIT
      // character classes — the WsChars dual-spelling discipline)
      rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.charClassCounts(col("text")).as("c"))
        .select(col("doc_id"),
          col("c.n_chars").cast(LongType).as("n_chars"),
          col("c.n_alpha").cast(LongType).as("n_alpha"),
          col("c.n_digit").cast(LongType).as("n_digit"),
          col("c.n_ws").cast(LongType).as("n_ws"),
          col("c.n_non_ascii").cast(LongType).as("n_non_ascii"))
        .orderBy(col("doc_id"))),

    "x28_hash_sample" -> ((s, dir) =>
      // deterministic md5-uniform mixing: per-source keep rates, default
      // for unlisted sources — the exact sample is engine-replicable
      Sampling.stratifiedMix(rd(s, dir, "documents"), "source", "doc_id",
        rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    "x29_asof_join" -> ((s, dir) => {
      // every click joined to the user's most recent view within 4h —
      // DuckDB's native ASOF LEFT JOIN is the oracle. Views collapse to
      // max(event_id) per instant so tie-breaks are engine-independent.
      val ev = rdEvents(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("event_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("v_event_id"))
        .select(col("user_id"), col("ts").as("v_ts"), col("v_event_id"))
      Joins.asofJoin(clicks, views, Seq("user_id"), "ts", "v_ts",
          tolerance = Some(expr("INTERVAL 4 HOURS")))
        .select(col("event_id"), col("v_event_id"),
          (unix_micros(col("ts")) - unix_micros(col("v_ts"))).as("lag_us"))
        .orderBy(col("event_id"))
    }),

    "x30_salted_join" -> ((s, dir) => {
      // skew-salted fact⋈dim join must equal the plain SQL join; salt
      // derives from (orderkey, linenumber) so it is deterministic
      val li = rd(s, dir, "lineitem").select(
        col("l_orderkey").as("o_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"))
      val o = rd(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      Joins.saltedJoin(li, o, Seq("o_orderkey"), nSalts = 8,
          saltCols = Seq("o_orderkey", "l_linenumber"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    }),

    "x31_dedup_lines" -> ((s, dir) => {
      // corpus-wide boilerplate scrub: every 5th doc gets the same
      // planted footer line (count ≥ sf0.001's 100 docs / 5 = 20 ≥ 5),
      // which must vanish from all of them; natural lines repeated ≥ 5
      // times corpus-wide go too — the oracle recomputes both
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = d.withColumn("text",
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit("\nSUBSCRIBE TO OUR NEWSLETTER TODAY")))
          .otherwise(col("text")))
      Dedup.dedupLines(planted, "text", "doc_id", minDupCount = 5)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
    }),

    "x32_pack_tokens" -> ((s, dir) => {
      // deterministic token-budget packing: md5 shard, id-ordered cumsum,
      // start-offset bin — pure integer window math, exact in any engine
      val d = rd(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("n_tokens"))
      Packing.packByTokenBudget(d, "doc_id", "n_tokens",
          maxTokensPerBin = 2000, nShards = 8)
        .select(col("doc_id"), col("n_tokens"), col("shard"),
          col("start_tok"), col("bin"))
        .orderBy(col("doc_id"))
    }),

    "x33_domain_cap" -> ((s, dir) =>
      // per-source cap: ≤ 5 docs per source, hash-ordered draw — the
      // C4/RefinedWeb per-domain page cap, engine-replicable
      Sampling.domainCap(rd(s, dir, "documents"), "source", "doc_id",
          maxPerDomain = 5)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))),

    "x34_len_percentiles" -> ((s, dir) =>
      // exact token-count quartiles per language — quartile positions
      // over integer counts interpolate exactly in binary, so DuckDB's
      // quantile_cont reproduces the doubles bit-for-bit
      TextAnalysis.groupPercentiles(
        rd(s, dir, "documents").select(col("lang"),
          TextAnalysis.tokenCountWs(col("text")).as("n_tokens")),
        "lang", "n_tokens")
        .orderBy(col("lang"))),

    "x49_knn_classify" -> ((s, dir) => {
      // k-NN label propagation over the labeled embeddings table: the
      // ranking is x9's exact top-k (double vectors so the DuckDB cosine
      // is comparable), the vote and min-label tie-break replay in SQL
      val emb = rd(s, dir, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast(ArrayType(DoubleType)).as("embedding"),
          col("label"))
      val queries = emb.where(col("vec_id") < 20)
      Similarity.knnClassify(emb, queries, "vec_id", "embedding", "label", k = 10)
        .orderBy(col("query_id"))
    }),

    "x68_cosine_dedup_increment" -> ((s, dir) => {
      // incremental embedding near-dup on the planted contract: the batch
      // holds scaled copies of corpus rows (same direction → same bucket
      // at mask 0, cosine 1.0 → dropped) and NEGATED corpus rows (cosine
      // −1 to their source, |cosine| < 0.5 to everything else → fresh,
      // survive). Output is exactly the negated half's ids.
      val emb = rd(s, dir, "embeddings").select("vec_id", "embedding")
      val idx = Similarity.lshIndex(emb, "vec_id", "embedding", nBits = 8)
      val copies = emb.where(col("vec_id") < 250)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      val fresh = emb.where(col("vec_id") >= 250 && col("vec_id") < 500)
        .select((col("vec_id") + 2L * PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => -v).as("embedding"))
      Similarity.cosineDedupIncrement(idx, copies.unionAll(fresh),
          "vec_id", "embedding", threshold = 0.9, nBits = 8, probeDepth = 1)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    "x69_semantic_dedup_increment" -> ((s, dir) => {
      // semantic incremental on the same planted contract as x68: the
      // batch's scaled copies share their originals' nearest cell (same
      // direction ⇒ same centroid scores) and verify at cosine 1.0 →
      // dropped; negated rows are fresh (|cosine| < 0.5 naturally) →
      // survive. Fully distributed (no driver collect of the batch).
      val emb = rd(s, dir, "embeddings").select("vec_id", "embedding")
      val cents = Similarity.ivfTrain(emb, "vec_id", "embedding",
        nlist = 16, lloydPasses = 1)
      val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", cents)
      val copies = emb.where(col("vec_id") < 250)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      val fresh = emb.where(col("vec_id") >= 250 && col("vec_id") < 500)
        .select((col("vec_id") + 2L * PlantedOffset).as("vec_id"),
          transform(col("embedding"), v => -v).as("embedding"))
      Similarity.semanticDedupIncrement(idx, cents, copies.unionAll(fresh),
          "vec_id", "embedding", threshold = 0.9, nprobe = 4)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    "x70_streaming_cosine_dedup" -> ((s, dir) => {
      // streaming embedding near-dup over TWO real micro-batches, the
      // x58 contract on vectors: batch 1 is the embedding corpus
      // (nothing to collide with — survives), batch 2 is a scaled copy
      // of every vector (cosine 1.0 ⇒ mask-0 candidate ⇒ drops) plus a
      // negated fresh vector per row (|cosine| < 0.5 to everything ⇒
      // survives). The accumulated parquet store is the checked output.
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingFlatten
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val vecs = rd(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .orderBy(col("vec_id"))
        .as[(Long, Array[Float])].collect()
      val work = java.nio.file.Files.createTempDirectory("x70").toString
      val in = MemoryStream[(Long, Array[Float])]
      val q = StreamingFlatten.streamingCosineDedup(
        in.toDF().toDF("vec_id", "embedding"), "embedding", "vec_id",
        s"$work/corpus", s"$work/ckpt",
        threshold = 0.9, nBits = 8, probeDepth = 1)
      try {
        in.addData(vecs.toSeq)
        q.processAllAvailable()
        in.addData(vecs.toSeq.flatMap { case (id, v) =>
          Seq((id + PlantedOffset, v.map(_ * 1.001f)),
            (id + 2 * PlantedOffset, v.map(x => -x)))
        })
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$work/corpus")
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    "x66_cosine_dedup_probed" -> ((s, dir) => {
      // the r14 multi-probe recall dial on the planted-twin contract:
      // identical-direction twins collide at flip mask 0, deeper probing
      // only ADDS candidate buckets, candidates are exact-cosine-verified,
      // and nothing natural clears the 0.9 bar — so the depth-2 output is
      // EXACTLY the planted pair set (x11's oracle), through the
      // completely different probe-join execution path.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.select((col("vec_id") + PlantedOffset).as("vec_id"),
        transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      Similarity.cosineDedupPairs(emb.select("vec_id", "embedding").unionAll(planted),
          "vec_id", "embedding", threshold = 0.9, nBits = 8, probeDepth = 2)
        .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score_r"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x67_semantic_dedup_probed" -> ((s, dir) => {
      // probeCells on the verbatim-copy contract: a copy shares its
      // original's nearest cell (identical vector ⇒ identical centroid
      // scores), extra probed cells only add exact-verified candidates,
      // nothing natural clears 0.9 — output is exactly the planted set
      // through the two-sided probe join + pair dedup path.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.select((col("vec_id") + PlantedOffset).as("vec_id"),
        col("embedding"))
      Similarity.semanticDedupPairs(
          emb.select("vec_id", "embedding").unionAll(planted),
          "vec_id", "embedding", threshold = 0.9, nlist = 16, probeCells = 2)
        .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score_r"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x50_semantic_dedup" -> ((s, dir) => {
      // SemDeDup contract run: planted VERBATIM copies (identical vector,
      // new id) are semantic duplicates by construction — an identical
      // vector scores identically against every centroid, so the copy
      // lands in its original's k-means cell deterministically, and the
      // within-cell cosine is 1.0 (round-4). Nothing else clears 0.9:
      // max natural pairwise cosine in the synthetic embeddings < 0.5.
      val emb = rd(s, dir, "embeddings")
      val planted = emb.select((col("vec_id") + PlantedOffset).as("vec_id"),
        col("embedding"))
      Similarity.semanticDedupPairs(
          emb.select("vec_id", "embedding").unionAll(planted),
          "vec_id", "embedding", threshold = 0.9, nlist = 16)
        .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score_r"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x51_semantic_dedup_apply" -> ((s, dir) => {
      // the apply form: connected components over the x50 pair graph,
      // keep-min per component — every planted copy drops, every
      // original survives
      val emb = rd(s, dir, "embeddings")
      val planted = emb.select((col("vec_id") + PlantedOffset).as("vec_id"),
        col("embedding"))
      Similarity.semanticDedup(
          emb.select("vec_id", "embedding").unionAll(planted),
          "vec_id", "embedding", threshold = 0.9, nlist = 16)
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    }),

    "x53_dedup_doc_lines" -> ((s, dir) =>
      // within-doc line scrub on the x21 planted-repetition corpus: every
      // 5th doc's text is duplicated onto a second block of lines, so the
      // scrub must return exactly the original block (keep-first, raw
      // line identity, order preserved) and leave other docs verbatim
      rd(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.dedupDocLines(
            when(col("doc_id") % 5 === 0, concat(col("text"), lit("\n"), col("text")))
              .otherwise(col("text"))).as("scrubbed"))
        .orderBy(col("doc_id"))),

    "x54_scrub_lines" -> ((s, dir) =>
      // C4 line scrub over documents augmented with known keep/drop
      // lines: a good sentence stays, a 1-word punctuated line drops
      // (word minimum), a javascript-bearing line drops (ban list), an
      // unpunctuated line drops, and the document's own lines keep or
      // drop by the same three rules — all replayed exactly in SQL
      rd(s, dir, "documents")
        .select(col("doc_id"),
          TextFilters.scrubLines(concat_ws("\n",
            lit("A good first sentence stays here."),
            col("text"),
            lit("short."),
            lit("Lines mentioning javascript are banned today."),
            lit("no terminal punctuation here"))).as("scrubbed"))
        .orderBy(col("doc_id"))),

    "x57_media_dedup" -> ((s, dir) => {
      // exact binary dedup over the synthetic media payloads (utf-8 text
      // bytes): planted verbatim copies must drop, natural duplicate
      // payloads keep their min id — DuckDB replays the same md5-over-
      // bytes partition
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val media = d.select(col("doc_id").as("media_id"),
        col("text").cast(BinaryType).as("payload"))
      val copies = media.select((col("media_id") + PlantedOffset).as("media_id"),
        col("payload"))
      Multimodal.dedupExactMedia(media.unionAll(copies), "payload", "media_id")
        .select(col("media_id")).orderBy(col("media_id"))
    }),

    "x80_media_neardup" -> ((s, dir) => {
      // perceptual near-dup over DECODED media features (the embeddings
      // table stands in for the decode stage's luminance grids): a
      // "recompressed twin" — every feature scaled by a hair — defeats
      // the md5-exact dedup of x57 but keeps the sign of almost every
      // consecutive difference, so the dHash pigeonhole banding finds
      // it. The oracle COMPUTES the full pair truth from the same
      // 63-bit difference hash (the r15 computed-truth rule), so any
      // natural near-identical feature rows pair too.
      // the twin scales every ODD element by 1% and leaves even elements
      // bit-identical — consecutive-difference signs flip only where the
      // neighbors were within ~1%, so twins land at small nonzero Hamming
      // (a uniform scale would be hash-IDENTICAL: order is preserved)
      val base = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val twins = base.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i % 2 === 0, x).otherwise(x * lit(1.01f)))
            .as("embedding"))
      Multimodal.nearDupMediaPairs(base.unionAll(twins), "embedding",
          "vec_id", maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x81_media_neardup_ahash" -> ((s, dir) => {
      // the aHash dial of x80: bit i = feature(i) > vector MEAN. The
      // alternating 1% twin moves the mean a hair AND half the
      // elements, so twins land at small nonzero Hamming through a
      // different mechanism than dHash's consecutive-sign flips; the
      // oracle recomputes the mean with the kernel's exact sequential
      // double summation (list_sum verified bit-identical to it).
      val base = rd(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
      val twins = base.where(col("vec_id") % 20 === 10)
        .select((col("vec_id") + PlantedOffset).as("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i % 2 === 0, x).otherwise(x * lit(1.01f)))
            .as("embedding"))
      Multimodal.nearDupMediaPairs(base.unionAll(twins), "embedding",
          "vec_id", maxHamming = 3, hash = "ahash")
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x56_temperature_mix" -> ((s, dir) =>
      // temperature-flattened language rebalancing: per-lang rates are
      // pure arithmetic over the lang counts (sorted fold, 9-dp
      // rounding), the keep decision is the md5 uniform — both replay
      // exactly in SQL
      Sampling.temperatureMix(
        rd(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", "doc_id", alpha = 0.5, targetFraction = 0.5)
        .orderBy(col("doc_id"))),

    "x55_cluster_prune" -> ((s, dir) => {
      // contract run with EXPLICIT one-hot centroids and verbatim one-hot
      // members: every direction-d member scores cosine exactly 1.0
      // against its own centroid and 0.0 against the rest, so the cell
      // assignment is unambiguous, all within-cell scores tie, and the
      // rank is exactly the id tie-break — SQL replays
      // keep-rank ≤ ceil(0.5 × n) directly
      val dirs = 4
      val dim = 8
      val vecs = rd(s, dir, "embeddings").select(col("vec_id"))
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)),
            i => when(i === (col("vec_id") % dirs).cast("int"), lit(1.0f))
              .otherwise(lit(0.0f))))
      val cents = Array.tabulate(dirs)(d =>
        Array.tabulate(dim)(j => if (j == d) 1f else 0f))
      Similarity.clusterPrune(vecs, "vec_id", "embedding", cents,
          keepFraction = 0.5)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),

    "x48_approx_percentiles" -> ((s, dir) =>
      // the 100 TB scale path for x34: a mergeable percentile_approx
      // sketch instead of buffering every group value. With accuracy
      // above the group sizes the sketch retains all values and the
      // result is the exact DISCRETE percentile — the value at rank
      // ceil(p*n) — which DuckDB's quantile_disc reproduces exactly
      // (OpsSpec pins the rank convention on 1..101 / 1..10 fixtures)
      TextAnalysis.groupPercentilesApprox(
        rd(s, dir, "documents").select(col("lang"),
          TextAnalysis.tokenCountWs(col("text")).as("n_tokens")),
        "lang", "n_tokens", accuracy = 1000000)
        .orderBy(col("lang"))),

    "x35_quantize_embed" -> ((s, dir) =>
      // symmetric int8 quantization: floor-based rounding is pure IEEE
      // arithmetic, so quantized ints and the fp scale match any engine.
      // The int array is emitted comma-joined: the driver's comparator
      // sorts result columns with pandas, which cannot sort list cells.
      Similarity.quantizeInt8(rd(s, dir, "embeddings"), "embedding")
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("q"), x => x.cast("string")), ",").as("q"))
        .orderBy(col("vec_id"))),

    "x39_l2_normalize" -> ((s, dir) =>
      // unit-norm embeddings, rounded to 9 dp in BOTH engines (the raw
      // quotients are cross-engine identical IEEE ops, but rounding
      // guards the comparison against any summation-order drift).
      // Emitted as a comma-joined %.9f string column — list cells break
      // the driver's pandas sort, and fixed-point printf sidesteps
      // engine-specific double→string rendering (Spark "1.0E-4" vs
      // DuckDB "0.0001"). `+ 0.0` normalizes IEEE -0.0 to +0.0 first.
      Similarity.l2Normalize(rd(s, dir, "embeddings"), "embedding", "nv")
        .select(col("vec_id"),
          array_join(transform(col("nv"), x =>
            format_string("%.9f", round(x, 9) + lit(0.0d))), ",").as("nv"))
        .orderBy(col("vec_id"))),

    "x36_hash_topn" -> ((s, dir) =>
      // exactly-37 deterministic holdout draw (TakeOrdered, no full sort)
      Sampling.hashTopN(rd(s, dir, "documents"), "doc_id", 37)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))),

    "x37_split" -> ((s, dir) =>
      // deterministic 75/12.5/12.5 split assignment — thresholds are
      // exact binary fractions so any engine reproduces the labels
      Sampling.split(rd(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id"))),

    "x38_bloom_decontaminate" -> ((s, dir) => {
      // bloom-prefiltered decontamination must EQUAL the exact variant
      // (bloom pre-filter + exact verify join): same % 10 == 3 bench as
      // x27; output is the surviving corpus
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 10 === 3).select(col("text"))
      Decontaminate.decontaminateBloom(d, "text", "doc_id", bench, "text", n = 13)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x52_fuzzy_decontaminate" -> ((s, dir) => {
      // near-dup decontamination with a threshold-straddling contract
      // (the x6 construction, cross-frame): the benchmark is every
      // % 11 == 0 doc with a 4-token tail appended, so a corpus doc's
      // exact 3-shingle Jaccard vs its benchmark derivative is
      // (m-2)/(m+2) — only docs with m ≥ 18 tokens clear the 0.8 bar.
      // 32 bands × 2 rows make P(LSH miss | j ≥ 0.8) < 1e-14, so the
      // DuckDB oracle can replay the full exact-Jaccard truth. Corpus
      // docs that are exact copies of a benchmark SOURCE doc drop too
      // (same Jaccard vs the derivative) — the oracle computes that.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val bench = d.where(col("doc_id") % 11 === 0)
        .select(concat(col("text"), lit(" graft eval benchmark tail")).as("bench_text"))
      Decontaminate.decontaminateFuzzy(d, "text", "doc_id", bench, "bench_text",
        threshold = 0.8, numHashes = 64, bands = 32)
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x11_cosine_dedup" -> ((s, dir) => {
      // Plant exact near-duplicates (same direction, scaled 1.001×) so the
      // operator has known positives: every (v, v+PlantedOffset) pair must come
      // back with cosine 1.0, and nothing else clears the 0.9 bar (max
      // natural pairwise cosine in the synthetic embeddings is < 0.5).
      val emb = rd(s, dir, "embeddings")
      val planted = emb.select((col("vec_id") + PlantedOffset).as("vec_id"),
        transform(col("embedding"), v => v * lit(1.001f)).as("embedding"))
      Similarity.cosineDedupPairs(emb.select("vec_id", "embedding").unionAll(planted),
          "vec_id", "embedding", threshold = 0.9, nBits = 8)
        .select(col("id_a"), col("id_b"), round(col("score"), 4).as("score_r"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    "x12_multimodal" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.syntheticFromDocuments(s, s"$dir/documents.parquet")
      Multimodal.extractFeatures(media)()
        .select(col("media_id"), col("kind"), col("byte_len"))
        .orderBy(col("media_id"))
    }),

    "x13_event_window" -> ((s, dir) =>
      rdEvents(s, dir)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
        .orderBy(col("window_start"), col("event_type"))),

    "x20_interval_join" -> ((s, dir) => {
      // stream-stream interval join shape, verified in batch mode (same
      // plan semantics minus watermark state): clicks enriched with the
      // same user's views within ±4h of event time
      import graft.streaming.StreamingFlatten
      val ev = rdEvents(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"))
      StreamingFlatten.intervalJoin(clicks, views, "user_id", "ts", "ts",
        joinWindow = "4 hours")
        .select(col("event_id"), col("r_event_id"))
        .orderBy(col("event_id"), col("r_event_id"))
    }),

    "x40_streaming_dedup" -> ((s, dir) => {
      // The REAL streaming path — MemoryStream → watermarked
      // dropDuplicatesWithinWatermark state → memory sink — oracle-checked
      // in batch SQL: every document plus a planted exact copy (offset id)
      // streams through in one pass; the fingerprint state must drop every
      // planted copy and every natural exact dup, leaving exactly the
      // distinct fingerprint set of the corpus. Which instance survives is
      // arrival-order-dependent, so the checked output is the fingerprint
      // itself (identical across a duplicate group by construction). The
      // collect is harness plumbing — MemoryStream is fed from the driver;
      // the operator under test is the streaming state.
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingFlatten
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      // bounded feed: MemoryStream is driver-resident by design, so cap
      // the staged corpus at the StreamDocCap lowest doc_ids (a no-op at
      // oracle scale factors, an OOM guard if Verify is pointed at a big
      // SF dir) — the oracle SQL applies the identical cap
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(StreamDocCap)
        .as[(Long, String)].collect()
      val in = MemoryStream[(Long, String)]
      in.addData(docs.flatMap { case (id, t) =>
        Seq((id, t), (id + PlantedOffset, t)) }.toSeq)
      val src = in.toDF().toDF("doc_id", "text")
        .withColumn("ts",
          timestamp_seconds(lit(1700000000L) + col("doc_id") % 3600))
      val out = StreamingFlatten.streamingDedup(src, "text", "ts", "2 hours")
      s.catalog.dropTempView("x40_sink")
      val q = out.writeStream.format("memory").queryName("x40_sink")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      s.table("x40_sink")
        .select(TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("fingerprint"))
    }),

    "x58_streaming_neardup" -> ((s, dir) => {
      // streaming near-dup over TWO real micro-batches: batch 1 is the
      // corpus (nothing to collide with — all survive, within-batch dups
      // uncollapsed by contract); batch 2 is a verbatim copy of every doc
      // (jaccard 1.0 ⇒ identical signatures ⇒ certain candidate ⇒ drops)
      // plus token-disjoint fresh docs (exact verify kills any freak band
      // collision ⇒ survive). The accumulated parquet corpus is the
      // checked output: documents ∪ fresh.
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingFlatten
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(StreamDocCap)
        .as[(Long, String)].collect()
      val work = java.nio.file.Files.createTempDirectory("x58").toString
      val in = MemoryStream[(Long, String)]
      val q = StreamingFlatten.streamingNearDup(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id",
        s"$work/corpus", s"$work/ckpt",
        threshold = 0.9, numHashes = 32, bands = 8)
      try {
        in.addData(docs.toSeq)
        q.processAllAvailable()
        in.addData(docs.toSeq.flatMap { case (id, t) =>
          Seq((id + PlantedOffset, t),
            (id + 2 * PlantedOffset,
              s"zzqx$id vvwk$id ppmj$id"))
        })
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$work/corpus")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x82_streaming_pipeline" -> ((s, dir) => {
      // the STREAMING ingest-hygiene stack over two real micro-batches:
      // batch 0 = the corpus + planted CONTAMINATED docs (each contains
      // the nonsense eval sentence verbatim → every 13-gram matches →
      // Bloom decontamination drops them all); batch 1 = a verbatim copy
      // of every corpus doc (drops against the STORED fingerprints — a
      // copy of an exact-dup loser still dies: its group's admitted
      // representative has the same fingerprint) plus token-disjoint
      // fresh docs (survive). Quality runs with only the word-count rule
      // biting (>= 3 words: SQL-replayable in one line) and near-dup at
      // threshold 1.0 (shingle-set equality — nothing in batch 1 reaches
      // it: copies die at the exact stage first). The accumulated store
      // is the checked output; the oracle COMPUTES quality, computed
      // contamination (token-boundary gram containment, not the planted
      // list), and the min-id-per-fingerprint exact winners.
      import s.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import graft.streaming.StreamingFlatten
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val docs = rd(s, dir, "documents").select(col("doc_id"), col("text"))
        .orderBy(col("doc_id")).limit(StreamDocCap)
        .as[(Long, String)].collect()
      val evalSentence = (1 to 14).map(i => s"qq$i").mkString(" ")
      val work = java.nio.file.Files.createTempDirectory("x82").toString
      val in = MemoryStream[(Long, String)]
      val rules = graft.ops.TextFilters.Rules(minWords = 3,
        maxWords = 100000, minMeanWordLen = 0.0, maxMeanWordLen = 1e9,
        maxSymbolWordRatio = 1e9, maxBulletLineRatio = 1.0,
        maxEllipsisLineRatio = 1.0, minAlphaWordRatio = 0.0,
        minStopwordHits = 0)
      val q = StreamingFlatten.streamingPipeline(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id",
        s"$work/corpus", s"$work/out", s"$work/ckpt",
        rules = Some(rules),
        eval = Some(Seq(evalSentence).toDF("text")),
        threshold = 1.0, numHashes = 32, bands = 8)
      try {
        in.addData(docs.toSeq ++ docs.toSeq.filter(_._1 % 10 == 0)
          .map { case (id, _) =>
            (id + 3 * PlantedOffset, s"$evalSentence filler token$id") })
        q.processAllAvailable()
        in.addData(docs.toSeq.flatMap { case (id, t) =>
          Seq((id + PlantedOffset, t),
            (id + 2 * PlantedOffset, s"zzqx$id vvwk$id ppmj$id"))
        })
        q.processAllAvailable()
      } finally q.stop()
      s.read.parquet(s"$work/corpus")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "x83_pipeline_hygiene" -> ((s, dir) => {
      // the BATCH pipeline's r19 hygiene stages composed through the
      // PUBLIC ops/Pipeline entry point: C4 line scrub (canonicalizes a
      // junk-wrapped copy back to its corpus form) → quality (word-count
      // rule only — SQL-replayable) → exact dedup vs a standing
      // fingerprint table holding the SCRUBBED corpus form (what fold
      // writes for a scrub-configured pipeline) → PII redaction on the
      // admitted output only. Batch: junk-wrapped corpus copies (drop at
      // the fp stage — the junk lines provably scrub away), fresh
      // two-line docs with a planted email (keep, email → [EMAIL]), and
      // junk-only docs (scrub to empty → quality drops). The oracle
      // recomputes every stage: the scrub line filter, the word count,
      // corpus fingerprints, within-batch min-id winners, and the
      // x26-proven redaction regex chain.
      import graft.ops.{Dedup, Pipeline, TextFilters}
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      // the synthetic documents carry no terminal punctuation, so the
      // raw text would scrub to EMPTY and never exercise the fp-drop
      // path — the corpus form appends one punctuated marker sentence
      // (single line: scrub preserves it verbatim on both engines)
      val cdoc = d.select(col("doc_id"),
        concat(col("text"), lit(" marker sentence ends here.")).as("text"))
      val scrubbed = TextFilters.scrubLines(col("text"))
      s.sql("DROP TABLE IF EXISTS x83_fp")
      Dedup.writeFingerprintTable(
        cdoc.select(col("doc_id"), scrubbed.as("text")), "text", "x83_fp",
        numBuckets = 8)
      val junked = cdoc.select((col("doc_id") + PlantedOffset).as("doc_id"),
        concat(lit("click here javascript tracking pixel\n"), col("text"),
          lit("\nbuy now")).as("text"))
      val fresh = d.select((col("doc_id") + 2 * PlantedOffset).as("doc_id"),
        concat(lit("A fresh review of topic "),
          col("doc_id").cast(StringType),
          lit(" arrives with its own words here.\ncontact user"),
          col("doc_id").cast(StringType),
          lit("@example.com today please.")).as("text"))
      val junkOnly = d.select((col("doc_id") + 3 * PlantedOffset).as("doc_id"),
        lit("no terminal punctuation here\nbuy now").as("text"))
      val rules = TextFilters.Rules(minWords = 3,
        maxWords = 100000, minMeanWordLen = 0.0, maxMeanWordLen = 1e9,
        maxSymbolWordRatio = 1e9, maxBulletLineRatio = 1.0,
        maxEllipsisLineRatio = 1.0, minAlphaWordRatio = 0.0,
        minStopwordHits = 0)
      Pipeline.run(junked.unionAll(fresh).unionAll(junkOnly),
          Pipeline.Config(scrub = Some(Pipeline.Scrub()),
            rules = Some(rules), fingerprintTable = Some("x83_fp"),
            redactPii = true, numBuckets = 8))
        .kept.select(col("doc_id"), col("text")).orderBy(col("doc_id"))
    }),

    "x14_sessionize" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.StreamingFlatten
      val ev = rdEvents(s, dir)
        .select(col("user_id"), col("ts"), col("value")).as[StreamingFlatten.Event]
      StreamingFlatten.sessionize(ev, gapMs = 60 * 60 * 1000L)
        .toDF()
        .select(col("user_id"), col("start"), col("end"), col("n_events"),
          // total in cents (long): session sums are tiny (<100 events) but
          // float addition order inside a session is fixed (sorted), so a
          // rounded integral form keeps the oracle comparison exact
          round(col("total_value") * 100).cast(LongType).as("total_cents"))
        .orderBy(col("user_id"), col("start"))
    }),

    "q7_semi_anti_join" -> ((s, dir) => {
      val o = rd(s, dir, "orders")
      val li = rd(s, dir, "lineitem").where(col("l_quantity") >= 45)
      val semi = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), lit("has_bulk").as("kind"))
      val anti = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), lit("no_bulk").as("kind"))
      semi.unionAll(anti).orderBy(col("o_orderkey"))
    }),

    "q8_rollup" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"))),

    "x15_exact_dedup_keep" -> ((s, dir) => {
      // Plant exact duplicates (same text, higher ids): dedup must keep
      // exactly the original 500 minimal ids.
      val d = rd(s, dir, "documents").select(col("doc_id"), col("text"))
      val dupes = d.select((col("doc_id") + PlantedOffset).as("doc_id"), col("text"))
      Dedup.exactDedup(d.unionAll(dupes), "text", "doc_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    "f25_variant_flatten" -> ((s, dir) => {
      // schemaless landing-zone flatten (SURVEY.md §1.4): the nested
      // order documents serialized to JSON text and parsed to VARIANT —
      // no declared schema anywhere — then flattened through
      // FlattenPlanner.flattenVariant (schema_of_variant_agg-derived
      // shredding). The output contract is the struct-schema path's
      // (f1): same oracle.
      val docs = nestedOrders(s, dir)
      val v = docs
        .select(parse_json(to_json(struct(docs.columns.toIndexedSeq.map(col): _*))).as("doc"))
      FlattenPlanner.flattenVariant(v, "doc", flattenOpts)("main")
        // variant shreds JSON decimal literals to DECIMAL (exact) where
        // the parquet schema had DOUBLE — cast at the end, both engines
        .select(col("_link"), col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          col("o_totalprice").cast(DoubleType).as("o_totalprice"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    "f13_variant" -> ((s, dir) => {
      // Spark 4 VariantType: schemaless ingest of the raw JSON props —
      // parse once to variant, extract typed paths lazily (shredded access
      // without a declared schema).
      rdEvents(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          try_variant_get(col("v"), "$.k", "bigint").as("k"))
        .where(col("k") > 80)
        .orderBy(col("event_id"))
    }),

    // --- source-format roundtrips (S1/S2/S4/S5/S6) ------------------ //
    // Each stages known rows into the wire format on disk (or a driver
    // iterator), reads them back through the JsonInput reader under test,
    // and compares against the original table as the oracle.
    "f14_json_array" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempFile("graft_arr", ".json")
      java.nio.file.Files.writeString(tmp, custJson(s, dir).mkString("[", ",", "]"))
      JsonInput.jsonArray(s, tmp.toString)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "f15_json_array_path" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempFile("graft_arrpath", ".json")
      java.nio.file.Files.writeString(tmp,
        s"""{"meta": {"version": 1}, "data": {"rows": ${custJson(s, dir).mkString("[", ",", "]")}}}""")
      JsonInput.jsonArrayAt(s, Seq("data", "rows"), tmp.toString)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "f16_json_stream" -> ((s, dir) => {
      // concatenated top-level objects with NO separators — the brace
      // splitter, not line alignment, must find document boundaries
      val tmp = java.nio.file.Files.createTempFile("graft_stream", ".json")
      java.nio.file.Files.writeString(tmp, custJson(s, dir).mkString(""))
      JsonInput.jsonStream(s, tmp.toString)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    "f17_iterator" -> ((s, dir) =>
      JsonInput.fromIterator(s, custJson(s, dir).iterator)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))),

    "f18_multifile_union" -> ((s, dir) => {
      // same content staged as two NDJSON files: the multi-path read must
      // double every row (reference semantics, flatterer/tests.py:91-100)
      val docs = custJson(s, dir).mkString("\n")
      val t1 = java.nio.file.Files.createTempFile("graft_u1", ".jsonl")
      val t2 = java.nio.file.Files.createTempFile("graft_u2", ".jsonl")
      java.nio.file.Files.writeString(t1, docs)
      java.nio.file.Files.writeString(t2, docs)
      JsonInput.ndjson(s, t1.toString, t2.toString)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // --- remaining flatten-planner options (P3/P4/P9/P10) ----------- //
    "f19_inline_one_to_one" -> ((s, dir) => {
      // arrays that never exceed one element (incl. empty for every 10th
      // order) inline into the parent as promoted columns, NULL where the
      // array is empty
      val o = rd(s, dir, "orders")
      val nested = o.select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 10 === 0,
          array().cast("array<struct<price:double,status:string>>"))
          .otherwise(array(struct(col("o_totalprice").as("price"),
            col("o_orderstatus").as("status")))).as("detail"))
      FlattenPlanner.flatten(nested, FlattenOptions(
        linkMode = LinkMode.NaturalKey("o_orderkey"), inlineOneToOne = true))("main")
        .select(col("o_orderkey"), col("o_custkey"),
          col("detail_price"), col("detail_status"))
        .orderBy(col("o_orderkey"))
    }),

    "f20_emit_obj" -> ((s, dir) => {
      // a 1:1 sub-object forced out as its own child table (position 0)
      val c = rd(s, dir, "customer").select(col("c_custkey"),
        struct(col("c_name").as("name"), col("c_acctbal").as("bal")).as("profile"))
      FlattenPlanner.flatten(c, FlattenOptions(
        linkMode = LinkMode.NaturalKey("c_custkey"),
        emitObj = Seq(Seq("profile"))))("profile")
        .orderBy(col("_link"))
    }),

    "f21_schema_order" -> ((s, dir) => {
      // JSONSchema property order + titles drive field selection/renaming
      val schema =
        """{"properties": {
          |  "o_orderkey": {"type": "integer", "title": "Order Key"},
          |  "o_totalprice": {"type": "number", "title": "Total Price"}}}""".stripMargin
      val fields = SchemaFields.fromJsonSchema(schema,
        titleMode = SchemaFields.UnderscoreSlug)
      FlattenPlanner.flatten(
        rd(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        FlattenOptions(linkMode = LinkMode.NaturalKey("o_orderkey"), noLink = true,
          onlyFields = true, fields = fields))("main")
        .orderBy(col("order_key"))
    }),

    "f22_naming" -> ((s, dir) => {
      // naming controls together: path separator "__" in promoted names,
      // table prefix on the child table, id prefix in every link value
      val c = rd(s, dir, "customer").select(col("c_custkey"),
        array(struct(struct(col("c_mktsegment").as("seg")).as("m"))).as("tags"))
      FlattenPlanner.flatten(c, FlattenOptions(
        linkMode = LinkMode.NaturalKey("c_custkey"),
        pathSeparator = "__", tablePrefix = "t_", idPrefix = "cust-"))("t_tags")
        .orderBy(col("_link"))
    }),

    // --- metadata analyses (A2/A3) ---------------------------------- //
    "f23_stats" -> ((s, dir) => {
      import s.implicits._
      Metadata.analyzeStats(
          rd(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"),
            col("o_orderpriority")), exact = true)
        .map(f => (f.fieldName, f.min.orNull, f.max.orNull, f.approxDistinct))
        .toDF("field_name", "min_v", "max_v", "n_distinct")
        .orderBy(col("field_name"))
    }),

    "f24_one_to_one" -> ((s, dir) => {
      val li = rd(s, dir, "lineitem")
      val nested = li.groupBy(col("l_orderkey")).agg(
        collect_list(struct(col("l_linenumber"))).as("items"),
        slice(sort_array(collect_list(struct(col("l_partkey")))), 1, 1).as("first_item"))
      FlattenPlanner.oneToOneAnalysis(nested).orderBy(col("array_path"))
    })
  )

  /** Deterministic JSON docs (one string per customer row, 3 fields) used
    * by the source-roundtrip queries f14-f18. Driver-side collect of 1.5k
    * rows at sf0.01 — these queries test the readers, not scan scale.
    */
  private def custJson(s: SparkSession, dir: String): Array[String] =
    rd(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey")).toJSON.collect()

  // ----------------------------------------------------------------- //
  // DuckDB oracles
  // ----------------------------------------------------------------- //

  def oracleSql: Map[String, String] = ListMap(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
        |  AND l_discount >= 0.05 AND l_quantity < 10.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_revenue" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_totalprice
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q5_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q6_group_topn" ->
      """SELECT c_mktsegment, rnk, c_custkey, c_acctbal FROM (
        |  SELECT c_mktsegment, c_custkey, c_acctbal,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk
        |  FROM customer) t
        |WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""".stripMargin,

    "q9_distinct_agg" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q10_above_avg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) /
        |         CAST(count(*) AS DOUBLE)
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q11_top_parts" ->
      """WITH rev AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_partkey, p_name, revenue
        |FROM rev JOIN part ON l_partkey = p_partkey
        |ORDER BY revenue DESC, p_partkey LIMIT 25""".stripMargin,

    "f1_flatten_main" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS _link, o_orderkey, o_custkey,
        |  o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f2_flatten_child" ->
      """SELECT CAST(l_orderkey AS VARCHAR) || '.items.' ||
        |    CAST(row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_returnflag) - 1 AS VARCHAR) AS _link,
        |  CAST(l_orderkey AS VARCHAR) AS _link_main,
        |  l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem ORDER BY _link""".stripMargin,

    "f3_subobject_promote" ->
      """SELECT c_custkey, c_name AS profile_name, c_acctbal AS profile_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f4_pushdown" ->
      """SELECT CAST(l_orderkey AS VARCHAR) || '.items.' ||
        |    CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS VARCHAR) AS _link,
        |  CAST(l_orderkey AS VARCHAR) AS _link_main,
        |  l_linenumber, o_orderstatus AS main_o_orderstatus
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY _link""".stripMargin,

    "f5_scalar_array_json" ->
      """SELECT l_orderkey,
        |  '[' || string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) || ']' AS linenumbers
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "f6_arrays_new_table" ->
      """SELECT CAST(l_orderkey AS VARCHAR) || '.nums.' ||
        |    CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) - 1 AS VARCHAR) AS _link,
        |  CAST(l_orderkey AS VARCHAR) AS _link_main,
        |  CAST(l_linenumber AS VARCHAR) AS value
        |FROM lineitem ORDER BY _link""".stripMargin,

    "f7_field_control" ->
      """SELECT o_orderkey AS order_id, o_totalprice AS total
        |FROM orders ORDER BY order_id""".stripMargin,

    "f8_preview_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 20""",

    "f9_field_counts" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS field_name, 'number' AS field_type, count(o_orderkey) AS cnt FROM orders
        |  UNION ALL SELECT 'o_custkey', 'number', count(o_custkey) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', 'text', count(o_orderstatus) FROM orders
        |  UNION ALL SELECT 'o_totalprice', 'number', count(o_totalprice) FROM orders
        |  UNION ALL SELECT 'o_orderdate', 'datetime', count(o_orderdate) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', 'text', count(o_orderpriority) FROM orders
        |) t ORDER BY field_name""".stripMargin,

    "f10_union_evolve" ->
      """SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey, NULL, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
        |ORDER BY o_orderkey""".stripMargin,

    "f11_jsonpath_filter" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS BIGINT) >= 50 AND event_type = 'click'
        |ORDER BY event_id""".stripMargin,

    "f12_ndjson_roundtrip" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderkey""",

    // fingerprint whitespace class: TextAnalysis.FingerprintWsRe2 — one
    // explicit class in both engines (bare \s differs between java.util
    // .regex and RE2 on U+000B and misses Unicode spaces entirely)
    "x1_exact_dedup" ->
      s"""SELECT md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g')) AS fingerprint,
        |  count(*) AS n_members, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,

    // streaming dedup over the corpus + one planted exact copy per doc
    // must leave exactly the distinct fingerprint set of the corpus
    // (capped at the StreamDocCap lowest doc_ids, mirroring the query's
    // bounded MemoryStream feed)
    "x40_streaming_dedup" ->
      s"""SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g')) AS fingerprint
        |FROM (SELECT text FROM documents ORDER BY doc_id LIMIT $StreamDocCap)
        |ORDER BY fingerprint""".stripMargin,

    // streaming near-dup: the accumulated corpus after both batches is
    // batch 1 (all documents) plus batch 2's token-disjoint fresh docs
    // (id + 2×offset); every verbatim copy (id + offset) dropped
    // x82: batch-0 admissions = min doc_id per fingerprint among
    // quality-passed (>= 3 ws-words), uncontaminated (token-boundary
    // 13-gram containment of the qq eval sentence, COMPUTED — the
    // planted +3e8 docs always contain it by construction and so never
    // appear) originals; batch-1 verbatim copies all die against the
    // stored fingerprints; the fresh +2e8 docs all pass.
    "x82_streaming_pipeline" ->
      s"""WITH base AS (
        |  SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT $StreamDocCap),
        |q AS (
        |  SELECT doc_id, text FROM base
        |  WHERE len(list_filter(regexp_split_to_array(text, '$FpWs'),
        |                        w -> len(w) > 0)) BETWEEN 3 AND 100000),
        |tok AS (
        |  SELECT doc_id,
        |    ' ' || array_to_string(list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> len(t) > 0), ' ') || ' ' AS ts
        |  FROM q),
        |clean AS (
        |  SELECT q.doc_id, q.text FROM q JOIN tok USING (doc_id)
        |  WHERE NOT (contains(ts, ' qq1 qq2 qq3 qq4 qq5 qq6 qq7 qq8 qq9 qq10 qq11 qq12 qq13 ')
        |          OR contains(ts, ' qq2 qq3 qq4 qq5 qq6 qq7 qq8 qq9 qq10 qq11 qq12 qq13 qq14 '))),
        |a1 AS (
        |  SELECT min(doc_id) AS doc_id FROM (
        |    SELECT doc_id,
        |      md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g')) AS fp
        |    FROM clean)
        |  GROUP BY fp)
        |SELECT doc_id FROM (
        |  SELECT doc_id FROM a1
        |  UNION ALL
        |  SELECT doc_id + ${2 * PlantedOffset} FROM base)
        |ORDER BY doc_id""".stripMargin,

    "x58_streaming_neardup" ->
      s"""SELECT doc_id FROM (
        |  SELECT doc_id FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $StreamDocCap)
        |  UNION ALL
        |  SELECT doc_id + 200000000
        |  FROM (SELECT doc_id FROM documents ORDER BY doc_id LIMIT $StreamDocCap))
        |ORDER BY doc_id""".stripMargin,

    // every stage recomputed: the C4 line filter (x54's spelling), the
    // word-count quality rule (x82's), corpus fingerprints of the
    // SCRUBBED form (x15's), within-batch min-id winners, and the
    // x26-proven redaction chain on the admitted rows
    "x83_pipeline_hygiene" ->
      s"""WITH cdoc AS (
        |  SELECT doc_id, text || ' marker sentence ends here.' AS text
        |  FROM documents),
        |scorp AS (
        |  -- coalesce: DuckDB array_to_string over an EMPTY list is NULL
        |  SELECT doc_id,
        |    coalesce(array_to_string(list_filter(regexp_split_to_array(text, chr(10)),
        |      x -> regexp_matches(trim(x), '[.!?"]$$')
        |           AND len(list_filter(regexp_split_to_array(trim(x), '$TokWs'),
        |                               w -> len(w) > 0)) >= 3
        |           AND NOT contains(lower(trim(x)), 'lorem ipsum')
        |           AND NOT contains(lower(trim(x)), 'javascript')), chr(10)), '') AS sc
        |  FROM cdoc),
        |corpfp AS (
        |  SELECT DISTINCT md5(regexp_replace(lower(trim(sc)), '$FpWs', ' ', 'g')) AS fp
        |  FROM scorp),
        |batch AS (
        |  SELECT doc_id + $PlantedOffset AS doc_id, sc AS t FROM scorp
        |  UNION ALL
        |  SELECT doc_id + ${2 * PlantedOffset},
        |    'A fresh review of topic ' || doc_id ||
        |    ' arrives with its own words here.' || chr(10) ||
        |    'contact user' || doc_id || '@example.com today please.'
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + ${3 * PlantedOffset}, '' FROM documents),
        |q AS (
        |  SELECT doc_id, t FROM batch
        |  WHERE len(list_filter(regexp_split_to_array(t, '$FpWs'),
        |                        w -> len(w) > 0)) BETWEEN 3 AND 100000),
        |keyed AS (
        |  SELECT doc_id, t,
        |    md5(regexp_replace(lower(trim(t)), '$FpWs', ' ', 'g')) AS fp
        |  FROM q),
        |freshk AS (SELECT * FROM keyed WHERE fp NOT IN (SELECT fp FROM corpfp)),
        |win AS (SELECT fp, min(doc_id) AS doc_id FROM freshk GROUP BY fp),
        |red1 AS (
        |  SELECT k.doc_id,
        |    regexp_replace(k.t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
        |  FROM keyed k JOIN win USING (doc_id)),
        |red2 AS (
        |  SELECT doc_id,
        |    regexp_replace(t1, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g') AS t2
        |  FROM red1)
        |SELECT doc_id,
        |  regexp_replace(t2, '\\+?([0-9][ ().-]{0,2}){6,}[0-9]', '[PHONE]', 'g') AS text
        |FROM red2 ORDER BY doc_id""".stripMargin,

    "x2_token_stats" ->
      s"""SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS n_tokens_ws,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_$WsChars]')) AS n_tokens_re,
        |  len(text) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x3_fingerprint" ->
      s"""SELECT doc_id, md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin,

    // duplicate-3-gram fraction: 1 - distinct/total over whitespace
    // 3-grams, 0.0 under 3 tokens; exact integer counts divided in double
    // are bit-identical across engines
    "x42_dup_ngrams" ->
      s"""WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '$TokWs') AS toks,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS n
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN n - 2 <= 0 THEN 0.0
        |       ELSE 1.0 - len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                     for i in generate_series(1, n - 2)]))
        |                  / CAST(n - 2 AS DOUBLE)
        |  END AS dup_3gram_ratio
        |FROM t ORDER BY doc_id""".stripMargin,

    // overlapping 64-token windows, stride 48 (= 64 - 16 overlap); chunk
    // count is ceil((n - 64) / 48) + 1 with a floor of one chunk; empty
    // docs chunk to nothing. Multiple unnests zip positionally in DuckDB,
    // so chunk_id / chunk_text / n_tokens stay aligned.
    "x41_chunk_docs" ->
      s"""WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '$TokWs') AS toks
        |  FROM documents WHERE len(trim(text)) > 0
        |), c AS (
        |  SELECT doc_id, toks,
        |    greatest(0, CAST(ceil((len(toks) - 64) / 48.0) AS INT)) + 1 AS nch
        |  FROM t
        |)
        |SELECT doc_id,
        |  unnest(generate_series(0, nch - 1)) AS chunk_id,
        |  unnest([array_to_string(toks[48*i + 1 : 48*i + 64], ' ')
        |          for i in generate_series(0, nch - 1)]) AS chunk_text,
        |  unnest([len(toks[48*i + 1 : 48*i + 64])
        |          for i in generate_series(0, nch - 1)]) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    // exact-substring dedup signal: identical window pipeline in SQL —
    // engine-portable tokenizer class, per-doc distinct md5 window keys
    // (hashed inside the comprehension, mirroring the engine's
    // hash-inside-transform), min-id owner per key, count of keys owned
    // by an earlier doc
    "x43_shared_windows" ->
      s"""WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
        |), t AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '$TokWs') AS toks,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS nt
        |  FROM docs
        |), wins AS (
        |  SELECT doc_id, unnest(list_distinct([md5(array_to_string(toks[i:i+9], ' '))
        |                                       for i in generate_series(1, nt - 9)])) AS w
        |  FROM t WHERE nt - 9 > 0
        |), o AS (
        |  SELECT w, min(doc_id) AS owner FROM wins GROUP BY w
        |), f AS (
        |  SELECT wins.doc_id,
        |    CAST(sum(CASE WHEN o.owner < wins.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |  FROM wins JOIN o USING (w) GROUP BY wins.doc_id
        |)
        |SELECT d.doc_id, coalesce(f.n_shared, 0) AS n_shared,
        |  CAST(coalesce(f.n_shared, 0) = 0 AS INT) AS keep
        |FROM docs d LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin,

    // incremental near-dup: copies (jaccard 1.0) drop with certainty,
    // token-disjoint fresh docs verify to ~0 — output is the fresh set
    "x45_neardup_increment" ->
      """SELECT doc_id + 200000000 AS doc_id FROM documents ORDER BY doc_id""",

    // same planted contract as x45 through the standing band table
    "x71_neardup_increment_indexed" ->
      """SELECT doc_id + 200000000 AS doc_id FROM documents ORDER BY doc_id""",

    // near-threshold incremental near-dup: recompute the incoming docs
    // (k = doc_id % 4 junk tokens appended), then the EXACT shingle-set
    // Jaccard of every shingle-sharing (incoming, existing) pair — the
    // same tokenizer ([a-z0-9] runs), 3-shingle rule (whole text when
    // ≤ 3 tokens), per-doc distinct shingles, and integer-ratio double
    // division the engine uses — and keep incoming ids whose max
    // Jaccard stays under 0.9. Shared-shingle blocking is exact: a pair
    // with Jaccard > 0 shares a shingle.
    "x47_neardup_threshold" ->
      """WITH exist AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS t
        |  FROM documents
        |), inc AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(
        |      text
        |      || CASE WHEN doc_id % 4 >= 1 THEN ' zqa' || CAST(doc_id AS VARCHAR) ELSE '' END
        |      || CASE WHEN doc_id % 4 >= 2 THEN ' zqb' || CAST(doc_id AS VARCHAR) ELSE '' END
        |      || CASE WHEN doc_id % 4 >= 3 THEN ' zqc' || CAST(doc_id AS VARCHAR) ELSE '' END
        |    ), '[^a-z0-9]+'), t -> len(t) > 0) AS t
        |  FROM documents
        |), she AS (
        |  SELECT doc_id, CASE WHEN len(t) <= 3 THEN [array_to_string(t, chr(31))]
        |    ELSE list_distinct([t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]
        |                        for i in generate_series(1, len(t) - 2)]) END AS s
        |  FROM exist
        |), shi AS (
        |  SELECT doc_id, CASE WHEN len(t) <= 3 THEN [array_to_string(t, chr(31))]
        |    ELSE list_distinct([t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]
        |                        for i in generate_series(1, len(t) - 2)]) END AS s
        |  FROM inc
        |), pe AS (
        |  SELECT doc_id AS eid, len(s) AS ne, unnest(s) AS w FROM she
        |), pi AS (
        |  SELECT doc_id AS iid, len(s) AS ni, unnest(s) AS w FROM shi
        |), dup AS (
        |  SELECT DISTINCT iid FROM (
        |    SELECT pi.iid, pe.eid, count(*) AS c,
        |      any_value(pi.ni) AS ni, any_value(pe.ne) AS ne
        |    FROM pi JOIN pe USING (w) GROUP BY pi.iid, pe.eid)
        |  WHERE CAST(c AS DOUBLE) / (ni + ne - c) >= 0.9
        |)
        |SELECT i.doc_id + 200000000 AS doc_id
        |FROM inc i ANTI JOIN dup ON i.doc_id = dup.iid
        |ORDER BY doc_id""".stripMargin,

    // incremental substring dedup: copies keep only when too short for a
    // window; token-disjoint 3-token fresh docs always pass
    "x46_window_increment" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS nt
        |  FROM documents)
        |SELECT doc_id FROM (
        |  SELECT doc_id + 100000000 AS doc_id FROM t WHERE nt - 9 <= 0
        |  UNION ALL
        |  SELECT doc_id + 200000000 AS doc_id FROM documents)
        |ORDER BY doc_id""".stripMargin,

    // rare-token ratio: corpus vocabulary counts then per-doc fraction of
    // occurrences under the threshold — integers divided in double, exact
    "x44_rare_tokens" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                       t -> len(t) > 0)) AS token
        |  FROM documents
        |), c AS (
        |  SELECT token, count(*) AS cnt FROM tok GROUP BY token
        |), f AS (
        |  SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |    CAST(sum(CASE WHEN c.cnt < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |  FROM tok JOIN c USING (token) GROUP BY tok.doc_id
        |)
        |SELECT d.doc_id, coalesce(f.n_rare, 0) AS n_rare,
        |  coalesce(CAST(f.n_rare AS DOUBLE) / f.n_tokens, 0.0) AS rare_ratio
        |FROM documents d LEFT JOIN f USING (doc_id) ORDER BY doc_id""".stripMargin,

    "x4_quality" ->
      s"""SELECT doc_id,
        |  CASE WHEN len(text) = 0 THEN 0.0
        |       ELSE CAST(len(regexp_replace(text, '$PunctEx', '', 'g')) AS DOUBLE) / len(text) END AS punct_ratio,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |       ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','from','this','be','are'], t))) AS DOUBLE) / len(toks) END AS stopword_ratio,
        |  CASE WHEN len(toks) = 0 THEN 0.0
        |       ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks) END AS mean_word_len
        |FROM (SELECT doc_id, text,
        |        list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS toks
        |      FROM documents) d
        |ORDER BY doc_id""".stripMargin,

    "x5_lang_id" ->
      """SELECT doc_id,
        |  CASE WHEN best.hits > 0 THEN best.lang ELSE 'und' END AS lang_pred
        |FROM (
        |  SELECT doc_id, list_sort([
        |      {'hits': len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','ein','mit','auf','ich'], t))), 'lang': 'de'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['the','and','of','to','in','is','that','it','for','with'], t))), 'lang': 'en'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['el','la','los','las','es','una','para','con','por','como'], t))), 'lang': 'es'},
        |      {'hits': len(list_filter(toks, t -> list_contains(['le','la','les','et','est','pas','une','pour','dans','que'], t))), 'lang': 'fr'}
        |    ])[-1] AS best
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS toks
        |        FROM documents) d) s
        |ORDER BY doc_id""".stripMargin,

    // the jaccard-1.0 pair set is COMPUTED (identical normalized token
    // sequences over originals ∪ planted copies), not assumed to be the
    // planted pairs alone: at sf0.1 the documents table contains natural
    // duplicate texts, and each such (a, b) adds the four extra 1.0
    // pairs {a–b, a–b', a'–b, a'–b'} beyond the planted a–a'/b–b'. The
    // equality join is the exact truth at threshold 0.99 as long as no
    // NON-identical pair reaches 0.99 (one differing token on these doc
    // lengths caps shingle jaccard ≈ 0.9 — the x16 comment's argument).
    "x16_minhash_planted" ->
      """WITH u AS (
        |  SELECT doc_id AS id,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+'), t -> len(t) > 0), chr(31)) AS k
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000 AS id,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+'), t -> len(t) > 0), chr(31)) AS k
        |  FROM documents
        |)
        |SELECT a.id AS id_a, b.id AS id_b, 1.0 AS jac_r
        |FROM u a JOIN u b ON a.k = b.k AND a.id < b.id
        |ORDER BY id_a, id_b""".stripMargin,

    // same computed-truth form as x16 (ngram shingle sets are identical
    // iff the token sequences are, on these doc lengths)
    "x17_ngram_planted" ->
      """WITH u AS (
        |  SELECT doc_id AS id,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+'), t -> len(t) > 0), chr(31)) AS k
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000 AS id,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+'), t -> len(t) > 0), chr(31)) AS k
        |  FROM documents
        |)
        |SELECT a.id AS id_a, b.id AS id_b, 1.0 AS jac_r
        |FROM u a JOIN u b ON a.k = b.k AND a.id < b.id
        |ORDER BY id_a, id_b""".stripMargin,

    "x9_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
        |           FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_dot_product(qv, cv) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS score
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(score, 4) AS score_r
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "x11_cosine_dedup" ->
      """SELECT vec_id AS id_a, vec_id + 100000000 AS id_b, 1.0 AS score_r
        |FROM embeddings ORDER BY id_a""".stripMargin,

    "x18_ann_ivf" ->
      """SELECT vec_id + 100000000 AS query_id, 1 AS rank, vec_id AS neighbor_id,
        |  1.0 AS score_r
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "x21_dup_lines" ->
      """SELECT doc_id,
        |  CASE WHEN len(l) = 0 THEN 0.0
        |       ELSE 1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / len(l) END AS dup_line_ratio
        |FROM (
        |  SELECT doc_id,
        |    list_filter(list_transform(
        |      regexp_split_to_array(
        |        CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || text ELSE text END,
        |        chr(10)),
        |      x -> trim(x)), x -> len(x) > 0) AS l
        |  FROM documents) d
        |ORDER BY doc_id""".stripMargin,

    "x22_top_tokens" ->
      """SELECT tok AS token, count(*) AS n FROM (
        |  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    t -> len(t) > 0)) AS tok
        |  FROM documents) t
        |GROUP BY tok ORDER BY n DESC, token LIMIT 50""".stripMargin,

    // computed truth, not "exactly the natural corpus survives": sf0.1's
    // documents table contains 8 NATURAL duplicate-text pairs (the r15
    // x16/x17 lesson), whose losers the pipeline correctly drops — the
    // kept set is min(id) per identical-token-sequence group over
    // corpus ∪ copies (x16 proves pairs ≡ those groups at both SFs)
    "x23_near_dedup_apply" ->
      """WITH u AS (
        |  SELECT doc_id AS id,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+'), t -> len(t) > 0), chr(31)) AS k
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000 AS id,
        |    array_to_string(list_filter(regexp_split_to_array(lower(text),
        |      '[^a-z0-9]+'), t -> len(t) > 0), chr(31)) AS k
        |  FROM documents
        |)
        |SELECT min(id) AS doc_id FROM u GROUP BY k ORDER BY doc_id""".stripMargin,

    // computed truth (the r15 x16/x17 lesson, same as x23): the fresh
    // batch inherits sf0.1's 8 natural duplicate-text pairs, so the
    // within-batch min-id dedup keeps one fresh doc per distinct
    // normalized text, not one per source row
    "x24_incremental_dedup" ->
      s"""SELECT min(doc_id) + 200000000 AS doc_id
        |FROM documents
        |GROUP BY md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin,

    "x25_quality_filter" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN base || ' # # # # # # # # # # # #' ELSE base END AS text
        |  FROM (SELECT doc_id,
        |          CASE WHEN doc_id % 3 = 0 THEN text || ' the be to of and that have with' ELSE text END AS base
        |        FROM documents)),
        |feat AS (
        |  SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text, '$FpWs'), w -> len(w) > 0) AS ws,
        |    list_filter(list_transform(regexp_split_to_array(text, chr(10)), x -> trim(x)), x -> len(x) > 0) AS ls,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS toks
        |  FROM t),
        |rules AS (
        |  SELECT doc_id,
        |    len(ws) BETWEEN 50 AND 100000 AS ok_word_count,
        |    (CASE WHEN len(ws) = 0 THEN 0.0
        |          ELSE CAST(list_sum(list_transform(ws, w -> len(w))) AS DOUBLE) / len(ws) END)
        |      BETWEEN 3.0 AND 10.0 AS ok_mean_word_len,
        |    (CASE WHEN len(ws) = 0 THEN 0.0
        |          ELSE CAST((len(text) - len(replace(text, '#', ''))) +
        |               len(regexp_extract_all(text, '\\.\\.\\.|…')) AS DOUBLE) / len(ws) END)
        |      <= 0.1 AS ok_symbol_ratio,
        |    (CASE WHEN len(ls) = 0 THEN 0.0
        |          ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '^[-*•‣◦]'))) AS DOUBLE) / len(ls) END)
        |      <= 0.9 AS ok_bullet_lines,
        |    (CASE WHEN len(ls) = 0 THEN 0.0
        |          ELSE CAST(len(list_filter(ls, l -> regexp_matches(l, '(\\.\\.\\.|…)$$'))) AS DOUBLE) / len(ls) END)
        |      <= 0.3 AS ok_ellipsis_lines,
        |    (CASE WHEN len(ws) = 0 THEN 0.0
        |          ELSE CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / len(ws) END)
        |      >= 0.8 AS ok_alpha_words,
        |    len(list_filter(['the','be','to','of','and','that','have','with'],
        |      s -> list_contains(toks, s))) >= 2 AS ok_stopword_hits
        |  FROM feat)
        |SELECT doc_id, ok_word_count, ok_mean_word_len, ok_symbol_ratio,
        |  ok_bullet_lines, ok_ellipsis_lines, ok_alpha_words, ok_stopword_hits,
        |  (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio AND ok_bullet_lines
        |   AND ok_ellipsis_lines AND ok_alpha_words AND ok_stopword_hits) AS keep,
        |  concat_ws(',',
        |    CASE WHEN NOT ok_word_count THEN 'word_count' END,
        |    CASE WHEN NOT ok_mean_word_len THEN 'mean_word_len' END,
        |    CASE WHEN NOT ok_symbol_ratio THEN 'symbol_ratio' END,
        |    CASE WHEN NOT ok_bullet_lines THEN 'bullet_lines' END,
        |    CASE WHEN NOT ok_ellipsis_lines THEN 'ellipsis_lines' END,
        |    CASE WHEN NOT ok_alpha_words THEN 'alpha_words' END,
        |    CASE WHEN NOT ok_stopword_hits THEN 'stopword_hits' END) AS drop_reasons
        |FROM rules ORDER BY doc_id""".stripMargin,

    "x26_redact" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com on 10.0.' ||
        |    (doc_id % 256) || '.1 or call 555-123-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |  FROM documents),
        |s1 AS (SELECT doc_id, text,
        |         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS no_email
        |       FROM t),
        |s2 AS (SELECT *, regexp_replace(no_email, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS no_ip FROM s1)
        |SELECT doc_id,
        |  regexp_replace(no_ip, '\+?([0-9][ ().-]{0,2}){6,}[0-9]', '[PHONE]', 'g') AS redacted,
        |  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(no_email, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ips,
        |  len(regexp_extract_all(no_ip, '\+?([0-9][ ().-]{0,2}){6,}[0-9]')) AS n_phones
        |FROM s2 ORDER BY doc_id""".stripMargin,

    "x27_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
        |  FROM documents),
        |pergram AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(tk) - 11),
        |      i -> substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 16))) AS gs
        |  FROM toks WHERE len(tk) >= 13),
        |docg AS (SELECT doc_id, unnest(gs) AS gram FROM pergram),
        |bg AS (SELECT DISTINCT unnest(gs) AS gram FROM pergram WHERE doc_id % 10 = 3)
        |SELECT doc_id, count(*) AS n_overlap_grams, true AS contaminated
        |FROM docg JOIN bg USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x61_scrub_spans" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
        |  FROM documents),
        |pergram AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(tk) - 11),
        |      i -> substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 16))) AS gs
        |  FROM toks WHERE len(tk) >= 13),
        |bg AS (SELECT DISTINCT unnest(gs) AS gram FROM pergram WHERE doc_id % 10 = 3),
        |hits AS (
        |  SELECT doc_id, s FROM (
        |    SELECT doc_id, unnest(range(1, len(tk) - 11)) AS s, tk
        |    FROM toks WHERE len(tk) >= 13)
        |  WHERE substr(md5(array_to_string(tk[s:s+12], ' ')), 1, 16) IN (SELECT gram FROM bg)),
        |covered AS (
        |  SELECT DISTINCT doc_id, p
        |  FROM (SELECT doc_id, unnest(range(s, s + 13)) AS p FROM hits)),
        |agg AS (
        |  SELECT c.doc_id,
        |    count(*) FILTER (WHERE prev.p IS NULL) AS n_spans_removed,
        |    count(*) AS n_tokens_removed
        |  FROM covered c LEFT JOIN covered prev
        |    ON prev.doc_id = c.doc_id AND prev.p = c.p - 1
        |  GROUP BY c.doc_id)
        |SELECT t.doc_id,
        |  COALESCE(a.n_spans_removed, 0) AS n_spans_removed,
        |  COALESCE(a.n_tokens_removed, 0) AS n_tokens_removed,
        |  len(t.tk) - COALESCE(a.n_tokens_removed, 0) AS n_tokens_after
        |FROM toks t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    "x64_token_budget" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source
        |      ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT,
        |        doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM ranked
        |WHERE cum <= CASE source WHEN 'src0' THEN 60000 WHEN 'src1' THEN 25000 ELSE 12000 END
        |ORDER BY doc_id""".stripMargin,

    "x65_token_budget_approx" ->
      """WITH totals AS (
        |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS tot
        |  FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN totals t USING (source)
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT::DOUBLE
        |      / 1152921504606846976 <
        |  least(CAST(1.0 AS DOUBLE),
        |    CAST(CASE d.source WHEN 'src0' THEN 60000 WHEN 'src1' THEN 25000 ELSE 12000 END AS DOUBLE)
        |      / CAST(t.tot AS DOUBLE))
        |ORDER BY d.doc_id""".stripMargin,

    "x62_char_mix" ->
      s"""SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
        |  CAST(length(text) - length(regexp_replace(text, '[$WsChars]', '', 'g')) AS BIGINT) AS n_ws,
        |  CAST(length(text) - length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS BIGINT) AS n_non_ascii
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x28_hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT::DOUBLE
        |      / 1152921504606846976 <
        |  CASE source WHEN 'src0' THEN CAST(1.0 AS DOUBLE) WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
        |       WHEN 'src2' THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.1 AS DOUBLE) END
        |ORDER BY doc_id""".stripMargin,

    "x74_shuffle" ->
      """SELECT doc_id, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'shuffle:7'), 1, 15))::UBIGINT::BIGINT
        |    AS shuffle_key
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x75_vocab_stats" ->
      s"""SELECT lang,
        |  count(DISTINCT tok) AS vocab_size,
        |  count(*) AS n_tokens,
        |  count(DISTINCT tok)::DOUBLE / count(*) AS type_token_ratio
        |FROM (SELECT lang, unnest(regexp_split_to_array(trim(text), '$TokWs')) AS tok
        |      FROM documents WHERE len(trim(text)) > 0) t
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "x77_interleave" ->
      """WITH h AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT::BIGINT AS hk
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, source, hk,
        |    row_number() OVER (PARTITION BY source ORDER BY hk, doc_id) AS rk
        |  FROM h
        |)
        |SELECT doc_id, source,
        |  CAST(rk AS DOUBLE) / (CASE source
        |    WHEN 'src0' THEN CAST(4.0 AS DOUBLE) WHEN 'src1' THEN CAST(2.0 AS DOUBLE)
        |    WHEN 'src2' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END) AS pos
        |FROM r ORDER BY pos, doc_id""".stripMargin,

    // closed-form 2x2 symmetric eigenproblem: largest eigenvalue
    // lam = (cxx+cyy+sqrt((cxx-cyy)^2+4cxy^2))/2, eigenvector
    // (cxy, lam-cxx) normalized, sign fixed like the engine (the
    // larger-|coordinate| entry made positive, ties to the first)
    "x76_pca_model" ->
      """WITH f AS (
        |  SELECT CAST(n_chars AS DOUBLE) AS x, CAST(doc_id % 97 AS DOUBLE) AS y
        |  FROM documents
        |), m AS (
        |  SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
        |         avg(x*x) AS sxx, avg(y*y) AS syy, avg(x*y) AS sxy
        |  FROM f
        |), c AS (
        |  SELECT n, sxx - mx*mx AS cxx, syy - my*my AS cyy, sxy - mx*my AS cxy FROM m
        |), e AS (
        |  SELECT n, cxx, cxy,
        |    (cxx + cyy + sqrt((cxx - cyy)*(cxx - cyy) + 4*cxy*cxy)) / 2 AS lam
        |  FROM c
        |), nv AS (
        |  SELECT n, lam,
        |    cxy / sqrt(cxy*cxy + (lam - cxx)*(lam - cxx)) AS c0,
        |    (lam - cxx) / sqrt(cxy*cxy + (lam - cxx)*(lam - cxx)) AS c1
        |  FROM e
        |)
        |SELECT n,
        |  round(CASE WHEN (CASE WHEN abs(c0) >= abs(c1) THEN c0 ELSE c1 END) < 0
        |             THEN -c0 ELSE c0 END, 6) AS c0_r,
        |  round(CASE WHEN (CASE WHEN abs(c0) >= abs(c1) THEN c0 ELSE c1 END) < 0
        |             THEN -c1 ELSE c1 END, 6) AS c1_r,
        |  round(lam, 2) AS var1_r
        |FROM nv""".stripMargin,

    "x78_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> len(t) > 0)) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
        |), n AS (
        |  SELECT count(*) AS nd FROM documents
        |), s AS (
        |  SELECT doc_id, term, tf, df_docs,
        |    CAST(tf * nd AS DOUBLE) / df_docs AS score
        |  FROM tf JOIN dfq USING (term) CROSS JOIN n
        |), r AS (
        |  SELECT doc_id, term, tf, df_docs, score,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
        |  FROM s
        |)
        |SELECT doc_id, rank, term, tf, df_docs, score
        |FROM r WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "x79_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> len(t) > 0)) AS term
        |  FROM documents
        |), g AS (
        |  SELECT (SELECT count(*) FROM documents) AS nd,
        |         (SELECT count(*) FROM tok) AS total
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'window', 'vector') GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
        |), dfq AS (
        |  SELECT term, count(*) AS df_docs FROM tf GROUP BY 1
        |)
        |SELECT term, doc_id, tf, dl, df_docs,
        |  CAST(tf AS DOUBLE) * 2.5 /
        |    (CAST(tf AS DOUBLE) + 1.5 *
        |      (0.25 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(total AS DOUBLE) / nd))))
        |    AS tf_norm
        |FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term) CROSS JOIN g
        |ORDER BY term, doc_id""".stripMargin,

    "x84_nb_classifier" ->
      """WITH lab AS (
        |  SELECT doc_id, text, (lang = 'en') AS is_en FROM documents
        |), tok AS (
        |  SELECT doc_id, is_en,
        |    unnest(list_distinct(list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> len(t) > 0))) AS token
        |  FROM lab
        |), counts AS (
        |  SELECT token,
        |    sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS df_pos,
        |    sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS df_neg
        |  FROM tok GROUP BY 1
        |), sizes AS (
        |  SELECT sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS n_pos,
        |         sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS n_neg
        |  FROM lab
        |), vocab AS (
        |  SELECT token, df_pos, df_neg
        |  FROM counts ORDER BY df_pos + df_neg DESC, token ASC LIMIT 100
        |), w AS (
        |  SELECT token,
        |    CAST(floor((ln((df_pos + 1) / (n_pos + 2.0)) -
        |                ln((df_neg + 1) / (n_neg + 2.0))) * 1e6 + 0.5)
        |      AS BIGINT) AS w_micro
        |  FROM vocab CROSS JOIN sizes
        |), bias AS (
        |  SELECT CAST(floor(ln(CAST(n_pos AS DOUBLE) / n_neg) * 1e6 + 0.5)
        |    AS BIGINT) AS b FROM sizes
        |), matched AS (
        |  SELECT doc_id, count(*) AS n_vocab_tokens, sum(w_micro) AS s
        |  FROM tok JOIN w USING (token) GROUP BY 1
        |)
        |SELECT d.doc_id,
        |  coalesce(m.n_vocab_tokens, 0) AS n_vocab_tokens,
        |  CAST(coalesce(m.s, 0) + b AS BIGINT) AS score_micro,
        |  (coalesce(m.s, 0) + b) > 0 AS predicted
        |FROM documents d LEFT JOIN matched m USING (doc_id) CROSS JOIN bias
        |ORDER BY d.doc_id""".stripMargin,

    // DSIR full-model replay: hashed unigram+bigram md5 buckets (the
    // x28/x74 60-bit md5 primitive applied to gram text), Laplace
    // weights quantized with the floor(x·1e6 + 0.5) spelling, exact
    // integer document sums, top-200 by pure integer ordering
    "x85_dsir_select" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, list_filter(
        |    regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |    t -> len(t) > 0) AS tok
        |  FROM documents
        |), grams AS (
        |  SELECT doc_id, lang,
        |    unnest(tok || [tok[i] || ' ' || tok[i+1]
        |                   for i in generate_series(1, len(tok) - 1)]) AS g
        |  FROM tk
        |), feats AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(g), 1, 15))::UBIGINT % 4096 AS BIGINT)
        |      AS bucket
        |  FROM grams
        |), ct AS (
        |  SELECT bucket, count(*) AS c_t FROM feats WHERE lang = 'en'
        |  GROUP BY 1
        |), cr AS (
        |  SELECT bucket, count(*) AS c_r FROM feats GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT count(*) FROM feats WHERE lang = 'en') AS n_t,
        |         (SELECT count(*) FROM feats) AS n_r
        |), w AS (
        |  SELECT cr.bucket,
        |    CAST(floor((ln((coalesce(ct.c_t, 0) + 1) / (n_t + 4096.0)) -
        |                ln((cr.c_r + 1) / (n_r + 4096.0))) * 1e6 + 0.5)
        |      AS BIGINT) AS w_micro
        |  FROM cr LEFT JOIN ct USING (bucket) CROSS JOIN tot
        |), sc AS (
        |  SELECT doc_id, count(*) AS n_grams, sum(w_micro) AS s
        |  FROM feats JOIN w USING (bucket) GROUP BY 1
        |), scored AS (
        |  SELECT d.doc_id, coalesce(sc.n_grams, 0) AS n_grams,
        |         CAST(coalesce(sc.s, 0) AS BIGINT) AS logw_micro
        |  FROM documents d LEFT JOIN sc USING (doc_id)
        |)
        |SELECT doc_id, n_grams, logw_micro,
        |  (row_number() OVER (ORDER BY logw_micro DESC, doc_id ASC)) <= 200
        |    AS selected
        |FROM scored ORDER BY doc_id""".stripMargin,

    // keep-best dedup: rank within each normalized-text group by
    // (n_chars desc, doc_id asc) — a fingerprint group IS one connected
    // component of the all-pairs set, and unpaired docs are their own
    // rank-1 singleton, so "rank 1 per group" is exactly the engine's
    // keep set
    "x87_dedup_keep_best" ->
      s"""SELECT doc_id FROM (
        |  SELECT doc_id, row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g'))
        |    ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents)
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    // the x84 model replayed, keeping the strictly-positive scores —
    // the Pipeline stage-2b contract (score_micro > 0)
    "x86_pipeline_classify" ->
      """WITH lab AS (
        |  SELECT doc_id, text, (lang = 'en') AS is_en FROM documents
        |), tok AS (
        |  SELECT doc_id, is_en,
        |    unnest(list_distinct(list_filter(
        |      regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |      t -> len(t) > 0))) AS token
        |  FROM lab
        |), counts AS (
        |  SELECT token,
        |    sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS df_pos,
        |    sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS df_neg
        |  FROM tok GROUP BY 1
        |), sizes AS (
        |  SELECT sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS n_pos,
        |         sum(CASE WHEN is_en THEN 0 ELSE 1 END) AS n_neg
        |  FROM lab
        |), vocab AS (
        |  SELECT token, df_pos, df_neg
        |  FROM counts ORDER BY df_pos + df_neg DESC, token ASC LIMIT 100
        |), w AS (
        |  SELECT token,
        |    CAST(floor((ln((df_pos + 1) / (n_pos + 2.0)) -
        |                ln((df_neg + 1) / (n_neg + 2.0))) * 1e6 + 0.5)
        |      AS BIGINT) AS w_micro
        |  FROM vocab CROSS JOIN sizes
        |), bias AS (
        |  SELECT CAST(floor(ln(CAST(n_pos AS DOUBLE) / n_neg) * 1e6 + 0.5)
        |    AS BIGINT) AS b FROM sizes
        |), matched AS (
        |  SELECT doc_id, sum(w_micro) AS s
        |  FROM tok JOIN w USING (token) GROUP BY 1
        |)
        |SELECT d.doc_id
        |FROM documents d LEFT JOIN matched m USING (doc_id) CROSS JOIN bias
        |WHERE coalesce(m.s, 0) + b > 0
        |ORDER BY d.doc_id""".stripMargin,

    "x29_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts AS v_ts, max(event_id) AS v_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id,
        |  CASE WHEN v.v_ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(v.v_ts) <= 14400000000
        |       THEN v.v_event_id END AS v_event_id,
        |  CASE WHEN v.v_ts IS NOT NULL AND epoch_us(c.ts) - epoch_us(v.v_ts) <= 14400000000
        |       THEN epoch_us(c.ts) - epoch_us(v.v_ts) END AS lag_us
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.v_ts <= c.ts
        |ORDER BY event_id""".stripMargin,

    "x30_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "x31_dedup_lines" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0
        |         THEN text || chr(10) || 'SUBSCRIBE TO OUR NEWSLETTER TODAY'
        |         ELSE text END AS text
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, chr(10)), x -> trim(x)),
        |                x -> len(x) > 0) AS ls
        |  FROM t),
        |heavy AS (
        |  SELECT line FROM (SELECT unnest(ls) AS line FROM feat)
        |  GROUP BY line HAVING count(*) >= 5),
        |harr AS (SELECT coalesce(list(line), []) AS hs FROM heavy)
        |SELECT doc_id,
        |  array_to_string(list_filter(ls, l -> NOT list_contains(hs, l)), chr(10)) AS text
        |FROM feat CROSS JOIN harr ORDER BY doc_id""".stripMargin,

    "x32_pack_tokens" ->
      s"""WITH toks AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS n_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT % 8 AS INT) AS shard
        |  FROM documents),
        |offs AS (
        |  SELECT doc_id, n_tokens, shard,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
        |  FROM toks)
        |SELECT doc_id, n_tokens, shard, start_tok,
        |  CAST(floor(start_tok / 2000) AS BIGINT) AS bin
        |FROM offs ORDER BY doc_id""".stripMargin,

    "x33_domain_cap" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source ORDER BY
        |      ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT,
        |      doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 5 ORDER BY doc_id""".stripMargin,

    "x34_len_percentiles" ->
      s"""SELECT lang, count(*) AS n,
        |  quantile_cont(n_tokens, 0.25) AS p25,
        |  quantile_cont(n_tokens, 0.5)  AS p50,
        |  quantile_cont(n_tokens, 0.75) AS p75
        |FROM (SELECT lang,
        |        CASE WHEN len(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS n_tokens
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "x49_knn_classify" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |     c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv, label
        |           FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id, label,
        |    list_dot_product(qv, cv) /
        |      (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS score
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, label,
        |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
        |  FROM scored),
        |votes AS (SELECT query_id, label, count(*) AS votes
        |  FROM ranked WHERE rank <= 10 GROUP BY query_id, label),
        |win AS (SELECT query_id, label, votes,
        |    row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
        |  FROM votes)
        |SELECT query_id, label, votes FROM win WHERE rn = 1 ORDER BY query_id""".stripMargin,

    "x68_cosine_dedup_increment" ->
      """SELECT vec_id + 200000000 AS vec_id FROM embeddings
        |WHERE vec_id >= 250 AND vec_id < 500 ORDER BY vec_id""".stripMargin,

    "x69_semantic_dedup_increment" ->
      """SELECT vec_id + 200000000 AS vec_id FROM embeddings
        |WHERE vec_id >= 250 AND vec_id < 500 ORDER BY vec_id""".stripMargin,

    "x70_streaming_cosine_dedup" ->
      """SELECT vec_id FROM embeddings
        |UNION ALL
        |SELECT vec_id + 200000000 AS vec_id FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "x66_cosine_dedup_probed" ->
      """SELECT vec_id AS id_a, vec_id + 100000000 AS id_b, 1.0 AS score_r
        |FROM embeddings ORDER BY id_a""".stripMargin,

    "x67_semantic_dedup_probed" ->
      """SELECT vec_id AS id_a, vec_id + 100000000 AS id_b, 1.0 AS score_r
        |FROM embeddings ORDER BY id_a""".stripMargin,

    "x50_semantic_dedup" ->
      """SELECT vec_id AS id_a, vec_id + 100000000 AS id_b, 1.0 AS score_r
        |FROM embeddings ORDER BY id_a""".stripMargin,

    "x51_semantic_dedup_apply" ->
      """SELECT vec_id FROM embeddings ORDER BY vec_id""",

    "x57_media_dedup" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, md5(text) AS k FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000, md5(text) FROM documents)
        |SELECT media_id FROM (
        |  SELECT media_id, min(media_id) OVER (PARTITION BY k) AS keep FROM m)
        |WHERE media_id = keep ORDER BY media_id""".stripMargin,

    // dHash bit j (0-based) = e[j+2] > e[j+1] in 1-indexed SQL terms —
    // identical to the kernel's v(i+1) > v(i) float comparison; the hash
    // is the bit sum, pairs are the complete Hamming-<=3 truth (the
    // banding in the operator is recall-complete by pigeonhole, so the
    // exhaustive SQL pair scan is the same set)
    "x80_media_neardup" ->
      """WITH m AS (
        |  SELECT vec_id AS id, embedding AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000000,
        |         list_transform(embedding, (x, i) ->
        |           CASE WHEN (i - 1) % 2 = 0 THEN x
        |                ELSE x * CAST(1.01 AS FLOAT) END)
        |  FROM embeddings WHERE vec_id % 20 = 0),
        |h AS (
        |  -- bit 63 is the BIGINT sign bit: DuckDB raises on 1 << 63, so
        |  -- it enters the sum as MIN_BIGINT (same two's-complement value
        |  -- the kernel's 1L << 63 produces; latent until embeddings grow
        |  -- past 64 dims — i tops out at 63 on today's 64-dim table)
        |  SELECT id, coalesce(CAST(list_sum(
        |           list_transform(range(1, least(len(e), 65)),
        |             i -> CASE WHEN e[i + 1] > e[i]
        |                       THEN CASE WHEN i = 64
        |                            THEN CAST(-9223372036854775807 - 1 AS BIGINT)
        |                            ELSE 1::BIGINT << (i - 1) END
        |                  ELSE 0 END))
        |         AS BIGINT), 0) AS hash
        |  FROM m)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(bit_count(xor(a.hash, b.hash)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.hash, b.hash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // aHash: bit i = e[i] > mean(e); the mean replays the kernel's exact
    // sequential double summation (DuckDB list_sum over CAST-to-DOUBLE
    // elements measured bit-identical to it on every sf0.1 embedding)
    "x81_media_neardup_ahash" ->
      """WITH m AS (
        |  SELECT vec_id AS id, embedding AS e FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000000,
        |         list_transform(embedding, (x, i) ->
        |           CASE WHEN (i - 1) % 2 = 0 THEN x
        |                ELSE x * CAST(1.01 AS FLOAT) END)
        |  FROM embeddings WHERE vec_id % 20 = 10),
        |mu AS (
        |  SELECT id, e,
        |         list_sum(list_transform(e, x -> CAST(x AS DOUBLE))) / len(e) AS m
        |  FROM m),
        |h AS (
        |  -- bit 63 is the BIGINT sign bit: DuckDB raises on 1 << 63, so
        |  -- it enters the sum as MIN_BIGINT (same two's-complement value
        |  -- the kernel's 1L << 63 produces)
        |  SELECT id, coalesce(CAST(list_sum(
        |           list_transform(range(1, least(len(e), 64) + 1),
        |             i -> CASE WHEN CAST(e[i] AS DOUBLE) > m
        |                       THEN CASE WHEN i = 64
        |                            THEN CAST(-9223372036854775807 - 1 AS BIGINT)
        |                            ELSE 1::BIGINT << (i - 1) END
        |                  ELSE 0 END))
        |         AS BIGINT), 0) AS hash
        |  FROM mu)
        |SELECT a.id AS id_a, b.id AS id_b,
        |       CAST(bit_count(xor(a.hash, b.hash)) AS INTEGER) AS hamming
        |FROM h a JOIN h b ON a.id < b.id
        |WHERE bit_count(xor(a.hash, b.hash)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "x56_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(c) AS DOUBLE) AS total,
        |             sum(pow(CAST(c AS DOUBLE), 0.5)) AS powsum FROM c),
        |r AS (SELECT lang,
        |        round(least(1.0,
        |          0.5 * total * (pow(CAST(c AS DOUBLE), 0.5) / powsum)
        |            / CAST(c AS DOUBLE)), 9) AS rate
        |      FROM c, t)
        |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT::DOUBLE
        |      / 1152921504606846976 < rate
        |ORDER BY doc_id""".stripMargin,

    "x55_cluster_prune" ->
      """SELECT vec_id FROM (
        |  SELECT vec_id,
        |    row_number() OVER (PARTITION BY vec_id % 4 ORDER BY vec_id) AS r,
        |    count(*) OVER (PARTITION BY vec_id % 4) AS n
        |  FROM embeddings)
        |WHERE r <= CAST(ceil(0.5 * n) AS BIGINT)
        |ORDER BY vec_id""".stripMargin,

    // within-doc line dedup: keep a line iff its FIRST occurrence index is
    // its own index (list_position returns the first match, 1-based —
    // exactly the Spark side's no-equal-element-in-prefix test)
    "x53_dedup_doc_lines" ->
      """SELECT doc_id,
        |  array_to_string([l[i] for i in generate_series(1, len(l))
        |                   if list_position(l, l[i]) = i], chr(10)) AS scrubbed
        |FROM (SELECT doc_id, regexp_split_to_array(
        |        CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || text ELSE text END,
        |        chr(10)) AS l
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "x54_scrub_lines" ->
      s"""SELECT doc_id,
        |  array_to_string(list_filter(regexp_split_to_array(
        |    'A good first sentence stays here.' || chr(10) || text || chr(10) ||
        |    'short.' || chr(10) || 'Lines mentioning javascript are banned today.'
        |    || chr(10) || 'no terminal punctuation here', chr(10)),
        |    x -> regexp_matches(trim(x), '[.!?"]$$')
        |         AND len(list_filter(regexp_split_to_array(trim(x), '$TokWs'),
        |                             w -> len(w) > 0)) >= 3
        |         AND NOT contains(lower(trim(x)), 'lorem ipsum')
        |         AND NOT contains(lower(trim(x)), 'javascript')), chr(10)) AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x48_approx_percentiles" ->
      s"""SELECT lang, count(*) AS n,
        |  quantile_disc(n_tokens, 0.25) AS p25,
        |  quantile_disc(n_tokens, 0.5)  AS p50,
        |  quantile_disc(n_tokens, 0.75) AS p75
        |FROM (SELECT lang,
        |        CASE WHEN len(trim(text)) = 0 THEN 0
        |             ELSE len(regexp_split_to_array(trim(text), '$TokWs')) END AS n_tokens
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "x35_quantize_embed" ->
      """SELECT vec_id,
        |  CASE WHEN m = 0 THEN 0.0 ELSE 127.0 / m END AS scale,
        |  array_to_string(list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) *
        |    (CASE WHEN m = 0 THEN 0.0 ELSE 127.0 / m END) + 0.5) AS INT)), ',') AS q
        |FROM (SELECT vec_id, embedding,
        |        list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS m
        |      FROM embeddings)
        |ORDER BY vec_id""".stripMargin,

    "x39_l2_normalize" ->
      """SELECT vec_id,
        |  array_to_string(CASE WHEN n = 0
        |       THEN list_transform(embedding, x -> printf('%.9f', 0.0))
        |       ELSE list_transform(embedding,
        |              x -> printf('%.9f', round(CAST(x AS DOUBLE) / n, 9) + 0.0)) END,
        |    ',') AS nv
        |FROM (SELECT vec_id, embedding,
        |        sqrt(list_sum(list_transform(embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS n
        |      FROM embeddings)
        |ORDER BY vec_id""".stripMargin,

    "x36_hash_topn" ->
      """SELECT doc_id FROM (
        |  SELECT doc_id FROM documents
        |  ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT,
        |    doc_id
        |  LIMIT 37)
        |ORDER BY doc_id""".stripMargin,

    "x37_split" ->
      """SELECT doc_id,
        |  CASE WHEN u < 0.75 THEN 'train' WHEN u < 0.875 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft'), 1, 15))::UBIGINT::DOUBLE
        |          / 1152921504606846976 AS u
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "x38_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS tk
        |  FROM documents),
        |pergram AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(tk) - 11),
        |      i -> substr(md5(array_to_string(tk[i:i+12], ' ')), 1, 16))) AS gs
        |  FROM toks WHERE len(tk) >= 13),
        |docg AS (SELECT doc_id, unnest(gs) AS gram FROM pergram),
        |bg AS (SELECT DISTINCT unnest(gs) AS gram FROM pergram WHERE doc_id % 10 = 3),
        |bad AS (SELECT DISTINCT doc_id FROM docg JOIN bg USING (gram))
        |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,

    // fuzzy decontamination: full exact-Jaccard replay (the x47 template,
    // corpus × benchmark): recompute the benchmark derivatives (% 11 == 0
    // docs + 4-token tail), the exact 3-shingle Jaccard of every
    // shingle-sharing (corpus, bench) pair with the engine's tokenizer /
    // whole-text-when-≤3-tokens shingle rule / per-doc distinct shingles,
    // and keep corpus ids whose max Jaccard stays under 0.8
    "x52_fuzzy_decontaminate" ->
      """WITH corp AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS t
        |  FROM documents
        |), ben AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text || ' graft eval benchmark tail'),
        |      '[^a-z0-9]+'), t -> len(t) > 0) AS t
        |  FROM documents WHERE doc_id % 11 = 0
        |), shc AS (
        |  SELECT doc_id, CASE WHEN len(t) <= 3 THEN [array_to_string(t, chr(31))]
        |    ELSE list_distinct([t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]
        |                        for i in generate_series(1, len(t) - 2)]) END AS s
        |  FROM corp
        |), shb AS (
        |  SELECT doc_id, CASE WHEN len(t) <= 3 THEN [array_to_string(t, chr(31))]
        |    ELSE list_distinct([t[i] || chr(31) || t[i+1] || chr(31) || t[i+2]
        |                        for i in generate_series(1, len(t) - 2)]) END AS s
        |  FROM ben
        |), pc AS (
        |  SELECT doc_id AS cid, len(s) AS nc, unnest(s) AS w FROM shc
        |), pb AS (
        |  SELECT doc_id AS bid, len(s) AS nb, unnest(s) AS w FROM shb
        |), dup AS (
        |  SELECT DISTINCT cid FROM (
        |    SELECT pc.cid, pb.bid, count(*) AS c,
        |      any_value(pc.nc) AS nc, any_value(pb.nb) AS nb
        |    FROM pc JOIN pb USING (w) GROUP BY pc.cid, pb.bid)
        |  WHERE CAST(c AS DOUBLE) / (nc + nb - c) >= 0.8
        |)
        |SELECT c.doc_id FROM corp c ANTI JOIN dup ON c.doc_id = dup.cid
        |ORDER BY doc_id""".stripMargin,

    "x19_quality_score" ->
      s"""SELECT doc_id,
        |  (CAST(len(text) BETWEEN 50 AND 100000 AS INT)
        |   + CAST(punct_ratio < 0.2 AS INT)
        |   + CAST(stopword_ratio > 0.01 AS INT)
        |   + CAST(mean_word_len BETWEEN 2.0 AND 12.0 AS INT)) / 4.0 AS quality
        |FROM (
        |  SELECT doc_id, text,
        |    CASE WHEN len(text) = 0 THEN 0.0
        |         ELSE CAST(len(regexp_replace(text, '$PunctEx', '', 'g')) AS DOUBLE) / len(text) END AS punct_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(len(list_filter(toks, t -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','from','this','be','are'], t))) AS DOUBLE) / len(toks) END AS stopword_ratio,
        |    CASE WHEN len(toks) = 0 THEN 0.0
        |         ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / len(toks) END AS mean_word_len
        |  FROM (SELECT doc_id, text,
        |          list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS toks
        |        FROM documents) d) q
        |ORDER BY doc_id""".stripMargin,

    "x12_multimodal" ->
      """SELECT doc_id AS media_id,
        |  ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
        |  octet_length(encode(text)) AS byte_len
        |FROM documents ORDER BY media_id""".stripMargin,

    "x13_event_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "x20_interval_join" ->
      """SELECT c.event_id AS event_id, v.event_id AS r_event_id
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND CAST(v.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP) - INTERVAL 4 HOUR
        | AND CAST(v.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 4 HOUR
        |ORDER BY event_id, r_event_id""".stripMargin,

    "x14_sessionize" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |grouped AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM marked)
        |SELECT user_id, min(ts) AS start, max(ts) AS "end",
        |  count(*) AS n_events,
        |  CAST(round(sum(value) * 100) AS BIGINT) AS total_cents
        |FROM grouped GROUP BY user_id, sess
        |ORDER BY user_id, start""".stripMargin,

    "q7_semi_anti_join" ->
      """SELECT o_orderkey, 'has_bulk' AS kind FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |UNION ALL
        |SELECT o_orderkey, 'no_bulk' AS kind FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        |ORDER BY o_orderkey""".stripMargin,

    "x10_ann_lsh" ->
      """SELECT vec_id + 100000000 AS query_id, 1 AS rank, vec_id AS neighbor_id,
        |  1.0 AS score_r
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // same planted contract as x10 through the persisted standing index
    "x72_ann_lsh_store" ->
      """SELECT vec_id + 100000000 AS query_id, 1 AS rank, vec_id AS neighbor_id,
        |  1.0 AS score_r
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    // x18's planted contract through the persisted cell-partitioned store
    "x73_ann_ivf_store" ->
      """SELECT vec_id + 100000000 AS query_id, 1 AS rank, vec_id AS neighbor_id,
        |  1.0 AS score_r
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "x59_pq_ann" ->
      """SELECT vec_id + 100000000 AS query_id, 1 AS rank, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "x63_ivfpq_ann" ->
      """SELECT vec_id + 100000000 AS query_id, 1 AS rank, vec_id AS neighbor_id
        |FROM embeddings WHERE vec_id < 5 ORDER BY query_id""".stripMargin,

    "x60_lm_score" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |            t -> len(t) > 0) AS toks
        |        FROM documents)),
        |vocab AS (
        |  SELECT tok AS token FROM tok GROUP BY tok
        |  ORDER BY count(*) DESC, tok LIMIT 500),
        |mapped AS (
        |  SELECT t.doc_id, t.pos,
        |    CASE WHEN v.token IS NULL THEN '<unk>' ELSE t.tok END AS w
        |  FROM tok t LEFT JOIN vocab v ON t.tok = v.token),
        |bg AS (
        |  SELECT a.doc_id, a.w AS w1, b.w AS w2
        |  FROM mapped a JOIN mapped b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |bimodel AS (
        |  SELECT w1, w2 FROM bg GROUP BY w1, w2
        |  ORDER BY count(*) DESC, w1, w2 LIMIT 2000),
        |stats AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN w = '<unk>' THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |  FROM mapped GROUP BY doc_id),
        |known AS (
        |  SELECT g.doc_id, count(m.w1) AS n_known_bigrams
        |  FROM bg g LEFT JOIN bimodel m ON g.w1 = m.w1 AND g.w2 = m.w2
        |  GROUP BY g.doc_id)
        |SELECT d.doc_id,
        |  COALESCE(s.n_tokens, 0) AS n_tokens,
        |  COALESCE(s.n_oov, 0) AS n_oov,
        |  COALESCE(k.n_known_bigrams, 0) AS n_known_bigrams
        |FROM documents d
        |LEFT JOIN stats s USING (doc_id)
        |LEFT JOIN known k USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "q8_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    // computed truth (the r15 x16/x17 lesson, same as x24): sf0.1's
    // 8 natural duplicate-text pairs lose a member to exact dedup too —
    // the kept set is min id per normalized-text fingerprint group
    "x15_exact_dedup_keep" ->
      s"""SELECT min(doc_id) AS doc_id
        |FROM documents
        |GROUP BY md5(regexp_replace(lower(trim(text)), '$FpWs', ' ', 'g'))
        |ORDER BY doc_id""".stripMargin,

    "f25_variant_flatten" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS _link, o_orderkey, o_custkey,
        |  o_orderstatus, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f13_variant" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract(props, '$.k') AS BIGINT) > 80
        |ORDER BY event_id""".stripMargin,

    // source roundtrips: reading the staged wire format must reproduce
    // the original rows exactly
    "f14_json_array" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey""",

    "f15_json_array_path" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey""",

    "f16_json_stream" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey""",

    "f17_iterator" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey""",

    "f18_multifile_union" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "f19_inline_one_to_one" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_totalprice END AS detail_price,
        |  CASE WHEN o_orderkey % 10 = 0 THEN NULL ELSE o_orderstatus END AS detail_status
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f20_emit_obj" ->
      """SELECT CAST(c_custkey AS VARCHAR) || '.profile.0' AS _link,
        |  CAST(c_custkey AS VARCHAR) AS _link_main,
        |  c_name AS name, c_acctbal AS bal
        |FROM customer ORDER BY _link""".stripMargin,

    "f21_schema_order" ->
      """SELECT o_orderkey AS order_key, o_totalprice AS total_price
        |FROM orders ORDER BY order_key""".stripMargin,

    "f22_naming" ->
      """SELECT 'cust-' || CAST(c_custkey AS VARCHAR) || '.tags.0' AS _link,
        |  'cust-' || CAST(c_custkey AS VARCHAR) AS _link_main,
        |  c_mktsegment AS m__seg
        |FROM customer ORDER BY _link""".stripMargin,

    "f23_stats" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS field_name, CAST(min(o_orderkey) AS VARCHAR) AS min_v,
        |    CAST(max(o_orderkey) AS VARCHAR) AS max_v, count(DISTINCT o_orderkey) AS n_distinct
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', min(o_orderstatus), max(o_orderstatus),
        |    count(DISTINCT o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', min(o_orderpriority), max(o_orderpriority),
        |    count(DISTINCT o_orderpriority) FROM orders) t
        |ORDER BY field_name""".stripMargin,

    "f24_one_to_one" ->
      """WITH m AS (SELECT max(cnt) AS mx FROM (
        |  SELECT count(*) AS cnt FROM lineitem GROUP BY l_orderkey) g)
        |SELECT * FROM (
        |  SELECT 'first_item' AS array_path, 1 AS max_size, true AS one_to_one
        |  UNION ALL
        |  SELECT 'items', (SELECT mx FROM m), (SELECT mx FROM m) <= 1) t
        |ORDER BY array_path""".stripMargin,

    // Exact ground truth for the near-dup operators. Jaccard oracles
    // compare string shingles where the engine compares 64-bit FNV shingle
    // hashes — identical sets modulo hash collisions (P < 1e-9 at this
    // scale). The simhash oracle recomputes the signature itself: the
    // engine's token hash is md5-derived precisely so SQL can replicate it.
    "x6_minhash_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000, text || ' graft appended tail marker' FROM documents),
        |toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS t
        |  FROM docs),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) <= 3 THEN [array_to_string(t, chr(31))]
        |         ELSE list_distinct(list_transform(range(1, len(t) - 1),
        |                i -> t[i] || chr(31) || t[i+1] || chr(31) || t[i+2])) END AS s
        |  FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "x7_simhash_pairs" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000000, text FROM documents),
        |toks AS (
        |  SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0)) AS tok
        |  FROM docs),
        |th AS (
        |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks),
        |votes AS (
        |  SELECT doc_id, b,
        |    sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM th, range(64) r(b) GROUP BY doc_id, b),
        |-- LEFT JOIN from docs: a token-less document (no rows in th)
        |-- has signature 0 in the engine and must pair at hamming 0 here too
        |sig AS (
        |  SELECT d.doc_id, COALESCE(s.sig, 0::UBIGINT) AS sig
        |  FROM docs d LEFT JOIN (
        |    SELECT doc_id,
        |      CAST(sum(CASE WHEN v > 0 THEN 1::UBIGINT << b ELSE 0::UBIGINT END) AS UBIGINT) AS sig
        |    FROM votes GROUP BY doc_id) s USING (doc_id))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  bit_count(xor(a.sig, b.sig)) AS hamming
        |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "x8_ngram_jaccard" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> len(t) > 0) AS t
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(t) <= 2 THEN [array_to_string(t, chr(31))]
        |         ELSE list_distinct(list_transform(range(1, len(t)),
        |                i -> t[i] || chr(31) || t[i+1])) END AS s
        |  FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.s, b.s))) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin
  )
}
