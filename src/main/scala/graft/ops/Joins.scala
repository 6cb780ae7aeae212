package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Join shapes Spark's optimizer can't produce on its own: backward as-of
  * joins (most-recent-match semantics) and salt-balanced equi-joins for
  * skewed keys.
  *
  * Both are expressed as plain DataFrame plans — one shuffle each, no
  * inequality-join fallback to BroadcastNestedLoopJoin, nothing collected
  * to the driver — so they hold their shape at 100 TB.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the right row with
    * the greatest `rightTime` ≤ `leftTime` within the same `on` keys
    * (DuckDB `ASOF LEFT JOIN` semantics). Optionally `tolerance` bounds
    * the allowed `leftTime - rightTime` gap; matches older than that
    * come back as nulls, like no match at all.
    *
    * Plan shape: tag-and-union both sides, ONE shuffle on the keys, one
    * in-partition sort, then `last(_, ignoreNulls)` over a running
    * window. This is the scalable spelling of as-of: a naive
    * `l.t >= r.t` range join degenerates to a nested-loop or an
    * exploding band join, while this stays a single exchange + sort —
    * the same cost class as any keyed window function. Ties (several
    * right rows at the same instant) break deterministically toward the
    * greatest right payload (struct ordering), so results are stable
    * across partitionings and cluster sizes.
    *
    * Right payload columns (everything not in `on`) must not collide
    * with left column names; they all appear in the output, null when
    * unmatched.
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      tolerance: Option[Column] = None): DataFrame = {
    val lPay = left.columns.filterNot(on.contains).toSeq
    val rPay = right.columns.filterNot(on.contains).toSeq
    require(rPay.contains(rightTime), s"rightTime $rightTime must be a non-key right column")
    val overlap = lPay.intersect(rPay)
    require(overlap.isEmpty, s"right payload columns collide with left: ${overlap.mkString(",")}")
    val reserved = Seq("_t", "_side", "_rpay", "_m")
      .intersect(left.columns ++ right.columns)
    require(reserved.isEmpty,
      s"column names reserved by asofJoin: ${reserved.mkString(",")}")

    val rStruct = StructType(rPay.map(c => right.schema(right.schema.fieldIndex(c))))
    val lSide = left.select(
      on.map(col) ++ Seq(col(leftTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(rStruct).as("_rpay")) ++ lPay.map(col): _*)
    // a NULL rightTime can never satisfy rightTime <= leftTime (ASOF
    // comparison is false on NULL) — and it would sort FIRST under the
    // ascending window order, where last(ignoreNulls) would pick its
    // payload as a bogus "most recent match"
    val rSide = right.where(col(rightTime).isNotNull).select(
      on.map(col) ++ Seq(col(rightTime).as("_t"), lit(0).as("_side"),
        struct(rPay.map(col): _*).as("_rpay")) ++
        lPay.map(c => lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)): _*)

    // right rows (_side 0) sort before left rows at the same instant, so
    // an exact-time right row is visible to its left row (≤, not <)
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_rpay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("_m", last(col("_rpay"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    val gated = tolerance match {
      case Some(tol) => matched.withColumn("_m",
        when(col("_m").isNotNull &&
          (col("_t") - col("_m").getField(rightTime)) <= tol, col("_m")))
      case None => matched
    }
    gated.select(on.map(col) ++ lPay.map(col) ++
      rPay.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Skew-balanced inner equi-join: `big` keeps one row but gets a
    * deterministic salt in [0, nSalts); `small` is exploded nSalts times
    * so every salted key still finds its match. A hot key's rows spread
    * over nSalts reducers instead of melting one executor.
    *
    * The salt derives from `saltCols` (default: every big-side column)
    * via xxhash64 — a pure function of the row, so the join is
    * deterministic and resumable, unlike `rand()`-salted joins. Use when
    * AQE's skew-join split can't help (e.g. the skew is in a single key
    * within one partition-sized unit) and `small` is too big to
    * broadcast but nSalts copies of it are still cheap.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, on: Seq[String],
      nSalts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    require(!(big.columns ++ small.columns).contains("_salt"),
      "column name _salt is reserved by saltedJoin")
    val src = if (saltCols.nonEmpty) saltCols else big.columns.toSeq
    val b = big.withColumn("_salt",
      pmod(xxhash64(src.map(col): _*), lit(nSalts.toLong)).cast("int"))
    val sm = small.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    b.join(sm, on :+ "_salt").drop("_salt")
  }
}
