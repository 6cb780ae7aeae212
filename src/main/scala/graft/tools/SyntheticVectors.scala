package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE deterministic hash-derived vector corpus every ANN
  * measurement shares — ScaleCurve's `ann` family, Bench's `b8`, and the
  * shuffle-evidence specs compare numbers across artifacts, so the
  * corpus must be the same by construction, not by copy-pasted comment.
  *
  * Element `j` of vector `id` is `xxhash64(id, j)` mapped to [-1, 1) as
  * float: no RNG, reproducible at any scale, realistic spread for
  * bucketing/quantization.
  *
  * `partitions = 0` skips the repartition — the shuffle-evidence specs
  * measure shuffle bytes off the executed plan, and a repartition
  * exchange inside the corpus frame would pollute the metric; the
  * bench/curve callers fan out explicitly because their source is a
  * single `range` task otherwise.
  */
object SyntheticVectors {
  def df(spark: SparkSession, n: Long, dims: Int = 64, partitions: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ids = spark.range(n).toDF(idCol)
    val fanned = if (partitions > 0) ids.repartition(partitions) else ids
    fanned.select(col(idCol),
      transform(sequence(lit(0), lit(dims - 1)), j =>
        (pmod(xxhash64(col(idCol), j), lit(2000)).cast("double") / 1000.0d - 1.0d)
          .cast("float")).as(vecCol))
  }
}
