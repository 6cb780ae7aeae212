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
}
