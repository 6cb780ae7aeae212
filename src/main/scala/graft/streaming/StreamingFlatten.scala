package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{FlattenOptions, LinkMode}
import graft.plan.FlattenPlanner
import graft.sinks.Sinks

/** Streaming ingest (SURVEY.md §2.10).
  *
  * The reference is streaming-ingest/batch-output (bounded-channel pipeline,
  * `/root/reference/src/lib.rs:237`). The Spark-native generalization is
  * Structured Streaming: because [[FlattenPlanner]] is a pure function of
  * (schema, options), it runs unchanged inside `foreachBatch` — each
  * micro-batch is flattened to the same table forest and appended.
  *
  * Root links use [[LinkMode.Monotonic]] prefixed with the batch id
  * (`<batchId>.<id>`) — globally unique without any cross-batch
  * coordination, exactly like the reference's per-thread id_prefix trick
  * (`src/lib.rs:248`).
  */
object StreamingFlatten {

  /** Start a streaming flatten: NDJSON files arriving in `inputDir` →
    * parquet table directories under `outDir`.
    */
  def start(spark: SparkSession, inputDir: String, outDir: String,
      schema: org.apache.spark.sql.types.StructType,
      opts: FlattenOptions = FlattenOptions(),
      checkpoint: Option[String] = None): StreamingQuery = {
    val stream = spark.readStream.schema(schema).json(inputDir)
    stream.writeStream
      .option("checkpointLocation", checkpoint.getOrElse(s"$outDir/_checkpoint"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val batchOpts = opts.copy(
          linkMode = LinkMode.Monotonic,
          idPrefix = s"$batchId.${opts.idPrefix}")
        FlattenPlanner.flatten(batch, batchOpts).foreach { case (name, df) =>
          df.write.mode("append").parquet(s"$outDir/$name")
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Event-time windowed aggregation with watermark — the standard
    * streaming analytics shape over an events stream.
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
}
