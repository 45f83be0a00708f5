package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured Streaming jobs for continuously-appended document/event
  * tables. The reference is batch-only (SURVEY.md §1.3) — its incremental
  * surface is `--resume` — so streaming here extends the engine for
  * append-style ingest: the same tile/window aggregations expressed over
  * `readStream`, with event-time watermarks bounding state.
  *
  * All transforms are shared with the batch path (same column exprs), so a
  * batch backfill and the streaming job produce identical rows — the
  * Dataset API's batch/streaming unification.
  */
object StreamJobs {

  /** Tumbling event-time window counts per event_type with a watermark —
    * the streaming twin of Queries.q13_time_window. Works on any streaming
    * DataFrame with (ts: timestamp, event_type: string, value: double). */
  def windowedCounts(events: DataFrame, window_ : String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")).as("sum_cents"))
      .select(unix_timestamp(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sum_cents"))

  /** Streaming tile-assignment: each arriving doc point is assigned its
    * (z, x, y) tiles — a narrow, stateless transform (no watermark needed).
    * Input: (doc_id, lon, lat). */
  def tileAssignments(points: DataFrame, minZ: Int, maxZ: Int): DataFrame =
    graft.engine.TileJob.assign(points, minZ, maxZ)

  /** File-source ingest of an append-only events directory → windowed
    * counts → parquet sink with checkpointing (exactly-once). */
  def runFileStream(spark: SparkSession, inDir: String, outDir: String,
                    checkpointDir: String, schemaFrom: String): StreamingQuery = {
    val schema = spark.read.parquet(schemaFrom).schema
    val in = spark.readStream.schema(schema).parquet(inDir)
    windowedCounts(in).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }
}
