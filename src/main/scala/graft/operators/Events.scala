package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Batch event-time analytics over the events table. These are the batch
  * expressions of the streaming windows; the Structured Streaming twins
  * (watermark + window / session_window over a stream) live in
  * [[graft.streaming.EventStreams]]. All bucketing here is integer arithmetic
  * on `ts_us` so the DuckDB oracle buckets identically.
  */
object Events {

  val HourUs: Long = 3600L * 1000000L
  val SessionGapUs: Long = 30L * 60L * 1000000L // 30 min

  /** Tumbling 1-hour event counts per type (batch analog of a streaming
    * tumbling window; keyed shuffle is (hour, type) — fully parallel). */
  def tumblingCounts(s: SparkSession, d: String): DataFrame =
    tumblingCountsDf(Tables.events(s, d))

  /** Same over any events DataFrame with a ts_us column. */
  def tumblingCountsDf(events: DataFrame): DataFrame =
    events
      .select(expr(s"ts_us div $HourUs").as("hour_idx"), col("event_type"))
      .groupBy("hour_idx", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("hour_idx", "event_type")

  /** 30-minute-gap sessionization: lag + conditional cumulative sum — the
    * classic batch sessionize. Two windows over the same (user_id; ts,
    * event_id) ordering → one shuffle + one sort, reused across both.
    * At 100 TB this partitions by user_id (high cardinality, no hot key);
    * the streaming twin with state cleanup is EventStreams.sessionize. */
  def sessionize(s: SparkSession, d: String): DataFrame =
    sessionizeDf(Tables.events(s, d))

  /** Same over any events DataFrame with (user_id, event_id, ts_us). */
  def sessionizeDf(events: DataFrame): DataFrame = {
    val order = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("new_s",
        when(col("ts_us") - lag("ts_us", 1).over(order) > SessionGapUs, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_id", sum("new_s").over(run))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts_us").as("start_us"),
        max("ts_us").as("end_us"))
      .orderBy("user_id", "session_id")
  }
}
