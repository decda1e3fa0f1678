package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns._
import graft.operators.TextAnalytics

/** The reference engine brands itself a *streaming* word counter — its
  * dispatch loop (coordinator.py:85-104) feeds chunks as the file is read.
  * This is that idea as an actual Structured Streaming query: a directory of
  * text files consumed as a stream (new files picked up per trigger), the
  * same tokenize → count pipeline as the batch/oracle path, counts
  * maintained incrementally in aggregation state.
  *
  * Scale posture: the aggregation state is one row per distinct word
  * (bounded by vocabulary, not stream length); file listing shards across
  * the cluster; complete-mode output is only sensible for report-sized
  * vocabularies — at 100 TB emit update mode into a keyed sink instead.
  */
object TextStreams {

  /** Continuous word count over a text-file directory (streaming twin of
    * Report.wordcountTextDir — identical pipeline, streaming source). */
  def wordCountStream(spark: SparkSession, dir: String): DataFrame =
    TextAnalytics.wordCountsText(spark.readStream.text(dir), "value")

  /** Documents schema (TESTDATA.md) for the streaming file source. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming source over a documents parquet path; `maxFilesPerTrigger`
    * is the same ingestion back-pressure knob as the event stream's. */
  def documentStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0): DataFrame = {
    val reader = spark.readStream.schema(documentsSchema)
    val withOpt =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      else reader
    withOpt.parquet(path)
  }

  /** Streaming exact-dedup twin of [[graft.operators.Dedup.exact]]: each
    * arriving document is fingerprinted with the engine's deterministic
    * polyHash and only a fingerprint's FIRST occurrence within the watermark
    * horizon passes — `dropDuplicatesWithinWatermark`, the streaming-state
    * form of the batch group-by-text survivor.
    *
    * Event time is synthesized from doc_id (documents carry no timestamp;
    * a real ingest pipeline would use arrival time). The watermark bounds
    * the dedup state: a fingerprint is remembered only `horizon` past its
    * event time, so state is O(docs per horizon window), not O(stream) —
    * the property that makes streaming dedup survive an unbounded crawl.
    * Batch semantics differ deliberately: batch keeps min-doc_id globally,
    * the stream keeps first-arrival per horizon — the SET of surviving
    * texts is identical when all dups arrive within one horizon
    * (StreamingSpec asserts exactly that). */
  def dedupStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 0, horizon: String = "1 hour"): DataFrame =
    documentStream(spark, path, maxFilesPerTrigger)
      .withColumn("fp", polyHash(col("text")))
      // +1 day: a row whose event time equals the INITIAL watermark (epoch 0)
      // would be discarded as late before the first batch even runs.
      .withColumn("event_ts", timestamp_micros(col("doc_id") + lit(86400000000L)))
      .withWatermark("event_ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"), col("text"))
}
