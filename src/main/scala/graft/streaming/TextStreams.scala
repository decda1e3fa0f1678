package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
