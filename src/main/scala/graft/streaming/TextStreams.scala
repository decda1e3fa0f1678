package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Fns._
import graft.operators.{Dedup, TextAnalytics}

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

  /** Streaming NEAR-dup twin of [[Dedup.simhashPairs]]: arriving documents
    * are SimHash-fingerprinted, exploded into the same 16-bit prefix bands,
    * and matched against per-bucket state via `flatMapGroupsWithState` —
    * each (band, bits) bucket remembers the (doc_id, fingerprint) pairs it
    * has seen and Hamming-verifies every newcomer against them. The
    * pigeonhole property carries over: a pair within Hamming ≤ maxHamming
    * agrees exactly on ≥ 1 band, so bucket-local matching finds every
    * qualifying pair as it arrives.
    *
    * Exactly-once emission WITHOUT cross-bucket state: a pair agreeing on
    * several bands would be discovered in each of them, so a match is
    * emitted only from its FIRST agreeing band — a pure function of the two
    * fingerprints, hence the same single bucket decides regardless of
    * arrival order or batch boundaries.
    *
    * Scale posture: state is per-bucket doc lists — bounded by band-bucket
    * occupancy (65,536 buckets/band at 64-bit), the same quantity that
    * bounds the batch band join's fan-out; on an unbounded crawl, evict by
    * event time (GroupStateTimeout.EventTimeTimeout) to cap state at the
    * dedup horizon, exactly like the exact-dedup twin's watermark. Rows
    * inside a micro-batch are processed in doc_id order so within-batch
    * discovery is deterministic. */
  def nearDupStream(spark: SparkSession, path: String, maxHamming: Int = 3,
      maxFilesPerTrigger: Int = 0): Dataset[NearDupPair] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(maxHamming < Dedup.SimBands, "pigeonhole needs maxHamming < SimBands")
    val bandStructs = array((0 until Dedup.SimBands).map { b =>
      struct(
        lit(b.toLong).as("band_idx"),
        shiftright(col("fp"), b * Dedup.SimBandBits)
          .bitwiseAND(lit((1L << Dedup.SimBandBits) - 1)).as("band_bits"))
    }: _*)
    val bands = documentStream(spark, path, maxFilesPerTrigger)
      .select(col("doc_id"),
        org.apache.spark.sql.graft.StringExprs
          .simhash(tokens(col("text")), Dedup.SimBits).as("fp"))
      .select(col("doc_id"), col("fp"), explode(bandStructs).as("bb"))
      .select(col("doc_id"), col("fp"),
        col("bb.band_idx").as("band_idx"), col("bb.band_bits").as("band_bits"))
      .as[(Long, Long, Long, Long)]
    def firstAgreeingBand(a: Long, b: Long): Long = {
      val mask = (1L << Dedup.SimBandBits) - 1
      (0 until Dedup.SimBands).indexWhere { i =>
        ((a >> (i * Dedup.SimBandBits)) & mask) == ((b >> (i * Dedup.SimBandBits)) & mask)
      }.toLong
    }
    bands
      .groupByKey { case (_, _, bandIdx, bandBits) => (bandIdx, bandBits) }
      .flatMapGroupsWithState[Seq[(Long, Long)], NearDupPair](
          OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case ((bandIdx, _), rows, state: GroupState[Seq[(Long, Long)]]) =>
          var seen = state.getOption.getOrElse(Seq.empty)
          val out = Seq.newBuilder[NearDupPair]
          for ((docId, fp, _, _) <- rows.toSeq.sortBy(_._1)) {
            for ((id2, fp2) <- seen) {
              val h = java.lang.Long.bitCount(fp ^ fp2)
              if (h <= maxHamming && firstAgreeingBand(fp, fp2) == bandIdx)
                out += NearDupPair(math.min(docId, id2), math.max(docId, id2), h.toLong)
            }
            seen = (docId, fp) +: seen // prepend: O(1) on List; order is irrelevant
          }
          state.update(seen)
          out.result().iterator
      }
  }
}

/** Output row of [[TextStreams.nearDupStream]]. */
case class NearDupPair(d1: Long, d2: Long, hamming: Long)
