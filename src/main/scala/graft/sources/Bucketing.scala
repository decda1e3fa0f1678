package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing: the co-located-join story from SCALE.md as code.
  *
  * Writing two fact tables bucketed (and sorted) by their join key lets
  * Spark plan the join with NO shuffle exchange on either side — each
  * bucket pair joins locally. At 100 TB this converts the dominant
  * fact⋈fact shuffle (terabytes over the network per query) into a
  * one-time layout cost at write time, amortized across every subsequent
  * join on that key. BucketingSpec asserts the shuffle-free plan and
  * result equality with the plain join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table (bucketBy
    * requires the table catalog — a path-only write cannot carry bucket
    * metadata). */
  def writeBucketed(df: DataFrame, name: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)

  def read(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
