package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Fns._

/** Dev scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("tokenize-only") {
      docs.select(size(tokens(col("text"))).as("n")).agg(sum("n")).head().getLong(0)
    }
    time("ngrams-explode") {
      docs.select(col("doc_id"), explode(wordNgrams(tokens(col("text")), 3)).as("sh")).count()
    }
    val sh = graft.operators.Dedup.shingles(docs)
    time("shingles-distinct") { sh.count() }
    time("grouped") {
      sh.groupBy("sh").agg(sort_array(collect_list(col("doc_id"))).as("ids")).count()
    }
    time("full-query") { graft.operators.Dedup.ngramJaccardPairsDf(docs).count() }
  }
}
