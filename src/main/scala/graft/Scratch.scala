package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch runner (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("dedup_ngram_jaccard", "dedup_minhash", "dedup_embedding", "dedup_embedding_lsh", "sim_lsh_topk")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, d).count()
      println(f"SCRATCH $name rows=$n%d ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
