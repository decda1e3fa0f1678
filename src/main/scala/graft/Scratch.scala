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
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val brute = graft.operators.Similarity.bruteTopK(spark, d)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val lsh = graft.operators.Similarity.lshTopK(spark, d)
        .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"SCRATCH $d recall=${brute.count(lsh.contains).toDouble / brute.size} lshRows=${lsh.size}")
    }
    spark.stop()
  }
}
