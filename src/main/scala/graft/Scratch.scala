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
    for (name <- Seq("scan_filter_project", "join_multiway", "wordcount_topk", "sim_topk")) {
      println(s"\n===== PLAN $name =====")
      val df = SparkEntry.queries(name)(spark, d)
      df.count() // let AQE finalize
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
