package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (forked test JVM, never stopped —
  * torn down with the JVM). Mirrors the Bench/Verify session config: UTC,
  * nanosAsLong for the events table, small fixed shuffle parallelism. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "target/test-scratch/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Smallest driver-generated corpus — correctness fixtures only. */
  val sf = "/root/testdata/sf0.001"
}
