package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Bucketing, Tables}

/** Co-located join via bucketing: same-bucketed tables must join with no
  * shuffle exchange, and the result must equal the plain join. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("join of two tables bucketed on the key plans without a shuffle") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val line = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_linenumber"))
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(line.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", "o_orderkey", 4)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = Bucketing.read(spark, "b_orders")
        .join(Bucketing.read(spark, "b_lineitem"), "o_orderkey")
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(2000)}")

      val viaBuckets = joined.select("o_orderkey", "l_linenumber")
        .as[(Long, Int)].collect().sorted.toSeq
      val plain = orders.join(
          line.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .select("o_orderkey", "l_linenumber")
        .as[(Long, Int)].collect().sorted.toSeq
      assert(viaBuckets === plain)
      assert(plain.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
