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

  test("the trained ANN index served from a cell-bucketed table probes without a shuffle") {
    // The serving posture the VectorStreams/SCALE docs claim: the IVF-PQ
    // index persists bucketed by cell_id, so the per-query candidate
    // lookup (probe cells → index rows) co-locates WITHOUT re-shuffling
    // the index — the property that lets a billion-vector index serve
    // queries while only the probe side moves.
    val index = graft.operators.Similarity
      .ivfPqTrainedCodes(spark, TestSpark.sf)
    Bucketing.writeBucketed(index, "b_ivfpq_index", "cell_id", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val served = Bucketing.read(spark, "b_ivfpq_index")
      // probes: a query fanning to 4 cells — repartition to the INDEX's
      // bucketing would be the scale bug this test forbids
      val probes = Seq((0L, 0L), (0L, 3L), (0L, 7L), (0L, 11L))
        .toDF("qid", "cell_id")
      val cand = served.join(probes, "cell_id")
      cand.count()
      val plan = cand.queryExecution.executedPlan.toString
      // the INDEX side reads its buckets (no exchange above the scan);
      // the one exchange in the plan belongs to the tiny probe side —
      // "only the probe side moves"
      assert(plan.contains("Bucketed: true"),
        s"index scan ignored its bucketing:\n${plan.take(2000)}")
      val exchanges =
        "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1,
        s"the bucketed index side re-shuffled on probe ($exchanges exchanges):\n${plan.take(2000)}")
      // the candidates equal the unbucketed join's
      val viaBuckets = cand.select("qid", "vec_id")
        .as[(Long, Long)].collect().sorted.toSeq
      val plain = index.join(probes, "cell_id").select("qid", "vec_id")
        .as[(Long, Long)].collect().sorted.toSeq
      assert(viaBuckets === plain)
      assert(plain.nonEmpty, "no candidates in probed cells — vacuous")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_ivfpq_index")
    }
  }
}
