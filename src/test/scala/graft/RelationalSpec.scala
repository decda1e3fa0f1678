package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, TextAnalytics}
import graft.sources.Tables

/** Equality/tolerance gates for the scale recipes: salting must not change
  * results, and the HLL sketch must stay near the exact distinct count. */
class RelationalSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("unpivot is the pivot's exact long form, zero cells included") {
    val wide = Relational.pivotStatus(spark, TestSpark.sf).collect()
    val long = Relational.unpivotStatus(spark, TestSpark.sf)
      .as[(String, String, Long)].collect().toSeq
    // Shape: every priority × status cell exists exactly once.
    assert(long.length === wide.length * Relational.OrderStatuses.length)
    assert(long.map(r => (r._1, r._2)).distinct.length === long.length)
    // Value round-trip: each long row equals its wide cell (including the
    // coalesced zeros a direct groupBy would drop).
    val cells = wide.flatMap { r =>
      Relational.OrderStatuses.map(st =>
        (r.getAs[String]("o_orderpriority"), st) -> r.getAs[Long](st))
    }.toMap
    assert(long.forall { case (p, st, n) => cells((p, st)) == n })
    // Totals conserved: the melt moves cells, never counts.
    val total = Tables.orders(spark, TestSpark.sf).count()
    assert(long.map(_._3).sum === total)
  }

  test("window distribution: fractions bounded, positional values consistent") {
    val rows = graft.operators.Relational.windowDistribution(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4 >= 0 && r._4 <= 10000), "percent_rank out of [0,1]")
    assert(rows.forall(r => r._5 > 0 && r._5 <= 10000), "cume_dist out of (0,1]")
    for ((cust, rs) <- rows.groupBy(_._1)) {
      val best = rs.map(_._3).max
      assert(rs.forall(_._6 === best), s"customer $cust: best_c is not the max total")
      // The running frame: exactly the top-ranked row (and only it) has a
      // NULL second_c; everyone else sees the partition's second value.
      val byRank = rs.sortBy(r => (-r._3, r._2))
      assert(byRank.head._7.isEmpty, s"customer $cust: rank-1 row has a second_c")
      if (rs.length > 1) {
        val second = byRank(1)._3
        assert(byRank.tail.forall(_._7.contains(second)),
          s"customer $cust: second_c is not the second-ranked total")
      }
      // cume_dist of the last row is exactly 1.
      assert(byRank.last._5 === 10000L)
    }
  }

  test("salted join equals the plain join") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey").as("k"), col("o_custkey"), col("o_totalprice"))
    val line = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey").as("k"), col("l_linenumber"), col("l_quantity"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("o_custkey"), col("l_linenumber"))
        .as[(Long, Long, Int)].collect().sorted.toSeq
    val plain = canon(line.join(orders, "k"))
    val salted = canon(Relational.saltedJoin(line, orders, "k", salts = 8))
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salted join: a pathological hot key fans out across shuffle partitions") {
    // Planted skew: 50,000 probe rows, 90% on one key. The claim salting
    // makes is about SHUFFLE PLACEMENT: a plain equi-join hashes every hot
    // row to ONE reducer (the straggler task that defines the stage's wall
    // clock at 100 TB), while (key, salt) spreads them across ~`salts`
    // reducers. The `hash()` function IS the Murmur3 hash shuffle
    // HashPartitioning uses, so computing pmod(hash(keys...), parts) below
    // reproduces the exchange's actual partition assignment — deterministic
    // evidence, immune to this VM's timing noise.
    val parts = 32
    val salts = 8
    val hot = 42L
    val skewed = spark.range(50000)
      .select(when(col("id") % 10 =!= 0, lit(hot)).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    // Plain join: every hot row lands in one partition.
    val plainBuckets = skewed
      .select(pmod(hash(col("k")), lit(parts)).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(plainBuckets.values.max >= 45000L,
      "planted skew must concentrate in one shuffle bucket unsalted")
    // Salted: the same hot rows spread over the salt's buckets.
    val salted = skewed.withColumn("__salt",
      pmod(hash(skewed.columns.map(col): _*), lit(salts)))
    val saltedBuckets = salted
      .filter(col("k") === hot)
      .select(pmod(hash(col("k"), col("__salt")), lit(parts)).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(saltedBuckets.size >= salts / 2,
      s"hot key should span ~$salts buckets, got ${saltedBuckets.size}")
    assert(saltedBuckets.values.max <= 45000L / 3,
      s"largest salted bucket ${saltedBuckets.values.max} is still a straggler")
    // And the salted join still returns exactly the plain-join rows.
    val build = Seq((hot, "dim_hot"), (1L, "dim_1")).toDF("k", "name")
    val plainRows = skewed.join(build, "k").count()
    val saltedRows = Relational.saltedJoin(skewed, build, "k", salts).count()
    assert(saltedRows === plainRows)
  }

  test("approx distinct words within 10% of exact per language") {
    val exact = TextAnalytics.distinctWords(spark, TestSpark.sf)
      .as[(String, Long)].collect().toMap
    val approx = TextAnalytics.distinctWordsApprox(spark, TestSpark.sf)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    for ((lang, ex) <- exact) {
      val ap = approx(lang)
      assert(math.abs(ap - ex).toDouble / ex <= 0.10,
        s"lang=$lang approx=$ap exact=$ex")
    }
  }

  test("approx quantiles within 2% of the exact percentile per group") {
    val exact = Relational.aggQuantiles(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Relational.aggQuantilesApprox(spark, TestSpark.sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(approx.keySet === exact.keySet)
    for ((g, (_, cnt, p50, p90, p99)) <- exact) {
      val (_, cntA, a50, a90, a99) = approx(g)
      assert(cntA === cnt)
      for (((ex, ap), q) <- Seq((p50, a50), (p90, a90), (p99, a99)).zip(Seq("p50", "p90", "p99")))
        assert(math.abs(ap - ex).toDouble / ex <= 0.02,
          s"group=$g $q approx=$ap exact=$ex")
    }
  }
}
