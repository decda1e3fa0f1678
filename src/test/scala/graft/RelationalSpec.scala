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
}
