package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DataQuality

/** Planted-violation checks for the data-quality family: the profiler must
  * count what is actually there, the expectation battery must PASS on the
  * shipped corpus (and count, not just flag), and the correlation moments
  * must reproduce hand-derivable fixed points. */
class DataQualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("profile: nulls, distincts and string-cast bounds on a planted frame") {
    val df = Seq(
      (1L, Option("a")), (2L, None), (3L, Option("b")), (4L, Option("a"))
    ).toDF("id", "s")
    val got = DataQuality.profileDf(df, Seq("id", "s"))
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got === Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b")))
  }

  test("expectations: the shipped corpus passes every check with zero violations") {
    val got = DataQuality.expectations(spark, TestSpark.sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(_._1) === got.map(_._1).sorted)
    assert(got.length === 7)
    assert(got.forall(r => r._2 === 0L && r._3 === 1L),
      s"corpus unexpectedly fails: ${got.filter(_._3 == 0L).mkString(", ")}")
  }

  test("correlation: exact ±1 on planted linear data, 0 on constants") {
    val pairs = (
      (1L to 10L).map(i => ("lin", i * 100, i * 200 + 500)) ++   // y = 2x+5 → +1
      (1L to 10L).map(i => ("neg", i * 100, 5000 - i * 300)) ++  // y = -3x+c → −1
      (1L to 10L).map(i => ("flat", i * 100, 700L))              // zero y-variance
    ).toDF("l_returnflag", "x", "y")
    val got = DataQuality.correlationDf(pairs)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("flat", 10L, 0L), ("lin", 10L, 10000L), ("neg", 10L, -10000L)))
  }

  test("correlation: decimal overflow fails loudly, like the HUGEINT oracle") {
    // Values near Long.MaxValue push Σx² past Decimal(38,0)'s 1e38
    // capacity. Under Spark 4's default ANSI mode the sum itself raises
    // ARITHMETIC_OVERFLOW; in a non-ANSI session the sum nulls silently
    // and the operator's raise_error guard fires instead. Either way the
    // query FAILS — never a silent null where the HUGEINT oracle raises.
    val big = 9000000000000000000L // 9e18; Σx² over two rows = 1.62e38
    val pairs = Seq(("of", big, 1L), ("of", big, 2L))
      .toDF("l_returnflag", "x", "y")
    val e = intercept[Exception] {
      DataQuality.correlationDf(pairs).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("overflowed Decimal(38,0)") ||
        m.contains("ARITHMETIC_OVERFLOW")),
      s"expected a loud overflow failure, got: ${e.getMessage}")
  }

  test("correlation: the synthetic corpus's quantity/price are near-independent") {
    val got = DataQuality.correlation(spark, TestSpark.sf)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall(r => math.abs(r._3) < 1500),
      s"synthetic qty/price should be ~uncorrelated: ${got.mkString(", ")}")
  }
}
