package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns

/** The codegen'd DotProductDouble must be value-identical to the HOF
  * `aggregate(zip_with(...))` formulation it replaced — including the NULL
  * semantics on length mismatch and null elements. */
class VectorExprsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** The original HOF dot product (kept here as the reference semantics). */
  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("bit-identical to the HOF form on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300) {
      val n = rnd.nextInt(65) + 1
      (Array.fill(n)(rnd.nextDouble() * 2 - 1).toSeq,
       Array.fill(n)(rnd.nextDouble() * 2 - 1).toSeq)
    }
    val df = rows.toDF("a", "b")
    val diff = df.select(
        (Fns.dotD(col("a"), col("b")) - hofDot(col("a"), col("b"))).as("d"))
      .agg(sum(abs(col("d")))).as[Double].head()
    // exact: same float op sequence, not approximately equal
    assert(diff === 0.0)
  }

  test("length mismatch returns NULL (HOF zip_with null-pad semantics)") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val out = df.select(Fns.dotD(col("a"), col("b")).as("d"),
      hofDot(col("a"), col("b")).as("h")).head()
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("null element returns NULL") {
    val df = Seq((Seq[java.lang.Double](1.0, null, 3.0), Seq[java.lang.Double](1.0, 2.0, 3.0)))
      .toDF("a", "b")
    val out = df.select(Fns.dotD(col("a"), col("b")).as("d")).head()
    assert(out.isNullAt(0))
  }

  test("null input array returns NULL") {
    val df = Seq((null: Seq[Double], Seq(1.0, 2.0))).toDF("a", "b")
    assert(df.select(Fns.dotD(col("a"), col("b"))).head().isNullAt(0))
  }

  test("interpreted path (codegen disabled) agrees with codegen path") {
    val rows = Seq((Seq(0.5, -1.5, 2.0), Seq(1.0, 2.0, -0.25)))
    val expected = 0.5 * 1.0 + -1.5 * 2.0 + 2.0 * -0.25
    def run(): Double =
      rows.toDF("a", "b").select(Fns.dotD(col("a"), col("b"))).as[Double].head()
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(withCodegen === expected && interpreted === expected)
  }
}
