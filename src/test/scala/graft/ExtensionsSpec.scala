package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook must make the graft expressions callable
  * from spark.sql(...) strings with the same semantics as the Column API. */
class ExtensionsSpec extends AnyFunSuite {

  private def withExtendedSession[A](f: SparkSession => A): A = {
    val base = TestSpark.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // `spark.sql.extensions` is a static conf read at SparkContext creation;
    // the shared test context predates it, so attach programmatically —
    // GraftExtensions IS a SparkSessionExtensions => Unit.
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("poly_hash32 / word_ngrams / dot_product_double resolve in SQL") {
    withExtendedSession { s =>
      assert(s.sql("SELECT poly_hash32('a')").head().getLong(0) === 97L)
      assert(s.sql("SELECT poly_hash32('')").head().getLong(0) === 0L)
      assert(s.sql("SELECT word_ngrams(array('a','b','c'), 2)")
        .head().getSeq[String](0) === Seq("a b", "b c"))
      assert(s.sql("SELECT dot_product_double(array(1.0d,2.0d), array(3.0d,4.0d))")
        .head().getDouble(0) === 11.0)
      // NULL semantics survive the SQL path
      assert(s.sql("SELECT dot_product_double(array(1.0d), array(1.0d,2.0d))")
        .head().isNullAt(0))
      // simhash64: empty array → 0; same value as the Column API path.
      assert(s.sql("SELECT simhash64(CAST(array() AS ARRAY<STRING>))")
        .head().getLong(0) === 0L)
      val viaSql = s.sql("SELECT simhash64(array('the','fox'))").head().getLong(0)
      import s.implicits._
      val viaCol = Seq(Seq("the", "fox")).toDF("toks")
        .select(org.apache.spark.sql.graft.StringExprs.simhash(
          org.apache.spark.sql.functions.col("toks"), 64))
        .head().getLong(0)
      assert(viaSql === viaCol)
    }
  }

  test("SQL path agrees with the Column API on corpus text") {
    withExtendedSession { s =>
      val viaSql = s.sql(
        s"""SELECT sum(poly_hash32(text)) FROM parquet.`${TestSpark.sf}/documents.parquet`""")
        .head().getLong(0)
      val viaCol = sources.Tables.documents(s, TestSpark.sf)
        .select(graft.functions.Fns.polyHash(org.apache.spark.sql.functions.col("text")).as("h"))
        .agg(org.apache.spark.sql.functions.sum("h")).head().getLong(0)
      assert(viaSql === viaCol)
    }
  }
}
