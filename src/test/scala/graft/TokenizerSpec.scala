package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns

/** Tokenizer parity with the reference engine's `\b[a-z]+\b` word regex
  * (reference worker.py:6,13) and the two structural invariants the
  * reference's chunked scan relies on (coordinator.py:47-60): chunk
  * invariance at line boundaries and count preservation. */
class TokenizerSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def sparkTokens(text: String): Seq[String] =
    Seq(text).toDF("text")
      .select(Fns.tokens(col("text")).as("t"))
      .as[Seq[String]].head()

  private val jdkRe = java.util.regex.Pattern.compile("\\b[a-z]+\\b")
  private def jdkTokens(text: String): Seq[String] = {
    val m = jdkRe.matcher(text.toLowerCase)
    val out = Seq.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  test("Unicode/digit/underscore boundary golden (FIXTURES.md §A4: CPython parity)") {
    // CPython re on this input yields exactly [don, t]: \b is Unicode-aware,
    // so letter-runs adjacent to digits/underscore/accented letters are not
    // word-bounded. Verified against python3 in the survey session.
    assert(sparkTokens("café élan abc123 foo_bar don't x2") === Seq("don", "t"))
  }

  test("reference inline fixture: hello world hello python world (test_mapreduce.py:11)") {
    val counts = Seq("hello world hello python world").toDF("text")
      .select(explode(Fns.tokens(col("text"))).as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toMap
    assert(counts === Map("hello" -> 2L, "world" -> 2L, "python" -> 1L))
  }

  test("Spark regexp_extract_all matches JDK regex on edge fixtures") {
    val fixtures = Seq(
      "", " ", "a", "A B c", "x2 2x x-y a_b _a a_", "don't stop",
      "naïve café über", "tab\there\nnewline", "punct!?.,;:()[]{}",
      "MiXeD CaSe WoRdS", "123 456", "a1b2c3", "hello   world")
    for (f <- fixtures)
      assert(sparkTokens(f) === jdkTokens(f), s"mismatch on fixture: '$f'")
  }

  test("chunk invariance: splitting at any line boundary preserves tokens (O2 invariant)") {
    val rnd = new scala.util.Random(42)
    val words = Seq("the", "quick", "brown", "fox", "x2", "foo_bar", "don't", "a", "")
    for (_ <- 1 to 200) {
      val lines = Vector.fill(rnd.nextInt(8) + 1)(
        Vector.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" "))
      val full = lines.mkString("\n")
      val k = rnd.nextInt(lines.length + 1)
      val (a, b) = lines.splitAt(k)
      val whole = jdkTokens(full)
      val split = jdkTokens(a.mkString("\n")) ++ jdkTokens(b.mkString("\n"))
      assert(whole === split, s"chunk split changed tokens for: '$full' at $k")
    }
  }

  test("count preservation: sum of per-word counts equals total token count") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
    val totalTokens = docs.select(size(Fns.tokens(col("text"))).as("n"))
      .agg(sum("n")).as[Long].head()
    val sumCounts = operators.TextAnalytics.wordCounts(docs)
      .agg(sum("cnt")).as[Long].head()
    assert(totalTokens === sumCounts)
  }
}
