package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns

/** The codegen'd string expressions must be value-identical to the
  * higher-order-function formulations they replaced (which are in turn
  * mirrored by the DuckDB oracle SQL). */
class FnsParitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("PolyHash32 equals the HOF rolling hash on the document corpus") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
    val mismatches = docs.select(
        Fns.polyHash(col("text")).as("fast"),
        Fns.polyHashHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches === 0L)
  }

  test("mix32: matches the JVM reference, stays bijective, spreads narrow bands") {
    def ref(x0: Long): Long = {
      var x = x0
      x = (((x >> 16) ^ x) * 0x45d9f3bL) & 0xFFFFFFFFL
      x = (((x >> 16) ^ x) * 0x45d9f3bL) & 0xFFFFFFFFL
      (x >> 16) ^ x
    }
    // The adversarial shape that motivated the mix: polyHash("strat:<id>")
    // values cluster in a narrow arithmetic band of the 32-bit space.
    val inputs = (0L until 4096L).map(i => 412974158L + i * 7L) ++ (0L until 256L)
    val got = inputs.toDF("x")
      .select(Fns.mix32(col("x"))).as[Long].collect().toSeq
    assert(got === inputs.map(ref))
    // Both xor-shift folds and odd-multiplies are 32-bit bijections, so the
    // composed mix must keep distinct inputs distinct.
    assert(got.distinct.length === got.length, "mix32 collided on distinct inputs")
    // The property the threshold pre-filter needs: a value cut at 1/8 of
    // the 32-bit space admits ~1/8 of even a narrow input band.
    val admitted = got.count(_ <= (1L << 29))
    assert(admitted > inputs.size / 16 && admitted < inputs.size / 4,
      s"narrow band not spread: $admitted of ${inputs.size} under the 1/8 cut")
  }

  test("PolyHash32 edge cases: empty string, single char, null") {
    val out = Seq(("", "a"), ("a", "")).toDF("s", "t")
      .select(Fns.polyHash(col("s"))).as[Long].collect()
    assert(out.contains(0L))       // empty → 0
    assert(out.contains(97L))      // "a" → 97
    val n = Seq((null: String, "x")).toDF("s", "t")
      .select(Fns.polyHash(col("s"))).head()
    assert(n.isNullAt(0))
  }

  test("PolyHash32 iterates codepoints: non-BMP parity with the HOF form") {
    // "a😀b": U+1F600 is a surrogate pair in UTF-16. The HOF form
    // (ascii(substr)) and the DuckDB twin both see one value per CHARACTER,
    // so the fast expression must hash the codepoint (128512), not the two
    // surrogate units.
    val df = Seq("a😀b", "😀", "αβγ").toDF("s")
    val bad = df.select(
        Fns.polyHash(col("s")).as("fast"),
        Fns.polyHashHof(col("s")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad === 0L)
    // And the raw JVM helper agrees with the expression path.
    val expect = (("a".codePointAt(0) * 31L + 128512L) * 31L + 'b'.toLong) & Fns.HashMask
    val got = df.filter(col("s") === "a😀b")
      .select(Fns.polyHash(col("s"))).as[Long].head()
    assert(got === expect)
    assert(org.apache.spark.sql.graft.PolyHash32.hash("a😀b") === expect)
  }

  test("WindowPolyHashes equals per-window PolyHash32 (rolling-update parity)") {
    // The rolling update h' = (h*31 - cp*31^w + cp') mod 2^32 must be
    // bit-identical to hashing each w-window from scratch — on corpus text,
    // on sub-window strings (empty array), and on non-BMP codepoints.
    val w = multimodal.Media.MediaWindow
    val docs = sources.Tables.documents(spark, TestSpark.sf)
      .select(col("text").as("t"), length(col("text")).as("n"))
      .union(Seq(("short", 5), ("a😀b😀c😀d😀e😀f😀g😀h😀i😀j😀k😀l", 23))
        .toDF("t", "n"))
    val perWindow = array_sort(array_distinct(
      when(col("n") >= w,
        transform(sequence(lit(1), (col("n") - (w - 1)).cast("int")),
          i => Fns.polyHash(col("t").substr(i, lit(w)))))
        .otherwise(array().cast("array<long>"))))
    val rolling = org.apache.spark.sql.graft.StringExprs.windowPolyHashes(col("t"), w)
    val bad = docs.select(rolling.as("fast"), perWindow.as("ref"))
      .filter(not(col("fast") <=> col("ref"))).count()
    assert(bad === 0L)
  }

  test("WinnowFingerprints equals the HOF gram-hash/slice/array_min chain") {
    // The native one-pass (gram hash fold + monotonic-deque sliding min)
    // must be set-identical to the HOF form the DuckDB oracle mirrors:
    // transform(wordNgrams(toks, 3), polyHash) → min per slice(…, w) →
    // distinct. Corpus rows plus the short-doc (< k, < k+w) edges.
    val w = operators.Dedup.WinnowW
    val docs = sources.Tables.documents(spark, TestSpark.sf)
      .select(col("text"))
      .union(Seq("", "one", "one two", "one two three",
        "one two three four five").toDF("text"))
      .select(Fns.tokens(col("text")).as("toks"))
    val hs = transform(Fns.wordNgrams(col("toks"), 3), g => Fns.polyHash(g))
    val ref = array_sort(array_distinct(
      when(size(hs) === 0, array().cast("array<long>"))
        .when(size(hs) <= w, array(array_min(hs)))
        .otherwise(transform(sequence(lit(1), size(hs) - lit(w) + lit(1)),
          i => array_min(slice(hs, i, lit(w)))))))
    val fast = org.apache.spark.sql.graft.StringExprs.winnowFps(col("toks"), 3, w)
    val bad = docs.select(fast.as("fast"), ref.as("ref"))
      .filter(not(col("fast") <=> col("ref"))).count()
    assert(bad === 0L)
  }

  test("CharNgrams equals the HOF substr-window formulation") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
      .select(lower(col("text")).as("t"))
      .union(Seq("ab", "", "a😀b😀c").toDF("t"))
    val hof = when(length(col("t")) >= 3,
      transform(sequence(lit(1), (length(col("t")) - lit(2)).cast("int")),
        i => col("t").substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    val fast = org.apache.spark.sql.graft.StringExprs.charNgrams(col("t"), 3)
    val bad = docs.select(fast.as("fast"), hof.as("ref"))
      .filter(not(col("fast") <=> col("ref"))).count()
    assert(bad === 0L)
  }

  test("SimHash expression equals the HOF formulation at 32 and 64 bits") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
    for (bits <- Seq(32, 64)) {
      val fast = graft.operators.Dedup.simhashFp(docs, bits)
        .withColumnRenamed("simhash", "fast")
      val ref = graft.operators.Dedup.simhashFpHof(docs, bits)
        .withColumnRenamed("simhash", "ref")
      val bad = fast.join(ref, "doc_id")
        .filter(col("fast") =!= col("ref")).count()
      assert(bad === 0L, s"SimHash($bits) diverges from the HOF reference")
    }
    // Edge cases: empty text (no tokens) → fingerprint 0; null text → null.
    val edge = Seq((1L, ""), (2L, "the the the")).toDF("doc_id", "text")
    val fps = graft.operators.Dedup.simhashFp(edge)
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === 0L)
    assert(fps(2L) !== 0L)
  }

  test("WordNgrams equals the HOF n-grams for n in 1..4 incl. short arrays") {
    val rnd = new scala.util.Random(11)
    val words = Seq("a", "bb", "ccc", "dddd", "x")
    val rows = Seq.fill(100)(Seq.fill(rnd.nextInt(6))(words(rnd.nextInt(words.length))))
    val df = rows.toDF("toks")
    for (n <- 1 to 4) {
      val bad = df.select(
          Fns.wordNgrams(col("toks"), n).as("fast"),
          Fns.wordNgramsHof(col("toks"), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(bad === 0L, s"ngram n=$n parity failed")
    }
  }

  test("WordNgrams on the corpus tokens equals the HOF form") {
    val docs = sources.Tables.documents(spark, TestSpark.sf)
    val bad = docs.select(Fns.tokens(col("text")).as("toks"))
      .select(
        Fns.wordNgrams(col("toks"), 3).as("fast"),
        Fns.wordNgramsHof(col("toks"), 3).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad === 0L)
  }
}
