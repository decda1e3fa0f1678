/* Declared inside org.apache.spark.sql so the Column <-> Expression bridge
 * (ExpressionUtils, private[sql] in Spark 4.x) is accessible. Everything used
 * here is public Apache Spark source; no proprietary APIs. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit polynomial rolling hash `h = (h*31 + codepoint) & 0xffffffff` over
  * a string — the deterministic, engine-portable document fingerprint
  * (identical integers in the DuckDB oracle's list_reduce twin; SURVEY §5).
  *
  * Iterates CODEPOINTS, not UTF-16 units: the HOF reference formulation
  * (`ascii(substr(s, i, 1))`) and the DuckDB twin both see one value per
  * character, so supplementary-plane text (outside the ASCII corpus
  * contract, but reachable through the library API) hashes identically on
  * all three paths. FnsParitySpec pins a non-BMP fixture.
  *
  * Replaces the `aggregate(transform(sequence(...)))` higher-order chain,
  * which interprets three lambdas and materializes two arrays per row; this
  * is a single generated loop over the string's codepoints.
  */
case class PolyHash32(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash32"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash32.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final String $s = $x.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int ${i}cp = $s.codePointAt($i);
         |  $h = ($h * 31L + ${i}cp) & 0xffffffffL;
         |  $i += Character.charCount(${i}cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash32 =
    copy(child = newChild)
}

object PolyHash32 {
  def hash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31L + cp) & 0xffffffffL
      i += Character.charCount(cp)
    }
    h
  }
}

/** 57-bit polynomial rolling hash `h = (h*base + codepoint) & (2^57-1)` —
  * the WIDE fingerprint for collision-sensitive keys (exact-substring dedup
  * counts windows by fingerprint, so a collision manufactures a false
  * duplicate; at 10^13 windows the 32-bit space guarantees them).
  *
  * Why 57 and not 64: the DuckDB oracle reproduces the hash with
  * overflow-CHECKED BIGINT arithmetic, so the pre-mask product must stay
  * under 2^63 — (2^57-1)*base + cp < 2^63 holds for every base ≤ 63. Two
  * instances with coprime bases (31, 37) give a 114-bit combined key;
  * bases must differ because for equal-length inputs any single-base
  * polynomial hash is affine in the input, so salting the STRING cannot
  * break a collision — changing the base does (DedupSpec pins a planted
  * 32-bit collision that the pair separates).
  */
case class PolyHash57(child: Expression, base: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(base >= 2 && base <= 63, "base must be in [2, 63] to keep the " +
    "pre-mask product inside checked int64 range")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = s"poly_hash57_$base"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash57.hash(input.asInstanceOf[UTF8String].toString, base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final String $s = $x.toString();
         |long $h = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  final int ${i}cp = $s.codePointAt($i);
         |  $h = ($h * ${base}L + ${i}cp) & ${PolyHash57.Mask}L;
         |  $i += Character.charCount(${i}cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash57 =
    copy(child = newChild)
}

object PolyHash57 {
  val Mask: Long = (1L << 57) - 1

  def hash(s: String, base: Int): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * base + cp) & Mask
      i += Character.charCount(cp)
    }
    h
  }
}

/** Word n-grams over a token array: element i of the output is tokens
  * [i, i+n) joined with a single space (UTF8String.concatWs — null tokens
  * skipped, exactly like the SQL concat_ws the HOF formulation used); fewer
  * than n tokens yields an empty array.
  *
  * Replaces `transform(sequence(...), i -> concat_ws(...element_at...))`,
  * which pays an interpreted lambda + n element_at lookups per output gram.
  * Array construction can't profit from expression codegen, so this uses
  * CodegenFallback — the win is the direct ArrayData loop, not the codegen.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"word_${n}grams"

  private val space = UTF8String.fromString(" ")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

/** The 114-bit fingerprint pair + character length of every word n-gram of
  * a token array, WITHOUT materializing the gram strings: element i is
  * struct(h1, h2, len) where h1/h2 are [[PolyHash57]] (bases 31/37) of
  * tokens [i, i+n) joined with single spaces and len is that joined
  * string's codepoint count. Value-identical to
  * `polyHash57(wordNgrams(toks, n), base)` + `length(...)` — the fold is
  * linear, so H(x ⧺ " " ⧺ y) = ((H(x)·B + 32)·B^len(y) + H(y)) mod 2^57,
  * and (a·b) mod 2^57 survives Java's wrapping 64-bit multiply because
  * 2^57 divides 2^64 — but skips the per-gram UTF8String concat entirely:
  * per-token hashes/powers are computed once per row, each window then
  * costs n modular multiply-adds. Fewer than n tokens yields an empty
  * array. CodegenFallback for the same reason as WordNgrams: the win is
  * the allocation-free loop, not expression codegen.
  */
case class NgramFp57(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override val dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("len", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = s"ngram_fp57_$n"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val mask = PolyHash57.Mask
    // Per-token: the two base folds, the two base powers B^charlen, and
    // the codepoint count — one pass over each token's characters.
    val h1 = new Array[Long](m); val h2 = new Array[Long](m)
    val p1 = new Array[Long](m); val p2 = new Array[Long](m)
    val ln = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = if (toks.isNullAt(i)) "" else toks.getUTF8String(i).toString
      var a = 0L; var b = 0L; var q1 = 1L; var q2 = 1L; var cl = 0L
      var k = 0
      while (k < s.length) {
        val cp = s.codePointAt(k)
        a = (a * 31L + cp) & mask
        b = (b * 37L + cp) & mask
        q1 = (q1 * 31L) & mask
        q2 = (q2 * 37L) & mask
        cl += 1
        k += Character.charCount(cp)
      }
      h1(i) = a; h2(i) = b; p1(i) = q1; p2(i) = q2; ln(i) = cl
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      var a = h1(i); var b = h2(i); var len = ln(i)
      var j = i + 1
      while (j < i + n) {
        a = (((a * 31L + 32L) & mask) * p1(j) + h1(j)) & mask
        b = (((b * 37L + 32L) & mask) * p2(j) + h2(j)) & mask
        len += 1L + ln(j)
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](a, b, len))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramFp57 =
    copy(child = newChild)
}

/** Repetition statistics of one document's item-fingerprint array — the
  * per-(doc, unit) aggregate of the Gopher repetition battery computed
  * LOCALLY, so the whole battery stays a per-row map instead of exploding
  * 11 unit kinds into a corpus-sized shuffle. Input: array<struct<h1, h2,
  * len>> ([[NgramFp57]] output, or line/paragraph fingerprints built with
  * [[PolyHash57]]); output: struct(n, nd, tot, dupchars, topmass) where
  * n = items, nd = distinct items, tot = Σ count·len, dupchars = the same
  * sum over items with count > 1, and topmass = count·len of the most
  * frequent item, ties broken by (h1, h2) ascending — the same
  * deterministic pick as `min(struct(-c, h1, h2))` in the distributed
  * formulation, which the DuckDB oracle mirrors with
  * `row_number() OVER (ORDER BY c DESC, h1, h2)`.
  *
  * One index sort by (h1, h2) + one run-length walk; equal fingerprints
  * imply equal len, so runs carry their length. CodegenFallback — the win
  * is the local O(k log k) pass replacing a corpus-wide aggregate.
  */
case class RepStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("len", LongType, nullable = false)))))
  override val dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("nd", LongType, nullable = false),
    StructField("tot", LongType, nullable = false),
    StructField("dupchars", LongType, nullable = false),
    StructField("topmass", LongType, nullable = false)))
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val h1 = new Array[Long](m); val h2 = new Array[Long](m)
    val ln = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = arr.getStruct(i, 3)
      h1(i) = row.getLong(0); h2(i) = row.getLong(1); ln(i) = row.getLong(2)
      i += 1
    }
    val idx = Array.tabulate[Integer](m)(identity)
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) => {
      val c1 = java.lang.Long.compare(h1(a), h1(b))
      if (c1 != 0) c1 else java.lang.Long.compare(h2(a), h2(b))
    })
    var n = 0L; var nd = 0L; var tot = 0L; var dup = 0L
    var bestC = 0L; var bestMass = 0L
    var s = 0
    while (s < m) {
      var e = s + 1
      while (e < m && h1(idx(e)) == h1(idx(s)) && h2(idx(e)) == h2(idx(s))) e += 1
      val c = (e - s).toLong
      val l = ln(idx(s))
      n += c; nd += 1L; tot += c * l
      if (c > 1L) dup += c * l
      // runs walk in (h1, h2) ascending order, so strict > keeps the
      // smallest-fingerprint run among count ties
      if (c > bestC) { bestC = c; bestMass = c * l }
      s = e
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, nd, tot, dup, bestMass))
  }

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** SimHash fingerprint over a token array, computed in one tight loop:
  * bit j of the result is the sign of Σ_tokens (bit j of the token's hash
  * set ? +1 : -1), where bits 0-31 come from PolyHash32(token) and bits
  * 32-63 from the independent salted PolyHash32("s2#" + token) — the same
  * construction as the reference HOF formulation in Dedup.simhashFpHof and
  * the DuckDB oracle twin (FnsParitySpec pins all three equal).
  *
  * Replaces a transform + aggregate + zip_with chain that interpreted three
  * lambdas and materialized a 64-element array per TOKEN; this walks the
  * tokens once with a 64-int accumulator per ROW. Array-typed accumulation
  * doesn't profit from expression codegen (same rationale as WordNgrams),
  * so CodegenFallback — the win is the direct loop.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(bits == 32 || bits == 64, "fingerprint width must be 32 or 64")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = s"simhash$bits"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val acc = new Array[Int](bits)
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i)) {
        val s = toks.getUTF8String(i).toString
        val ha = PolyHash32.hash(s)
        var j = 0
        while (j < 32 && j < bits) {
          acc(j) += (if (((ha >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        if (bits == 64) {
          val hb = PolyHash32.hash("s2#" + s)
          j = 0
          while (j < 32) {
            acc(32 + j) += (if (((hb >> j) & 1L) == 1L) 1 else -1)
            j += 1
          }
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (acc(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Distinct 32-bit polynomial hashes of every `w`-codepoint sliding window
  * of a string, in ONE pass: the hash of window i+1 derives from window i by
  * the standard rolling update `h' = (h*31 - cp_i*31^w + cp_{i+w}) mod 2^32`
  * (all ops congruent mod 2^32, so each window's value is bit-identical to
  * PolyHash32 of the window substring — and to the DuckDB oracle's
  * list_reduce over substr windows). Fewer than w codepoints yields an
  * empty array; the caller supplies the short-payload fallback.
  *
  * Replaces `transform(sequence(1, n-w+1), i -> polyHash(substr(t,i,w)))` +
  * `array_distinct`, which allocates a substring copy per window and redoes
  * w multiply-adds per window — O(n·w) time and O(n) allocations. This is
  * O(n) time, zero per-window allocation, with dedup via sort+unique on a
  * primitive long[] (order is irrelevant: callers explode then aggregate).
  * Array-typed output doesn't profit from expression codegen (same
  * rationale as WordNgrams), so CodegenFallback — the win is the loop.
  */
case class WindowPolyHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(w >= 1, "window width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"window_poly_hashes_$w"

  // 31^w mod 2^32 — the coefficient of the outgoing codepoint.
  private val powW: Long = {
    var p = 1L
    var i = 0
    while (i < w) { p = (p * 31L) & 0xffffffffL; i += 1 }
    p
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // One pass to codepoints (ASCII corpus ⇒ cps.length == s.length, but
    // codepoint iteration keeps parity with PolyHash32 on non-BMP text).
    val cps = new Array[Int](s.length)
    var m = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(m) = cp; m += 1
      i += Character.charCount(cp)
    }
    if (m < w) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Long](m - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (h * 31L + cps(i)) & 0xffffffffL; i += 1 }
    out(0) = h
    i = 1
    while (i <= m - w) {
      h = (h * 31L - cps(i - 1) * powW + cps(i + w - 1)) & 0xffffffffL
      out(i) = h
      i += 1
    }
    java.util.Arrays.sort(out)
    var n = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(n) = out(i); n += 1 }
      i += 1
    }
    val distinct = new Array[Any](n)
    i = 0
    while (i < n) { distinct(i) = out(i); i += 1 }
    new GenericArrayData(distinct)
  }

  override protected def withNewChildInternal(newChild: Expression): WindowPolyHashes =
    copy(child = newChild)
}

/** Winnowing fingerprints of a token array in ONE pass (Schleimer et al.
  * 2003): the distinct minima of every `w`-wide sliding window over the
  * ordered sequence of [[PolyHash32]] values of the `k`-token grams
  * (space-joined, so values are identical to
  * `transform(wordNgrams(toks, k), polyHash)` — the fold walks the gram's
  * codepoints without materializing the string). The sliding min is a
  * monotonic deque — O(n) total versus the HOF chain's O(n·w) with a
  * per-window slice allocation; dedup is sort+unique on a primitive
  * long[] (callers treat the output as a set). Fewer than k tokens →
  * empty; k..k+w-1 tokens (1..w grams) → the single global min, the
  * winnowing convention for short documents. CodegenFallback — array
  * output, the win is the loop (same rationale as WordNgrams).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(k >= 1 && w >= 1, "gram size and window width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = s"winnow_fps_${k}_$w"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < k) return new GenericArrayData(Array.empty[Any])
    // Gram hashes: fold PolyHash32 over each k-token window's codepoints
    // with ' ' (32) between tokens — no gram string is ever built.
    val nGrams = m - k + 1
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0L
      var j = 0
      while (j < k) {
        if (j > 0) h = (h * 31L + 32L) & 0xffffffffL
        val t = if (toks.isNullAt(i + j)) "" else toks.getUTF8String(i + j).toString
        var p = 0
        while (p < t.length) {
          val cp = t.codePointAt(p)
          h = (h * 31L + cp) & 0xffffffffL
          p += Character.charCount(cp)
        }
        j += 1
      }
      hs(i) = h
      i += 1
    }
    // Sliding min via monotonic deque (indices, increasing values).
    val nWins = if (nGrams <= w) 1 else nGrams - w + 1
    val mins = new Array[Long](nWins)
    if (nGrams <= w) {
      var mn = hs(0)
      i = 1
      while (i < nGrams) { if (hs(i) < mn) mn = hs(i); i += 1 }
      mins(0) = mn
    } else {
      val deque = new Array[Int](nGrams)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < nGrams) {
        while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) mins(i - w + 1) = hs(deque(head))
        i += 1
      }
    }
    java.util.Arrays.sort(mins)
    var n = 0
    i = 0
    while (i < mins.length) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(n) = mins(i); n += 1 }
      i += 1
    }
    val distinct = new Array[Any](n)
    i = 0
    while (i < n) { distinct(i) = mins(i); i += 1 }
    new GenericArrayData(distinct)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** All `n`-codepoint sliding windows of a string as an array<string>, in ONE
  * pass. Value-identical to `transform(sequence(1, len-n+1), i ->
  * substr(s, i, n))` (and the DuckDB list_transform twin), but that HOF form
  * is O(len²): every interpreted lambda call re-evaluates its input
  * subexpression (e.g. a lower(text)) and substr(i, n) re-scans from the
  * string start to find codepoint i. This walks the codepoint offsets once
  * and slices each window directly. Fewer than n codepoints yields an empty
  * array. CodegenFallback for the same reason as WordNgrams: the win is the
  * single-pass loop, not expression codegen.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(n >= 1, "ngram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"char_${n}grams"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // Offsets (in UTF-16 units) of each codepoint start, plus the end.
    val offs = new Array[Int](s.length + 1)
    var m = 0
    var i = 0
    while (i < s.length) {
      offs(m) = i; m += 1
      i += Character.charCount(s.codePointAt(i))
    }
    offs(m) = s.length
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      out(i) = UTF8String.fromString(s.substring(offs(i), offs(i + n)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** Greedy longest-match subword segmentation of one token against a FIXED
  * piece vocabulary — the BPE/WordPiece INFERENCE step. At each position
  * the longest vocabulary piece starting there is taken; no match → the
  * single character (full coverage, always terminates, no ties — "longest"
  * is unique). Production WordPiece adds "##" continuation marks and an
  * [UNK] collapse; both are literal swaps on this loop — the CUT POSITIONS,
  * which fertility metrics measure, are identical. Iterates UTF-16 chars:
  * inputs are the tokenizer's `[a-z]+` tokens by contract. Evaluated per
  * DISTINCT word (segment the vocabulary, not the corpus — see
  * TextAnalytics.tokenizeWordpieceDf), so CodegenFallback is off the hot
  * path like CharNgrams. */
case class WordPieces(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(vocab.nonEmpty, "piece vocabulary must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_pieces"

  @transient private lazy val vset: Set[String] = vocab.toSet
  @transient private lazy val maxLen: Int = vocab.map(_.length).max

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < s.length) {
      var len = math.min(maxLen, s.length - pos)
      while (len > 1 && !vset.contains(s.substring(pos, pos + len))) len -= 1
      out += UTF8String.fromString(s.substring(pos, pos + len))
      pos += len
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieces =
    copy(child = newChild)
}

object StringExprs {
  /** Column wrapper: `(h*31 + char) & 0xffffffff` rolling hash. */
  def polyHash32(s: Column): Column =
    ExpressionUtils.column(PolyHash32(ExpressionUtils.expression(s)))

  /** Column wrapper: 57-bit `(h*base + char) & (2^57-1)` rolling hash. */
  def polyHash57(s: Column, base: Int): Column =
    ExpressionUtils.column(PolyHash57(ExpressionUtils.expression(s), base))

  /** Column wrapper: n-grams of a token array joined with spaces. */
  def wordNgrams(toks: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(toks), n))

  /** Column wrapper: (h1, h2, len) fingerprints of word n-grams. */
  def ngramFp57(toks: Column, n: Int): Column =
    ExpressionUtils.column(NgramFp57(ExpressionUtils.expression(toks), n))

  /** Column wrapper: local repetition stats of a fingerprint array. */
  def repStats(fps: Column): Column =
    ExpressionUtils.column(RepStats(ExpressionUtils.expression(fps)))

  /** Column wrapper: SimHash fingerprint of a token array. */
  def simhash(toks: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(toks), bits))

  /** Column wrapper: distinct rolling hashes of all w-codepoint windows. */
  def windowPolyHashes(s: Column, w: Int): Column =
    ExpressionUtils.column(WindowPolyHashes(ExpressionUtils.expression(s), w))

  /** Column wrapper: all n-codepoint character windows of a string. */
  def charNgrams(s: Column, n: Int): Column =
    ExpressionUtils.column(CharNgrams(ExpressionUtils.expression(s), n))

  /** Column wrapper: distinct winnowing fingerprints of a token array. */
  def winnowFps(toks: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowFingerprints(ExpressionUtils.expression(toks), k, w))

  /** Column wrapper: greedy longest-match subword pieces of a token. */
  def wordPieces(word: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(WordPieces(ExpressionUtils.expression(word), vocab))

  /** Column wrapper: optimal-segmentation [best_score, n_pieces] of a token
    * (the unigram/Viterbi DP over integer piece scores). */
  def unigramDp(word: Column, vocab: Seq[String], scores: Seq[Long]): Column =
    ExpressionUtils.column(UnigramDp(ExpressionUtils.expression(word), vocab, scores))
}

/** OPTIMAL segmentation score — the unigram-LM/Viterbi counterpart of
  * [[WordPieces]]' greedy walk (Kudo 2018, "Subword Regularization", ACL —
  * the SentencePiece segmentation shape, with integer frequency scores in
  * place of log-probabilities so the DP is exactly portable): over all ways
  * to split the word into vocabulary pieces and single characters, maximize
  * the total piece score; ties prefer FEWER pieces. Single characters are
  * always available at score 0 (the same every-word-segments guarantee as
  * the greedy walk), so the DP never dead-ends. Returns
  * [best_score, n_pieces] — the VALUE of the optimum, which is unique even
  * where several splits achieve it, keeping the result deterministic
  * without path tie-break rules. An empty vocabulary degrades to
  * all-singles (score 0, one piece per char). Duplicate vocab strings: the
  * FIRST occurrence's score wins (mirrors the oracle's min-merge-rank
  * rule). O(len · maxPieceLen) per word, evaluated per DISTINCT word like
  * the greedy walk. */
case class UnigramDp(child: Expression, vocab: Seq[String], scores: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  require(vocab.length == scores.length, "vocab and scores must align")
  require(scores.forall(_ >= 0L), "piece scores must be non-negative")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "unigram_dp"

  // first occurrence wins on duplicate pieces
  @transient private lazy val smap: Map[String, Long] =
    vocab.zip(scores).reverse.toMap
  // Piece length measured in CODE POINTS, matching the DP's indexing
  // below and the oracle's len()/substr() semantics.
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 1
    else math.max(vocab.map(v => v.codePointCount(0, v.length)).max, 1)

  override protected def nullSafeEval(input: Any): Any = {
    // Index by CODE POINTS, not UTF-16 code units: DuckDB's len/substr
    // count code points, so a non-BMP character (a surrogate pair in
    // Java) must be ONE DP cell on both engines — s.length/substring
    // would make it two here and desync the oracle (latent on the
    // ASCII-only tokenizer output, but the expression shouldn't carry
    // that assumption).
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val bs = new Array[Long](n + 1) // best score for prefix length i
    val bp = new Array[Long](n + 1) // piece count at that best
    var p = 1
    while (p <= n) {
      var bestS = -1L
      var bestP = 0L
      var j = math.max(0, p - maxLen)
      while (j < p) {
        val sc: Long =
          if (p - j == 1) 0L
          else smap.getOrElse(new String(cps, j, p - j), -1L)
        if (sc >= 0L) {
          val cs = bs(j) + sc
          val cp = bp(j) + 1L
          if (cs > bestS || (cs == bestS && cp < bestP)) {
            bestS = cs; bestP = cp
          }
        }
        j += 1
      }
      bs(p) = bestS; bp(p) = bestP
      p += 1
    }
    new GenericArrayData(Array(bs(n), bp(n)))
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramDp =
    copy(child = newChild)
}
