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

object StringExprs {
  /** Column wrapper: `(h*31 + char) & 0xffffffff` rolling hash. */
  def polyHash32(s: Column): Column =
    ExpressionUtils.column(PolyHash32(ExpressionUtils.expression(s)))

  /** Column wrapper: n-grams of a token array joined with spaces. */
  def wordNgrams(toks: Column, n: Int): Column =
    ExpressionUtils.column(WordNgrams(ExpressionUtils.expression(toks), n))

  /** Column wrapper: SimHash fingerprint of a token array. */
  def simhash(toks: Column, bits: Int): Column =
    ExpressionUtils.column(SimHash(ExpressionUtils.expression(toks), bits))
}
