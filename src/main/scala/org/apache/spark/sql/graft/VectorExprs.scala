/* Declared inside org.apache.spark.sql so the Column <-> Expression bridge
 * (ExpressionUtils, private[sql] in Spark 4.x) is accessible. Everything used
 * here is public Apache Spark source; no proprietary APIs. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the hot-path dot product over two
  * `array<double>` columns.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions are
  * evaluated by interpreting a lambda per element and allocating an
  * intermediate array per row — fine for one-off scalar queries, ruinous
  * inside an all-pairs similarity loop (O(n²) rows × 64 elements). This
  * expression participates in whole-stage codegen: the generated Java is a
  * single primitive loop over the two `ArrayData` buffers, no allocation.
  *
  * Semantics match the HOF formulation it replaces exactly:
  *  - accumulation is ascending-index sequential (bit-identical to DuckDB's
  *    sequential list fold, SURVEY §2.D rule R2);
  *  - length-mismatched arrays → NULL (`zip_with` null-pads, `acc + null` →
  *    NULL in the HOF form);
  *  - any NULL element → NULL (same HOF reasoning).
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_double"
  // NULL is produced for mismatched lengths / null elements even when the
  // input columns themselves are non-nullable.
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column wrapper: codegen'd `Σ aᵢ·bᵢ` over two array<double> columns. */
  def dotDouble(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductDouble(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
