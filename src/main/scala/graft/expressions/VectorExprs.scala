package graft.expressions

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
  * Accumulation order is ascending-index sequential — bit-identical to both
  * the HOF formulation it replaces and DuckDB's `list_inner_product`, so
  * oracle hash-parity is preserved (SURVEY §2.D rule R2).
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_double"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
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
