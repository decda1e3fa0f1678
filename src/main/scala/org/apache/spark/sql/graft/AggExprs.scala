/* Declared inside org.apache.spark.sql so the Column <-> Expression bridge
 * (ExpressionUtils, private[sql] in Spark 4.x) is accessible. Everything used
 * here is public Apache Spark source; no proprietary APIs. */
package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Growable long buffer — the aggregation state of [[BoundedCollectLong]].
  * Capped at `cap` elements: once full, further appends are dropped. */
final class LongBuf(var arr: Array[Long], var n: Int) {
  def append(v: Long, cap: Int): Unit = {
    if (n < cap) {
      if (n == arr.length) {
        val grown = new Array[Long](math.min(cap, math.max(4, arr.length * 2)))
        System.arraycopy(arr, 0, grown, 0, n)
        arr = grown
      }
      arr(n) = v; n += 1
    }
  }
}

/** collect_list for longs with BOUNDED state: at most `cap` elements are ever
  * held per group, on the map side and through every merge. Groups that hit
  * the cap surface as cap-length arrays whose CONTENTS are partition-order
  * dependent — callers must treat "length == cap" as an overflow marker and
  * discard the group (the df-capped shingle pipeline filters `size < cap`).
  * Groups below the cap are complete, and eval sorts them, so their output
  * is deterministic regardless of merge order.
  *
  * This is the scale-safety property that previously required a separate
  * df-count aggregation plus an eligibility join BEFORE collect_list (an
  * unbounded collect on a hot key — df 10⁹ boilerplate at crawl scale — is
  * an executor OOM). Bounding the state inside the aggregate buys the same
  * guarantee in ONE shuffle instead of two plus a join.
  */
case class BoundedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongBuf] with UnaryLike[Expression] {
  require(cap >= 1, "cap must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = s"bounded_collect_long_$cap"

  override def createAggregationBuffer(): LongBuf =
    new LongBuf(new Array[Long](4), 0)

  override def update(buf: LongBuf, input: InternalRow): LongBuf = {
    val v = child.eval(input)
    if (v != null) buf.append(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(buf: LongBuf, other: LongBuf): LongBuf = {
    var i = 0
    while (i < other.n && buf.n < cap) { buf.append(other.arr(i), cap); i += 1 }
    buf
  }

  override def eval(buf: LongBuf): Any = {
    val out = java.util.Arrays.copyOf(buf.arr, buf.n)
    java.util.Arrays.sort(out)
    val boxed = new Array[Any](out.length)
    var i = 0
    while (i < out.length) { boxed(i) = out(i); i += 1 }
    new GenericArrayData(boxed)
  }

  override def serialize(buf: LongBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putLong(buf.arr(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Long](math.max(4, n))
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    new LongBuf(arr, n)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectLong =
    copy(child = newChild)
}

/** All index pairs (i < j) of a long array as array<struct<d1,d2>>, in one
  * tight loop. Value-identical to the nested-HOF formulation
  * `flatten(transform(ids, (x,i) -> transform(slice(ids, i+2, n), y ->
  * struct(x, y))))`, which pays an interpreted lambda call plus a slice COPY
  * of the array tail per element — O(k²) allocations per group. Input order
  * is preserved ((arr(i), arr(j)) with i < j), so sorted input yields
  * d1 < d2 pairs. CodegenFallback: array-of-struct construction doesn't
  * profit from expression codegen (same rationale as WordNgrams).
  */
case class LongPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("d1", LongType, nullable = false),
      StructField("d2", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "long_pairs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = arr.numElements()
    val out = new Array[Any](k * (k - 1) / 2)
    var p = 0
    var i = 0
    while (i < k) {
      val a = arr.getLong(i)
      var j = i + 1
      while (j < k) {
        out(p) = new GenericInternalRow(Array[Any](a, arr.getLong(j)))
        p += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LongPairs =
    copy(child = newChild)
}

object AggExprs {
  /** Column wrapper: bounded collect_list of a long column (sorted if the
    * group stayed under the cap; length == cap marks overflow). */
  def boundedCollectLong(c: Column, cap: Int): Column =
    ExpressionUtils.column(
      BoundedCollectLong(ExpressionUtils.expression(c), cap).toAggregateExpression())

  /** Column wrapper: all (i<j) pairs of a long array as structs. */
  def longPairs(c: Column): Column =
    ExpressionUtils.column(LongPairs(ExpressionUtils.expression(c)))
}
