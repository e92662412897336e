package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) curve value of two dimensions — the multi-column
  * clustering key for data layout: sorting or range-partitioning a table by
  * `zvalue2(x, y)` keeps rows close in BOTH dimensions physically together,
  * so per-file/row-group min-max statistics stay tight on x AND y and scans
  * filtered on either dimension (or both) can skip most of a 100 TB table —
  * the layout trick behind Delta/Iceberg Z-ORDER clustering, usable here
  * with plain `repartitionByRange(zvalue2(...)) . sortWithinPartitions`.
  *
  * Interleaves the low 16 bits of each input (x on even bits, y on odd) via
  * the standard bit-spreading multiplications — branchless, allocation-free,
  * codegen'd. Inputs must be pre-normalized to [0, 2^16) (bucket or scale
  * first; out-of-range raises rather than silently wrapping). */
object ZOrder {

  def zvalue2(x: Column, y: Column): Column =
    ColumnBridge.column(ZValue2(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Spread the low 16 bits of v to even bit positions (0,2,...,30). */
  private def spread16(v: Long): Long = {
    var x = v & 0xFFFFL
    x = (x | (x << 8)) & 0x00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0FL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  def interleave16(x: Long, y: Long): Long = {
    if (x < 0 || x > 0xFFFFL || y < 0 || y > 0xFFFFL)
      throw new IllegalArgumentException(
        s"zvalue2 inputs must be in [0, 65536), got ($x, $y) — bucket or scale first")
    spread16(x) | (spread16(y) << 1)
  }
}

/** Codegen'd two-dimensional Morton value; see [[ZOrder]]. */
case class ZValue2(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zvalue2 requires (bigint, bigint) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOrder.interleave16($x, $y)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZValue2 =
    copy(left = newLeft, right = newRight)
}
