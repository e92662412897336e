package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{lit, nullif, round, size}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Set cardinality kernels over SORTED primitive-long arrays.
  *
  * `array_intersect` is order-agnostic and pays for it: one hash set built
  * per ROW PAIR, plus the boxed output array nobody reads when only the
  * cardinality matters. The near-dup verification joins (q52/q55) intersect
  * hundreds of thousands of candidate pairs per run, so the kernel below
  * exploits what the sketch pipeline can guarantee for free — each doc's
  * hashed-gram set is sorted ONCE at sketch time — and computes |A ∩ B| as
  * a two-pointer merge: O(n+m) longs streamed, zero allocation, inside
  * whole-stage codegen. The round-8 bench put q52's verification stage at
  * ~3 s of the lane's 4.3 s standalone cost; the merge form cuts most of it.
  *
  * CONTRACT: both inputs must be sorted ascending with distinct elements
  * (exactly what [[graft.operators.Dedup.sketchOf]] emits). Unsorted input
  * silently undercounts — the DedupSpec exactness tests and the q52/q55
  * DuckDB oracles (which recompute exact Jaccard relationally) are the
  * guards that would catch a producer breaking the contract.
  */
object SetOps {

  /** |A ∩ B| for sorted distinct long arrays (two-pointer merge). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  def intersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Jaccard of two sorted distinct-long-array columns — same arithmetic
    * (and therefore bit-identical results) as [[graft.operators.Dedup.jaccard]],
    * with the hash-set intersect swapped for the merge kernel:
    * |A∪B| = |A| + |B| − |A∩B|, NULL on two empty sets. */
  def sortedJaccard(a: Column, b: Column): Column = {
    val inter = intersectSize(a, b).cast("double")
    round(inter / nullif(size(a) + size(b) - inter, lit(0)), 6)
  }
}

/** Codegen'd two-pointer |A ∩ B| over sorted distinct long arrays. */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_intersect_size requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOps.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetOps.sortedIntersectSize($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectSize =
    copy(left = newLeft, right = newRight)
}
