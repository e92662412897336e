package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Double-precision vector math as a native codegen'd expression.
  *
  * Spark's higher-order `aggregate(zip_with(...))` fold is INTERPRETED — one
  * lambda eval per element per row. For a 64-dim embedding that is 128
  * interpreted calls per pair, which dominated the candidate-verify stage of
  * the bucketed near-dup operator (~8 s of a 49 s bench at sf0.1). This
  * expression runs the whole fold as one static primitive loop inside
  * whole-stage codegen, with semantics IDENTICAL to the HOF form: same
  * left-to-right double accumulation (bit-exact vs the DuckDB oracle's
  * generate_series fold), NULL when lengths differ or any element is NULL
  * (zip_with pads / propagates the same way).
  */
object VectorOps {

  /** Left-to-right double dot product over two numeric ArrayData. Returns
    * null (boxed) when lengths differ or an element is null. */
  def dotData(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(FloatDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Left-to-right squared-L2 fold: sum((a_i - b_i)^2), accumulated in the
    * same element order as [[dotData]]. Returns null (boxed) when lengths
    * differ or an element is null. */
  def sqDistData(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val diff = x - y
      acc += diff * diff
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def sqDist(a: Column, b: Column): Column =
    ColumnBridge.column(FloatSqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dotData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = elemFloat(left)
    val bf = elemFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("dotBoxed")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorOps.dotData($a, $b, $af, $bf);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance between two float/double arrays — the k-means
  * assignment kernel. Same contract as [[FloatDot]]: double accumulation in
  * element order (bit-exact vs the DuckDB oracle's generate_series fold of
  * `(a[i]-b[i])*(a[i]-b[i])`), NULL on length mismatch or NULL element. */
case class FloatSqDist(left: Expression, right: Expression) extends BinaryExpression {
  private def elemFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def okType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left) && okType(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.sqDistData(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemFloat(left), elemFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val af = elemFloat(left)
    val bf = elemFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("sqDistBoxed")
      s"""
         |java.lang.Double $boxed = graft.functions.VectorOps.sqDistData($a, $b, $af, $bf);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatSqDist =
    copy(left = newLeft, right = newRight)
}
