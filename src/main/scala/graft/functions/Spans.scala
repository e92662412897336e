package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional word-window siblings of [[Shingling]] — primitive loops inside
  * whole-stage codegen for the same reason (HOF lambdas run interpreted):
  *
  *  - [[WordSpansOf]]: consecutive NON-overlapping n-token spans in document
  *    order, INCLUDING the partial tail — concatenating the spans with single
  *    spaces reproduces the whitespace-normalized document, which is what
  *    lets the span-level dedup operator reassemble cleaned documents.
  *  - [[WordGramsOf]]: ALL overlapping n-grams in order, NON-distinct —
  *    the multiset the repetition-quality metrics count over (ShinglesOf
  *    dedupes, so it cannot measure repetition by construction).
  */
object Spans {

  def wordSpans(text: Column, n: Int): Column =
    ColumnBridge.column(WordSpansOf(ColumnBridge.expression(text), n))

  def wordGrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordGramsOf(ColumnBridge.expression(text), n))

  /** Non-overlapping n-token spans in order (partial tail included). */
  def spansOf(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length == 1 && toks(0).isEmpty) return new GenericArrayData(Array.empty[Any])
    val m = (toks.length + n - 1) / n
    val arr = new Array[Any](m)
    val sb = new java.lang.StringBuilder()
    var s = 0
    while (s < m) {
      sb.setLength(0)
      var k = s * n
      val end = math.min(k + n, toks.length)
      while (k < end) {
        if (k > s * n) sb.append(' ')
        sb.append(toks(k))
        k += 1
      }
      arr(s) = UTF8String.fromString(sb.toString)
      s += 1
    }
    new GenericArrayData(arr)
  }

  /** All overlapping n-grams in order, duplicates kept. */
  def gramsOf(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n || (toks.length == 1 && toks(0).isEmpty))
      return new GenericArrayData(Array.empty[Any])
    val arr = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** Codegen'd non-overlapping word-span expression; `n` is a plan-time constant. */
case class WordSpansOf(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"span length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_spans requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Spans.spansOf(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Spans.spansOf($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordSpansOf =
    copy(child = newChild)
}

/** Codegen'd all-overlapping-n-gram expression; `n` is a plan-time constant. */
case class WordGramsOf(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_grams requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Spans.gramsOf(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Spans.gramsOf($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordGramsOf =
    copy(child = newChild)
}
