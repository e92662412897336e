package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Primitive-loop word-shingling shared by the dedup/decontamination
  * operators. The declarative form — `array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', element_at(toks, i+k)...)))` — runs every element
  * lambda INTERPRETED (the round-1 lesson, re-learned in round 6 when the
  * decontamination scan spent 16 s of its 16.5 s in shingle HOFs at sf0.1);
  * this expression does the whole tokenize→gram→dedupe loop in ONE static
  * JVM call inside whole-stage codegen. Semantics are pinned to the
  * declarative form by `ShinglingSpec` (tokens = `split(trim(text), "\s+")`,
  * grams joined by single spaces, distinct in first-occurrence order), which
  * is also exactly what the DuckDB oracle's
  * [[graft.queries.DuckHashSql.gramsSql]] computes. */
object Shingling {

  /** Column API for [[ShinglesOf]]. */
  def shingles(text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShinglesOf(org.apache.spark.sql.graft.ColumnBridge.expression(text), n))

  /** Distinct word n-grams of `text` in first-occurrence order. */
  def shinglesOf(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
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
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(arr)
  }
}

/** Codegen'd distinct-word-n-gram expression; `n` is a plan-time constant. */
case class ShinglesOf(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Shingling.shinglesOf(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingling.shinglesOf($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesOf =
    copy(child = newChild)
}
