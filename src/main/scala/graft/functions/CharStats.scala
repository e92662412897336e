package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-distribution statistics for the q141 quality lane.
  *
  * The naive plan — `explode(split(s, ""))` then two doc-keyed groupBys —
  * turns EVERY CHARACTER of the corpus into an aggregate-hash-map row: at
  * 100 TB that is ~10¹⁴ rows through two shuffles, the single worst
  * row-explosion in the suite (the round-8 bench measured it at 8+ s even
  * at sf0.1). The whole computation is per-document, so none of it needs a
  * shuffle: this expression walks the string's code points ONCE inside
  * whole-stage codegen and emits one skinny struct
  * `(m, distinct_chars, sum_c2)` per document — count of characters, count
  * of distinct characters, and Σcᵢ² over the per-character counts — from
  * which collision probability Σ(cᵢ/m)² is one codegen'd division. The
  * lane's only remaining wide operation is the presentation orderBy.
  *
  * Counting is by Unicode CODE POINT, matching both the previous
  * `split(s, "")` form (Java regex zero-width matches do not split
  * surrogate pairs) and the DuckDB oracle's `substr(s, i, 1)` (character
  * positions). ASCII code points — the overwhelming share of any real
  * corpus — hit a flat 128-slot array; the rest fall back to a boxed map.
  * Σcᵢ² fits a long for any document below ~3 billion characters (c ≤ m,
  * Σc² ≤ m²), far beyond any single training document.
  */
object CharStatsFns {

  def charStats(text: Column): Column =
    ColumnBridge.column(CharStatsOf(ColumnBridge.expression(text)))

  val resultType: StructType = StructType(Seq(
    StructField("m", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("sum_c2", LongType, nullable = false)))

  /** One pass over the code points: (m, distinct, Σc²). */
  def statsOf(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, Array[Long]] = null
    var m = 0L
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      m += 1
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Long]]()
        val slot = other.get(cp)
        if (slot == null) other.put(cp, Array(1L)) else slot(0) += 1
      }
    }
    var distinct = 0L
    var sumC2 = 0L
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) { distinct += 1; sumC2 += c * c }
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        distinct += 1
        sumC2 += c * c
      }
    }
    InternalRow(m, distinct, sumC2)
  }
}

/** Codegen'd one-pass char-distribution expression (see [[CharStatsFns]]). */
case class CharStatsOf(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_stats requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = CharStatsFns.resultType

  override def prettyName: String = "char_stats_of"

  override protected def nullSafeEval(input: Any): Any =
    CharStatsFns.statsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharStatsFns.statsOf($c)")

  override protected def withNewChildInternal(newChild: Expression): CharStatsOf =
    copy(child = newChild)
}
