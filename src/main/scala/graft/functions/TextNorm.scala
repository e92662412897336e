package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the text
  * canonicalization step every multi-source corpus needs before exact or
  * hash-based dedup: the same visible text can arrive composed ("é") from
  * one crawl and decomposed ("e" + U+0301) from another, and every
  * fingerprint/shingle/equality operator in this library would treat them
  * as different documents. Spark has no normalization builtin; a Scala UDF
  * would break whole-stage codegen at full scan width, so this follows the
  * [[Hashing]] expression pattern (one static JVM call inside codegen).
  * Name-parity with DuckDB's `nfc_normalize`, which is the oracle twin.
  */
object TextNorm {

  /** JVM kernel: NFC-normalize one UTF8String. Fast path: if the value is
    * already NFC (all-ASCII always is), return the INPUT — no String
    * round-trip allocation survives for the overwhelmingly common case;
    * `isNormalized` is a scan, not a rewrite. */
  def nfcOf(u: UTF8String): UTF8String = {
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** Column API for [[NfcNormalize]]. */
  def nfc(text: Column): Column = ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}

/** See [[TextNorm]]. Registered in SQL as `nfc_normalize` (DuckDB-parity
  * name) by [[graft.GraftExtensions]]. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfcOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfcOf($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
