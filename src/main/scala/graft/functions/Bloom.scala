package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Bloom-filter membership over the shared splitmix hash family: bit
  * positions of a key with base hash h are `mod(mix64(h, j), mBits)` for
  * j in [0, k) — the SAME family every other sketch uses, so a filter built
  * relationally on one side of a join probes bit-compatibly on the other.
  *
  * The probe is a codegen'd expression holding the word array as a plan
  * reference object: one static JVM call per row, k dependent loads from an
  * L1/L2-resident array — cheap enough to sit inside the scan's
  * WholeStageCodegen span as a pre-join row filter. */
object Bloom {

  /** k bit-tests over the word array; absent bit => definitely not a member. */
  def mightContain(words: Array[Long], mBits: Int, k: Int, h: Long): Boolean = {
    var j = 0
    while (j < k) {
      val pos = java.lang.Math.floorMod(Hashing.mix64(h, j), mBits.toLong).toInt
      if (((words(pos >>> 6) >>> (pos & 63)) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  /** Column API: `baseHash` must carry the same base hash the filter was
    * built from (e.g. the raw long key, or hash64 of a string key). */
  def mightContainCol(baseHash: Column, words: Array[Long], mBits: Int, k: Int): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(baseHash),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(words), mBits, k))
}

/** Codegen'd Bloom probe; `words`/`mBits`/`k` are plan-time constants (the
  * word array rides along as a codegen reference object, NOT inlined SQL).
  * `words` is an ArraySeq, not a raw Array: case-class equality on an Array
  * field is reference identity, which would make two probes of the SAME
  * filter never semanticEquals — defeating subexpression elimination and
  * exchange reuse for reused subqueries. */
case class BloomMightContain(
    child: Expression, words: scala.collection.immutable.ArraySeq[Long], mBits: Int, k: Int)
    extends UnaryExpression {
  require(mBits >= 64 && (mBits & 63) == 0, s"mBits must be a positive multiple of 64, got $mBits")
  require(words.length == mBits / 64, s"words.length ${words.length} != mBits/64 ${mBits / 64}")
  require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")

  @transient private lazy val wordArr: Array[Long] =
    words.unsafeArray.asInstanceOf[Array[Long]]

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a bigint base hash, got ${child.dataType.catalogString}")
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(input: Any): Any =
    Bloom.mightContain(wordArr, mBits, k, input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", wordArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.Bloom.mightContain($w, $mBits, $k, $c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
