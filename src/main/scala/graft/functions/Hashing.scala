package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Splitmix-style 64-bit hashing primitives shared by every sketch operator
  * (MinHash, SimHash, rolling fingerprints).
  *
  * SINGLE SOURCE OF TRUTH for the constants: the JVM loops here, the
  * codegen'd Catalyst expressions below, and the DuckDB SQL twins rendered by
  * [[graft.queries.DuckHashSql]] must all agree bit-for-bit — that agreement
  * is what lets the driver hash-compare hash-sketch query results against a
  * cross-engine oracle. Change a constant and every oracle goes red.
  *
  * All functions are pure, allocation-free primitive loops (Spark's
  * higher-order array functions are interpreted per element — the round-1
  * lesson), and operate on Java's signed 64-bit longs; the SQL twin models
  * the same bit patterns in unsigned hugeint arithmetic.
  */
object Hashing {
  /** 2^64 / golden ratio — seed and stream constant. */
  final val Golden = 0x9E3779B97F4A7C15L
  /** Per-character multiplier of [[hash64]] (xxhash prime). */
  final val StepMul = 0xC2B2AE3D27D4EB4FL
  /** Murmur3-style finalizer multipliers of [[hash64]]. */
  final val Fin1 = 0xFF51AFD7ED558CCDL
  final val Fin2 = 0xC4CEB9FE1A85EC53L
  /** Splitmix64 finalizer multipliers of [[mix64]]. */
  final val Mix1 = 0xBF58476D1CE4E5B9L
  final val Mix2 = 0x94D049BB133111EBL
  /** Seed of the MinHash band fold (see Dedup.sketchOf). */
  final val BandSeed = 0x27D4EB2F165667C5L

  /** 64-bit string hash: rotate-multiply per UTF-16 code unit + murmur-style
    * finalizer. */
  def hash64(s: String): Long = {
    var h = Golden
    var i = 0
    while (i < s.length) {
      h = java.lang.Long.rotateLeft((h ^ s.charAt(i).toLong) * StepMul, 31)
      i += 1
    }
    h ^= h >>> 33; h *= Fin1; h ^= h >>> 33; h *= Fin2
    h ^ (h >>> 33)
  }

  /** Per-permutation long mixer: splitmix64 step seeded by permutation i. */
  def mix64(h: Long, i: Int): Long = {
    var z = h + Golden * (i + 1)
    z ^= z >>> 30; z *= Mix1
    z ^= z >>> 27; z *= Mix2
    z ^ (z >>> 31)
  }

  /** Order-sensitive rolling fingerprint of the whitespace-token sequence:
    * acc' = mix64(acc ^ hash64(token), 0), acc0 = 0. Equivalent mixing power
    * to a polynomial rolling hash but overflow-free under ANSI mode, and —
    * unlike the xxhash64 fold it replaces — exactly replicable in DuckDB SQL
    * ([[graft.queries.DuckHashSql.rollingHashSql]]), so the fingerprint query
    * gets a real cross-engine oracle. */
  def rollingHashOf(text: String): Long = {
    if (text == null) return 0L
    val toks = text.trim.split("\\s+")
    var acc = 0L
    var i = 0
    while (i < toks.length) { acc = mix64(acc ^ hash64(toks(i)), 0); i += 1 }
    acc
  }

  /** 64-bit SimHash over the whitespace-token multiset: bit b is set iff
    * more than half of the token hashes have bit b set. */
  def simhashOf(text: String): Long = {
    if (text == null) return 0L
    val toks = text.trim.split("\\s+")
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hash64(toks(i))
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) counts(b) += 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) * 2 > toks.length) sig |= (1L << b); b += 1 }
    sig
  }

  /** Column API for the codegen'd expressions below. */
  def rollingHash(text: Column): Column = ColumnBridge.column(RollingHash64(ColumnBridge.expression(text)))
  def simhash(text: Column): Column = ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
  def mix64Col(id: Column): Column = ColumnBridge.column(Mix64Of(ColumnBridge.expression(id)))
  def hash64Col(text: Column): Column = ColumnBridge.column(Hash64Of(ColumnBridge.expression(text)))
  def nlz64Col(x: Column): Column = ColumnBridge.column(Nlz64(ColumnBridge.expression(x)))
  def mix64At(h: Column, i: Column): Column =
    ColumnBridge.column(Mix64At(ColumnBridge.expression(h), ColumnBridge.expression(i)))
}

/** mix64(h, i) with a COLUMN permutation index — the per-hash-function
  * rehash of the Count-Min sketch (and of any operator needing a family of
  * independent hash functions from one base hash). The wrap-around long
  * arithmetic lives in the JVM call: inlining it as Catalyst `+`/`*` would
  * overflow-error under ANSI mode (on by default in Spark 4). DuckDB twin:
  * [[graft.queries.DuckHashSql.mix64Sql]] with an index expression. */
case class Mix64At(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64_at requires (bigint, int) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(h: Any, i: Any): Any =
    Hashing.mix64(h.asInstanceOf[Long], i.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, i) => s"graft.functions.Hashing.mix64($h, $i)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Mix64At =
    copy(left = newLeft, right = newRight)
}

/** [[Hashing.hash64]] of a string column — the shared item hash of the
  * sketch operators; DuckDB twin: [[graft.queries.DuckHashSql.hash64Sql]]. */
case class Hash64Of(child: Expression) extends HashStringToLong {
  override protected def jvmFunction: String = "graft.functions.Hashing.hash64"
  override protected def compute(s: String): Long = Hashing.hash64(s)
  override protected def withNewChildInternal(newChild: Expression): Hash64Of = copy(child = newChild)
}

/** Number of leading zeros of a long's 64-bit pattern (0..64) — the rho
  * primitive of the HyperLogLog sketch. Exact integer bit math; the DuckDB
  * twin is `64 - length(bin(w))` with a zero guard (log2-based floats can
  * be off by one at exact powers of two, so neither engine uses them). */
case class Nlz64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nlz64 requires a bigint argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.numberOfLeadingZeros(input.asInstanceOf[Long]).toLong
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(long) java.lang.Long.numberOfLeadingZeros($c)")
  override protected def withNewChildInternal(newChild: Expression): Nlz64 = copy(child = newChild)
}

/** mix64(x, 0) over a long column — the deterministic sampling hash used by
  * IVF centroid selection. Unlike xxhash64 it has a DuckDB hugeint twin
  * ([[graft.queries.DuckHashSql.mix64Sql]]), so even the centroid SAMPLE is
  * reproducible in the cross-engine oracle. */
case class Mix64Of(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix64 requires a bigint argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Hashing.mix64(input.asInstanceOf[Long], 0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hashing.mix64($c, 0)")
  override protected def withNewChildInternal(newChild: Expression): Mix64Of = copy(child = newChild)
}

/** Per-row sketches as native Catalyst expressions: the whole token-hash-fold
  * loop is ONE static call inside whole-stage codegen — no UDF wrapping, no
  * Dataset encoder round-trip, no interpreted higher-order functions. This is
  * the production shape for map-side sketching at full scan width. */
abstract class HashStringToLong extends UnaryExpression {
  /** JVM entry point, e.g. "graft.functions.Hashing.rollingHashOf". */
  protected def jvmFunction: String
  protected def compute(s: String): Long

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$jvmFunction($c.toString())")
}

case class RollingHash64(child: Expression) extends HashStringToLong {
  override protected def jvmFunction: String = "graft.functions.Hashing.rollingHashOf"
  override protected def compute(s: String): Long = Hashing.rollingHashOf(s)
  override protected def withNewChildInternal(newChild: Expression): RollingHash64 = copy(child = newChild)
}

case class SimHash64(child: Expression) extends HashStringToLong {
  override protected def jvmFunction: String = "graft.functions.Hashing.simhashOf"
  override protected def compute(s: String): Long = Hashing.simhashOf(s)
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
}
