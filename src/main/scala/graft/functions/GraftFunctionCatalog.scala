package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Spark DSv2 `FunctionCatalog` exposing graft's hash kernels through the
  * connector catalog API — the third SQL registration surface next to
  * `GraftExtensions.injectFunction` (session extensions) and the catalog-less
  * Column API. Configured as
  * `spark.sql.catalog.graft = graft.functions.GraftFunctionCatalog`, after
  * which plain SQL resolves `graft.mix64(x)` / `graft.hash64(s)` with no
  * session-extension wiring — the registration travels with the CATALOG
  * conf, so SQL-only clients (JDBC gateways, notebooks that can't touch
  * `spark.sql.extensions`) still get the shared hash family, and with it
  * cross-engine-replayable sampling/sketch predicates.
  *
  * Each function implements `ScalarFunction`'s magic `invoke` method with
  * primitive signatures, so Catalyst plans a direct method call (codegen
  * `Invoke`, no row boxing) — the `produceResult` fallback exists only for
  * the interpreted path. Results are deterministic (declared, so the
  * optimizer can fold and reuse them) but NULLABLE — each function
  * propagates NULL input to NULL output, and `isResultNullable = true`
  * declares exactly that contract.
  */
class GraftFunctionCatalog extends CatalogPlugin with FunctionCatalog {
  import GraftFunctionCatalog._

  private var catalogName: String = "graft"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    Functions.keysIterator.map(n => Identifier.of(Array.empty, n)).toArray
  }

  override def loadFunction(ident: Identifier): UnboundFunction = {
    if (ident.namespace.nonEmpty) throw new NoSuchFunctionException(ident)
    Functions.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT),
      throw new NoSuchFunctionException(ident))
  }

  override def functionExists(ident: Identifier): Boolean =
    ident.namespace.isEmpty &&
      Functions.contains(ident.name.toLowerCase(java.util.Locale.ROOT))
}

object GraftFunctionCatalog {

  // bind() sees PRE-coercion argument types (an unsuffixed SQL literal is
  // INT, not BIGINT), so it must not demand exact types — but dropping the
  // check entirely would let a STRING argument slip through Spark's
  // string→bigint implicit cast and turn malformed values into silent
  // NULLs. Accept exactly the SAFE widenings (integral→bigint) and fail
  // analysis loudly on everything else.
  private def integralish(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private abstract class OneArg(
      fnName: String, argType: DataType, resType: DataType) extends UnboundFunction {
    def bound: BoundFunction
    override def name(): String = fnName
    override def description(): String =
      s"$fnName(${argType.simpleString}) -> ${resType.simpleString} (graft hash family)"
    private def accepts(dt: DataType): Boolean =
      if (argType == LongType) integralish(dt) else dt == argType
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 1 || !accepts(inputType.head.dataType))
        throw new UnsupportedOperationException(
          s"$fnName expects exactly one ${argType.simpleString} argument " +
            s"(integral widths coerce), got ${inputType.simpleString}")
      bound
    }
  }

  /** splitmix64 finalizer of a long — `graft.mix64(x)`. */
  private object Mix64Unbound extends OneArg("mix64", LongType, LongType) {
    override def bound: BoundFunction = Mix64Bound
  }

  private object Mix64Bound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "mix64"
    override def canonicalName(): String = "graft.mix64"
    override def isDeterministic: Boolean = true
    // produceResult returns null for NULL input (the interpreted path), so
    // the declared contract must allow it — even though the magic-invoke
    // path short-circuits nulls before the call and never produces one
    override def isResultNullable: Boolean = true
    // magic method: primitive signature, codegen'd as a static-shaped Invoke;
    // Spark's null propagation short-circuits NULL inputs before the call
    def invoke(x: Long): Long = Hashing.mix64(x, 0)
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else Hashing.mix64(input.getLong(0), 0)
  }

  /** Seeded string hash — `graft.hash64(s)`. */
  private object Hash64Unbound extends OneArg("hash64", StringType, LongType) {
    override def bound: BoundFunction = Hash64Bound
  }

  private object Hash64Bound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(StringType)
    override def resultType(): DataType = LongType
    override def name(): String = "hash64"
    override def canonicalName(): String = "graft.hash64"
    override def isDeterministic: Boolean = true
    // NULL string input -> NULL result. Unlike the primitive-long functions
    // (where Spark's null propagation short-circuits before the call), a
    // null REFERENCE argument reaches the magic method, so the method
    // handles it (boxed return) and the result is declared nullable.
    override def isResultNullable: Boolean = true
    def invoke(s: UTF8String): java.lang.Long =
      if (s == null) null else java.lang.Long.valueOf(Hashing.hash64(s.toString))
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0)) null else Hashing.hash64(input.getUTF8String(0).toString)
  }

  /** Morton/Z-curve interleave of two longs in [0, 2^16) — `graft.zvalue2`. */
  private object ZValue2Unbound extends UnboundFunction {
    override def name(): String = "zvalue2"
    override def description(): String = "zvalue2(bigint, bigint) -> bigint (Morton interleave)"
    override def bind(inputType: StructType): BoundFunction = {
      if (inputType.length != 2 || inputType.exists(f => !integralish(f.dataType)))
        throw new UnsupportedOperationException(
          s"zvalue2 expects exactly two bigint arguments " +
            s"(integral widths coerce), got ${inputType.simpleString}")
      ZValue2Bound
    }
  }

  private object ZValue2Bound extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType, LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "zvalue2"
    override def canonicalName(): String = "graft.zvalue2"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true // see mix64 — produceResult nulls
    def invoke(x: Long, y: Long): Long = ZOrder.interleave16(x, y)
    override def produceResult(input: InternalRow): java.lang.Long =
      if (input.isNullAt(0) || input.isNullAt(1)) null
      else ZOrder.interleave16(input.getLong(0), input.getLong(1))
  }

  private val Functions: Map[String, UnboundFunction] = Map(
    "mix64" -> Mix64Unbound,
    "hash64" -> Hash64Unbound,
    "zvalue2" -> ZValue2Unbound)
}
