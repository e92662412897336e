package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.types.IntegerType

import graft.functions.{FloatDot, Hash64Of, Mix64Of, NfcNormalize, Nlz64, RollingHash64, ShinglesOf, SimHash64, WordGramsOf, WordSpansOf, ZValue2}

/** SQL-surface registration of graft's native expressions via the public
  * `SparkSessionExtensions` hook — the blessed way for a library to extend
  * Spark SQL without touching internals:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT rolling_hash64(text), simhash64(text) FROM docs")
  * }}}
  *
  * Every function is a codegen'd Catalyst expression (no UDF wrapping), so
  * the SQL form and the Column API (`Hashing.rollingHash`, `VectorOps.dot`)
  * produce identical plans.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def unary(name: String, usage: String, build: Expression => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects exactly 1 argument, got ${args.length}")
        build(args.head)
      })

  private def binary(name: String, usage: String, build: (Expression, Expression) => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects exactly 2 arguments, got ${args.length}")
        build(args(0), args(1))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    // optimizer rule: threshold comparisons on unbanded levenshtein →
    // banded O(len·k) form (see BandedLevenshteinRule's scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
    // planner strategy: AsOfMergeJoinNode → the physical streaming merge
    // (see AsOfMergeJoinExec's scaladoc)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfMergeJoinStrategy)
    ext.injectFunction(unary("rolling_hash64",
      "rolling_hash64(text) - order-sensitive 64-bit fingerprint of the whitespace-token sequence",
      RollingHash64.apply))
    ext.injectFunction(unary("simhash64",
      "simhash64(text) - 64-bit SimHash over the whitespace-token multiset",
      SimHash64.apply))
    ext.injectFunction(unary("mix64",
      "mix64(x) - splitmix64 finalizer of a bigint (deterministic sampling hash)",
      Mix64Of.apply))
    ext.injectFunction(unary("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC canonical composition (DuckDB-parity name)",
      NfcNormalize.apply))
    ext.injectFunction(binary("float_dot",
      "float_dot(a, b) - double-precision left-to-right dot product of two float/double arrays",
      FloatDot.apply))
    ext.injectFunction(unary("hash64",
      "hash64(text) - 64-bit string hash (rotate-multiply + murmur finalizer)",
      Hash64Of.apply))
    ext.injectFunction(unary("nlz64",
      "nlz64(x) - number of leading zeros of a bigint's 64-bit pattern",
      Nlz64.apply))
    ext.injectFunction(binary("shingles",
      "shingles(text, n) - distinct word n-grams in first-occurrence order (n: int literal)",
      (t, ne) => {
        require(ne.foldable && ne.dataType == IntegerType,
          "shingles: n must be an int literal")
        ShinglesOf(t, ne.eval().asInstanceOf[Int])
      }))
    ext.injectFunction(binary("word_spans",
      "word_spans(text, n) - consecutive non-overlapping n-token spans in order, partial tail included (n: int literal)",
      (t, ne) => {
        require(ne.foldable && ne.dataType == IntegerType,
          "word_spans: n must be an int literal")
        WordSpansOf(t, ne.eval().asInstanceOf[Int])
      }))
    ext.injectFunction(binary("word_grams",
      "word_grams(text, n) - all overlapping word n-grams in order, duplicates kept (n: int literal)",
      (t, ne) => {
        require(ne.foldable && ne.dataType == IntegerType,
          "word_grams: n must be an int literal")
        WordGramsOf(t, ne.eval().asInstanceOf[Int])
      }))
    ext.injectFunction(binary("zvalue2",
      "zvalue2(x, y) - Morton (Z-order) interleave of two bigints in [0, 65536) for multi-dimensional clustering",
      ZValue2.apply))
  }
}
