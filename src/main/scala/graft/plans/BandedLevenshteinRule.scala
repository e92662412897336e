package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite threshold comparisons against the UNBANDED
  * `levenshtein(a, b)` into the banded `levenshtein(a, b, k)` form.
  *
  * `levenshtein(a, b) <= k` computes the full O(|a|·|b|) dynamic program and
  * then throws most of it away; the banded variant visits only the 2k+1
  * diagonal (O(min(|a|,|b|)·k)) and returns −1 as soon as the distance
  * provably exceeds k. For a typical near-dup filter (64-char strings,
  * k = 2) that is a ~13× cut of the inner loop — exactly the kind of
  * rewrite a user should NOT have to know about, which is what makes it an
  * optimizer rule rather than an API convention ([[graft.operators.Dedup
  * .editDistancePairs]] calls the banded form explicitly; this rule gives
  * ad-hoc SQL/DataFrame predicates the same plan).
  *
  * Semantics are identical by the banded contract: for non-null inputs the
  * banded form returns the exact distance when it is ≤ k and −1 otherwise,
  * so `banded >= 0  ⟺  dist <= k`; NULL inputs yield NULL under both forms
  * and every comparison below propagates it. Rewrites handle both operand
  * orders, strict (`<`) and non-strict (`<=`) bounds, and `=` pinning; a
  * negative bound is left alone (always-false — constant-folding territory,
  * not ours).
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.GraftExtensions]]) — the rule composes with the rest of the
  * optimizer (it rewrites expressions in place, wherever they appear:
  * Filter, Project, Join conditions) and runs to fixed point like any
  * built-in rule.
  */
object BandedLevenshteinRule extends Rule[LogicalPlan] {

  private def bandedGE0(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dist <= k  /  k >= dist
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      bandedGE0(a, b, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      bandedGE0(a, b, k)
    // dist < k  /  k > dist   (k >= 1 so the shifted bound stays valid)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      bandedGE0(a, b, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 1 =>
      bandedGE0(a, b, k - 1)
    // dist = k: band at k, then pin the exact value
    case EqualTo(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
    case EqualTo(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
      EqualTo(Literal(k), Levenshtein(a, b, Some(Literal(k))))
  }
}
