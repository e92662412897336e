package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.{SumMode, VectorOps}

/** The ordered-fold family's scale-mode contract (the q103/q187/q193/q201
  * convention): ExactFold — per-group `sort_array(collect_list(...))` +
  * ordered IEEE fold — is the VERIFY-SF choice that lets the DuckDB oracle
  * hash-match arbitrary-float moments bit-for-bit, and PlaneSums — plain
  * partial-agg double sums — is the 100 TB default with bounded per-group
  * state. Plan shape AND agreement are pinned so a future edit can't
  * silently re-introduce a per-group collect into the scale path or let
  * the two modes drift apart beyond summation-order ulps. */
class SumModePlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"
  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  // rounded-to-6dp outputs: modes may straddle one rounding boundary when
  // the unrounded values differ by summation-order ulps — one decimal ulp
  // is the agreement bound for rounded columns, 1e-9 relative for raw ones
  private val roundedTol = 1.000001e-6

  test("PlaneSums standardize plans with NO per-group collect (plain partial-agg sums)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val p = plan(VectorOps.standardize(embs, "vec_id", "embedding", SumMode.PlaneSums))
    withClue(p) {
      p should not include "collect_list"
      p should not include "sort_array"
      p should include("HashAggregate")
    }
  }

  test("ExactFold standardize plans through the ordered collect (the documented cost of oracle exactness)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val p = plan(VectorOps.standardize(embs, "vec_id", "embedding", SumMode.ExactFold))
    withClue(p) { p should include("collect_list") }
  }

  test("PlaneSums labelMeans and powerIteration plan collect-free") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val p1 = plan(VectorOps.labelMeans(embs, "vec_id", "label", "embedding", SumMode.PlaneSums))
    withClue(p1) { p1 should not include "collect_list" }
    val p2 = plan(VectorOps.powerIteration(embs, "vec_id", "embedding", 2, SumMode.PlaneSums))
    withClue(p2) { p2 should not include "collect_list" }
  }

  test("standardize: modes agree within one 6-dp ulp at sf0.01") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    def m(mode: SumMode) = VectorOps.standardize(embs, "vec_id", "embedding", mode)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)))).toMap
    val exact = m(SumMode.ExactFold)
    val plain = m(SumMode.PlaneSums)
    plain.keySet shouldBe exact.keySet
    exact.size should be > 0
    for ((k, e) <- exact) {
      val p = plain(k)
      withClue(s"$k exact=$e plain=$p: ") {
        (e == null) shouldBe (p == null)
        if (e != null) math.abs(e - p) should be <= roundedTol
      }
    }
  }

  test("labelMeans: modes agree within 1e-9 relative at sf0.01 (unrounded means)") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    def m(mode: SumMode) = VectorOps.labelMeans(embs, "vec_id", "label", "embedding", mode)
      .collect().map(r => (r.get(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val exact = m(SumMode.ExactFold)
    val plain = m(SumMode.PlaneSums)
    plain.keySet shouldBe exact.keySet
    exact.size should be > 0
    for ((k, (em, en)) <- exact) {
      val (pm, pn) = plain(k)
      pn shouldBe en // counts are exact in both modes
      val rel = math.abs(em - pm) / math.max(math.abs(em), 1e-30)
      withClue(s"$k exact=$em plain=$pm rel=$rel: ") { rel should be <= 1e-9 }
    }
  }

  test("powerIteration + topTwoComponents: modes agree within one 6-dp ulp at sf0.01") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    def p1(mode: SumMode) = VectorOps.powerIteration(embs, "vec_id", "embedding", 3, mode)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (e1, f1) = (p1(SumMode.ExactFold), p1(SumMode.PlaneSums))
    f1.keySet shouldBe e1.keySet
    e1.size should be > 0
    for ((d, (el, eb)) <- e1; (pl, pb) = f1(d)) {
      withClue(s"pc1 dim $d: ") {
        math.abs(el - pl) should be <= roundedTol
        math.abs(eb - pb) should be <= roundedTol
      }
    }
    def p2(mode: SumMode) = VectorOps.topTwoComponents(embs, "vec_id", "embedding", 2, mode)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val (e2, f2) = (p2(SumMode.ExactFold), p2(SumMode.PlaneSums))
    f2.keySet shouldBe e2.keySet
    for ((k, (el, eb)) <- e2; (pl, pb) = f2(k)) {
      withClue(s"pc/dim $k: ") {
        math.abs(el - pl) should be <= roundedTol
        math.abs(eb - pb) should be <= roundedTol
      }
    }
  }

  test("empty input fails loudly, not with NoSuchElementException") {
    val empty = embs.filter(org.apache.spark.sql.functions.lit(false))
    val e = intercept[IllegalArgumentException] {
      VectorOps.topTwoComponents(empty, "vec_id", "embedding", 2, SumMode.PlaneSums).collect()
    }
    e.getMessage should include("empty input")
  }
}
