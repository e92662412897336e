package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.RelationalQueries

/** The q125 scale-mode contract: the exact column profile is a CHOICE
  * (Expand-based multi-distinct — right at verification scale), and the
  * approximate profile is the 100 TB default (single pass, HLL++ buffers,
  * no row multiplication). Plan shape AND agreement are pinned so a future
  * edit can't silently re-introduce Expand into the approx path or let the
  * two modes drift apart. */
class ProfileAuditPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  test("exact profile scan: one single-distinct branch per column, no Expand") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    // the raw scan the train_profile_exact trainer pays once per dir;
    // q125/q214 then serve its memoized 11 rows. r18: the multi-distinct
    // Expand form (row replication ×ncols+1, 12-slot partial-agg keys) was
    // replaced by a union of per-column single-distinct aggregates — the
    // classic two-phase distinct, no row multiplication, each branch
    // scanning only its own parquet column. Still EXACT: countDistinct per
    // branch, the same UNION-ALL shape the DuckDB oracle executes.
    val p = plan(RelationalQueries.profileAuditExactScan(spark, sfDir))
    withClue(p) {
      p should not include "Expand"
      p should include("Union")
      p should include("count(distinct ")
    }
  }

  test("approx profile has NO Expand and no distinct aggregation") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val p = plan(RelationalQueries.profileAuditApprox(spark, sfDir))
    withClue(p) {
      p should not include "Expand"
      // one partial+final aggregate pair over the scan, nothing more
      p should include("HashAggregate")
    }
  }

  test("approx agrees with exact within HLL error (rsd 2%, gate at 10%) at sf0.01") {
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists())
    val exact = RelationalQueries.profileAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = RelationalQueries.profileAuditApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    approx.keySet shouldBe exact.keySet
    for ((c, (nNulls, est)) <- approx) {
      val (exNulls, exDst) = exact(c)
      nNulls shouldBe exNulls // null counts are exact in both modes
      val err = math.abs(est.toDouble - exDst.toDouble) / math.max(exDst.toDouble, 1.0)
      withClue(s"$c: est=$est exact=$exDst err=$err") { err should be <= 0.10 }
    }
  }
}
