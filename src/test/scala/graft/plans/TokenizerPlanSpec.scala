package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.{CurationQueries, PipelineQueries}

/** 100 TB plan-shape pins for the tokenizer/heavy-hitter lanes: the
  * corpus-facing joins must be BROADCAST (candidate and merge tables are
  * bounded by construction), never shuffled sort-merge; and the heavy-
  * hitter verification pass must reach the scan as a semi-join, so corpus
  * rows outside the candidate set are dropped map-side instead of
  * traveling through an exchange keyed on every distinct token. */
class TokenizerPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  test("q164: candidate filter is a broadcast LEFT SEMI join, no sort-merge join") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val p = plan(PipelineQueries.heavyHitters(spark, sfDir))
    withClue(p) {
      p should include("BroadcastHashJoin")
      p.toLowerCase should include("leftsemi")
      p should not include "SortMergeJoin"
    }
  }

  test("q162: merge table is driver-built — the plan is a local scan, no corpus join") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    // The lane's corpus work happens in the bounded dict collect before the
    // returned DataFrame exists; the result plan itself must be local rows.
    val p = plan(CurationQueries.bpeTrainLane(spark, sfDir))
    withClue(p) {
      p should not include "Join"
      p should not include "FileScan"
    }
  }

  test("q163: encode fans out from the word dict, never joins the corpus twice") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val p = plan(CurationQueries.bpeEncodeLane(spark, sfDir))
    withClue(p) {
      // one corpus aggregation (word counts) then vocab-sized work: the
      // plan must not contain any join at all.
      p should not include "Join"
    }
  }
}
