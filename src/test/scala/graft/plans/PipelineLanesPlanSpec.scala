package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.PipelineQueries

/** Plan pins for the q165–q168 lanes: the scale-critical shapes — model
  * table BROADCAST into the token scan (q165), benchmark grams broadcast
  * LEFT SEMI (q167), no global (unpartitioned) Window anywhere near the
  * corpus (q165/q167), and no nested-loop/cartesian joins (all four) — so
  * a future edit can't silently turn the map-side inference/membership
  * shapes into shuffled joins or corpus-wide windows. */
class PipelineLanesPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  private def docsExist = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("q165 classifier: weight model broadcasts; no Window, no nested loop") {
    assume(docsExist)
    val p = plan(PipelineQueries.qualityClassifier(spark, sfDir))
    withClue(p) {
      p should include("BroadcastHashJoin")
      p should not include "Window"
      p should not include "NestedLoop"
      p should not include "CartesianProduct"
    }
  }

  test("q166 join-size: the cells inner product is an equi-join, never cartesian") {
    assume(new java.io.File(s"$sfDir/events.parquet").exists())
    val p = plan(PipelineQueries.cmsJoinSize(spark, sfDir))
    withClue(p) {
      // the (d, bucket) cells join must plan as a real equi-join
      (p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
        p.contains("ShuffledHashJoin")) shouldBe true
      // the only BNLJs allowed are the final cross of four ONE-ROW summary
      // frames; a CartesianProduct would mean a row-level side reached one
      p should not include "CartesianProduct"
    }
  }

  test("q167 overlap decontamination: benchmark grams broadcast as LEFT SEMI") {
    assume(docsExist)
    val p = plan(PipelineQueries.overlapContamination(spark, sfDir))
    withClue(p) {
      p should include("LeftSemi")
      p should include("BroadcastHashJoin")
      p should not include "CartesianProduct"
    }
  }

  test("q168 vocab coverage: no cartesian product; token agg is partial before its exchange") {
    assume(docsExist)
    val p = plan(PipelineQueries.vocabCoverage(spark, sfDir))
    withClue(p) {
      // The V x types theta-join may plan as BNLJ over the broadcast literal
      // size list — acceptable, both inputs are post-agg and tiny. A
      // CartesianProduct would mean a shuffled corpus side reached the join.
      p should not include "CartesianProduct"
      p should include("partial_count") // map-side combine on the token agg
    }
  }
}
