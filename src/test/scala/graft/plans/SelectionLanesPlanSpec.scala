package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.{PipelineQueries, SimilarityQueries, TextQueries}

/** Plan pins for the continuation-session lanes with LIVE returned plans
  * (q176/q179/q181 materialize bounded results driver-side, so their
  * returned plan is a LocalTableScan — their scale shapes are pinned by
  * operator specs instead): the Zipf audit must never plan a cartesian or
  * nested-loop join, MMR must run as a MapGroups over broadcast-joined
  * candidates, and the classifier scoring join must broadcast the weight
  * table, with no corpus-wide Window anywhere. */
class SelectionLanesPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  private def docsExist = new java.io.File(s"$sfDir/documents.parquet").exists()
  private def embsExist = new java.io.File(s"$sfDir/embeddings.parquet").exists()

  test("q175 zipf: word-count + vocabulary regression, no cartesian/nested-loop") {
    assume(docsExist)
    val p = plan(TextQueries.zipfAudit(spark, sfDir))
    withClue(p) {
      p should not include "CartesianProduct"
      p should not include "NestedLoop"
    }
  }

  test("q121 inverted index: df band fires on counts below the LeftSemi, postings collected above it") {
    assume(docsExist)
    // A stopword token's posting list is corpus-sized; the df cutoff must
    // drop it by COUNT before any collect_set buffer materializes it
    // (one group's aggregation buffer cannot spill — the LSH-banding
    // defect class, see Dedup.cappedBuckets).
    val p = plan(TextQueries.invertedIndex(spark, sfDir))
    withClue(p) {
      p should include("LeftSemi")
      // tree prints parents first: the collecting aggregate sits ABOVE the
      // semi join that already dropped the out-of-band tokens
      p.indexOf("collect_set") should be < p.indexOf("LeftSemi")
      p.indexOf("collect_set") should be > -1
    }
  }

  test("q177 mmr: greedy runs as MapGroups; candidates broadcast, corpus never sorted") {
    assume(embsExist)
    val p = plan(SimilarityQueries.mmrRerank(spark, sfDir))
    withClue(p) {
      p should include("MapGroups")
      p should not include "CartesianProduct"
      // the ≤ queries·k candidate list is the broadcast side by explicit
      // hint (BuildLeft on the candidates→corpus join) — a plan that
      // instead builds on the corpus side (what static parquet stats pick)
      // would sort-merge the embeddings at scale
      p should not include "SortMergeJoin"
      p should include regex "BroadcastHashJoin \\[neighbor_id#\\d+L?\\], \\[neighbor_id#\\d+L?\\], Inner, BuildLeft"
    }
  }

  test("q182 scoring: weight table broadcasts; no Window, no cartesian") {
    assume(docsExist)
    val p = plan(PipelineQueries.logregScore(spark, sfDir))
    withClue(p) {
      p should include("BroadcastHashJoin")
      p should not include "Window"
      p should not include "CartesianProduct"
    }
  }
}
