package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.{DedupQueries, StreamingQueries}

/** Plan pins for the dedup-serving lanes (q222–q226): the scale-critical
  * shapes — candidate confirmation is equi-joined (never cartesian), no
  * corpus-wide Window anywhere, and the refresh merge stays a plain union +
  * write (no join at all) — so a future edit can't silently turn the
  * candidates-only serving loop into an all-pairs pass. */
class ServingLanesPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  private def docsExist = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("q225 serving: confirmation is equi-joined candidates, no cartesian/window") {
    assume(docsExist)
    val p = plan(StreamingQueries.streamNearDupServe(spark, sfDir))
    withClue(p) {
      // drained pairs join the gram sets via real equi-joins
      (p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin") ||
        p.contains("SortMergeJoin")) shouldBe true
      p should not include "CartesianProduct"
      p should not include "NestedLoop"
      p should not include "Window"
    }
  }

  test("q226 refresh: the reloaded new generation is a bare scan+sort, no join") {
    assume(docsExist)
    // the merge itself is a union WRITE inside the method; the returned
    // frame is the reload of the new generation — pin that serving reads
    // of the refreshed index stay scan-shaped
    val p = plan(DedupQueries.minhashIndexRefresh(spark, sfDir))
    withClue(p) {
      p should include("Sort")
      p should not include "Join"
      p should not include "CartesianProduct"
    }
  }
}
