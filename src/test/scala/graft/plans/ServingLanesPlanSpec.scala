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

  test("q228 IVF refresh: map-side assignment, no join/window anywhere") {
    assume(docsExist)
    // arrivals are assigned against centroid PLAN LITERALS (k codegen'd
    // squared-L2 folds + argmin) and merged by union — any Join or Window
    // appearing here means the assignment stopped being map-side
    val p = plan(graft.queries.SimilarityQueries.ivfIndexRefresh(spark, sfDir))
    withClue(p) {
      p should include("Sort")
      p should not include "Join"
      p should not include "Window"
      p should not include "CartesianProduct"
    }
  }

  test("q228/q229: incremental index content equals a from-scratch full assignment") {
    assume(docsExist)
    // the refresh-correctness claim at the DataFrame level (the driver
    // oracle pins it cross-engine; this pins it in-process so a refactor
    // fails fast): prior(even) + arrivals(odd) == assign(ALL) under the
    // same persisted model generation
    val got = graft.queries.SimilarityQueries.ivfIndexRefresh(spark, sfDir)
    // deployed model = the q209 artifact's round(·,8) values, read through
    // the PUBLIC lane (the same file the refresh assigns against)
    val cents = graft.queries.SimilarityQueries.centroidsArtifact(spark, sfDir)
      .collect()
      .groupBy(_.getInt(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }.toSeq.sortBy(_._1)
    val full = graft.operators.KMeans.assignWith(
        graft.queries.QueryRegistry.table(spark, sfDir, "embeddings"),
        "vec_id", "embedding", cents)
      .select(org.apache.spark.sql.functions.col("id").as("vec_id"),
        org.apache.spark.sql.functions.col("cluster"))
    assert(got.count() == full.count())
    assert(got.except(full).count() == 0L)
    assert(full.except(got).count() == 0L)
  }
}
