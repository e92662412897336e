package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.{PipelineQueries, RelationalQueries}

/** Plan pins for the round-9 scale fixes — the shapes the sf1 rehearsal
  * proved matter. Each pin asserts the PLAN property whose silent loss
  * would reintroduce a measured superlinearity or a shuffled model join.
  */
class ScaleShapePlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  test("q130: the null-safe join joins AGGREGATES, not row-level sides") {
    assume(new java.io.File(s"$sfDir/customer.parquet").exists())
    val df = RelationalQueries.nullSafeJoin(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan.toString
    // both join children must be aggregates (the count factorization) —
    // a row-level <=> join on the 25-value nation key materializes
    // |C|x|S|/25 rows just to count them (22x at the sf1 rehearsal)
    val joinIdx = plan.indexOf("Join")
    joinIdx should be >= 0
    val below = plan.substring(joinIdx)
    below.split('\n').count(_.contains("Aggregate")) should be >= 2
    // and the result still carries the null-safe comparison
    plan should include("<=>")
  }

  test("q138: train-side model tables broadcast at bench SF") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val (df, release) = PipelineQueries.lmNoveltyPlan(spark, sfDir)
    try {
      val p = executedPlan(df)
      withClue(p) {
        // both the bigram and unigram left joins must be broadcast builds
        // under the row cap (aggregates defeat Catalyst size estimation, so
        // without the explicit gate these were shuffled joins)
        p.split('\n').count(l =>
          l.contains("BroadcastHashJoin") && l.contains("LeftOuter")) should be >= 2
        p should not include "CartesianProduct"
      }
    } finally release()
  }
}
