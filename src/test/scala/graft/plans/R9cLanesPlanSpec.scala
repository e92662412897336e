package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.{CurationQueries, PipelineQueries, SimilarityQueries}

/** Plan pins for the r9c lanes' scale-critical shapes: the JL projection
  * is ONE map-side pass (no exchange at all before the output sort), the
  * boilerplate anti-join and the standardization stats join stay
  * BROADCAST (the small side is small BY CONSTRUCTION — a future edit
  * must not let it become a corpus-wide shuffle join), and the Pareto
  * frontier joins its doc side against a broadcast frontier table. */
class R9cLanesPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  private def embsExist = new java.io.File(s"$sfDir/embeddings.parquet").exists()
  private def docsExist = new java.io.File(s"$sfDir/documents.parquet").exists()

  test("q188 JL projection: no shuffle before the output sort — pure map pass") {
    assume(embsExist)
    val df = SimilarityQueries.jlProjection(spark, sfDir)
    df.collect()
    // strip the final presentation orderBy: its range-partition exchange is
    // the ONLY exchange the plan may contain
    val p = plan(df)
    val exchanges = "Exchange".r.findAllIn(p).length
    withClue(p) {
      exchanges should be <= 2 // rangepartitioning for orderBy (+AQE read)
      p should not include "hashpartitioning" // no aggregate/join shuffle
      p should not include "Join"
    }
  }

  test("q185 boilerplate removal: the span anti-join is BROADCAST, never shuffled") {
    assume(docsExist)
    val p = plan(PipelineQueries.boilerplateSpans(spark, sfDir))
    withClue(p) {
      p should include regex "BroadcastHashJoin .*LeftAnti"
      p should not include "SortMergeJoin"
    }
  }

  test("q187 standardization: the d-row stats join back is BROADCAST") {
    assume(embsExist)
    val p = plan(SimilarityQueries.embeddingStandardize(spark, sfDir))
    withClue(p) {
      p should include("BroadcastHashJoin")
      p should not include "SortMergeJoin"
    }
  }

  test("q194 pareto: docs join a BROADCAST frontier; no cartesian anywhere") {
    assume(docsExist)
    val p = plan(CurationQueries.paretoFrontier(spark, sfDir))
    withClue(p) {
      p should include("BroadcastHashJoin")
      p should not include "CartesianProduct"
      p should not include "BroadcastNestedLoopJoin"
    }
  }
}
