package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.CurationQueries

/** The q150 scale-mode contract (the q125 exact/approx pattern applied to
  * admission): the exact per-language Window rank is the oracle-checkable
  * verification shape; the approximate mode — sketch cutoffs broadcast back
  * as a plain filter — is the 100 TB default. Plan shape AND agreement are
  * pinned so an edit can't reintroduce a corpus-wide Window into the approx
  * path or let the two modes drift apart. */
class QuantileAdmissionPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  test("exact admission ranks through a Window (the verification shape)") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val p = plan(CurationQueries.quantileAdmission(spark, sfDir))
    withClue(p) { p should include("Window") }
  }

  test("approx admission has NO Window and broadcasts the cutoffs") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val p = plan(CurationQueries.quantileAdmissionApprox(spark, sfDir))
    withClue(p) {
      p should not include "Window"
      p should include("BroadcastHashJoin")
      p should not include "SortMergeJoin"
    }
  }

  test("approx agrees with exact within 10% admitted per language at sf0.01") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val exact = CurationQueries.quantileAdmission(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = CurationQueries.quantileAdmissionApprox(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.keySet shouldBe exact.keySet
    for ((lang, nApprox) <- approx) {
      val nExact = exact(lang)
      val err = math.abs(nApprox.toDouble - nExact.toDouble) / math.max(nExact.toDouble, 1.0)
      withClue(s"$lang: approx=$nApprox exact=$nExact err=$err") { err should be <= 0.10 }
    }
  }
}
