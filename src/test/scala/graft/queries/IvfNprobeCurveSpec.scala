package graft.queries

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The q221 multi-probe contract: recall@10 is MONOTONE in nprobe. More
  * probed cells give a superset of candidates, and any exact-top-10 member
  * present in the candidate set necessarily makes the approximate top-10
  * (at most 9 other corpus vectors beat it anywhere), so hits can only
  * grow — a broken probe selector or candidate join shows up as an
  * inversion here long before a recall number merely "looks low". */
class IvfNprobeCurveSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.01"

  test("q221 recall@10 is monotone in nprobe (1 <= 2 <= 4 <= 8) per query") {
    assume(new java.io.File(s"$sfDir/embeddings.parquet").exists())
    val rows = SimilarityQueries.annRecallAudit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val queries = rows.keys.map(_._2).toSeq.distinct.sorted
    queries should not be empty
    for (q <- queries) {
      val np1 = rows(("ivf_np1", q)); val np2 = rows(("ivf_np2", q))
      val np4 = rows(("ivf_np4", q)); val np8 = rows(("ivf", q))
      withClue(s"query $q: np1=$np1 np2=$np2 np4=$np4 np8=$np8") {
        np1 should be <= np2
        np2 should be <= np4
        np4 should be <= np8
      }
    }
    // the curve must actually climb somewhere, or the audit isn't a curve
    val gain = queries.map(q => rows(("ivf", q)) - rows(("ivf_np1", q))).sum
    gain should be > 0.0
  }
}
