package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.SimilarityQueries

/** RRF fusion contract on a fixture built so the winner is decided by
  * FUSION, not by either ranker alone: one candidate is lexically close but
  * semantically far, one the reverse, and one is merely good on both — the
  * both-lists candidate must outrank both single-list specialists. Values
  * are pinned cross-engine by the DuckDB oracle; this suite pins the
  * fusion semantics. */
class HybridRrfSpec extends SparkSpec with Matchers {

  /** Query doc/vec 0. Doc 10: shares most 3-grams, embedding orthogonal.
    * Doc 20: embedding nearly parallel, no shared grams. Doc 30: second
    * place on both lists. Docs 40+: filler so ranks are meaningful. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-rrf-fixture").toString
    Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (10L, "alpha beta gamma delta epsilon eta"), // lexical near-twin
      (20L, "omega psi chi phi upsilon tau"), // lexically disjoint
      (30L, "alpha beta gamma x y z"), // some shared grams
      (40L, "one two three four five six"),
      (50L, "seven eight nine ten eleven twelve"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def vec(parallel: Double, ortho: Double): Array[Float] =
      Array(parallel.toFloat, ortho.toFloat, 0f, 0f)
    Seq(
      (0L, vec(1.0, 0.0), 0),
      (10L, vec(0.0, 1.0), 0), // orthogonal to the query
      (20L, vec(0.99, 0.1), 0), // semantic near-twin
      (30L, vec(0.80, 0.6), 0), // second-best semantically
      (40L, vec(0.10, 0.9), 0),
      (50L, vec(0.05, 0.9), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private lazy val rows = SimilarityQueries.hybridRrf(spark, dir)
    .collect()
    .filter(_.getLong(0) == 0L)
    .map(r => (r.getInt(1), r.getLong(2)))

  test("the candidate on BOTH lists outranks each single-list specialist") {
    val rankOf = rows.map { case (rk, id) => id -> rk }.toMap
    // doc 30 is (lex rank 2, sem rank 2) -> rrf 2/62; docs 10 and 20 are
    // rank 1 on one list only -> 1/61 < 2/62
    rankOf(30L) should be < rankOf(10L)
    rankOf(30L) should be < rankOf(20L)
    rows.head._2 shouldBe 30L
  }

  test("single-list candidates still surface, ordered by their one rank") {
    val ids = rows.map(_._2)
    ids should contain allOf (10L, 20L)
    // both have identical single-list RRF (rank 1 each) -> id tiebreak
    ids.indexOf(10L) should be < ids.indexOf(20L)
  }
}
