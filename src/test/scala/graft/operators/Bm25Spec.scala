package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.TextQueries

/** BM25 semantics on a fixture where the ranking is computable by eye, plus
  * the plan shape the lane promises: the query-term whitelist joins
  * broadcast, and the per-query top-k is the bounded TopKByScore aggregate,
  * never a corpus-sized Window. Cross-engine VALUES are pinned by the
  * DuckDB oracle gate; this suite pins behavior and the physical plan. */
class Bm25Spec extends SparkSpec with Matchers {

  /** Corpus where query 'q1' = {hash, join} separates cleanly:
    * doc 0 has both terms, doc 1 one term twice, doc 2 one term once,
    * doc 3 none. All docs the same length, so the length norm cancels. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-bm25-fixture").toString
    Seq(
      (0L, "hash join alpha beta", "en", "web", 20L),
      (1L, "hash hash alpha beta", "en", "web", 20L),
      (2L, "hash alpha beta gamma", "en", "web", 21L),
      (3L, "alpha beta gamma delta", "en", "web", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val q1 = TextQueries.bm25TopK(spark, dir)
    .collect()
    .filter(_.getString(0) == "q1")
    .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))

  test("both-term doc outranks repeated-single-term doc outranks single hit; no-hit doc absent") {
    // idf-weighted: two distinct terms beat the same term twice (tf
    // saturates at k1), which beats a single occurrence
    q1.map(_._2) shouldBe Array(0L, 1L, 2L)
    val byDoc = q1.map(t => t._2 -> t._3).toMap
    byDoc(0L) should be > byDoc(1L)
    byDoc(1L) should be > byDoc(2L)
  }

  test("ranks are dense from 1 and scores non-increasing") {
    q1.map(_._1) shouldBe Array(1, 2, 3)
    q1.map(_._3).sliding(2).foreach { case Array(a, b) => a should be >= b }
  }

  test("plan: term whitelist broadcasts; top-k is the bounded aggregate, not a Window") {
    val p = TextQueries.bm25TopK(spark, dir).queryExecution.executedPlan.toString
    withClue(p) {
      p should include("BroadcastHashJoin")
      p should not include "Window"
    }
  }
}
