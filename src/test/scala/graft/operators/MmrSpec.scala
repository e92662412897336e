package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** MMR re-ranking: λ=1 degenerates to pure relevance order, the diversity
  * term actually demotes near-duplicates, determinism, edge inputs. */
class MmrSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // one query; two near-identical high-rel candidates (10, 11) plus an
  // orthogonal mid-rel one (12)
  private def cands() = Seq(
    (1L, 10L, 0.95, Seq(1f, 0f)),
    (1L, 11L, 0.94, Seq(0.999f, 0.001f)),
    (1L, 12L, 0.80, Seq(0f, 1f))
  ).toDF("q", "id", "rel", "v")

  test("lambda = 1 is pure relevance ranking") {
    val out = Mmr.rerank(cands(), "q", "id", "rel", "v", k = 3, lambda = 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    out.toSeq shouldBe Seq(10L, 11L, 12L)
  }

  test("diversity term demotes the near-duplicate") {
    val out = Mmr.rerank(cands(), "q", "id", "rel", "v", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    // 11 is nearly identical to the first pick, so the orthogonal 12 wins
    // rank 2 despite lower relevance
    out.toSeq shouldBe Seq(10L, 12L, 11L)
  }

  test("k caps output; short candidate lists exhaust cleanly; groups are independent") {
    val two = Seq(
      (1L, 10L, 0.9, Seq(1f, 0f)), (1L, 11L, 0.8, Seq(0f, 1f)),
      (2L, 20L, 0.7, Seq(1f, 1f))
    ).toDF("q", "id", "rel", "v")
    val out = Mmr.rerank(two, "q", "id", "rel", "v", k = 5, lambda = 0.7)
      .orderBy("query_id", "mmr_rank").collect()
    out.count(_.getLong(0) == 1L) shouldBe 2
    out.count(_.getLong(0) == 2L) shouldBe 1
  }

  test("null rel or vector rows are dropped; ties break on lowest id") {
    val df = Seq(
      (1L, Some(10L), Some(0.9), Some(Seq(1f, 0f))),
      (1L, Some(11L), None: Option[Double], Some(Seq(1f, 0f))),
      (1L, Some(12L), Some(0.9), Some(Seq(1f, 0f))),
      (1L, Some(13L), Some(0.5), None: Option[Seq[Float]])
    ).toDF("q", "id", "rel", "v")
    val out = Mmr.rerank(df, "q", "id", "rel", "v", k = 4, lambda = 1.0)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    out.toSeq shouldBe Seq(10L, 12L) // equal rel: lowest id first; null rows gone
  }

  test("parameter validation") {
    an[IllegalArgumentException] should be thrownBy
      Mmr.rerank(cands(), "q", "id", "rel", "v", k = 0, lambda = 0.5)
    an[IllegalArgumentException] should be thrownBy
      Mmr.rerank(cands(), "q", "id", "rel", "v", k = 1, lambda = 1.5)
  }
}
