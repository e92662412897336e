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

  test("zero-norm vector cannot crash or wedge the group") {
    val df = Seq(
      (1L, 10L, 0.9, Seq(1f, 0f)),
      (1L, 11L, 0.99, Seq(0f, 0f)), // zero norm: NaN cosine once anything is selected
      (1L, 12L, 0.5, Seq(0f, 1f))
    ).toDF("q", "id", "rel", "v")
    val out = Mmr.rerank(df, "q", "id", "rel", "v", k = 3, lambda = 0.5)
      .orderBy("mmr_rank").collect().map(_.getLong(2))
    // 11 wins rank 1 on relevance; its NaN cosines are then SKIPPED in the
    // diversity max (no information, not a poison), so the scoreable
    // candidates still rank normally and all three rows come out
    out.toSeq shouldBe Seq(11L, 10L, 12L)
  }

  test("MMR == driver-side greedy reference on randomized candidates (fuzz)") {
    val rng = new scala.util.Random(47)
    for (trial <- 1 to 5) {
      val nq = 1 + rng.nextInt(3)
      val dim = 2 + rng.nextInt(4)
      val lam = Seq(0.0, 0.3, 0.7, 1.0)(rng.nextInt(4))
      val k = 1 + rng.nextInt(6)
      val cands = for {
        q <- 0 until nq
        c <- 0 until (3 + rng.nextInt(10))
      } yield (q.toLong, c.toLong, rng.nextDouble(), Seq.fill(dim)(rng.nextFloat() * 2f - 1f))
      val got = Mmr.rerank(cands.toDF("q", "id", "rel", "v"), "q", "id", "rel", "v", k, lam)
        .orderBy("query_id", "mmr_rank").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        d / (math.sqrt(na) * math.sqrt(nb))
      }
      val want = cands.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
        val pool = cs.map(c => (c._2, c._3, c._4.map(_.toDouble).toArray))
        var sel = Vector.empty[(Long, Double, Array[Double])]
        val out = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
        while (out.length < math.min(k, pool.length)) {
          val scored = pool.filterNot(p => sel.exists(_._1 == p._1)).map { p =>
            val div = if (sel.isEmpty) 0.0 else sel.map(s => cos(s._3, p._3)).max
            (p, lam * p._2 - (1.0 - lam) * div)
          }
          val best = scored.minBy { case (p, s) => (-s, p._1) }
          sel :+= best._1
          out += ((q, out.length + 1, best._1._1))
        }
        out
      }.sortBy(t => (t._1, t._2))
      assert(got.toSeq == want.toSeq, s"trial $trial: nq=$nq dim=$dim k=$k lam=$lam")
    }
  }
}
