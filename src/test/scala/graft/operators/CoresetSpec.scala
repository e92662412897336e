package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Farthest-point sampling: planted-cluster coverage, the FPS monotonicity
  * invariant, determinism, and edge inputs. */
class CoresetSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // three tight clusters far apart on distinct axes; ids interleaved so
  // cluster membership is not id-contiguous
  private def planted() = Seq(
    (0L, Seq(10f, 0f, 0f)), (3L, Seq(10.1f, 0f, 0f)), (6L, Seq(9.9f, 0.1f, 0f)),
    (1L, Seq(0f, 10f, 0f)), (4L, Seq(0f, 10.1f, 0.1f)), (7L, Seq(0.1f, 9.9f, 0f)),
    (2L, Seq(0f, 0f, 10f)), (5L, Seq(0.1f, 0f, 10.1f)), (8L, Seq(0f, 0.1f, 9.9f))
  ).toDF("id", "v")

  private def cluster(id: Long): Long = id % 3

  test("k=3 picks one representative per planted cluster") {
    val sel = Coreset.farthestPointSample(planted(), "id", "v", k = 3)
      .collect().map(r => r.getLong(1))
    sel.map(cluster).toSet shouldBe Set(0L, 1L, 2L)
  }

  test("min_sq_dist is non-increasing in selection order (FPS invariant)") {
    val ds = Coreset.farthestPointSample(planted(), "id", "v", k = 9)
      .orderBy("sel_rank").collect()
    ds.length shouldBe 9
    ds.head.isNullAt(2) shouldBe true // seed has no previous set
    val dists = ds.tail.map(_.getDouble(2))
    dists.zip(dists.tail).foreach { case (a, b) => b should be <= a }
  }

  test("deterministic across runs and seeds on the lowest id") {
    val a = Coreset.farthestPointSample(planted(), "id", "v", k = 5).collect().toSeq
    val b = Coreset.farthestPointSample(planted(), "id", "v", k = 5).collect().toSeq
    a shouldBe b
    a.head.getLong(1) shouldBe 0L
  }

  test("k larger than corpus stops early; null vectors and null elements excluded") {
    val df = Seq(
      (1L, Some(Seq(Some(1f), Some(0f)))),
      (2L, Some(Seq(Some(0f), Some(1f)))),
      (3L, None: Option[Seq[Option[Float]]]),
      (4L, Some(Seq(Some(1f), None)))
    ).toDF("id", "v")
    val sel = Coreset.farthestPointSample(df, "id", "v", k = 10).collect()
    sel.map(_.getLong(1)).toSet shouldBe Set(1L, 2L)
  }

  test("NULL ids are dropped, not NPE'd (non-numeric strings fail loudly under ANSI)") {
    val df = Seq((None: Option[Long], Seq(1f, 0f)), (Some(7L), Seq(0f, 1f)),
      (Some(9L), Seq(1f, 1f))).toDF("id", "v")
    val sel = Coreset.farthestPointSample(df, "id", "v", k = 5).collect()
    sel.map(_.getLong(1)).toSet shouldBe Set(7L, 9L)
  }

  test("k must be positive") {
    an[IllegalArgumentException] should be thrownBy
      Coreset.farthestPointSample(planted(), "id", "v", k = 0)
  }

  test("FPS == driver-side greedy reference on randomized corpora (fuzz)") {
    val rng = new scala.util.Random(43)
    for (trial <- 1 to 5) {
      val n = 12 + rng.nextInt(20)
      val dim = 1 + rng.nextInt(5)
      val rows = (0 until n).map(i => (i.toLong, Seq.fill(dim)(rng.nextFloat() * 4f - 2f)))
      val k = 1 + rng.nextInt(n + 2)
      val got = Coreset.farthestPointSample(rows.toDF("id", "v"), "id", "v", k)
        .orderBy("sel_rank").collect()
        .map(r => (r.getInt(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))

      // independent reference: plain greedy over doubles
      val vecs = rows.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
      def sq(a: Array[Double], b: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
        s
      }
      val want = scala.collection.mutable.ArrayBuffer[(Int, Long, Option[Double])]()
      var chosen = List(rows.map(_._1).min)
      want += ((1, chosen.head, None))
      while (want.length < math.min(k, n)) {
        val cands = rows.map(_._1).filterNot(chosen.contains)
          .map(id => (id, chosen.map(c => sq(vecs(id), vecs(c))).min))
        val best = cands.minBy { case (id, d) => (-d, id) }
        want += ((want.length + 1, best._1, Some(best._2)))
        chosen ::= best._1
      }
      assert(got.toSeq == want.toSeq, s"trial $trial: n=$n dim=$dim k=$k")
    }
  }
}
