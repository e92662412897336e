package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class KMeansSpec extends SparkSpec with Matchers {

  /** Three planted, well-separated clusters: members of group g sit at
    * g-th axis direction * 10 plus a small per-member wiggle on a far
    * dimension — inter-cluster distance dwarfs intra-cluster spread. Ids
    * interleave groups (id = m*10 + g) so the k lowest-id seeds span all
    * three groups. */
  private def planted(): DataFrame = {
    import spark.implicits._
    val rows = for {
      g <- 0 until 3
      m <- 0 until 20
    } yield {
      val v = Array.fill(8)(0.0f)
      v(g) = 10.0f
      v(7) = m * 0.01f
      (m * 10L + g, v, g)
    }
    rows.toDF("id", "v", "planted")
  }

  test("planted clusters come back pure and deterministic") {
    val df = planted()
    val out = KMeans.assignments(df, "id", "v", k = 3, rounds = 3, SumMode.ExactFold)
      .join(df, Seq("id"))
      .select(col("planted"), col("cluster"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // every planted group maps to exactly one cluster and clusters don't mix
    val byPlanted = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byPlanted.values.foreach(_.size shouldBe 1)
    byPlanted.values.toSeq.distinct.size shouldBe 3

    val again = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 3, SumMode.ExactFold)
      .orderBy("id").collect().toSeq
    val first = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 3, SumMode.ExactFold)
      .orderBy("id").collect().toSeq
    again shouldBe first
  }

  test("seeding is lowest-id: with rounds=1 each seed row lands in its own cluster") {
    val out = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 1, SumMode.ExactFold)
      .filter(col("id").isin(0L, 1L, 2L)) // the three lowest ids = the seeds
      .orderBy("id").collect()
    // each seed IS its cluster's centroid in round 1: own cluster, distance 0
    out.map(_.getInt(1)).toSeq shouldBe Seq(0, 1, 2)
    out.map(_.getDouble(2)).toSeq shouldBe Seq(0.0, 0.0, 0.0)
  }

  test("NULL vectors are dropped, not crashed on; dimension mismatch rows are dropped") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Array(1.0f, 0.0f))),
      (2L, Some(Array(0.9f, 0.1f))),
      (3L, None),
      (4L, Some(Array(0.0f, 1.0f))))
      .toDF("id", "v")
    val out = KMeans.assignments(df, "id", "v", k = 2, rounds = 2, SumMode.ExactFold)
    out.select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 4L)
  }

  test("a NULL element disqualifies a row from seeding but only drops that row") {
    import spark.implicits._
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, null)), // lowest id but unscoreable
      (2L, Array[java.lang.Float](10.0f, 0.0f)),
      (3L, Array[java.lang.Float](0.0f, 10.0f)))
      .toDF("id", "v")
    val out = KMeans.assignments(df, "id", "v", k = 2, rounds = 2, SumMode.ExactFold)
      .orderBy("id").collect()
    // row 1 is dropped (NULL distance), rows 2 and 3 seed clusters 0 and 1
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L, 3L)
    out.map(_.getInt(1)).toSeq shouldBe Seq(0, 1)
  }

  test("assignment stage is map-side: no Exchange in the assignments plan") {
    val plan = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 2, SumMode.ExactFold)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  test("semDeDup drops the higher id of a within-cluster near-dup pair, keeps the lowest") {
    import spark.implicits._
    // two tight pairs inside one planted direction + a loner elsewhere
    val df = Seq(
      (10L, Array(10.0f, 0.0f, 0.0f)),
      (11L, Array(10.0f, 0.001f, 0.0f)), // near-dup of 10 -> dropped
      (20L, Array(0.0f, 10.0f, 0.0f)),
      (21L, Array(0.0f, 10.0f, 0.002f)), // near-dup of 20 -> dropped
      (30L, Array(0.0f, 0.0f, 10.0f)))
      .toDF("id", "v")
    val out = KMeans.semDeDup(df, "id", "v", k = 3, rounds = 2, threshold = 0.99, SumMode.ExactFold)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    out.toSeq shouldBe Seq(
      (10L, false), (11L, true), (20L, false), (21L, true), (30L, false))
  }

  test("semDeDup threshold gates the drop: orthogonal members survive") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(10.0f, 0.0f)),
      (2L, Array(0.0f, 10.0f)))
      .toDF("id", "v")
    // one cluster (k=1) but cosine 0 < threshold -> nobody dropped
    val out = KMeans.semDeDup(df, "id", "v", k = 1, rounds = 1, threshold = 0.5, SumMode.ExactFold)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
    out shouldBe Set((1L, false), (2L, false))
  }

  test("differential fuzz: assignments equal a bit-exact driver-side Lloyd's") {
    import spark.implicits._
    // Reference implementation replicating the operator's contracts in
    // plain Scala: lowest-id seeding, element-order squared-L2 fold with
    // float->double widening, (d, cid) argmin tie-break, id-ordered mean
    // folds. Same IEEE ops on the same values in the same order -> results
    // must be EXACTLY equal, distances included.
    def refKMeans(rows: Seq[(Long, Array[Float])], k: Int, rounds: Int): Map[Long, (Int, Double)] = {
      var cents: Seq[(Int, Array[Double])] =
        rows.sortBy(_._1).take(k).zipWithIndex.map { case ((_, v), i) => i -> v.map(_.toDouble) }
      def sq(v: Array[Float], c: Array[Double]): Double = {
        var a = 0.0; var i = 0
        while (i < v.length) { val d = v(i).toDouble - c(i); a += d * d; i += 1 }
        a
      }
      def assign(): Map[Long, (Int, Double)] = rows.map { case (id, v) =>
        val (d, cid) = cents.map { case (cid, c) => (sq(v, c), cid) }.min
        id -> (cid, d)
      }.toMap
      for (_ <- 1 until rounds) {
        val asg = assign()
        cents = rows.groupBy(r => asg(r._1)._1).toSeq.map { case (cid, members) =>
          val sorted = members.sortBy(_._1)
          val dim = sorted.head._2.length
          cid -> Array.tabulate(dim) { d =>
            var a = 0.0
            sorted.foreach { case (_, v) => a += v(d).toDouble }
            a / sorted.size
          }
        }.sortBy(_._1)
      }
      assign()
    }

    val rng = new scala.util.Random(2026)
    for (trial <- 1 to 8) {
      val n = 10 + rng.nextInt(50)
      val dim = 2 + rng.nextInt(4)
      val k = 2 + rng.nextInt(4)
      val rounds = 1 + rng.nextInt(3)
      val rows = (0 until n).map(i => (i.toLong, Array.fill(dim)(rng.nextFloat() * 10 - 5)))
      val expected = refKMeans(rows, k, rounds)
      val got = KMeans.assignments(rows.toDF("id", "v"), "id", "v", k, rounds, SumMode.ExactFold)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      withClue(s"trial $trial (n=$n dim=$dim k=$k rounds=$rounds): ") {
        got shouldBe expected
      }
    }
  }

  test("k larger than distinct rows still works (empty clusters vanish)") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(10.0f, 0.0f)),
      (2L, Array(10.0f, 0.1f)),
      (3L, Array(0.0f, 10.0f)))
      .toDF("id", "v")
    // k=3 seeds on ids 1,2,3; after one update rows 1,2 merge toward their
    // shared direction — rounds=3 must not fail if a cluster empties
    val out = KMeans.assignments(df, "id", "v", k = 3, rounds = 3, SumMode.ExactFold)
    out.count() shouldBe 3L
    out.select("cluster").distinct().count() should be <= 3L
  }

  test("PlaneSums update cells plan with NO per-group collect (plain partial-agg mean)") {
    val assigned = KMeans.assignWith(planted(), "id", "v",
        KMeans.trainCentroids(planted(), "id", "v", k = 3, rounds = 1, SumMode.ExactFold))
      .join(planted().select(col("id"), col("v")), Seq("id"))
    val df = KMeans.updateCells(assigned, SumMode.PlaneSums)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    withClue(p) {
      p should not include "collect_list"
      p should not include "sort_array"
      p should include("HashAggregate")
    }
    val pe = KMeans.updateCells(assigned, SumMode.ExactFold)
      .queryExecution.executedPlan.toString
    withClue(pe) { pe should include("collect_list") }
  }

  test("SumMode agreement: PlaneSums centroids match ExactFold within 1e-9 relative") {
    val df = planted()
    def train(mode: SumMode) =
      KMeans.trainCentroids(df, "id", "v", k = 3, rounds = 3, mode).toMap
    val exact = train(SumMode.ExactFold)
    val plain = train(SumMode.PlaneSums)
    plain.keySet shouldBe exact.keySet
    exact.size should be > 0
    for ((cid, ec) <- exact) {
      val pc = plain(cid)
      pc.length shouldBe ec.length
      for (d <- ec.indices) {
        val rel = math.abs(ec(d) - pc(d)) / math.max(math.abs(ec(d)), 1e-30)
        withClue(s"cluster $cid dim $d exact=${ec(d)} plain=${pc(d)}: ") {
          rel should be <= 1e-9
        }
      }
    }
    // and the assignments those centroids induce agree exactly on planted data
    val ae = KMeans.assignWith(df, "id", "v", exact.toSeq.sortBy(_._1))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ap = KMeans.assignWith(df, "id", "v", plain.toSeq.sortBy(_._1))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ap shouldBe ae
  }
}
