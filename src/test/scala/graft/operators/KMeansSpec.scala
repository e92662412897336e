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
    val out = KMeans.assignments(df, "id", "v", k = 3, rounds = 3)
      .join(df, Seq("id"))
      .select(col("planted"), col("cluster"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    // every planted group maps to exactly one cluster and clusters don't mix
    val byPlanted = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    byPlanted.values.foreach(_.size shouldBe 1)
    byPlanted.values.toSeq.distinct.size shouldBe 3

    val again = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 3)
      .orderBy("id").collect().toSeq
    val first = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 3)
      .orderBy("id").collect().toSeq
    again shouldBe first
  }

  test("seeding is lowest-id: with rounds=1 each seed row lands in its own cluster") {
    val out = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 1)
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
    val out = KMeans.assignments(df, "id", "v", k = 2, rounds = 2)
    out.select("id").collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L, 4L)
  }

  test("assignment stage is map-side: no Exchange in the assignments plan") {
    val plan = KMeans.assignments(planted(), "id", "v", k = 3, rounds = 2)
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
    val out = KMeans.semDeDup(df, "id", "v", k = 3, rounds = 2, threshold = 0.99)
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
    val out = KMeans.semDeDup(df, "id", "v", k = 1, rounds = 1, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(3))).toSet
    out shouldBe Set((1L, false), (2L, false))
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
    val out = KMeans.assignments(df, "id", "v", k = 3, rounds = 3)
    out.count() shouldBe 3L
    out.select("cluster").distinct().count() should be <= 3L
  }
}
