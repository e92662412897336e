package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The merge-intersect kernel must agree with array_intersect cardinality
  * on every sorted-distinct input — fuzzed, plus the edge shapes. */
class SetOpsSpec extends SparkSpec with Matchers {

  test("sortedIntersectSize matches array_intersect on fuzzed sorted sets") {
    import spark.implicits._
    val rng = new Random(7)
    val rows = (0 until 200).map { i =>
      def set() = {
        val n = rng.nextInt(50)
        Array.fill(n)(rng.nextInt(60).toLong).distinct.sorted
      }
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
        SetOps.intersectSize($"a", $"b").as("merge"),
        org.apache.spark.sql.functions.size(array_intersect($"a", $"b")).as("hash"))
      .collect()
    got.foreach { r => r.getInt(0) shouldBe r.getInt(1) }
  }

  test("sortedJaccard is bit-identical to Dedup.jaccard on sorted sets") {
    import spark.implicits._
    val rng = new Random(11)
    val rows = (0 until 200).map { i =>
      def set() = Array.fill(rng.nextInt(40))(rng.nextInt(50).toLong).distinct.sorted
      (i.toLong, set(), set())
    }
    // includes empty-vs-empty rows (NULL expected from both forms)
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
        graft.operators.Dedup.jaccard($"a", $"b").as("ref"),
        SetOps.sortedJaccard($"a", $"b").as("merge"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(0)) r.isNullAt(1) shouldBe true
      else r.getDouble(1) shouldBe r.getDouble(0)
    }
  }

  test("edge shapes: empty, disjoint, identical, subset") {
    import spark.implicits._
    val df = Seq(
      (Array.empty[Long], Array(1L, 2L), 0),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 0),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L), 3),
      (Array(2L, 3L), Array(1L, 2L, 3L, 4L), 2)).toDF("a", "b", "want")
    df.select(SetOps.intersectSize($"a", $"b").as("got"), $"want").collect()
      .foreach(r => r.getInt(0) shouldBe r.getInt(1))
  }
}
