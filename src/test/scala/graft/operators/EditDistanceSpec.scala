package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class EditDistanceSpec extends SparkSpec with Matchers {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "the quick brown fox jumped"), // dist 2 from 0
      (2L, "the quick brown dog jumps"),  // dist 2 from 0 (f→d, x→g)
      (3L, "the quick crown fox jumps"),  // dist 1 from 0
      (4L, "a completely different one"),
      (5L, "the quick brown fox jumps"),  // exact dup of 0
      (6L, null.asInstanceOf[String]))
      .toDF("id", "s")
  }

  test("blocked pairs match the unbanded brute force over the same blocks") {
    import spark.implicits._
    val got = Dedup.editDistancePairs(corpus, "id", "s",
      blockCol = substring(col("s"), 1, 10), maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // brute force: same blocking, plain 2-arg levenshtein (different code
    // path than the banded threshold variant), no length prefilter
    val rows = corpus.filter($"s".isNotNull)
      .select($"id", $"s", substring($"s", 1, 10).as("blk"))
    val brute = rows.as("a").join(rows.as("b"),
        col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.s"), col("b.s")).as("dist"))
      .filter($"dist" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    got shouldBe brute
    got should contain((0L, 3L, 1))
    got should contain((0L, 5L, 0))
    got.map(_._1) should not contain 6L
  }

  test("distances are exact for kept pairs and bounded by maxDist") {
    val got = Dedup.editDistancePairs(corpus, "id", "s",
      blockCol = substring(col("s"), 1, 10), maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    all(got.map(_._3)) should be <= 1
    // (0,3) dist 1 survives at threshold 1; (0,1) dist 2 must be gone
    got.map(t => (t._1, t._2)) should contain((0L, 3L))
    got.map(t => (t._1, t._2)) should not contain ((0L, 1L))
  }

  test("negative maxDist rejected") {
    an[IllegalArgumentException] should be thrownBy
      Dedup.editDistancePairs(corpus, "id", "s", col("s"), maxDist = -1)
  }
}
