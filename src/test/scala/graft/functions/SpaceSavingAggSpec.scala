package graft.functions

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The TypedImperativeAggregate surface: per-group candidate supersets
  * under adversarial partitionings (the omission bound, exercised through
  * Spark's real partial/merge/serialize machinery), null handling, and the
  * serialize round trip. */
class SpaceSavingAggSpec extends SparkSpec with Matchers {

  test("per-group candidates are a superset of every true heavy hitter across partitionings") {
    import spark.implicits._
    val rng = new Random(7)
    // two groups with Zipf-ish skew: a few hot tokens + a noise tail
    val rows = (1 to 4000).map { _ =>
      val g = if (rng.nextBoolean()) "g1" else "g2"
      val t =
        if (rng.nextInt(10) < 6) s"hot${rng.nextInt(3)}"
        else s"cold${rng.nextInt(500)}"
      (g, t)
    }
    val k = 10
    for (parts <- Seq(1, 3, 17)) {
      val df = rows.toDF("g", "t").repartition(parts)
      val out = df.groupBy($"g")
        .agg(SpaceSavingCandidates.candidates($"t", 4 * k).as("c"))
        .collect().map { r =>
          val entries = r.getSeq[org.apache.spark.sql.Row](1)
          r.getString(0) -> (entries.map(_.getString(0)).toSet,
            entries.map(_.getLong(1)).sum)
        }.toMap
      // ground truth per group
      val byGroup = rows.groupBy(_._1)
      for ((g, grp) <- byGroup) {
        val total = grp.size
        val counts = mutable.HashMap.empty[String, Int]
        grp.foreach { case (_, t) => counts.update(t, counts.getOrElse(t, 0) + 1) }
        val heavy = counts.filter { case (_, c) => c.toLong * k > total }.keySet
        heavy should not be empty
        val (candSet, cntSum) = out(g)
        withClue(s"group $g parts=$parts missing=${heavy -- candSet}") {
          (heavy -- candSet) shouldBe empty
        }
        // the SpaceSaving invariant survives partials + sum-merge: tracked
        // counts sum to the group's item count
        cntSum shouldBe total.toLong
      }
    }
  }

  test("null inputs are ignored; all-null group yields an empty candidate array") {
    import spark.implicits._
    val df = Seq(("g1", Option("a")), ("g1", None), ("g2", None))
      .toDF("g", "t")
    val out = df.groupBy($"g")
      .agg(SpaceSavingCandidates.candidates($"t", 8).as("c"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getString(0), e.getLong(1)))).toMap
    out("g1") shouldBe Seq(("a", 1L))
    out("g2") shouldBe Seq.empty
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = SpaceSavingCandidates(
      org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), capacity = 4)
    val b = mutable.HashMap("alpha" -> 3L, "βeta" -> 7L, "" -> 1L)
    agg.deserialize(agg.serialize(b)) shouldBe b
  }

  test("non-string input fails at analysis, not mid-job") {
    import spark.implicits._
    val df = Seq(("g", 1L)).toDF("g", "x")
    an[Exception] should be thrownBy
      df.groupBy($"g").agg(SpaceSavingCandidates.candidates($"x", 8)).collect()
  }

  test("capacity contract enforced") {
    an[IllegalArgumentException] should be thrownBy
      SpaceSavingCandidates(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("x")), capacity = 0)
  }
}
