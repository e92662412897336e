package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** IntervalJoin.overlap must be ROW-IDENTICAL to the naive theta join —
  * including duplicates (the report-once rule replaces a post-join distinct,
  * so a double-counted pair is the failure mode to pin) — and must plan as
  * an equi-join on the chunk id, never a nested loop. */
class IntervalJoinSpec extends SparkSpec with Matchers {

  private def intervals(seed: Int, n: Int, maxSpan: Int) = {
    import spark.implicits._
    val rng = new Random(seed)
    (0 until n).map { i =>
      val lo = rng.nextInt(1000)
      (i.toLong, lo.toDouble, (lo + 1 + rng.nextInt(maxSpan)).toDouble)
    }.toDF("id", "lo", "hi")
  }

  for (width <- Seq(1.0, 7.0, 50.0, 1000.0)) {
    test(s"overlap == theta join, exactly once per pair (width=$width)") {
      val a = intervals(1, 400, 40)
      val b = intervals(2, 300, 25)
        .toDF("rid", "rlo", "rhi")
      val got = IntervalJoin.overlap(a, b, "lo", "hi", "rlo", "rhi", width)
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = a.join(b, col("lo") < col("rhi") && col("rlo") < col("hi"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      got.length shouldBe want.length // catches double-reports, not just set-misses
      got.sorted shouldBe want.sorted
      want.length should be > 0 // non-vacuous
    }
  }

  // Randomized rounds in the reference's own property style (its suite runs
  // 20 random (count, length, split) rounds with the seed logged): random
  // width/sizes/spans, including spans far larger and far smaller than the
  // chunk width, must stay pair-exact vs the theta join.
  test("randomized rounds: overlap == theta join under random width/size/span (seed=8)") {
    val rng = new Random(8)
    for (round <- 1 to 10) {
      val width = Seq(0.5, 3.0, 17.0, 128.0, 2048.0)(rng.nextInt(5))
      val a = intervals(rng.nextInt(10000), 50 + rng.nextInt(300), 1 + rng.nextInt(120))
      val b = intervals(rng.nextInt(10000), 50 + rng.nextInt(300), 1 + rng.nextInt(120))
        .toDF("rid", "rlo", "rhi")
      val got = IntervalJoin.overlap(a, b, "lo", "hi", "rlo", "rhi", width)
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = a.join(b, col("lo") < col("rhi") && col("rlo") < col("hi"))
        .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      withClue(s"round=$round width=$width") {
        got.length shouldBe want.length
        got.sorted shouldBe want.sorted
      }
    }
  }

  test("zero-length and inverted intervals never match") {
    import spark.implicits._
    val a = Seq((1L, 10.0, 10.0), (2L, 30.0, 20.0)).toDF("id", "lo", "hi")
    val b = Seq((9L, 0.0, 100.0)).toDF("rid", "rlo", "rhi")
    IntervalJoin.overlap(a, b, "lo", "hi", "rlo", "rhi", 5.0).count() shouldBe 0
  }

  test("extraKeys confine matches to the key partition") {
    import spark.implicits._
    val a = Seq((1L, "u1", 0.0, 10.0), (2L, "u2", 0.0, 10.0)).toDF("id", "k", "lo", "hi")
    val b = Seq((8L, "u1", 5.0, 15.0), (9L, "u3", 5.0, 15.0)).toDF("rid", "k", "lo2", "hi2")
    val got = IntervalJoin.overlap(a, b, "lo", "hi", "lo2", "hi2", 5.0, extraKeys = Seq("k"))
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    got.toSeq shouldBe Seq((1L, 8L))
  }

  test("fan-out guard: an interval spanning >= maxChunksPerRow chunks fails loudly") {
    import spark.implicits._
    val a = Seq((1L, 0.0, 100.0)).toDF("id", "lo", "hi") // 100 chunks at width 1
    val b = Seq((9L, 5.0, 6.0)).toDF("rid", "rlo", "rhi")
    val e = intercept[Exception] {
      IntervalJoin.overlap(a, b, "lo", "hi", "rlo", "rhi", width = 1.0,
        maxChunksPerRow = 10L).collect()
    }
    e.getMessage should include("spans >= 10 chunks")
    // just at the boundary still works and answers exactly
    IntervalJoin.overlap(a, b, "lo", "hi", "rlo", "rhi", width = 1.0,
        maxChunksPerRow = 101L)
      .select($"id", $"rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq shouldBe Seq((1L, 9L))
  }

  test("plans as an equi-join on the chunk id — no nested loop") {
    val a = intervals(3, 500, 30)
    val b = intervals(4, 500, 30).toDF("rid", "rlo", "rhi")
    val df = IntervalJoin.overlap(a, b, "lo", "hi", "rlo", "rhi", 10.0)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val p = { val i = s.indexOf("== Initial Plan =="); if (i >= 0) s.substring(0, i) else s }
    withClue(p) { p should not include "NestedLoop" }
  }
}
