package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec with Matchers {

  test("bucketed range join is row-identical to the nested-loop form, overlapping ranges included") {
    import spark.implicits._
    val points = (0 until 2000).map(i => (i.toLong, (i % 997) * 0.37)).toDF("pid", "v")
    // overlapping + disjoint + empty + sub-width + width-straddling ranges
    val ranges = Seq(
      ("a", 0.0, 50.0), ("b", 25.0, 120.0), ("c", 100.0, 100.5),
      ("d", 359.0, 370.0), ("e", 500.0, 600.0), ("f", 0.0, 400.0))
      .toDF("rid", "lo", "hi")

    val plain = points.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .select($"pid", $"rid").collect().map(_.toSeq).toSet
    val bucketed = RangeJoin.bucketed(points, ranges, "v", "lo", "hi", width = 10.0)
      .select($"pid", $"rid").collect().map(_.toSeq).toSet
    bucketed shouldBe plain
    // overlap really exercised: some point matched >1 range
    bucketed.size should be > bucketed.map(_.head).size
  }

  test("boundary values: lo inclusive, hi exclusive, exact bucket-edge values") {
    import spark.implicits._
    val points = Seq((1L, 10.0), (2L, 19.999), (3L, 20.0), (4L, 9.999)).toDF("pid", "v")
    val ranges = Seq(("r", 10.0, 20.0)).toDF("rid", "lo", "hi")
    val got = RangeJoin.bucketed(points, ranges, "v", "lo", "hi", width = 10.0)
      .select($"pid").as[Long].collect().toSet
    got shouldBe Set(1L, 2L)
  }

  test("bucketed form plans an equi (hash) join, never a nested loop") {
    import spark.implicits._
    val points = (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("pid", "v")
    val ranges = Seq(("r", 0.0, 50.0)).toDF("rid", "lo", "hi")
    val bucketedPlan = RangeJoin.bucketed(points, ranges, "v", "lo", "hi", 10.0)
      .queryExecution.executedPlan.toString
    bucketedPlan should not include "BroadcastNestedLoopJoin"
    bucketedPlan should include regex "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
    // the declarative containment join is the nested loop we're avoiding
    val plainPlan = points.join(ranges, $"v" >= $"lo" && $"v" < $"hi")
      .queryExecution.executedPlan.toString
    plainPlan should include("BroadcastNestedLoopJoin")
  }

  test("fan-out guard: a range spanning >= maxChunksPerRow buckets fails loudly") {
    import spark.implicits._
    val points = Seq((1L, 5.0)).toDF("pid", "v")
    val ranges = Seq(("r", 0.0, 100.0)).toDF("rid", "lo", "hi")
    // 100 buckets at width 1.0 under a cap of 10: the row's bucket array
    // would be materialized in memory — must raise, naming the interval
    val e = intercept[Exception] {
      RangeJoin.bucketed(points, ranges, "v", "lo", "hi", width = 1.0,
        maxChunksPerRow = 10L).collect()
    }
    e.getMessage should include("spans >= 10 buckets")
    // just under the cap still works and answers exactly
    RangeJoin.bucketed(points, ranges, "v", "lo", "hi", width = 1.0,
        maxChunksPerRow = 101L)
      .select($"pid").as[Long].collect().toSeq shouldBe Seq(1L)
  }

  test("non-positive width rejected") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("pid", "v")
    an[IllegalArgumentException] should be thrownBy
      RangeJoin.bucketed(df, df.toDF("rid", "lo").withColumn("hi", lit(2.0)),
        "v", "lo", "hi", width = 0.0)
  }
}
