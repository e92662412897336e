package graft.operators

import scala.util.Random

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class OrderedScanSpec extends SparkSpec with Matchers {

  test("imperative fold equals the lag-window formulation on random data") {
    import spark.implicits._
    val rng = new Random(11)
    // many keys per partition, shuffled input order, duplicate timestamps
    val rows = rng.shuffle((0 until 50).flatMap { k =>
      (0 until rng.nextInt(20) + 1).map(_ => (k.toLong, rng.nextInt(1000).toLong))
    }.toVector)
    val df = rows.toDF("k", "t").repartition(7) // scatter keys across partitions

    val got = OrderedScan.perKeyGapStats(df, "k", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val w = Window.partitionBy($"k").orderBy($"t")
    val exp = df.withColumn("pt", lag($"t", 1).over(w))
      .groupBy($"k")
      .agg(count(lit(1)).as("n"),
        coalesce(max($"t" - $"pt"), lit(0L)).as("mx"),
        coalesce(sum($"t" - $"pt"), lit(0L)).as("sm"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    got shouldBe exp
  }

  test("single-event keys report zero gaps; NULLs dropped") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(10L)), (Some(2L), Some(5L)), (Some(2L), Some(9L)),
      (None, Some(1L)), (Some(3L), None))
      .toDF("k", "t")
    val got = OrderedScan.perKeyGapStats(df, "k", "t")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got shouldBe Map(1L -> ((1L, 0L, 0L)), 2L -> ((2L, 4L, 4L)))
  }
}
