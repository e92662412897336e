package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the Morton interleave against a naive bit loop, its locality
  * property, range checking, and SQL registration. */
class ZOrderSpec extends SparkSpec with Matchers {

  private def naive(x: Long, y: Long): Long = {
    var z = 0L
    (0 until 16).foreach { b =>
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
    }
    z
  }

  test("matches the naive bit loop across the domain") {
    val probes = Seq(0L, 1L, 2L, 150L, 1439L, 0xFFFFL, 0xAAAAL, 0x5555L, 12345L)
    for (x <- probes; y <- probes)
      withClue(s"($x, $y): ") { ZOrder.interleave16(x, y) shouldBe naive(x, y) }
  }

  test("z-range buckets cover bounded rectangles (the pruning property)") {
    import spark.implicits._
    val pts = for (x <- 0L until 256L; y <- 0L until 256L) yield (x, y)
    val stats = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zvalue2($"x", $"y").as("z"))
      .groupBy(shiftright($"z", 10).as("b")) // 64 buckets of 2^10 z-values
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .collect()
    stats.length shouldBe 64
    // a 2^10 z-range spans at most 2^5 values of each dimension
    stats.foreach { r =>
      r.getLong(1) should be < 32L
      r.getLong(2) should be < 32L
    }
  }

  test("rejects out-of-range inputs instead of silently wrapping") {
    an[IllegalArgumentException] should be thrownBy ZOrder.interleave16(65536L, 0L)
    an[IllegalArgumentException] should be thrownBy ZOrder.interleave16(0L, -1L)
  }

  test("SQL registration matches the Column API") {
    import spark.implicits._
    val df = Seq((150L, 1439L)).toDF("x", "y")
    df.createOrReplaceTempView("z_sql_t")
    spark.sql("SELECT zvalue2(x, y) FROM z_sql_t").head.getLong(0) shouldBe
      ZOrder.interleave16(150L, 1439L)
  }
}
