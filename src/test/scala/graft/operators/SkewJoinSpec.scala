package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec with Matchers {

  test("salted join is row-identical to the plain join on a pathologically skewed key") {
    import spark.implicits._
    // 10k rows, 95% on ONE key — the shape that drowns a single reducer
    val probe = (0 until 10000)
      .map(i => (if (i % 20 == 0) i % 7 else 42, i.toLong, i * 1.5))
      .toDF("k", "row_id", "v")
    val build = (0 until 100).map(i => (i, s"dim$i")).toDF("k", "name")

    val plain = probe.join(build, "k")
      .select($"k", $"row_id", $"v", $"name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInnerJoin(probe, build, "k", saltBy = "row_id", salts = 8)
      .select($"k", $"row_id", $"v", $"name")
      .collect().map(_.toSeq).toSet
    salted shouldBe plain

    // the salt really spreads the hot key: its rows land in >1 salt bucket
    val saltSpread = probe.filter($"k" === 42)
      .withColumn("_salt", pmod(xxhash64($"row_id"), lit(8)))
      .select($"_salt").distinct().count()
    saltSpread should be > 1L
  }

  test("salts=1 degrades to the plain join; invalid salts rejected") {
    import spark.implicits._
    val probe = Seq((1, 10L), (2, 20L)).toDF("k", "row_id")
    val build = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "name")
    SkewJoin.saltedInnerJoin(probe, build, "k", "row_id", salts = 1).count() shouldBe 2L
    an[IllegalArgumentException] should be thrownBy
      SkewJoin.saltedInnerJoin(probe, build, "k", "row_id", salts = 0)
  }
}
