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

  test("inputs that already contain salt-like columns are not corrupted") {
    import spark.implicits._
    // probe carries `_salt` AND the first-choice helper name `_graft_salt0`;
    // the operator must pick a fresh name, join correctly, and preserve the
    // caller's columns untouched.
    val probe = Seq((1, 10L, 99L, 77L), (2, 20L, 98L, 76L))
      .toDF("k", "row_id", "_salt", "_graft_salt0")
    val build = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(probe, build, "k", "row_id", salts = 4)
    out.columns.toSeq should contain allOf ("_salt", "_graft_salt0")
    val rows = out.select($"k", $"_salt", $"_graft_salt0", $"name").orderBy($"k").collect()
    rows.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq shouldBe
      Seq((1, 99L, 77L, "a"), (2, 98L, 76L, "b"))

    // build side carrying the helper name too
    val build2 = Seq((1, "a", 5L), (2, "b", 6L)).toDF("k", "name", "_graft_salt1")
    SkewJoin.saltedInnerJoin(probe, build2, "k", "row_id", salts = 4).count() shouldBe 2L
  }
}
