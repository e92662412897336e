package graft.operators

import org.apache.spark.sql.functions.lit
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec with Matchers {

  test("as-of join picks latest right <= left.ts per key; null when none precedes") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), (1L, 200L, 20L), (1L, 50L, 5L), // key 1
      (2L, 100L, 99L)) // key 2 — no right rows at all
      .toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 60L, "r60"), (1L, 100L, "r100"), (1L, 150L, "r150"),
      (3L, 10L, "other-key"))
      .toDF("k", "ts", "rv")

    val out = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv"))
      .select($"k", $"ts", $"lv", $"asof_rv")
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) null else r.getString(3))).toSet

    out shouldBe Set(
      (1L, 50L, null),    // nothing at or before 50
      (1L, 100L, "r100"), // equal ts is inclusive (right sorts first)
      (1L, 200L, "r150"),
      (2L, 100L, null))   // key with no right side
  }

  test("a matched right row with NULL value wins the match and contributes its NULL") {
    import spark.implicits._
    val left = Seq((1L, 200L)).toDF("k", "ts")
    val right = Seq((1L, 50L, Some("old")), (1L, 100L, None: Option[String]))
      .toDF("k", "ts", "rv")
    val r = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv")).select($"asof_rv").head
    // ASOF semantics: the ts=100 row matches even though its value is NULL;
    // carrying bare values with last(ignoreNulls) would wrongly return "old".
    r.isNullAt(0) shouldBe true
  }

  test("right rows with NULL ts never match (right.ts <= left.ts is never true)") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "ts")
    val right = Seq((1L, Option.empty[Long], "null-ts"), (1L, Some(50L), "r50"))
      .toDF("k", "ts", "rv")
    val r = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv")).select($"asof_rv").head
    // nulls-first sort would otherwise carry the NULL-ts row into every match
    r.getString(0) shouldBe "r50"

    val onlyNull = Seq((1L, Option.empty[Long], "null-ts")).toDF("k", "ts", "rv")
    AsOfJoin.asOf(left, onlyNull, "k", "ts", Seq("rv")).select($"asof_rv").head.isNullAt(0) shouldBe true
  }

  test("NULL join keys never match (SQL equality semantics)") {
    import spark.implicits._
    val left = Seq((Option.empty[Long], 100L, 1)).toDF("k", "ts", "tag")
    val right = Seq((Option.empty[Long], 50L, "nullkey-right")).toDF("k", "ts", "rv")
    val r = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv")).select($"asof_rv").head
    r.isNullAt(0) shouldBe true
  }

  test("asOfWithin masks matches older than maxAge, keeps fresh ones") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 100L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 95L, "fresh-for-a"), (2L, 10L, "stale-for-c"))
      .toDF("k", "ts", "rv")
    val out = AsOfJoin.asOfWithin(left, right, "k", "ts", Seq("rv"), lit(20L))
      .select($"tag", $"asof_rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    out("a") shouldBe Some("fresh-for-a")   // age 5 <= 20
    out("b") shouldBe None                  // same match, age 105 > 20
    out("c") shouldBe None                  // age 90 > 20
  }

  test("asOfWithin equals asOf when every match is within tolerance") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 101L)).toDF("k", "ts")
    val right = Seq((1L, 99L, "r")).toDF("k", "ts", "rv")
    val bounded = AsOfJoin.asOfWithin(left, right, "k", "ts", Seq("rv"), lit(1000L))
      .select($"ts", $"asof_rv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val unbounded = AsOfJoin.asOf(left, right, "k", "ts", Seq("rv"))
      .select($"ts", $"asof_rv").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    bounded shouldBe unbounded
  }
}
