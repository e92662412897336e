package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Row-wise MERGE semantics: replace on match, insert on no-match, base
  * survives otherwise — and a NULL inside an update row OVERWRITES (unlike
  * per-column coalesce, which would silently keep the stale value). */
class MergeSpec extends SparkSpec with Matchers {

  test("replace / insert / survive, with NULL overwrite") {
    import spark.implicits._
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0))
      .toDF("k", "s", "v")
    val updates = Seq((2L, None: Option[String], 99.0), (4L, Some("d"), 40.0))
      .toDF("k", "s", "v")
    val out = Merge.upsert(base, updates, "k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).sortBy(_._1)
    out shouldBe Array(
      (1L, Some("a"), 10.0),
      (2L, None, 99.0), // update wins row-wise: NULL s overwrites "b"
      (3L, Some("c"), 30.0),
      (4L, Some("d"), 40.0))
  }

  test("a NULL-key update row INSERTS with its values intact") {
    import spark.implicits._
    val base = Seq((Some(1L), Some("a"), 10.0)).toDF("k", "s", "v")
    val updates = Seq((None: Option[Long], Some("orphan"), 77.0),
      (Some(1L), Some("a2"), 11.0)).toDF("k", "s", "v")
    val out = Merge.upsert(base, updates, "k")
      .collect().map(r => (Option(r.get(0)), Option(r.getString(1)), r.getDouble(2)))
      .sortBy(_._3)
    // the NULL key never equi-joins: the row must INSERT as-is, not be
    // replaced by the all-NULL base side of its unmatched join row
    out shouldBe Array(
      (Some(1L), Some("a2"), 11.0),
      (None, Some("orphan"), 77.0))
  }

  test("schema mismatch fails fast") {
    import spark.implicits._
    val base = Seq((1L, "a")).toDF("k", "s")
    val bad = Seq((1L, "a")).toDF("k", "other")
    an[IllegalArgumentException] should be thrownBy Merge.upsert(base, bad, "k")
  }
}
