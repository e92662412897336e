package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Count-Min sketch invariants: per-row mass conservation, the one-sided
  * error guarantee (estimates never undercount), and exactness in the
  * collision-free regime. Cross-engine value equality of cells and
  * estimates is q49's DuckDB oracle. */
class FrequencySpec extends SparkSpec with Matchers {

  private val depth = 4

  test("every depth row conserves total item mass") {
    import spark.implicits._
    val items = (0 until 3000).map(i => s"item-${i % 97}").toDF("item")
    val cells = Frequency.cmsCells(items, col("item"), depth, wBits = 6)
    val perRow = cells.groupBy("d").agg(sum("n").as("mass")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    perRow.keySet shouldBe (0 until depth).toSet
    perRow.values.foreach(_ shouldBe 3000L)
  }

  test("estimates never undercount, and are exact without collisions") {
    import spark.implicits._
    val freqs = (0 until 50).map(i => s"w$i" -> (i + 1L))
    val items = freqs.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.toDF("item")
    val exact = freqs.toDF("item", "n_exact")
    // wBits=16: 50 items in 65536 buckets x 4 rows -> collision-free for
    // these deterministic hashes (would have failed in dev otherwise)
    val cells = Frequency.cmsCells(items, col("item"), depth, wBits = 16)
    val est = Frequency.cmsEstimate(exact, "item", cells, depth, wBits = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    est.length shouldBe 50
    est.foreach { case (w, n, e) =>
      withClue(s"$w: ") { e shouldBe n } // no collisions -> exact
    }
    // tiny table forces collisions; the estimate may only ever OVERcount
    val tiny = Frequency.cmsCells(items, col("item"), depth, wBits = 4)
    Frequency.cmsEstimate(exact, "item", tiny, depth, wBits = 4)
      .collect().foreach { r =>
        r.getLong(2) should be >= r.getLong(1)
      }
  }

  test("an unseen probe survives with estimate 0 (absent cells count as 0)") {
    import spark.implicits._
    val items = Seq("a", "b", "a").toDF("item")
    val cells = Frequency.cmsCells(items, col("item"), depth, wBits = 16)
    // 2 items in 4x65536 cells: a fresh probe's cells are (almost surely, and
    // for this fixed hash: verifiably) all absent -> the CMS point-query
    // contract says estimate 0, with the probe row PRESENT in the output.
    val est = Frequency.cmsEstimate(Seq("never-seen").toDF("item"), "item", cells, depth, wBits = 16)
      .collect()
    est.length shouldBe 1
    est.head.getLong(1) shouldBe 0L
  }

  test("duplicate probe rows each survive with their own estimate row") {
    import spark.implicits._
    val items = Seq("a", "b", "a", "a").toDF("item")
    val cells = Frequency.cmsCells(items, col("item"), depth, wBits = 16)
    // a raw probe list with repeats (no unique id column): every ROW must
    // survive — grouping by probe VALUE would collapse the two "a" rows
    val out = Frequency.cmsEstimate(Seq("a", "a", "b").toDF("item"), "item", cells, depth, wBits = 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    out shouldBe Array(("a", 3L), ("a", 3L), ("b", 1L))
  }

  test("probe columns named d/bucket/n do not collide with the cell side") {
    import spark.implicits._
    val items = Seq("a", "b", "a", "a").toDF("item")
    val cells = Frequency.cmsCells(items, col("item"), depth, wBits = 16)
    val probes = Seq(("a", 1, 2L, 3L)).toDF("item", "d", "bucket", "n")
    val out = Frequency.cmsEstimate(probes, "item", cells, depth, wBits = 16).collect()
    out.length shouldBe 1
    out.head.getAs[Long]("cms_est") shouldBe 3L // "a" occurs 3x, collision-free
    out.head.getAs[Int]("d") shouldBe 1         // caller's columns pass through
    an[IllegalArgumentException] should be thrownBy
      Frequency.cmsEstimate(Seq(("a", 1)).toDF("item", "_cms_n"), "item", cells, depth, wBits = 16)
  }
}
