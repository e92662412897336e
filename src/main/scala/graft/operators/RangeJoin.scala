package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join via integer bucketing — the SCALE path for range
  * joins (SURVEY.md §2.3).
  *
  * The declarative form `points.join(ranges, value >= lo && value < hi)` has
  * no equi-key, so Spark plans a broadcast nested-loop join: every point is
  * tested against every range — fine when the ranges side is a literal
  * handful (q33), quadratic death when ranges number in the millions
  * (IP-geo tables, ad campaign windows, genomic intervals).
  *
  * Bucketing restores an equi-key: pick a bucket width `w`, map each point
  * to bucket `floor(value / w)` (exactly ONE bucket per point) and explode
  * each range over the buckets its `[lo, hi)` span overlaps. The join
  * becomes a hash/sort-merge equi-join on the bucket id, shuffling
  * `points + Σ range-span/w` rows instead of materializing |points|·|ranges|
  * candidate pairs; the exact containment predicate then filters in place.
  * Because a point lives in exactly one bucket, a (point, range) pair can
  * meet at most once — no post-join dedup, results row-identical to the
  * nested-loop form (which is the DuckDB oracle for q107).
  *
  * Width trade-off: small `w` → more replicated range rows; large `w` →
  * more non-matching candidates per bucket. At 100 TB pick `w` near the
  * median range span, and let AQE handle bucket skew (hot buckets from
  * popular value regions split like any other skewed join key).
  */
object RangeJoin {

  /** Join `points` to every `ranges` row whose `[lo, hi)` interval contains
    * the point's `value`. All three columns must be numeric; `width` > 0.
    * Output columns: all of `points` then all of `ranges`.
    */
  def bucketed(
      points: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      width: Double): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    // hi is exclusive, but emitting its bucket unconditionally is harmless:
    // a spurious trailing bucket only adds candidates the exact containment
    // filter drops — and keeping the math branch-free keeps it replayable.
    val rb = ranges.withColumn(
      "_gr_bucket",
      explode(sequence(
        floor(col(loCol) / width).cast("long"),
        floor(col(hiCol) / width).cast("long"))))
    val pb = points.withColumn("_gr_bucket", floor(col(valueCol) / width).cast("long"))
    pb.join(rb, "_gr_bucket")
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_gr_bucket")
  }
}
