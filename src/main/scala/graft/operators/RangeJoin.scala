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
    *
    * `maxChunksPerRow` is a LOUD guard on the bucket fan-out: one range
    * row's bucket array is materialized in memory by `sequence`, so a
    * pathological range spanning the whole domain at a fine `width` builds
    * a single giant array inside one task (the single-buffer defect class)
    * — and silently multiplies the row by its span. Exceeding the cap
    * raises an error naming the offending interval instead; widen `width`
    * or split the range. The default (2^20 buckets ≈ 8 MB) is far above
    * any sane width choice.
    */
  def bucketed(
      points: DataFrame,
      ranges: DataFrame,
      valueCol: String,
      loCol: String,
      hiCol: String,
      width: Double,
      maxChunksPerRow: Long = 1L << 20): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    require(maxChunksPerRow > 0, s"maxChunksPerRow must be positive, got $maxChunksPerRow")
    // hi is exclusive, but emitting its bucket unconditionally is harmless:
    // a spurious trailing bucket only adds candidates the exact containment
    // filter drops — and keeping the math branch-free keeps it replayable.
    val first = floor(col(loCol) / width).cast("long")
    val last = floor(col(hiCol) / width).cast("long")
    val lastGuarded = when(last - first >= maxChunksPerRow,
        raise_error(format_string(
          s"rangeJoin: range [%s, %s) spans >= $maxChunksPerRow buckets at width $width; " +
            "widen the bucket width or split the range (one row's bucket array " +
            "is materialized in memory)", col(loCol), col(hiCol))).cast("long"))
      .otherwise(last)
    val rb = ranges.withColumn("_gr_bucket", explode(sequence(first, lastGuarded)))
    val pb = points.withColumn("_gr_bucket", floor(col(valueCol) / width).cast("long"))
    pb.join(rb, "_gr_bucket")
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("_gr_bucket")
  }
}
