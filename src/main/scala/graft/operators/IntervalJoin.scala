package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-OVERLAP join via chunk bucketing — the interval×interval sibling
  * of [[RangeJoin]]'s point-in-interval join (SURVEY.md §2.3).
  *
  * The declarative form `a.join(b, aLo < bHi && bLo < aHi)` has no equi-key,
  * so Spark plans a nested-loop join: |a|·|b| candidate pairs. Chunking
  * restores an equi-key: pick a chunk width `w`, explode EACH side's
  * `[lo, hi)` interval over the chunks it covers, and equi-join on the chunk
  * id. Two overlapping intervals share at least one chunk, so no pair is
  * missed; but they may share MANY chunks, so naive chunk-joining needs a
  * post-join distinct — an extra full shuffle of the (typically large)
  * result. This implementation drops that shuffle with the standard
  * report-once rule (used by genomic interval joiners): a pair is emitted
  * only in the chunk where the LATER interval starts,
  * `chunk == greatest(floor(aLo/w), floor(bLo/w))` — that chunk is covered
  * by both intervals exactly when they overlap, so each qualifying pair
  * matches in exactly one chunk. Results are row-identical to the
  * nested-loop form with zero dedup.
  *
  * Scale shape: shuffle carries `Σ span/w` chunk rows per side instead of
  * |a|·|b| pairs; hot chunks (dense time regions) split under AQE skew
  * handling like any other skewed equi-join key. Width trade-off mirrors
  * [[RangeJoin.bucketed]]: `w` near the median interval span keeps
  * replication ~2× while keeping per-chunk candidate lists short. Optional
  * `extraKeys` (e.g. a tenant/user column present on both sides) compound
  * the equi-key, confining candidates to the key's partition.
  */
object IntervalJoin {

  /** Join every `left` row to every `right` row whose half-open interval
    * `[loR, hiR)` overlaps the left row's `[loL, hiL)`. Interval columns
    * must be numeric (cast dates/timestamps to epoch days/seconds first);
    * `width` > 0. Empty/inverted intervals (hi <= lo) never match: the
    * predicate enforces it explicitly — the bare theta shorthand
    * `aLo < bHi && bLo < aHi` would admit them as points, but chunking
    * covers an inverted interval incompletely, so excluding empties is the
    * only semantics the equi-join can honor exactly (set-theoretically it
    * is also the right answer: an empty interval intersects nothing).
    * Output columns: all of `left` then all of `right` (callers
    * disambiguate names, as with any join).
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      loL: String, hiL: String,
      loR: String, hiR: String,
      width: Double,
      extraKeys: Seq[String] = Nil,
      maxChunksPerRow: Long = 1L << 20): DataFrame = {
    require(width > 0, s"chunk width must be positive, got $width")
    require(maxChunksPerRow > 0, s"maxChunksPerRow must be positive, got $maxChunksPerRow")
    def chunked(df: DataFrame, lo: String, hi: String): DataFrame = {
      // ceil(hi/w) - 1 is the last chunk a half-open [lo, hi) touches;
      // greatest() keeps zero-length intervals from producing an empty
      // sequence error (they are filtered by the overlap predicate anyway).
      val first = floor(col(lo) / width).cast("long")
      val last = greatest(ceil(col(hi) / width).cast("long") - 1L, first)
      // LOUD fan-out guard (see RangeJoin.bucketed): one row's chunk array
      // is materialized in memory, so a pathological interval spanning the
      // domain at a fine width is an error, not a silent giant array.
      val lastGuarded = when(last - first >= maxChunksPerRow,
          raise_error(format_string(
            s"intervalJoin: interval [%s, %s) spans >= $maxChunksPerRow chunks at " +
              s"width $width; widen the chunk width or split the interval (one " +
              "row's chunk array is materialized in memory)", col(lo), col(hi)))
            .cast("long"))
        .otherwise(last)
      df.withColumn("_gi_chunk", explode(sequence(first, lastGuarded)))
    }
    val lc = chunked(left, loL, hiL)
    val rc = chunked(right, loR, hiR).withColumnRenamed("_gi_chunk", "_gi_chunk_r")
    val joinKeys = (col("_gi_chunk") === col("_gi_chunk_r")) +:
      extraKeys.map(k => lc(k) === rc(k))
    lc.join(rc, joinKeys.reduce(_ && _))
      .where(col(loL) < col(hiR) && col(loR) < col(hiL) &&
        col(loL) < col(hiL) && col(loR) < col(hiR))
      // report-once: only the chunk where the later interval starts
      .where(col("_gi_chunk") ===
        greatest(floor(col(loL) / width).cast("long"), floor(col(loR) / width).cast("long")))
      .drop("_gi_chunk", "_gi_chunk_r")
  }
}
