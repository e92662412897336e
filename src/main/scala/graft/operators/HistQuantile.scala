package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate quantiles from a MERGEABLE equi-width histogram sketch —
  * the streaming/distributed complement to q38's exact `percentile`:
  *
  *   - sketch state = per-group bucket counts over a DECLARED domain
  *     [lo, hi) — at most `buckets` tiny rows per group through the one
  *     shuffle, regardless of input size (the same state-bound argument as
  *     the HLL registers), and counts MERGE by addition across sources,
  *     partitions, or time windows;
  *   - estimate = linear interpolation inside the bucket where the
  *     cumulative count crosses q·N, error bounded by the bucket width;
  *   - every step (clamped bucket index, cumulative sums, the interpolation
  *     arithmetic on exact-integer-derived doubles) is deterministic and
  *     textually replayable in SQL, so the ESTIMATES hash-match cross-engine
  *     — unlike `approx_percentile`'s opaque KLL-ish buffer.
  *
  * The declared domain mirrors the explicit-values pivot (q84): at 100 TB
  * you know your column's domain (or spend one cheap min/max pass); values
  * outside clamp into the edge buckets, biasing only the extreme quantiles
  * (documented, same policy as the q104 histogram).
  */
object HistQuantile {

  /** Per-group quantile estimates. Output: groupCols + `q` + `n_rows` +
    * `est` (rounded to 6 decimals). NULL values are excluded (SQL aggregate
    * convention). `qs` must lie in (0, 1]. */
  def estimate(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      buckets: Int,
      qs: Seq[Double]): DataFrame = {
    require(hi > lo, s"domain [$lo, $hi) is empty")
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0),
      s"quantiles must lie in (0, 1], got $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val w = (hi - lo) / buckets
    val bucket = least(greatest(floor((col(valueCol) - lo) / w), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("long")

    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ bucket.as("_b"): _*)
      .agg(count(lit(1)).as("_c"))
    estimateFromCounts(counts, groupCols, lo, w, qs)
  }

  /** The interpolation half of [[estimate]], over an ALREADY-built bucket
    * count table (groupCols + `_b` + `_c`) — the single source for every
    * consumer of the sketch state, wherever the counts were accumulated
    * (one batch pass, a merge of per-source tables, or the drained state
    * of a streaming aggregation: the counts ARE the stream state, so a
    * stream hands its registers straight to this). */
  def estimateFromCounts(
      counts: DataFrame,
      groupCols: Seq[String],
      lo: Double,
      w: Double,
      qs: Seq[Double]): DataFrame = {
    val spark = counts.sparkSession
    import spark.implicits._
    val perGroup = Window.partitionBy(groupCols.map(col): _*)
    val cum = counts
      .withColumn("_cum", sum(col("_c")).over(perGroup.orderBy(col("_b"))))
      .withColumn("_n", sum(col("_c")).over(perGroup))

    val qdf = qs.toDF("q")
    val target = col("q") * col("_n").cast("double")
    cum.crossJoin(broadcast(qdf))
      .filter((col("_cum") - col("_c")).cast("double") < target &&
        col("_cum").cast("double") >= target)
      .select(
        (groupCols.map(col) :+ col("q") :+ col("_n").as("n_rows") :+
          round(lit(lo) + lit(w) * (col("_b").cast("double") +
            (target - (col("_cum") - col("_c")).cast("double")) / col("_c").cast("double")), 6)
            .as("est")): _*)
  }
}
