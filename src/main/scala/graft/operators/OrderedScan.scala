package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key ORDERED linear scans — MapReduce's "secondary sort" idiom in
  * Spark clothes, for the rare computation that is genuinely imperative
  * over a time-ordered stream per key (state machines, delta/gap encoding,
  * custom sessionizers) and would explode intermediate rows as a window.
  *
  * Plan: `repartition(key)` co-locates each key, `sortWithinPartitions(key,
  * ts)` makes its rows CONTIGUOUS AND ORDERED inside the partition (one
  * shuffle + per-partition sort — exactly a window's cost, no more), then a
  * single `mapPartitions` pass folds each key run with O(1) state per key.
  * Unlike `groupByKey.flatMapGroups` there is no per-key iterator
  * materialization; unlike a window there is no per-row output requirement.
  */
object OrderedScan {

  /** Per-key gap statistics of a long-valued "timestamp" column: for each
    * key, the event count and the max/sum of consecutive deltas in sorted
    * `ts` order. Duplicate timestamps are fine (their mutual order cannot
    * change any delta). Output: (key, n_events, max_gap, sum_gap) — keys
    * with one event report 0 gaps. NULL keys/timestamps are dropped (SQL
    * grouping/ordering over gaps is undefined for them). */
  def perKeyGapStats(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long").as("k"), col(tsCol).cast("long").as("t"))
      .filter(col("k").isNotNull && col("t").isNotNull)
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("t"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val out = ArrayBuffer.empty[(Long, Long, Long, Long)]
        var cur = 0L
        var open = false
        var n = 0L
        var prev = 0L
        var maxGap = 0L
        var sumGap = 0L
        def close(): Unit = if (open) out += ((cur, n, maxGap, sumGap))
        it.foreach { case (k, t) =>
          if (!open || k != cur) {
            close()
            cur = k; open = true; n = 1L; prev = t; maxGap = 0L; sumGap = 0L
          } else {
            val gap = t - prev
            if (gap > maxGap) maxGap = gap
            sumGap += gap
            prev = t
            n += 1L
          }
        }
        close()
        out.iterator
      }
      .toDF("key", "n_events", "max_gap", "sum_gap")
  }
}
