package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, attach the latest right
  * row with `right.ts <= left.ts` within the same key — the time-series
  * lookup Spark has no built-in operator for.
  *
  * Spark-first plan shape (the 100 TB path): tag and UNION the two sides,
  * then one window pass per key ordered by (ts, side) carrying the last
  * non-null right values forward. Exactly ONE shuffle on the key — no
  * per-row subquery, no range self-join blowup; skew follows the key
  * distribution like any windowed aggregation (salt hot keys upstream).
  * Rights sort before lefts at equal timestamps, making the match
  * inclusive (>=), the same convention as DuckDB/QuestDB ASOF JOIN.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto each left row
    *                   (null when no right row precedes the left row). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val taggedLeft = left
      .withColumn("_side", lit(1))
      .select(col(keyCol).as("_k") +: col(tsCol).as("_ts") +: col("_side") +:
        leftCols.map(col) ++: valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c")): _*)
    val taggedRight = right
      .withColumn("_side", lit(0))
      .select(col(keyCol).as("_k") +: col(tsCol).as("_ts") +: col("_side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        valueCols.map(c => col(c).as(s"_r_$c")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedLeft.unionByName(taggedRight)
      .select(
        (col("_side") +: leftCols.map(col) ++:
          valueCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"asof_$c"))): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }
}
