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
    *                   (null when no right row precedes the left row).
    *
    * The matched right row is carried as a WHOLE struct, so a right row
    * whose value column is NULL still wins the match and contributes its
    * NULL (carrying bare value columns with `last(ignoreNulls)` would skip
    * it and resurrect an older row's value — not ASOF semantics). NULL join
    * keys never match, same as SQL equality.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val rstruct = struct(valueCols.map(c => right(c).as(c)): _*)
    val nullRstruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c).copy(name = c))))

    val taggedLeft = left
      .withColumn("_side", lit(1))
      .select(col(keyCol).as("_k") +: col(tsCol).as("_ts") +: col("_side") +:
        leftCols.map(col) ++: Seq(nullRstruct.as("_rrow")): _*)
    // A NULL-ts right row can never satisfy right.ts <= left.ts (SQL
    // comparison semantics) — drop it before the union, or Spark's
    // nulls-first ascending sort would place it before every left row and
    // last(ignoreNulls) would carry it into every match.
    val taggedRight = right
      .filter(col(tsCol).isNotNull)
      .withColumn("_side", lit(0))
      .select(col(keyCol).as("_k") +: col(tsCol).as("_ts") +: col("_side") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++:
        Seq(rstruct.as("_rrow")): _*)

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // NULL-keyed rows share a window partition; mask their matches to NULL
    // (SQL equality semantics: NULL = NULL is not a match).
    val carried = when(col("_k").isNotNull, last(col("_rrow"), ignoreNulls = true).over(w))

    taggedLeft.unionByName(taggedRight)
      .select(
        (col("_side") +: leftCols.map(col) ++:
          valueCols.map(c => carried.getField(c).as(s"asof_$c"))): _*)
      .filter(col("_side") === 1)
      .drop("_side")
  }

  /** Physical-operator form of [[asOf]]: same semantics, planned as
    * [[graft.plans.AsOfMergeJoinExec]] — each side exchanged+sorted at its
    * own width and streamed through a single merge pass, instead of the
    * union+window reshape (see the exec's scaladoc for the cost
    * comparison). Requires `GraftExtensions` on the session
    * (`injectPlannerStrategy`); carried columns come back as `asof_<c>`,
    * like [[asOf]]. Ties on right (key, ts) follow the right sort order —
    * pre-dedup the right side to one row per (key, ts) for
    * engine-independent results. */
  def asOfMerge(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    // Make the planner strategy available on ANY session, not only ones
    // built with spark.sql.extensions=graft.GraftExtensions: the public
    // experimental.extraStrategies hook, guarded for idempotence (a
    // duplicate registration would be harmless anyway — first strategy to
    // produce a plan wins).
    val exp = left.sparkSession.experimental
    if (!exp.extraStrategies.contains(graft.plans.AsOfMergeJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ graft.plans.AsOfMergeJoinStrategy
    // Alias the whole right projection: fresh exprIds on every carried
    // attribute, so a shared-lineage right side (self-as-of) can't collide
    // with left output ids, and output names are collision-free by
    // construction.
    val rightSel = right.select(
      col(keyCol).as("_asof_key") +: col(tsCol).as("_asof_ts") +:
        valueCols.map(c => col(c).as(s"asof_$c")): _*)
    val lp = left.queryExecution.analyzed
    val rp = rightSel.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asOfMerge: column '$name' not found"))
    // The physical node builds its orderings and hash distribution from the
    // LEFT types and skips analyzer coercion entirely — an int-vs-bigint key
    // would hash equal values to different partitions and compare garbage
    // bytes, silently dropping matches. Demand exact type equality; the
    // caller casts explicitly (visible in the plan) when sides differ.
    val (lk, rk) = (attr(lp, keyCol), attr(rp, "_asof_key"))
    val (lt, rt) = (attr(lp, tsCol), attr(rp, "_asof_ts"))
    require(lk.dataType == rk.dataType,
      s"asOfMerge: key types differ (${lk.dataType.sql} vs ${rk.dataType.sql}); cast one side explicitly")
    require(lt.dataType == rt.dataType,
      s"asOfMerge: ts types differ (${lt.dataType.sql} vs ${rt.dataType.sql}); cast one side explicitly")
    val node = graft.plans.AsOfMergeJoinNode(
      lp, rp, lk, rk, lt, rt,
      valueCols.map(c => attr(rp, s"asof_$c")))
    org.apache.spark.sql.graft.PlanBridge.ofRows(left.sparkSession, node)
  }

  /** [[asOfWithin]] on the physical-merge path: the matched right
    * timestamp rides along as one more carried column, and the staleness
    * mask applies map-side on top of [[asOfMerge]]'s output — API symmetry
    * so callers can pick the plan form independently of the freshness
    * rule. */
  def asOfMergeWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      maxAge: Column): DataFrame = {
    val withTs = right.withColumn("_asof_rts", col(tsCol))
    val joined = asOfMerge(left, withTs, keyCol, tsCol, valueCols :+ "_asof_rts")
    val fresh = col("asof__asof_rts").isNotNull &&
      col(tsCol) <= col("asof__asof_rts") + maxAge
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop("asof__asof_rts")
  }

  /** As-of join with a STALENESS bound: matches older than `maxAge` are
    * nulled — "the latest right row within the last hour", the freshness
    * rule every feature-store lookup needs (an unbounded as-of happily
    * serves a year-old feature). Same single-shuffle plan as [[asOf]]: the
    * matched right row's timestamp rides along in the carried struct, and
    * the age test masks stale matches per row after the window — map-side,
    * no extra join. `maxAge` is typically an interval literal
    * (`expr("INTERVAL 1 HOUR")`) for timestamp keys, or a number for
    * numeric "timestamps". */
  def asOfWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      maxAge: Column): DataFrame = {
    val withTs = right.withColumn("_asof_rts", col(tsCol))
    val joined = asOf(left, withTs, keyCol, tsCol, valueCols :+ "_asof_rts")
    val fresh = col("asof__asof_rts").isNotNull &&
      col(tsCol) <= col("asof__asof_rts") + maxAge
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop("asof__asof_rts")
  }
}
