package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Approximate distinct counting (HyperLogLog) as PURE relational algebra —
  * no custom aggregation buffer, no imperative state:
  *
  *   1. map side: item → (bucket = top p bits of hash64(item),
  *      rho = leading-zero run of the remaining bits + 1) — codegen'd
  *      expressions, full scan width;
  *   2. one shuffle of at most groups × 2^p tiny rows: groupBy(group,
  *      bucket).max(rho) with map-side partial aggregation — at 100 TB the
  *      shuffle carries KILOBYTES per group, the classic sketch win over
  *      count_distinct's full repartition of every distinct item;
  *   3. the harmonic-mean estimate folds the ≤ 2^p registers per group.
  *
  * Unlike `approx_count_distinct` (whose HLL++ buffer hashes with xxhash64
  * and is opaque to other engines), every step here is DETERMINISTIC and
  * replayable in DuckDB hugeint SQL, so the ESTIMATE ITSELF hash-matches
  * cross-engine: same buckets, same registers, same fold order, same
  * double bits. Accuracy is the standard ~1.04/sqrt(2^p) relative error;
  * no small-range (linear counting) correction is applied — callers in the
  * small-cardinality regime should use exact count_distinct, which is cheap
  * exactly when HLL is unnecessary.
  */
object Cardinality {

  /** alpha_m * m^2 of the raw HLL estimator (m = 2^p). Computed once in
    * Scala; the SQL twin embeds the identical double literal. */
  def alphaM2(p: Int): Double = {
    val m = (1 << p).toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m
  }

  /** (bucket, rho) of one item: bucket = top p bits of hash64(item); rho =
    * nlz(hash << p) + 1 capped at (64 - p) + 1 (all-zero suffix). */
  def bucketAndRho(item: Column, p: Int): (Column, Column) = {
    val h = Hashing.hash64Col(item)
    val bucket = shiftrightunsigned(h, 64 - p)
    val rho = least(Hashing.nlz64Col(shiftleft(h, p)), lit((64 - p).toLong)) + 1L
    (bucket, rho)
  }

  /** Per-group register table: one `(_bucket, _rho)` row per TOUCHED
    * register (≤ 2^p rows per group). This is the sketch's mergeable state:
    * registers of any groups union by `groupBy(_bucket).max(_rho)` — the
    * property [[hllSetOps]]-style queries exploit to estimate unions of
    * pre-sketched sources without rescanning the data. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], itemCol: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val (bucket, rho) = bucketAndRho(itemCol, p)
    // NULL items are excluded like count_distinct excludes them. Without the
    // filter a NULL hash yields bucket NULL but rho = 65-p (least() SKIPS
    // its NULL argument) — a phantom maximal register inflating the estimate
    df.filter(itemCol.isNotNull)
      .select(groupCols.map(col) :+ bucket.as("_bucket") :+ rho.as("_rho"): _*)
      .groupBy(groupCols.map(col) :+ col("_bucket"): _*)
      .agg(max(col("_rho")).as("_rho"))
  }

  /** Fold a register table (output shape of [[hllRegisters]], possibly
    * merged) into the estimate: groupCols + `n_used` + `hll_est`. The fold
    * runs over registers sorted by bucket, so the double-addition order is
    * deterministic and replayable in SQL. */
  def estimateFromRegisters(regs: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_used"),
        sort_array(collect_list(struct(col("_bucket"), col("_rho")))).as("_regs"))
      .withColumn("hll_est",
        round(lit(alphaM2(p)) /
          aggregate(col("_regs"), (lit(m) - col("n_used")).cast("double"),
            (acc, r) => acc + pow(lit(2.0), -r.getField("_rho"))), 4))
      .drop("_regs")
  }

  /** Per-group HLL distinct estimate of `itemCol`. Output: groupCols +
    * `n_used` (touched registers) + `hll_est` (raw estimate, rounded to 4
    * decimals). Input rows need NOT be distinct — sketch insertion is
    * idempotent, which is the whole point (no pre-shuffle dedup). */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], itemCol: Column, p: Int): DataFrame =
    estimateFromRegisters(hllRegisters(df, groupCols, itemCol, p), groupCols, p)
}
