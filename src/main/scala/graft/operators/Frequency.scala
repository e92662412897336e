package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Count-Min sketch frequency estimation as pure relational algebra — the
  * streaming-classic heavy-hitters structure, built with one groupBy:
  *
  *   1. map side: item → d (bucket_j = low wBits bits of
  *      mix64(hash64(item), j)) cells, all codegen'd expressions;
  *   2. one shuffle of at most d·2^wBits cells per group (map-side partial
  *      counts): `groupBy(d, bucket).count()` — the sketch for a 100 TB
  *      corpus is d·2^wBits longs, while the exact answer's groupBy carries
  *      every distinct item through the exchange;
  *   3. point estimate of an item = min over the d cells it hashes to —
  *      an overestimate by construction (collisions only ever add), with
  *      error ≤ 2N/2^wBits at confidence 1−(1/2)^d.
  *
  * Like [[Cardinality]], every step is deterministic integer math on the
  * shared splitmix hashes, so the DuckDB oracle reproduces cell counts AND
  * estimates exactly — the sketch itself is cross-engine verifiable, not
  * just spot-sane. */
object Frequency {

  /** The d×2^wBits cell counts of the items' multiset: (d, bucket, n). */
  def cmsCells(items: DataFrame, itemCol: Column, depth: Int, wBits: Int): DataFrame =
    cmsCellsBy(items, Seq.empty, itemCol, depth, wBits)

  /** Per-group cell tables: groupCols + (d, bucket, n) — the SHARD form of
    * [[cmsCells]]. Cell counts are plain counts, so cells of any set of
    * groups merge by `SUM(n)` per (d, bucket) — additivity is the CMS merge
    * property (where HLL registers merge by max), and it is what lets a
    * sharded deployment sketch each shard once, persist the ≤ d·2^wBits-row
    * tables, and answer point queries over any shard union without
    * rescanning (the q211 artifact lane). */
  def cmsCellsBy(
      items: DataFrame, groupCols: Seq[String], itemCol: Column,
      depth: Int, wBits: Int): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(wBits >= 4 && wBits <= 24, s"wBits must be in [4,24], got $wBits")
    // the sketch's own output columns — a group column reusing one would
    // produce ambiguous/duplicate columns downstream, silently
    require(groupCols.intersect(Seq("d", "bucket", "n")).isEmpty,
      s"group columns ${groupCols.mkString(", ")} collide with the sketch's " +
        "reserved output names (d, bucket, n) — alias the group column first")
    val h = Hashing.hash64Col(itemCol)
    val cells = array((0 until depth).map { j =>
      struct(lit(j).as("d"),
        pmod(Hashing.mix64At(h, lit(j)), lit(1L << wBits)).as("bucket"))
    }: _*)
    items.select(groupCols.map(col) :+ explode(cells).as("_c"): _*)
      .groupBy(groupCols.map(col) :+ col("_c.d").as("d") :+ col("_c.bucket").as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** CMS point estimates for `probes` (any DataFrame with `itemCol`):
    * appends `cms_est` = min over the d cells. Cells are LEFT-joined with an
    * absent cell counting as 0, per the CMS point-query contract: an item the
    * sketch never saw estimates 0, and every probe row survives. The cell
    * columns are prefixed `_cms_` before the join so probe columns named
    * `d`/`bucket`/`n` can't resolve ambiguously (`_pc` and `_cms_*` are the
    * only reserved probe names). The cell side is broadcast only while
    * d·2^wBits stays driver-safe (≤ 4M cells); at the allowed extremes
    * (depth 8 × wBits 24 → ~134M cells) it falls back to a shuffle join. */
  def cmsEstimate(
      probes: DataFrame, itemCol: String, cells: DataFrame,
      depth: Int, wBits: Int): DataFrame = {
    require(!probes.columns.exists(c => c.startsWith("_pc") || c.startsWith("_cms_")),
      "probe column names _pc* and _cms_* are reserved by cmsEstimate")
    val h = Hashing.hash64Col(col(itemCol))
    // re-group on a per-ROW tag, not the probe columns: grouping by value
    // would collapse duplicate probe rows (breaking the every-probe-row-
    // survives contract) and cannot group map-typed probe columns at all
    val keyed = probes.withColumn("_pc_row", monotonically_increasing_id())
      .withColumn("_pc", explode(array((0 until depth).map { j =>
        struct(lit(j).as("d"),
          pmod(Hashing.mix64At(h, lit(j)), lit(1L << wBits)).as("bucket"))
      }: _*)))
    val c = cells.select(
      col("d").as("_cms_d"), col("bucket").as("_cms_bucket"), col("n").as("_cms_n"))
    val cellSide = if ((depth.toLong << wBits) <= (1L << 22)) broadcast(c) else c
    val aggs = probes.columns.toIndexedSeq.map(cn => first(col(cn)).as(cn)) :+
      min(coalesce(col("_cms_n"), lit(0L))).as("cms_est")
    keyed
      .join(cellSide,
        col("_pc.d") === col("_cms_d") && col("_pc.bucket") === col("_cms_bucket"), "left")
      .groupBy(col("_pc_row"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("_pc_row")
  }
}
