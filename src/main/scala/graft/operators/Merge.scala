package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SQL-MERGE-shaped upsert as pure relational algebra (no table format
  * required): rows of `updates` REPLACE same-key rows of `base`, unmatched
  * update rows INSERT, unmatched base rows survive — the snapshot-refresh
  * primitive of any feed ingestion pipeline.
  *
  * One shuffle on the key for both sides (or none for the big side when the
  * update batch is small enough to broadcast — Catalyst decides from size
  * stats, the usual case for incremental loads against a 100 TB base). The
  * winner is decided by KEY PRESENCE on the update side — row-wise MERGE
  * semantics — not per-column coalesce, so NULL values inside an update row
  * overwrite like SQL MERGE does.
  *
  * CONTRACT: `key` must be unique within EACH side (the usual snapshot +
  * update-batch shape). A duplicated update key would fan out matching base
  * rows through the full-outer join — the same "multiple rows matched"
  * condition SQL MERGE rejects at runtime; dedupe the batch first (e.g.
  * [[Dedup.keepBest]] on an update-version column). */
object Merge {

  def upsert(base: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(base.columns.sameElements(updates.columns),
      s"upsert requires identical schemas, got ${base.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val u = updates.columns.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"_u_$c"))
      // presence TAG, not key nullability: a NULL-key update row never
      // equi-joins, and deciding the winner by `_u_key IS NOT NULL` would
      // replace it with the all-NULL base side of its unmatched join row —
      // silently destroying the update's values instead of inserting them
      .withColumn("_u_present", lit(1))
    base.join(u, col(key) === col(s"_u_$key"), "full_outer")
      .select(base.columns.toIndexedSeq.map { c =>
        when(col("_u_present").isNotNull, col(s"_u_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
