package graft

import org.apache.spark.sql.SparkSession

/** Between-lane state reset for the 173-query single-JVM sweeps (Bench,
  * Verify, RunQ).
  *
  * `spark.catalog.clearCache()` alone is NOT enough: it clears the SQL
  * CacheManager, but `localCheckpoint()` materializations (truncateLineage,
  * requireBounded) are RDD-LEVEL persists the CacheManager never sees.
  * Their blocks are freed by the ContextCleaner only after the owning RDD
  * is garbage-collected AND its weak reference is processed — which, in a
  * long suite run, can lag many lanes behind. The round-8 bench showed the
  * cost: lanes early in sort order ran at their standalone time, while
  * q52 (after ~90 lanes) and the q70s streaming block (after ~130) ran
  * 1.5–2.9× their standalone cost under the accumulated block-manager and
  * GC-debt pressure.
  *
  * So the reset (a) clears the SQL cache, (b) explicitly unpersists every
  * still-registered RDD persist — after a lane's action has completed
  * nothing live needs them, (c) nudges reference processing with one
  * `System.gc()` so the ContextCleaner can retire whatever died this lane
  * before the next lane's clock starts. The reset runs OUTSIDE the timed
  * region; it exists to stop lane N's garbage from being billed to lane
  * N+1.
  */
object LaneReset {
  def apply(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    System.gc()
  }
}
