package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark plan plus (when SQL-expressible) a DuckDB
  * oracle over the same parquet tables. Names are stable keys used by the
  * driver's correctness gate (Verify) and the bench harness.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryRegistry {
  /** All registered query groups, in presentation order. */
  def all: Seq[Q] =
    CoreQueries.all ++ RelationalQueries.all ++ TextQueries.all ++
      PipelineQueries.all ++ DedupQueries.all ++ SimilarityQueries.all ++
      StreamingQueries.all ++ MultimodalQueries.all ++ CurationQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Read one of the driver-generated parquet tables for scale-factor dir. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events table with its TIMESTAMP(NANOS) column converted to a real
    * timestamp: Spark 4 reads parquet nanos only via the nanosAsLong legacy
    * conf; integral `div` keeps the µs conversion exact (double math would
    * round above 2^53).
    *
    * SIDE EFFECT (documented): sets the session-wide nanosAsLong conf — any
    * later read of a TIMESTAMP(NANOS) parquet in this session sees longs.
    * The driver mains (Verify/Bench/RunQ) run every query under one session,
    * so the flag is effectively session-constant there; standalone callers
    * should set it at session build time. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Per-scale-factor scratch dir for fixed-width round-trip artifacts. */
  def scratch(dir: String, tag: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/tmp/graft-scratch/$sf/$tag"
  }
}
