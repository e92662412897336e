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

  /** The events table with `ts` normalized to a session-TZ TIMESTAMP
    * regardless of how the parquet encodes it — the driver's generator has
    * shipped both TIMESTAMP(NANOS) (read as long under the nanosAsLong
    * legacy conf, µs conversion via integral `div` — double math would
    * round above 2^53) and TIMESTAMP(MICROS) (read natively as
    * TIMESTAMP_NTZ; cast re-interprets the wall-clock in the session's UTC
    * zone, so epoch math is unchanged). Keying on the OBSERVED type rather
    * than an assumed encoding is what keeps a testdata regeneration from
    * silently breaking every events lane.
    *
    * SIDE EFFECT (documented): sets the session-wide nanosAsLong conf — any
    * later read of a TIMESTAMP(NANOS) parquet in this session sees longs.
    * The driver mains (Verify/Bench/RunQ) run every query under one session,
    * so the flag is effectively session-constant there; standalone callers
    * should set it at session build time. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(table(spark, dir, "events"))
  }

  /** `ts` → session-TZ TIMESTAMP from any of the three representations the
    * events table has appeared in (long nanos, TIMESTAMP_NTZ, TIMESTAMP). */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // The NTZ→TZ cast reinterprets the stored wall clock in the SESSION
        // time zone — epoch math is unchanged only under UTC (which the
        // driver mains pin). Refuse anything else so a standalone non-UTC
        // caller fails loudly instead of silently shifting every event.
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC,
          s"events.ts is TIMESTAMP_NTZ; casting to TIMESTAMP requires " +
            s"spark.sql.session.timeZone=UTC (got '$tz') — a non-UTC session " +
            "would reinterpret the wall clock and shift every epoch")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected long nanos, " +
          "timestamp_ntz, or timestamp)")
    }
  }

  /** Per-scale-factor scratch dir for fixed-width round-trip artifacts. */
  def scratch(dir: String, tag: String): String = {
    val sf = dir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/tmp/graft-scratch/$sf/$tag"
  }
}
