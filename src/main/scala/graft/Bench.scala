package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    // Deterministic name order: Map iteration order shuffles across builds,
    // which moved shared lazy-init costs between queries and made
    // round-over-round per-query timings non-comparable.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // A failed query must be visible as -1, not recorded as a fast run.
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop state a query persisted/cached so later queries aren't taxed
      // by another query's memory footprint.
      spark.catalog.clearCache()
      name -> (if (ok) dt else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }

  /** Untimed warmup: one-time JVM/codegen/machinery init costs otherwise
    * land on whichever query happens to run first under sorted order (r3:
    * q01 absorbed session+encode init, q70 absorbed streaming init — both
    * looked 2-3 s slower than their steady-state cost), making per-query
    * round-over-round deltas untrustworthy. Nothing here computes any timed
    * query's ANSWER — it initializes shared machinery and materializes the
    * per-scale-dir input fixtures (idempotent, marker-guarded). */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    // parquet scan + whole-stage codegen + FS first-touch
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // fixed-width scratch fixtures (encode side) — the queries' input data
    queries.CoreQueries.warmFixtures(spark, sfDir)
    // fixedwidth DSv2 read machinery on a throwaway 3-record file
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench-warm").toString
    java.nio.file.Files.write(java.nio.file.Path.of(tmp, "w.fwb"),
      "aaaabbbbcccc".getBytes("US-ASCII"))
    spark.read.format("fixedwidth").option("recordLength", 4).load(tmp).count()
    // streaming micro-batch machinery (checkpoint log, memory sink, state
    // store) via a throwaway 3-row file stream — NOT the events table
    val warmDir = java.nio.file.Files.createTempDirectory("graft-bench-warmstream").toString
    spark.range(3).selectExpr("id", "id % 2 AS k").write.mode("overwrite").parquet(warmDir)
    val streamed = spark.readStream
      .schema(spark.read.parquet(warmDir).schema)
      .parquet(warmDir)
      .groupBy(col("k")).count()
    val q = streamed.writeStream
      .format("memory").queryName("bench_warmup").outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-bench-warmckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table("bench_warmup").count()
    spark.catalog.clearCache()
  }
}
