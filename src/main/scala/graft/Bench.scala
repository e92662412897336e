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
    // Untimed warmup: JVM/codegen/filesystem first-touch costs otherwise land
    // on whichever query runs first.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
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
}
