package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway phase profiler for q201/q193 (round-19 optimization): time the
  * pieces of a topTwoComponents call — means pull, first-round action, later
  * rounds — to attribute the per-round ~1 s. Diagnostic only. */
object ProfilePca {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.3fs"); r
    }
    // warmup lane
    t("warmup_q01") { graft.queries.QueryRegistry.queries("q01_fw_pricing_summary")(spark, sfDir).count() }
    (1 to 3).foreach { rep =>
      t(s"rep$rep total q201") {
        graft.queries.QueryRegistry.queries("q201_top_two_pcs")(spark, sfDir).count()
      }
      graft.LaneReset(spark)
    }
    val n = t("embeddings count") {
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    }
    println(s"embeddings rows = $n")
    spark.stop()
  }
}
