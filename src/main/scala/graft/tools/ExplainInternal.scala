package graft.tools

import org.apache.spark.sql.SparkSession

/** Explain INTERNAL (non-lane) frames that lanes serve from memos — the
  * lane-level `RunQ explain:` only shows the post-memo local relation, so
  * plan-shape evidence for trainer-side changes needs the raw frame.
  * Usage: sbt "runMain graft.tools.ExplainInternal <sfDir> <name...>"
  * Names: profile_exact_scan (the train_profile_exact corpus pass);
  * logreg_round (one GD round's gradient aggregate over the per-doc
  * feature arrays — the train_logreg_weights per-round shape).
  */
object ExplainInternal {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach {
      case "profile_exact_scan" =>
        println("=== profile_exact_scan ===")
        graft.queries.RelationalQueries.profileAuditExactScan(spark, sfDir)
          .explain("formatted")
      case "logreg_round" =>
        println("=== logreg_round ===")
        graft.operators.LogReg.explainRoundShape(
          spark.read.parquet(s"$sfDir/documents.parquet"))
      case "dsir_frame" =>
        // the q179 computation dsirSelect eagerly collects (the lane-level
        // explain only shows the collected LocalTableScan)
        println("=== dsir_frame ===")
        // persisted exactly as dsirSelect runs it, so the plan shows the
        // InMemoryRelation reuse instead of a re-derived corpus subtree
        val db = graft.queries.CurationQueries.dsirBucketCounts(spark, sfDir).persist()
        graft.queries.CurationQueries.dsirResultFrame(db, m = 1024)
          .explain("formatted")
        db.unpersist(blocking = false)
      case "pca_round" =>
        // one materialized power-iteration round's re-projection frame (the
        // per-round corpus action q201's topTwoComponents executes; the
        // lane-level explain only shows the pulled local relations)
        println("=== pca_round ===")
        graft.operators.VectorOps.explainRoundShape(
          spark.read.parquet(s"$sfDir/embeddings.parquet"))
      case other => System.err.println(s"unknown internal frame: $other")
    }
  }
}
