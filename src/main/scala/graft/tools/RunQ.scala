package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.QueryRegistry

/** Run named queries against a scale dir and print row count + wall time.
  * Usage: sbt "runMain graft.tools.RunQ <sfDir> <query...>"
  * Add `explain` as a query name prefix (e.g. explain:q52...) to dump the
  * formatted physical plan instead of executing. The literal name `all`
  * expands to every registered lane in sorted order — the full-suite
  * peak-task-memory audit (rank the RUNQ lines by peakTaskMem to find
  * non-spillable buffers before a real corpus does).
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).flatMap {
      case "all" => QueryRegistry.queries.keys.toSeq.sorted
      case n     => Seq(n)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Per-lane MAX of task peakExecutionMemory — the scale-rehearsal
    // receipt that a skew guard actually bounds memory (an unbounded
    // aggregation buffer shows up here long before it OOMs a real
    // executor; shuffle-spill keeps elapsed time looking innocent).
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
      }
    })
    val all = QueryRegistry.queries
    names.foreach { raw =>
      val (doExplain, name) =
        if (raw.startsWith("explain:")) (true, raw.stripPrefix("explain:")) else (false, raw)
      if (doExplain) { println(s"=== $name ==="); all(name)(spark, sfDir).explain("formatted") }
      else {
        // time CONSTRUCTION + count: streaming queries execute their stream
        // eagerly inside the builder, so timing only count() undercounts them
        peak.set(0L)
        val t0 = System.nanoTime()
        val n = all(name)(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        // listener bus is async; give the final task-end events a beat
        Thread.sleep(300)
        println(f"RUNQ $name rows=$n time=$secs%.2fs peakTaskMem=${peak.get() / (1024.0 * 1024)}%.1fMB")
        // same between-lane reset as Bench, so warm RunQ repeats measure the
        // query, not a leftover cache/checkpoint from the previous repeat
        graft.LaneReset(spark)
      }
    }
    spark.stop()
  }
}
