package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.QueryRegistry

/** Scale rehearsal for the LSH skew guard: the real `documents` corpus of a
  * scale dir UNIONED with N copies of one identical spam payload — the
  * exact adversary `bucketCap`'s doc names. Every spam doc lands in the
  * SAME (band, hash) bucket of every band; pre-r18 the banding
  * materialized that bucket's full id array in one non-spillable
  * aggregation buffer before the cap filter could drop it, so this tool
  * OOM-shaped exactly as a 100 TB spam crawl would. Post-fix the bucket is
  * count-dropped before collection, so the run must complete with a SMALL
  * bounded per-task peak (reported below) and return exactly the real
  * corpus's near-dup pairs.
  *
  * Usage: sbt "runMain graft.tools.AdversarialLsh [sfDir] [spamCopies]"
  */
object AdversarialLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spamCopies = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) peak.getAndAccumulate(m.peakExecutionMemory, math.max(_, _))
      }
    })
    import spark.implicits._
    val real = QueryRegistry.table(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val spam = spark.range(spamCopies).select(
      ($"id" + 100000000L).as("doc_id"),
      lit("identical spam payload repeated verbatim in every single document " +
        "of this adversarial corpus for the hot bucket rehearsal").as("text"))
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashNearDups(real.unionByName(spam), "doc_id", "text",
      shingleLen = 3, numHashes = 64, bands = 16, threshold = 0.5, bucketCap = 2000)
    // no pair may touch a spam id: the degenerate bucket must be dropped
    val spamPairs = pairs
      .filter($"id_a" >= 100000000L || $"id_b" >= 100000000L).count()
    val realPairs = pairs.filter($"id_a" < 100000000L && $"id_b" < 100000000L).count()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // listener bus is async
    println(f"ADVERSARIAL sf=$sfDir spam=$spamCopies realPairs=$realPairs " +
      f"spamPairs=$spamPairs time=$secs%.2fs peakTaskMem=${peak.get() / (1024.0 * 1024)}%.1fMB")
    require(spamPairs == 0L, "hot bucket leaked candidate pairs past the cap")
    spark.stop()
  }
}
