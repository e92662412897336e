package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale rehearsal for connected components under a hub adversary: a star
  * graph (one node adjacent to N others — a spam clique collapses to this
  * after one large-star round) plus long chains for round-count stress.
  * Pre-r18 each star round collected a node's ENTIRE neighborhood with
  * `collect_set` into one non-spillable aggregation buffer, so the hub put
  * all N ids into a single task's memory; no cap may drop the group
  * (correctness needs every edge — unlike the LSH adversary, there is no
  * "discard the bucket" escape). Post-fix the rounds are min-aggregate +
  * hash-join (constant state per node), so the run must complete with a
  * small bounded per-task peak (reported below) and label every node with
  * the true component minimum.
  *
  * Usage: sbt "runMain graft.tools.AdversarialCc [hubDegree] [chains]"
  */
object AdversarialCc {
  def main(args: Array[String]): Unit = {
    val hubDegree = args.headOption.map(_.toLong).getOrElse(2000000L)
    val chains = args.lift(1).map(_.toLong).getOrElse(64L)
    val chainLen = 1000L
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
    // hub component: node 0 — {1..hubDegree}; chain components: disjoint
    // paths of length chainLen starting at offset c (diameter stress the
    // O(log n) alternation must still converge through)
    val base = 1000000000L
    val hub = spark.range(1L, hubDegree + 1L)
      .select(lit(0L).as("id_a"), $"id".as("id_b"))
    // NOTE: Spark's `/` on longs is DOUBLE division; `div` keeps longs
    val off = expr(s"(id div ${chainLen - 1}) * $chainLen + (id % ${chainLen - 1}) + $base")
    val chainEdges = spark.range(chains * (chainLen - 1))
      .select(off.as("id_a"), (off + 1L).as("id_b"))
    val t0 = System.nanoTime()
    val comps = Dedup.connectedComponents(hub.unionByName(chainEdges))
    val agg = comps.agg(
      count(lit(1)).as("n"),
      count(when($"id" <= hubDegree && $"component" === 0L, 1)).as("hub_ok"),
      count(when($"id" >= base &&
        $"component" === expr(s"((id - $base) div $chainLen) * $chainLen + $base"), 1))
        .as("chain_ok"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // listener bus is async
    val (n, hubOk, chainOk) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
    println(f"ADVERSARIAL_CC hubDegree=$hubDegree chains=$chains nodes=$n " +
      f"hubOk=$hubOk chainOk=$chainOk time=$secs%.2fs " +
      f"peakTaskMem=${peak.get() / (1024.0 * 1024)}%.1fMB")
    require(hubOk == hubDegree + 1L, "hub component mislabeled")
    require(chainOk == chains * chainLen, "chain component mislabeled")
    spark.stop()
  }
}
