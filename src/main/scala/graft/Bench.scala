package graft
import org.apache.spark.sql.SparkSession

import graft.operators.ArtifactStore

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // UTC like every other main: the event lanes' NTZ→TZ normalization
      // REQUIRES it (QueryRegistry.normalizeTs fails loudly otherwise), and
      // timing the same plans under a different session TZ than Verify's
      // would be comparing different codegen.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    // Deterministic name order: Map iteration order shuffles across builds,
    // which moved shared lazy-init costs between queries and made
    // round-over-round per-query timings non-comparable.
    // SPARK_GRAFT_BENCH_REPS (default 3): run each query N times and record
    // the MEDIAN. Median-of-3 is the RECORDED configuration from round 9 on
    // (noted in BASELINE.md): single-shot runs spiked 3-20x on one random
    // lane per round (q16/q46/q52/q141 across rounds) and cost two rounds
    // of judge adjudication time; medians absorb exactly that spike class.
    // Set =1 for a quick driver-identical single shot while iterating.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    // Trained-artifact accounting: the ArtifactStore memo gives lanes the
    // deployed train-once shape, but combined with median-of-reps it also
    // HID training cost from the record entirely — rep 1 of the first
    // consumer lane paid it, reps 2+ replayed the cache, and the median
    // discarded the slow rep. So the bench pays each shared artifact's
    // cold training cost HERE, once, recorded as its own train_* entry
    // inside the total: per-lane times measure the lane's real
    // incremental (warm-artifact) cost in EVERY rep, and the one-time
    // cost stays visible instead of vanishing between reps. Single-shot
    // by design — a one-time cost has no steady state to median over.
    ArtifactStore.clear()
    // Purity sentinel (see runSentinel below): the FIRST checkpoint runs
    // here, BEFORE the trainer phase — the r12 contention incident that
    // motivated the sentinel polluted the train_* entries themselves, so a
    // window opening after the trainers would record that exact case as
    // contended:false.
    // untimed warms: the raw-thread loop C2-compiles within a couple of
    // iterations; warms also let the warmup machinery's background
    // compilation threads drain before the first timed checkpoint
    (1 to 3).foreach(_ => sentinelLane(spark))
    val sentinelStart = runSentinel(spark)
    val trainers =
      queries.PipelineQueries.artifactTrainers ++
        queries.CurationQueries.artifactTrainers ++
        queries.SimilarityQueries.artifactTrainers ++
        queries.DedupQueries.artifactTrainers ++
        queries.RelationalQueries.artifactTrainers
    val trainResults = trainers.map { case (name, f) =>
      val t0 = System.nanoTime()
      val ok = try { f(spark, sfDir); true }
               catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
      val dt = (System.nanoTime() - t0) / 1e9
      LaneReset(spark)
      name -> (if (ok) dt else -1.0)
    }
    // Keys the registered trainers populated: compared against the memo
    // AFTER the lane sweep to catch an unregistered ArtifactStore.cached
    // site (see the coverage check below the sweep).
    val trainedKeys = ArtifactStore.keys()
    // In-run variance detector, complementary to the sentinel: the
    // observed pollution class (r10-r13) is a stretch of lanes whose reps
    // spike 2-5x — and the lanes run on Spark's LONG-LIVED executor
    // threads, which share the CPU with competing load in a way a fresh
    // short probe thread does not (CFS runs low-vruntime burst threads
    // nearly unimpeded, measured: 16 busy-loops left the thread sentinel
    // at its idle floor). Rep spread is measured on the lanes themselves,
    // costs nothing, and is recorded per run for cross-round calibration.
    val noisyLanes = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    // Per-lane GC attribution (SURVEY §7.5 open item 1): cumulative GC
    // millis across the lane's reps, read from the MXBean like the
    // sweep-level snapshots. The r13 record showed GC climbing 2.3 s →
    // 222 s across the sweep; this names the lanes that pay it (and the
    // lanes that CAUSE it, to the extent they are the same — a lane
    // inheriting a fragmented heap shows high GC without high allocation,
    // which is exactly the distinction the in-suite-tax investigation
    // needs in-record). Sidecar-only, like `noisiest`.
    val laneGcMs = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def sweep(qs: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]) =
      qs.map { case (name, fn) =>
        val gc0 = jvmStats()._1
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // A failed query must be visible as -1, not recorded as a fast run.
          val ok = try { fn(spark, sfDir).count(); true }
                   catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
          val dt = (System.nanoTime() - t0) / 1e9
          // Drop state a query persisted/cached/checkpointed so later queries
          // aren't taxed by another query's memory footprint (see LaneReset).
          LaneReset(spark)
          if (ok) dt else -1.0
        }
        laneGcMs += (name -> (jvmStats()._1 - gc0))
        if (reps >= 3 && !times.contains(-1.0)) {
          // spread over WARM reps only — rep 1 always pays the lane's
          // plan/codegen cold cost, so including it measures cold-vs-warm
          // (44 false "noisy" lanes on an idle sf0.001 run), not load
          val warm = times.tail
          val spread = warm.max / math.max(warm.min, 1e-9)
          // only lanes big enough that scheduler jitter can't fake a spike
          if (warm.min > 0.3 && spread > 2.0)
            noisyLanes += (name -> math.rint(spread * 100) / 100)
        }
        val dt = if (times.contains(-1.0)) -1.0
                 else times.sorted.apply((times.size - 1) / 2)
        name -> dt
      }
    val allLanes = SparkEntry.queries.toSeq.sortBy(_._1)
    val (firstHalf, secondHalf) = allLanes.splitAt(allLanes.size / 2)
    val jvmStatStart = jvmStats()
    val jvmDeepStart = jvmDeepStats()
    val firstResults = sweep(firstHalf)
    val sentinelMid = runSentinel(spark)
    val jvmStatMid = jvmStats()
    val jvmDeepMid = jvmDeepStats()
    val laneResults = firstResults ++ sweep(secondHalf)
    val sentinelEnd = runSentinel(spark)
    val jvmStatEnd = jvmStats()
    val jvmDeepEnd = jvmDeepStats()
    val sentinelTimes = Seq(sentinelStart, sentinelMid, sentinelEnd)
    val contended = sentinelTimes.max / sentinelTimes.min > 1.3
    // JVM-state snapshots next to the sentinel checkpoints: the one bench
    // phenomenon left after the sentinel (see SURVEY §7.5 open item 1) is
    // big-aggregation lanes running 3-5x slower IN-SUITE than warm
    // standalone on a sentinel-clean host — JVM-wide state, not load.
    // Cumulative GC time and heap occupancy at start/mid/end make that
    // investigable from the record itself.
    // `noisiest` (per-lane spreads) goes to the SIDECAR only: the stdout
    // total line rides a ~2000-char driver tail and must never let
    // diagnostics crowd out the headline fields
    val noisySidecarJson = {
      val worst = noisyLanes.sortBy(-_._2).take(5)
        .map { case (n, s) => s"\"" + n + "\":" + s }.mkString("{", ",", "}")
      // top GC payers (millis across the lane's reps) — the per-lane
      // attribution of the sweep-level jvm_gc_ms climb
      val gcTop = laneGcMs.sortBy(-_._2).take(10)
        .map { case (n, g) => s"\"" + n + "\":" + g }.mkString("{", ",", "}")
      s""""noisiest":$worst,"gc_top_ms":$gcTop,""" +
        s""""jvm_deep":[$jvmDeepStart,$jvmDeepMid,$jvmDeepEnd],"""
    }
    val jvmJson =
      s""""jvm_gc_ms":[${jvmStatStart._1},${jvmStatMid._1},${jvmStatEnd._1}],""" +
      s""""jvm_heap_used_mb":[${jvmStatStart._2},${jvmStatMid._2},${jvmStatEnd._2}],""" +
      s""""noisy_lane_count":${noisyLanes.size}"""
    // Trainer-coverage check: any artifact key memoized DURING the lane
    // sweep came from a `cached` site no registered trainer covers — its
    // cold training cost hid inside the first consumer lane's rep 1 and
    // the median then discarded it (the exact round-10 accounting bug the
    // train_* entries exist to prevent). Fail LOUDLY but not DESTRUCTIVELY:
    // the full sweep's timings are still written (stdout + sidecar, tagged
    // with the unregistered keys) and the process then exits nonzero —
    // discarding an hour of lane timings would punish the diagnosis. Note
    // a key can also land here when its REGISTERED trainer failed (-1
    // entry above) and a consumer lane retrained it; the failures count
    // disambiguates.
    val unregistered = ArtifactStore.keys() -- trainedKeys
    if (unregistered.nonEmpty)
      System.err.println("[bench] artifact keys first memoized inside the " +
        s"lane sweep: ${unregistered.mkString(", ")} — either register a " +
        "trainer in the module's artifactTrainers, or check the train_* " +
        "entries above for a -1 (failed trainer retrained by its consumer)")
    val results = trainResults ++ laneResults
    // A failed lane/trainer records the -1.0 sentinel; summing it would
    // silently SHRINK the total by 1 s per failure. Exclude sentinels from
    // the headline number and surface the count instead.
    val failures = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    // Full per-query map first (human/archive record)...
    val qsFull = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"per_query_full","value":$total,"unit":"sec","queries":$qsFull,"sf":"$sfDir"}""")
    // ...then the parseable line LAST and SHORT: the driver keeps only the
    // final ~2000 chars of output, and the full 132-query map exceeds that
    // (r7's BENCH json has parsed:null). Emit total + the slowest queries,
    // adding entries by descending cost until the line nears the budget, so
    // the headline number and the lanes that matter always survive the tail.
    def r3(v: Double) = math.rint(v * 1000) / 1000
    val byCost = results.sortBy(-_._2).map { case (k, v) => s"\"" + k + "\":" + r3(v) }
    // 1500, not 1600: the sentinel + JVM-stat fields ride the same line
    // and the driver keeps only the final ~2000 chars — the headline
    // total and purity fields must never be the part that gets cut
    val budget = 1500
    val kept = new scala.collection.mutable.ArrayBuffer[String]
    var len = 0
    // strict PREFIX of the by-cost ranking: stop at the first entry over
    // budget (a guard-only filter would drop an expensive long-named lane
    // yet keep cheaper short-named ones after it)
    var cut = false
    for (e <- byCost if !cut) {
      if (len + e.length + 1 < budget) { kept += e; len += e.length + 1 }
      else cut = true
    }
    val sentinelJson =
      s""""sentinel_times":[${sentinelTimes.map(r3).mkString(",")}],"contended":$contended,$jvmJson"""
    val note = (if (kept.size < results.size)
      s""","queries_shown":${kept.size},"queries_total":${results.size}""" else "") +
      (if (failures > 0) s""","failures":$failures""" else "") +
      (if (unregistered.nonEmpty)
        s""","unregistered_artifacts":${unregistered.size}""" else "")
    val totalLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":${kept.mkString("{", ",", "}")}$note,$sentinelJson,"sf":"$sfDir"}"""
    // Sidecar copy (full per-query map, not tail-budgeted): a parse-proof
    // artifact next to the build regardless of how the runner decorates
    // stdout. The stdout total line stays the primary driver contract.
    try java.nio.file.Files.write(java.nio.file.Path.of("bench.json"),
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qsFull,"failures":$failures,$noisySidecarJson$sentinelJson,"sf":"$sfDir"}\n""".getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] sidecar write failed: $e") }
    spark.stop()
    // AFTER spark.stop(): no Spark shutdown chatter can land after this line.
    println(totalLine)
    // the coverage violation still fails the run — but only after the
    // record is written
    if (unregistered.nonEmpty) sys.exit(3)
  }

  /** (cumulative GC millis across all collectors, heap used MiB) — the
    * JVM-state snapshot taken beside each sentinel checkpoint. */
  private def jvmStats(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    val heap = java.lang.management.ManagementFactory.getMemoryMXBean
      .getHeapMemoryUsage.getUsed / (1024L * 1024L)
    (gc, heap)
  }

  /** Deeper JVM-state snapshot for the in-suite-tax investigation
    * (SURVEY §7.5 open item 1): GC pause COUNT, metaspace + code-cache
    * occupancy, and live loaded-class count. 230 lanes × fresh codegen
    * classes each is exactly the kind of JVM-wide state that grows with
    * sweep position while heap-used stays flat — these four series tell a
    * metaspace/class-churn story apart from an allocation-rate story. */
  private def jvmDeepStats(): String = {
    import scala.jdk.CollectionConverters._
    val gcN = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionCount, 0L)).sum
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    def poolMb(name: String): Long =
      pools.filter(_.getName.toLowerCase.contains(name))
        .map(_.getUsage.getUsed).sum / (1024L * 1024L)
    val classes = java.lang.management.ManagementFactory.getClassLoadingMXBean
      .getLoadedClassCount
    s"""{"gc_count":$gcN,"metaspace_mb":${poolMb("metaspace")},""" +
      s""""codecache_mb":${poolMb("codeheap") max poolMb("code cache")},""" +
      s""""classes_loaded":$classes}"""
  }

  /** Purity sentinel: the same tiny calibration lane timed at sweep start
    * (before the trainer phase), middle, and end. Three rounds running, a
    * contended host inflated recorded lane medians up to 6x and the
    * judge+builder spent an adjudication cycle separating host drift from
    * code motion (q201/q193 r10, the streaming family r11, q155/train_*
    * r12). The sentinel makes purity part of the record itself: identical
    * constant work drifting >1.3x across the sweep can only be the HOST,
    * so a `contended:true` flag reads as "discount this record" without
    * any out-of-band A/B. MIN-of-5 per checkpoint, not median: a one-rep
    * GC or JIT transient inflates individual reps at any SF, but only
    * SUSTAINED competing load raises the floor of five back-to-back
    * identical runs — exactly the condition the flag exists to catch. */
  private def runSentinel(spark: SparkSession): Double = {
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      sentinelLane(spark)
      (System.nanoTime() - t0) / 1e9
    }
    ts.min
  }

  /** The sentinel's calibration lane: a fixed pure-CPU splitmix loop on
    * one plain JVM thread per core — deliberately NO Spark at all. It
    * computes no registered query's answer and reads no input data — the
    * work is IDENTICAL at every scale factor (hence no sfDir parameter),
    * so drift across the sweep measures the HOST's available CPU, not the
    * code and not the filesystem cache. Two Spark-based variants were
    * tried first and rejected: a small parquet scan-agg (single ~100 ms
    * task dominated by scheduler-latency jitter) and a range→mod→sum
    * codegen aggregate (the DAG-scheduler/codegen warm state made the
    * pre-trainer START checkpoint read ~1.35x its mid-sweep floor on an
    * idle host, false-flagging clean runs). A raw thread loop C2-compiles
    * in a couple of iterations and carries no framework state. The result
    * is folded into a volatile sink so the loop cannot be dead-code
    * eliminated. */
  @volatile private var sentinelSink: Long = 0L
  private def sentinelLane(spark: SparkSession): Unit = {
    val cores = spark.sparkContext.defaultParallelism.max(1)
    val perThread = 120L * 1000 * 1000
    val threads = (0 until cores).map { t =>
      new Thread(() => {
        var x = 0x9e3779b97f4a7c15L + t
        var acc = 0L
        var i = 0L
        while (i < perThread) {
          x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
          x ^= x >>> 27; x *= 0x94d049bb133111ebL
          x ^= x >>> 31
          acc += x
          i += 1
        }
        // deliberately racy cross-thread += : this is ONLY a DCE sink (any
        // written value suffices); a lock/atomic here would serialize the
        // calibration loop's final writes and add contention the sentinel
        // exists to measure elsewhere — don't "fix" it
        sentinelSink += acc
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
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
