package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level profile of the q172 prefix-filter similarity join (dev
  * tool): attributes the lane's cost to gram-table build / prefix build /
  * candidate generation+aggregation / exact verification. The stage
  * replica mirrors the r13 `Dedup.prefixFilterPairs` (hash-at-entry,
  * window-fused frequency, stat-driven verify joins) for attribution
  * only — the lane itself still runs the real operator.
  * Usage: sbt "runMain graft.tools.ProfilePrefix [sfDir]"
  */
object ProfilePrefix {
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

    val (tnum, tden) = (1, 2)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    spark.read.parquet(s"$sfDir/documents.parquet").count() // warm scan + JIT

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val grams = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("grams"))
        .filter(size(col("grams")) > 0)

      // stage replica of prefixFilterPairs (r13 form) for attribution
      // NOTE: localCheckpoint(eager=true) runs the job AT the call — the
      // materialization must sit INSIDE time() or the stage prints ~0s
      val g = time("gram-table build (hash at entry)") {
        grams.select(col("doc_id").as("_fid"),
            array_sort(transform(col("grams"), x => xxhash64(x))).as("_g"))
          .localCheckpoint(true)
      }
      val ge = g.select(col("_fid").as("_id"), explode(col("_g")).as("_gram"))
      val prefixes = time("prefix-table build") { ge
        .withColumn("_f", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("_gram"))))
        .groupBy(col("_id"))
        .agg(array_sort(collect_list(struct(col("_f"), col("_gram")))).as("_sorted"),
          count(lit(1)).as("_n"))
        .withColumn("_p",
          expr(s"cast(_n - ((_n * $tnum + ${tden - 1}) div $tden) + 1 AS int)"))
        .select(col("_id"), col("_n"), posexplode(expr(
          "transform(slice(_sorted, 1, _p), s -> s._gram)")).as(Seq("_pos", "_gram")))
        .localCheckpoint(true)
      }

      val candRaw = prefixes.select(
          col("_id").as("id_a"), col("_n").as("_na"), col("_pos").as("_ia"), col("_gram"))
        .join(prefixes.select(
          col("_id").as("id_b"), col("_n").as("_nb"), col("_pos").as("_ib"), col("_gram")), "_gram")
        .filter(col("id_a") < col("id_b") &&
          col("_na") * tnum <= col("_nb") * tden &&
          col("_nb") * tnum <= col("_na") * tden)
      val cand = time("candidate gen+aggregation") { candRaw
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("_ia")).as("_ia"), min(col("_ib")).as("_ib"),
          first(col("_na")).as("_na"), first(col("_nb")).as("_nb"))
        .filter(least(col("_na") - col("_ia"), col("_nb") - col("_ib")) * (tnum + tden) >=
          (col("_na") + col("_nb")) * tnum)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint(true)
      }
      val nCand = cand.count()

      // verification reuses the entry gram table (r13: no separate build)
      val full = g
      val nOut = time("exact verification (unhinted)") {
        cand
          .join(full.select(col("_fid").as("id_a"), col("_g").as("_ga")), "id_a")
          .join(full.select(col("_fid").as("id_b"), col("_g").as("_gb")), "id_b")
          .select(col("id_a"), col("id_b"),
            size(col("_ga")).cast("long").as("n_a"),
            size(col("_gb")).cast("long").as("n_b"),
            graft.functions.SetOps.intersectSize(col("_ga"), col("_gb")).cast("long").as("n_inter"))
          .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
          .filter(col("n_inter") * tden >= col("n_union") * tnum)
          .count()
      }
      println(s"PROF candidates=$nCand survivors=$nOut")

      val nRaw = time("candidate rows PRE-aggregation")(candRaw.count())
      println(s"PROF candRaw=$nRaw")

      // stage-level attribution of the real lane: collect per-stage wall
      // times while the single fused job runs
      val stages = new scala.collection.mutable.ArrayBuffer[(Int, Long, Int, String)]()
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
          val scopes = i.rddInfos.flatMap(_.scope).map(_.name).distinct.mkString(",")
          stages += ((i.stageId, ms, i.numTasks, scopes.take(120)))
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val total = time("full operator (lane path)") {
        Dedup.prefixFilterPairs(grams, "doc_id", "grams", tnum, tden).count()
      }
      spark.sparkContext.removeSparkListener(listener)
      println(s"PROF lane rows=$total")
      stages.sortBy(-_._2).take(8).foreach { case (id, ms, n, name) =>
        println(f"PROF   stage $id%4d ${ms / 1e3}%7.2fs tasks=$n%-4d $name")
      }
      graft.LaneReset(spark)
    }
    spark.stop()
  }
}
