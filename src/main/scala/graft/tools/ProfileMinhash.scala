package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level profile of the q52 MinHash+LSH lane (dev tool): times each
  * sub-pipeline of [[Dedup.minhashNearDups]] in isolation so a lane-level
  * regression can be attributed to sketch / banding / candidate-gen /
  * verification instead of guessed at.
  * Usage: sbt "runMain graft.tools.ProfileMinhash [sfDir]"
  */
object ProfileMinhash {
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
    import spark.implicits._

    val (shingleLen, numHashes, bands) = (2, 64, 32)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs"); r
    }
    // warm the scan + JIT once
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val sketched = docs
        .select(col("doc_id").cast("long").as("id"), col("text"))
        .filter(col("text").isNotNull)
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          val (gh, _, bh) = Dedup.sketchOf(text, shingleLen, numHashes, bands)
          if (gh.isEmpty) None else Some((id, gh, bh))
        })
        .toDF("id", "gh", "bands")
      val sigs = time("sketch+localCheckpoint")(
        Dedup.truncateLineage(sketched, None))
      time("sigs.count")(sigs.count())

      val banded = sigs.select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      val buckets = Dedup.cappedBuckets(banded, "band_idx", "band_hash", "id", 2000)
      time("bucket agg count")(println(s"  buckets=${buckets.count()}"))
      val candidates = buckets
        .select(explode(Dedup.pairsOf(array_sort(col("ids")))).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
      time("raw candidate pairs")(println(s"  rawPairs=${candidates.count()}"))
      val distinctCand = candidates.distinct()
      time("distinct pairs")(println(s"  pairs=${distinctCand.count()}"))
      val verified = distinctCand
        .join(sigs.select(col("id").as("id_a"), col("gh").as("g_a")).hint("shuffle_hash"), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("gh").as("g_b")).hint("shuffle_hash"), "id_b")
        .select(col("id_a"), col("id_b"),
          graft.functions.SetOps.sortedJaccard(col("g_a"), col("g_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.05)
      time("verify join+jaccard")(println(s"  out=${verified.count()}"))
      time("END-TO-END minhashNearDups")(println(s"  rows=${Dedup.minhashNearDups(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        shingleLen = 2, numHashes = 64, bands = 32, threshold = 0.05).count()}"))
      graft.LaneReset(spark)
    }
    spark.stop()
  }
}
