package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.StreamingQueries

/** The streaming SimHash near-dup core under a FORCED multi-batch stream
  * (the q178 lane's AvailableNow run drains in one batch, so cross-batch
  * state and late lower-id arrivals are only exercised here). Signatures
  * are synthetic longs so every Hamming relation is chosen exactly. */
class StreamNearDupSpec extends SparkSpec with Matchers {

  private val A = 0x0123456789abcdefL

  test("verdicts match lower-id Hamming<=3 across micro-batches; banding rejects far same-band pairs") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-snd-data").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("sig", LongType)))

    // the file-stream source lists FILES in the directory (it does not
    // recurse into per-write subdirectories), so stage each batch's part
    // file and move it in as a plain file with a controlled mtime
    def writeOne(rows: Seq[(Long, Long)], name: String, mtime: Long): Unit = {
      val stage = Files.createTempDirectory("graft-snd-stage").toString
      rows.toDF("doc_id", "sig").coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      val dest = new java.io.File(dir, name)
      Files.move(part.toPath, dest.toPath)
      dest.setLastModified(mtime)
    }
    val t0 = System.currentTimeMillis() - 60000
    // batch 1: 11 is 1 bit from 10 (dup); 12 differs in 12 bits, all inside
    // band 0 — it SHARES bands 1-3 with 10/11, so it meets them in-group and
    // must be rejected by the Hamming check, not by never meeting them
    writeOne(Seq((10L, A), (11L, A ^ 1L), (12L, A ^ 0xfff1L)), "b1.parquet", t0)
    // batch 2: 13 is 2 bits from 10 (dup via state recovered from batch 1);
    // 5 arrives LATE with a lower id and matches nothing below it
    writeOne(Seq((13L, A ^ (1L << 20) ^ (1L << 40)), (5L, ~A)), "b2.parquet", t0 + 5000)

    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    val q = StreamingQueries.nearDupVerdicts(
        ss.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(dir).as[(Long, Long)](newLongLongEncoder))
      .writeStream.format("memory").queryName("snd_test").outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("graft-snd-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.count(_.numInputRows > 0) should be >= 2L.toInt

    val verdicts = ss.table("snd_test")
      .groupBy(col("doc_id")).agg(max(col("band_dup")).as("is_dup"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    verdicts shouldBe Map(10L -> 0, 11L -> 1, 12L -> 0, 13L -> 1, 5L -> 0)
  }

  private def newLongLongEncoder = {
    import spark.implicits._
    implicitly[org.apache.spark.sql.Encoder[(Long, Long)]]
  }

  test("stateCap: a spam-saturated bucket stops accumulating but keeps issuing verdicts") {
    import spark.implicits._
    // 200 identical sigs (the spam adversary: all land in the same 4 band
    // buckets) + a Hamming-3 pair (400, 500) that shares ONLY the spam-
    // saturated band-0 bucket with each other (they differ in one bit of
    // each other band, and are far from the spam sig). Batch-mode run
    // (empty initial state, rows process in ascending id): with cap 10
    // the bucket retains ids 1..10; every later spam doc still matches
    // id 1 (dup), but 400 is never retained, so 500's only possible
    // meeting place is saturated and its pair is lost — the documented
    // bucketCap tradeoff in streaming form.
    val spam = (1L to 200L).map(i => (i, A))
    val x = A ^ (0x7fL << 24) // 7 bits off in band 1: same band-0 value, not a spam dup
    val y = x ^ (1L << 20) ^ (1L << 40) ^ (1L << 56) // Hamming 3 from x, shares only band 0
    val df = (spam ++ Seq((400L, x), (500L, y))).toDF("doc_id", "sig")
    val out = StreamingQueries.nearDupVerdicts(
        df.as[(Long, Long)](newLongLongEncoder), stateCap = 10)
      .groupBy($"doc_id").agg(max($"band_dup").as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out(1L) shouldBe 0
    (2L to 200L).foreach(i => out(i) shouldBe 1) // matched against the prefix
    out(400L) shouldBe 0
    out(500L) shouldBe 0 // pair lost to the cap: 400 was never retained
    // and the uncapped default still finds it
    val exact = StreamingQueries.nearDupVerdicts(
        df.as[(Long, Long)](newLongLongEncoder))
      .groupBy($"doc_id").agg(max($"band_dup").as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    exact(500L) shouldBe 1
  }

  test("NULL sig rows are dropped before the primitive encoder (batch-mode run)") {
    import spark.implicits._
    // (flat)MapGroupsWithState also runs on batch Datasets (empty state) —
    // enough to pin the null filter without a stream
    val df = Seq((1L, Some(A)), (2L, Some(A ^ 1L)), (3L, None: Option[Long]))
      .toDF("doc_id", "sig").select($"doc_id", $"sig")
    val out = StreamingQueries.nearDupVerdicts(df.as[(Long, Long)](newLongLongEncoder))
      .groupBy($"doc_id").agg(max($"band_dup").as("d"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    out shouldBe Map(1L -> 0, 2L -> 1)
  }
}
