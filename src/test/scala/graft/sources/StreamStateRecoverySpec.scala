package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Stateful-aggregation state RECOVERY across separate query runs: a
  * grouped count whose state store must survive a stop/restart cycle —
  * the restarted run sees only NEW files but must produce totals over the
  * whole stream, i.e. the counts live in the recovered state, not in the
  * re-read data. (FixedWidthStreamingSpec pins source-offset resume; this
  * pins the STATE side.) */
class StreamStateRecoverySpec extends SparkSpec with Matchers {

  test("grouped-count state survives a stop/restart over the same checkpoint") {
    import spark.implicits._
    val data = Files.createTempDirectory("graft-state-data").toString
    val ckpt = Files.createTempDirectory("graft-state-ckpt").toString

    def writeBatch(keys: Seq[String]): Unit =
      keys.map(k => f"$k%-10s").toDF("value").coalesce(1)
        .write.format("fixedwidth").option("recordLength", 10).mode("append").save(data)

    def drain(name: String): Map[String, Long] = {
      val q = spark.readStream.format("fixedwidth").option("recordLength", 10).load(data)
        .select(trim(col("value").cast("string")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.table(name).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    writeBatch(Seq("a", "a", "b"))
    drain("state_rec_1") shouldBe Map("a" -> 2L, "b" -> 1L)

    // new run, same checkpoint: only the new file is read, but totals must
    // include the first run's rows — they can only come from recovered state
    writeBatch(Seq("a", "c"))
    drain("state_rec_2") shouldBe Map("a" -> 3L, "b" -> 1L, "c" -> 1L)
  }
}
