package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The fixedwidth MicroBatchStream: new files = new data, offsets resume
  * from the checkpoint, batch and stream read identical bytes. */
class FixedWidthStreamingSpec extends SparkSpec with Matchers {

  test("streaming reads existing files, then ONLY files added later (checkpoint resume)") {
    import spark.implicits._
    val data = Files.createTempDirectory("graft-stream-data").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val out = Files.createTempDirectory("graft-stream-out").toString

    def writeBatch(tag: String, n: Int): Unit =
      (0 until n).map(i => f"$tag%s$i%05d").toDF("value").coalesce(1)
        .write.format("fixedwidth").option("recordLength", 10).mode("append").save(data)

    def drain(): Unit = {
      val q = spark.readStream.format("fixedwidth").option("recordLength", 10).load(data)
        .select(col("value").cast("string").as("value"))
        .writeStream.format("parquet").outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch("aaaaa", 30)
    drain()
    spark.read.parquet(out).count() shouldBe 30L

    writeBatch("bbbbb", 12)
    // same checkpoint → second run must deliver ONLY the new file's records
    drain()
    val rows = spark.read.parquet(out).collect().map(_.getString(0))
    rows.length shouldBe 42
    rows.count(_.startsWith("bbbbb")) shouldBe 12
  }
}
