package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Edge-case probe for the fixedwidth format, driven through the public
  * `spark.read/write.format("fixedwidth")` surface. Run with
  * `sbt "runMain graft.tools.Probe"`. Prints one PROBE line per case.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def expectError(tag: String)(body: => Unit): Unit =
      try { body; println(s"PROBE $tag: NO-ERROR (unexpected)") }
      catch { case e: Throwable =>
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq.last
        println(s"PROBE $tag: ${root.getClass.getSimpleName}: ${root.getMessage.linesIterator.next()}")
      }

    val base = Files.createTempDirectory("graft-probe").toString

    // happy path: raw round trip with custom key
    val df = (0 until 100).map(i => f"rec$i%06d").toDF("value")
    df.write.format("fixedwidth").option("recordLength", 10).mode("overwrite").save(s"$base/raw")
    val back = spark.read.format("fixedwidth")
      .option("recordLength", 10).option("keyStartAt", 3).option("keyEndAt", 8)
      .load(s"$base/raw")
    val n = back.count()
    val keyed = back.select($"offset", $"key".cast("string").as("k")).orderBy($"offset").head(2).toSeq
    println(s"PROBE roundtrip: n=$n first=$keyed")

    expectError("missing-recordLength") {
      spark.read.format("fixedwidth").load(s"$base/raw").count()
    }
    expectError("key-start-without-end") {
      spark.read.format("fixedwidth").option("recordLength", 10)
        .option("keyStartAt", 2).load(s"$base/raw").count()
    }
    expectError("key-end-lt-start") {
      spark.read.format("fixedwidth").option("recordLength", 10)
        .option("keyStartAt", 5).option("keyEndAt", 2).load(s"$base/raw").count()
    }
    expectError("key-end-past-record") {
      spark.read.format("fixedwidth").option("recordLength", 10)
        .option("keyStartAt", 5).option("keyEndAt", 10).load(s"$base/raw").count()
    }
    expectError("truncated-file") {
      Files.write(Paths.get(s"$base/trunc"), new Array[Byte](25))
      spark.read.format("fixedwidth").option("recordLength", 10).load(s"$base/trunc").count()
    }
    expectError("compressed-file") {
      Files.write(Paths.get(s"$base/comp.gz"), new Array[Byte](20))
      spark.read.format("fixedwidth").option("recordLength", 10).load(s"$base/comp.gz").count()
    }
    expectError("nonexistent-path") {
      spark.read.format("fixedwidth").option("recordLength", 10).load(s"$base/nope").count()
    }
    expectError("write-missing-layout-col") {
      df.write.format("fixedwidth").option("fields", "a:long:0:10")
        .mode("overwrite").save(s"$base/badw")
    }
    expectError("oversize-raw-value") {
      Seq("12345678901").toDF("value").write.format("fixedwidth")
        .option("recordLength", 10).mode("overwrite").save(s"$base/over")
    }

    // split-smaller-than-record analog: tiny maxPartitionBytes must still
    // produce whole records (reference test :235-238 forces split < record).
    spark.conf.set("spark.sql.files.maxPartitionBytes", "3")
    val tiny = spark.read.format("fixedwidth").option("recordLength", 10).load(s"$base/raw")
    println(s"PROBE tiny-splits: n=${tiny.count()} parts=${tiny.rdd.getNumPartitions} " +
      s"allLen10=${tiny.select(min(length($"value")) === 10 && max(length($"value")) === 10).head.getBoolean(0)}")
    spark.conf.unset("spark.sql.files.maxPartitionBytes")

    spark.stop()
  }
}
