package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Hadoop-migration compatibility surface: the reference's job-conf property
  * names (reference FixedLengthInputFormat.java:97-149) are accepted as
  * reader option aliases, and the writer states its compression stance
  * explicitly (reference FixedLengthRecordReader.java:147-152 rejects
  * compressed input; a compressed fixed-width file cannot be record-split).
  */
class FixedWidthCompatSpec extends SparkSpec with Matchers {

  private def tmp(): String = Files.createTempDirectory("graft-compat").toString

  private def writeRaw(dir: String, n: Int = 50): Unit = {
    import spark.implicits._
    (0 until n).map(i => f"rec$i%06d").toDF("value")
      .write.format("fixedwidth").option("recordLength", 10).mode("overwrite").save(dir)
  }

  test("Hadoop record.length alias reads like the native option") {
    val dir = tmp(); writeRaw(dir)
    val native = spark.read.format("fixedwidth")
      .option("recordLength", 10).load(dir)
    val alias = spark.read.format("fixedwidth")
      .option("mapreduce.input.fixedlengthinputformat.record.length", 10).load(dir)
    alias.schema shouldBe native.schema
    alias.count() shouldBe native.count()
    alias.select(col("value").cast("string")).collect().map(_.getString(0)).sorted shouldBe
      native.select(col("value").cast("string")).collect().map(_.getString(0)).sorted
  }

  test("Hadoop recordkey.startat/endat aliases produce the key column with slice semantics") {
    val dir = tmp(); writeRaw(dir)
    val alias = spark.read.format("fixedwidth")
      .option("mapreduce.input.fixedlengthinputformat.record.length", 10)
      .option("mapreduce.input.fixedlengthinputformat.recordkey.startat", 3)
      .option("mapreduce.input.fixedlengthinputformat.recordkey.endat", 8)
      .load(dir)
    val native = spark.read.format("fixedwidth")
      .option("recordLength", 10).option("keyStartAt", 3).option("keyEndAt", 8)
      .load(dir)
    alias.columns should contain("key")
    alias.select(col("key").cast("string")).collect().map(_.getString(0)).sorted shouldBe
      native.select(col("key").cast("string")).collect().map(_.getString(0)).sorted
  }

  test("matching native and alias spellings coexist; conflicting values fail fast") {
    val dir = tmp(); writeRaw(dir)
    // same value both ways: fine
    spark.read.format("fixedwidth")
      .option("recordLength", 10)
      .option("mapreduce.input.fixedlengthinputformat.record.length", 10)
      .load(dir).count() shouldBe 50
    // different values: ambiguous, must not silently pick one
    val e = intercept[IllegalArgumentException] {
      spark.read.format("fixedwidth")
        .option("recordLength", 10)
        .option("mapreduce.input.fixedlengthinputformat.record.length", 12)
        .load(dir).count()
    }
    e.getMessage should include("conflicts with its Hadoop alias")
  }

  test("alias validation errors are the same as native ones (both-or-neither key rule)") {
    val dir = tmp(); writeRaw(dir)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("fixedwidth")
        .option("mapreduce.input.fixedlengthinputformat.record.length", 10)
        .option("mapreduce.input.fixedlengthinputformat.recordkey.startat", 2)
        .load(dir).count()
    }
    e.getMessage should include("must be set together")
  }

  test("writer compression contract: zstd/gzip write framed .fwz, others rejected") {
    import spark.implicits._
    val out = tmp()
    val df = (0 until 5).map(i => f"rec$i%06d").toDF("value")
    // non-framed codecs are still rejected loudly (raw compressed
    // fixed-width bytes can't record-split — reference parity)
    for (codec <- Seq("snappy", "lz4", "bzip2")) {
      val e = intercept[IllegalArgumentException] {
        df.write.format("fixedwidth").option("recordLength", 10)
          .option("compression", codec).mode("overwrite").save(out)
      }
      e.getMessage should include("unsupported write compression")
    }
    val e2 = intercept[IllegalArgumentException] {
      df.write.format("fixedwidth").option("recordLength", 10)
        .option("codec", "deflate").mode("overwrite").save(out)
    }
    e2.getMessage should include("unsupported write compression")
    // zstd/gzip opt into the framed .fwz layout (r14) and round-trip
    for (codec <- Seq("zstd", "gzip")) {
      df.write.format("fixedwidth").option("recordLength", 10)
        .option("compression", codec).mode("overwrite").save(out)
      val files = new java.io.File(out).listFiles
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      files.map(_.getName).foreach(_ should endWith(".fwz"))
      spark.read.format("fixedwidth").option("recordLength", 10).load(out)
        .count() shouldBe 5
    }
    // the harmless spellings write fine and round-trip
    df.write.format("fixedwidth").option("recordLength", 10)
      .option("compression", "none").mode("overwrite").save(out)
    spark.read.format("fixedwidth").option("recordLength", 10).load(out)
      .count() shouldBe 5
  }
}
