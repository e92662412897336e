package graft.sources

import java.nio.file.{Files, Paths}

import scala.util.Random

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.{BytesWritable, LongWritable}
import org.apache.hadoop.mapreduce.lib.input.{FixedLengthInputFormat => HadoopFLIF}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** DIFFERENTIAL parity against the real thing: the reference repo's
  * descendant, `org.apache.hadoop.mapreduce.lib.input.FixedLengthInputFormat`
  * (the format the reference README points users at since Hadoop 2.x),
  * ships on the Spark classpath — so instead of only testing OUR READING of
  * the reference semantics, read the same bytes through both readers and
  * assert the (offset, value) record sets are identical.
  *
  * Envelope mirrors the reference's randomized suite
  * (TestFixedLengthInputFormat.java:201-209, :235-238): random record
  * lengths, record length 1, split smaller than one record, split forced to
  * a non-multiple of the record length. Split geometry differs by design —
  * the Hadoop reader fixes up unaligned splits at READ time (skip to the
  * next record boundary, finish the last record past split end), ours
  * aligns splits at PLANNING time — so the invariant both must satisfy is
  * set-level: every record exactly once, keyed by its byte offset in the
  * file, with identical bytes. One file per case makes offset a unique key.
  */
class HadoopDifferentialSpec extends SparkSpec with Matchers {

  /** Write n seeded-random records of len bytes as ONE file; returns path. */
  private def writeFile(n: Int, len: Int, seed: Int): String = {
    val dir = Files.createTempDirectory("graft-hadoop-diff").toString
    val rng = new Random(seed)
    val bytes = new Array[Byte](n * len)
    rng.nextBytes(bytes)
    Files.write(Paths.get(dir, "data.fwb"), bytes)
    dir
  }

  private def readHadoop(dir: String, len: Int, maxSplit: Option[Long]): Seq[(Long, Seq[Byte])] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    HadoopFLIF.setRecordLength(conf, len)
    maxSplit.foreach(conf.setLong("mapreduce.input.fileinputformat.split.maxsize", _))
    spark.sparkContext.newAPIHadoopFile(
        s"$dir/data.fwb", classOf[HadoopFLIF], classOf[LongWritable], classOf[BytesWritable], conf)
      // Writables are REUSED by the record reader — copy before collect
      .map { case (k, v) => (k.get, v.copyBytes().toSeq) }
      .collect().toSeq
  }

  private def readFixedwidth(dir: String, len: Int, maxSplit: Option[Long]): Seq[(Long, Seq[Byte])] = {
    maxSplit.foreach(v => spark.conf.set("spark.sql.files.maxPartitionBytes", v.toString))
    try {
      spark.read.format("fixedwidth").option("recordLength", len).load(dir)
        .select(col("offset"), col("value"))
        .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    } finally maxSplit.foreach(_ => spark.conf.unset("spark.sql.files.maxPartitionBytes"))
  }

  private def check(n: Int, len: Int, maxSplit: Option[Long], seed: Int): Unit = {
    val dir = writeFile(n, len, seed)
    val h = readHadoop(dir, len, maxSplit).sortBy(_._1)
    val g = readFixedwidth(dir, len, maxSplit).sortBy(_._1)
    h.size shouldBe n
    g.size shouldBe n
    g shouldBe h
  }

  // The reference suite's forced edge cases, pinned deterministically.
  test("parity: record length 1 (reference :207-209)")(check(n = 97, len = 1, None, seed = 1))
  test("parity: split smaller than one record (reference :235-238)")(
    check(n = 64, len = 128, Some(61L), seed = 2))
  test("parity: split a non-multiple of the record length")(
    check(n = 200, len = 96, Some(1000L), seed = 3))
  test("parity: default split geometry")(check(n = 999, len = 13, None, seed = 4))

  // Randomized sweep in the reference's style (seeded for reproducibility):
  // random (records, length, maxSplit) combinations, maxSplit drawn to land
  // below, inside, and above the file size.
  {
    val rng = new Random(20260814)
    for (i <- 1 to 6) {
      val n = rng.nextInt(500) + 1
      val len = rng.nextInt(2048) + 1
      val fileSize = n.toLong * len
      val maxSplit = rng.nextInt(3) match {
        case 0 => Some(math.max(1L, rng.nextLong(math.max(2L, len))))      // < one record
        case 1 => Some(math.max(1L, rng.nextLong(math.max(2L, fileSize)))) // mid-file
        case _ => None                                                     // default
      }
      test(s"parity: randomized case $i (n=$n len=$len maxSplit=$maxSplit)")(
        check(n, len, maxSplit, seed = 100 + i))
    }
  }
}
