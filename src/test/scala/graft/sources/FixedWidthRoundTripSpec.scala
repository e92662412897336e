package graft.sources

import java.nio.file.{Files, Path => JPath}

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property-style round-trip tests mirroring the reference's randomized
  * suite (reference TestFixedLengthInputFormat.java:183-488): random record
  * counts/lengths, sentinel first/last bytes, forced tiny splits, key
  * semantics, exact coverage. Seed is fixed for reproducibility.
  */
class FixedWidthRoundTripSpec extends SparkSpec with Matchers {

  private def tmp(): String = Files.createTempDirectory("graft-test").toString

  /** Write `n` records of `len` bytes, each `!...!` sentinel-framed with a
    * zero-padded index inside (like the reference's dummy files,
    * TestFixedLengthInputFormat.java:92-134). Returns the records. */
  private def writeDummy(dir: String, n: Int, len: Int): IndexedSeq[String] = {
    val rng = new Random(42)
    val alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    val recs = (0 until n).map { i =>
      if (len == 1) "!"
      else if (len < 12) "!" * len
      else {
        val mid = f"$i%010d" + Array.fill(len - 12)(alphabet(rng.nextInt(alphabet.length))).mkString
        "!" + mid + "!"
      }
    }
    import spark.implicits._
    recs.toDF("value").repartition(3)
      .write.format("fixedwidth").option("recordLength", len).mode("overwrite").save(dir)
    recs
  }

  // P-roundtrip + P-partition over a sweep of (count, length, maxSplit)
  // shapes, including the reference's forced edge cases: record length 1
  // (test :207-209) and split smaller than one record (:235-238).
  for ((n, len, maxSplit) <- Seq(
      (1, 1, None), (7, 1, None), (999, 13, None),
      (100, 64, Some("100")), // split smaller than one record
      (250, 100, Some("999")), // split floored to a record multiple
      (50, 4096, Some("8192")))) {
    test(s"round trip n=$n len=$len maxSplit=$maxSplit") {
      val dir = tmp()
      val recs = writeDummy(dir, n, len)
      maxSplit.foreach(v => spark.conf.set("spark.sql.files.maxPartitionBytes", v))
      try {
        val df = spark.read.format("fixedwidth").option("recordLength", len).load(dir)
        val rows = df.select(col("value").cast("string")).collect().map(_.getString(0))
        // Σ records read == records written (reference asserts :323-324)
        rows.length shouldBe n
        // every record exactly len bytes with sentinels intact — no
        // mid-record split (reference asserts :302-305)
        all(rows.map(_.length)) shouldBe len
        if (len >= 12) {
          all(rows.map(r => r.head == '!' && r.last == '!')) shouldBe true
          rows.sorted should contain theSameElementsInOrderAs recs.sorted
        }
      } finally maxSplit.foreach(_ => spark.conf.unset("spark.sql.files.maxPartitionBytes"))
    }
  }

  test("default key: offset is the record's byte offset within its file") {
    val dir = tmp()
    writeDummy(dir, 200, 20)
    val df = spark.read.format("fixedwidth").option("recordLength", 20).load(dir)
    // per-file offsets are 0, 20, 40, ... with no gaps (reference key
    // semantics: global byte offset, FixedLengthRecordReader.java:255-260)
    val offsets = df.select(col("offset")).collect().map(_.getLong(0)).sorted
    all(offsets.map(_ % 20)) shouldBe 0L
    // 3 part files → offset 0 appears exactly 3 times
    offsets.count(_ == 0L) shouldBe 3
  }

  test("custom key: key column equals the [start..end] inclusive byte slice") {
    val dir = tmp()
    writeDummy(dir, 50, 30)
    val df = spark.read.format("fixedwidth")
      .option("recordLength", 30).option("keyStartAt", 1).option("keyEndAt", 10)
      .load(dir)
    val rows = df.select(col("key").cast("string"), col("value").cast("string")).collect()
    rows.foreach { r =>
      r.getString(0) shouldBe r.getString(1).substring(1, 11) // end inclusive
      r.getString(0).length shouldBe 10
    }
  }

  test("truncated file (not a record multiple) fails the scan") {
    val dir = tmp()
    Files.write(JPath.of(dir, "bad.fwb"), new Array[Byte](25))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("fixedwidth").option("recordLength", 10).load(dir).count()
    }
    e.getMessage should include("not a multiple of recordLength")
  }

  test("PERMISSIVE mode drops the trailing partial record instead of failing") {
    val dir = tmp()
    val bytes = ("A" * 10 + "B" * 10 + "CCC").getBytes("US-ASCII") // 23 bytes: 2 records + fragment
    Files.write(JPath.of(dir, "frag.fwb"), bytes)
    val df = spark.read.format("fixedwidth")
      .option("recordLength", 10).option("mode", "PERMISSIVE").load(dir)
    df.select(col("value").cast("string")).collect().map(_.getString(0)).sorted shouldBe
      Array("A" * 10, "B" * 10)
  }

  test("compressed input: rejected by default, whole-file read with allowCompressed") {
    import java.util.zip.GZIPOutputStream
    val dir = tmp()
    val recs = (0 until 250).map(i => f"gz-rec$i%04d")
    val gz = new GZIPOutputStream(Files.newOutputStream(JPath.of(dir, "data.fwb.gz")))
    recs.foreach(r => gz.write(r.getBytes("US-ASCII")))
    gz.close()

    // parity: rejected without the opt-in (reference behavior)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("fixedwidth").option("recordLength", 10).load(dir).count()
    }
    e.getMessage should include("compressed input is not supported")

    // opt-in: single whole-file partition, decompressed, offsets logical
    val df = spark.read.format("fixedwidth")
      .option("recordLength", 10).option("allowCompressed", "true").load(dir)
    df.rdd.getNumPartitions shouldBe 1
    val rows = df.select(col("offset"), col("value").cast("string")).collect()
    rows.length shouldBe 250
    rows.map(_.getString(1)).sorted shouldBe recs.sorted.toArray
    rows.map(_.getLong(0)).sorted shouldBe (0 until 250).map(_ * 10L).toArray
  }

  test("typed layout round-trips ints, longs, doubles, strings and NULLs") {
    import spark.implicits._
    val dir = tmp()
    val in = Seq(
      (1, Some(42L), Some(1.5), Some("alpha")),
      (2, None, Some(-0.125), Some("beta")),
      (3, Some(Long.MaxValue), None, Some("gamma")),
      (4, Some(Long.MinValue), Some(1.7976931348623157e308), Some("x" * 8)))
      .toDF("id", "l", "d", "s")
    val fields = "id:int:0:10,l:long:10:20,d:double:30:25,s:string:55:8"
    in.write.format("fixedwidth").option("fields", fields).mode("overwrite").save(dir)
    val back = spark.read.format("fixedwidth").option("fields", fields).load(dir)
      .select($"id", $"l", $"d", $"s").orderBy($"id")
    val got = back.collect()
    val want = in.orderBy($"id").collect()
    got.zip(want).foreach { case (g, w) =>
      g.getInt(0) shouldBe w.getInt(0)
      (g.isNullAt(1), w.isNullAt(1)) match {
        case (false, false) => g.getLong(1) shouldBe w.getLong(1)
        case (a, b)         => a shouldBe b
      }
      (g.isNullAt(2), w.isNullAt(2)) match {
        case (false, false) => g.getDouble(2) shouldBe w.getDouble(2)
        case (a, b)         => a shouldBe b
      }
      (g.isNullAt(3), w.isNullAt(3)) match {
        case (false, false) => g.getString(3) shouldBe w.getString(3)
        case (a, b)         => a shouldBe b
      }
    }
  }

  test("decimal(p,s) fields round-trip exactly, including NULL, negatives, and edge scales") {
    import spark.implicits._
    val dir = tmp()
    val in = Seq(
      (1, Some(BigDecimal("12345.67"))),
      (2, Some(BigDecimal("-0.01"))),
      (3, None),
      (4, Some(BigDecimal("0.00"))),
      (5, Some(BigDecimal("9999999999999.99")))) // 15 digits, max for (15,2)
      .toDF("id", "m")
      .select($"id", $"m".cast("decimal(15,2)").as("m"))
    val fields = "id:int:0:5,m:decimal(15,2):5:18"
    in.write.format("fixedwidth").option("fields", fields).mode("overwrite").save(dir)
    val back = spark.read.format("fixedwidth").option("fields", fields).load(dir)
      .select($"id", $"m").orderBy($"id")
    back.schema("m").dataType.simpleString shouldBe "decimal(15,2)"
    val got = back.collect()
    val want = in.orderBy($"id").collect()
    got.zip(want).foreach { case (g, w) =>
      (g.isNullAt(1), w.isNullAt(1)) match {
        case (false, false) => g.getDecimal(1) shouldBe w.getDecimal(1)
        case (a, b)         => a shouldBe b
      }
    }
    // a value that does not fit the declared scale fails loudly, not rounds
    val bad = Seq((9, BigDecimal("1.999"))).toDF("id", "m")
      .select($"id", $"m".cast("decimal(15,3)").as("m"))
    an[Exception] should be thrownBy {
      bad.write.format("fixedwidth").option("fields", fields).mode("overwrite").save(tmp())
    }

    // decimal comparisons push down fully (value-based compare, no FilterExec)
    import org.apache.spark.sql.execution.FilterExec
    val flt = back.filter($"m" > BigDecimal("0.00") && $"m" < BigDecimal("99999.99"))
    flt.queryExecution.executedPlan.collect { case f: FilterExec => f } shouldBe empty
    flt.collect().map(_.getInt(0)).sorted shouldBe Array(1)
  }

  test("string NULL is lossy by design: decodes back as empty string") {
    import spark.implicits._
    // Fixed-width has no out-of-band NULL for strings — an all-space field
    // is indistinguishable from the empty string, so NULL → "" on round
    // trip (numerics DO round-trip NULL via the all-blank + isBlank path).
    val dir = tmp()
    Seq((1, None: Option[String])).toDF("id", "s")
      .write.format("fixedwidth").option("fields", "id:int:0:5,s:string:5:10")
      .mode("overwrite").save(dir)
    val r = spark.read.format("fixedwidth").option("fields", "id:int:0:5,s:string:5:10")
      .load(dir).select($"s").head
    r.isNullAt(0) shouldBe false
    r.getString(0) shouldBe ""
  }

  test("filter pushdown: source-side skip produces identical results to post-filtering") {
    import spark.implicits._
    val dir = tmp()
    val in = (0 until 500).map(i => (i.toLong, i * 2.5, s"name$i"))
      .toDF("id", "score", "name")
    val fields = "id:long:0:10,score:double:10:24,name:string:34:10"
    in.write.format("fixedwidth").option("fields", fields).mode("overwrite").save(dir)
    val fw = spark.read.format("fixedwidth").option("fields", fields).load(dir)

    val filtered = fw.filter($"id" >= 100 && $"id" < 120 && $"score" > 260.0)
      .select($"id", $"score", $"name").orderBy($"id")
    // plan advertises the pushed filters
    filtered.queryExecution.executedPlan.toString should include("PushedFilters=[")
    val got = filtered.collect()
    got.map(_.getLong(0)).toSeq shouldBe (105L until 120L)
    got.foreach(r => r.getString(2) shouldBe s"name${r.getLong(0)}")

    // string + In pushdown
    fw.filter($"name".isin("name7", "name8")).count() shouldBe 2

    // the filtered scan must STAY vectorized: predicates evaluate on the
    // record buffer inside the columnar reader, so the plan keeps the
    // ColumnarToRow lane instead of falling back to one-row-at-a-time
    filtered.queryExecution.executedPlan.toString should include("ColumnarToRow")

    // fully-pushed predicates are NOT re-evaluated post-scan: no FilterExec
    // in the plan (the source's buffer predicates are Catalyst-identical)
    import org.apache.spark.sql.execution.FilterExec
    filtered.queryExecution.executedPlan.collect { case f: FilterExec => f } shouldBe empty

    // a predicate-ONLY column may be pruned from the read schema entirely
    // and the filter still applies at the source
    val pruned = fw.filter($"score" > 260.0 && $"score" < 300.0).select($"name")
    pruned.queryExecution.executedPlan.collect { case f: FilterExec => f } shouldBe empty
    pruned.collect().map(_.getString(0)).sorted shouldBe
      (105 to 119).filter(i => i * 2.5 > 260.0 && i * 2.5 < 300.0).map(i => s"name$i").sorted
  }

  test("column pruning: value-only projection still correct, offset-only too") {
    val dir = tmp()
    writeDummy(dir, 20, 16)
    val df = spark.read.format("fixedwidth").option("recordLength", 16).load(dir)
    df.select("value").count() shouldBe 20
    df.select("offset").distinct().count() should be > 1L
    // pruned scan plan reads only the requested column
    val plan = df.select("offset").queryExecution.executedPlan.toString
    plan should include("offset")
  }
}
