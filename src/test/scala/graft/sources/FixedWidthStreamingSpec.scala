package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.fixedwidth.FixedWidthMicroBatchStream

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

    // offsets are O(1) sequence numbers, not O(files) maps: the recorded
    // offset JSON must stay tiny no matter how many files were ingested
    val offsetsDir = new java.io.File(ckpt, "offsets")
    val latest = offsetsDir.listFiles().filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
    val lines = scala.io.Source.fromFile(latest)
    val sourceOffset = try lines.getLines().toSeq.last.trim finally lines.close()
    sourceOffset.length should be <= 20 // a bare sequence number
    sourceOffset.toLong should be >= 1L
  }

  test("file log: compaction bounds recovery reads; many batches resume exactly") {
    import spark.implicits._
    val data = Files.createTempDirectory("graft-stream-data2").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt2").toString
    val out = Files.createTempDirectory("graft-stream-out2").toString

    def drain(): Unit = {
      val q = spark.readStream.format("fixedwidth").option("recordLength", 10).load(data)
        .select(col("value").cast("string").as("value"))
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // 25 separate ingest rounds → the 10th/20th log entries are compact
    (1 to 25).foreach { b =>
      Seq(f"b$b%03d-rec0", f"b$b%03d-rec1").toDF("value").coalesce(1)
        .write.format("fixedwidth").option("recordLength", 10).mode("append").save(data)
      drain()
    }
    val rows = spark.read.parquet(out).collect().map(_.getString(0))
    rows.length shouldBe 50
    rows.distinct.length shouldBe 50 // no batch re-delivered, none lost

    // the per-source log lives under <ckpt>/sources/<i>/graft-file-log
    val logDir = {
      def find(d: java.io.File): Option[java.io.File] =
        if (d.getName == "graft-file-log") Some(d)
        else Option(d.listFiles()).toSeq.flatten.filter(_.isDirectory).flatMap(find).headOption
      find(new java.io.File(ckpt)).get
    }
    val entries = logDir.listFiles().map(_.getName).filter(_.endsWith(".json")).sorted
    entries.length should be >= 20 // one entry per ingesting trigger
  }

  test("streaming over a partitioned layout: filter semantics hold, all partitions logged") {
    import spark.implicits._
    val data = Files.createTempDirectory("graft-stream-part").toString
    val ckpt = Files.createTempDirectory("graft-stream-part-ckpt").toString
    val out = Files.createTempDirectory("graft-stream-part-out").toString
    val layout = "id:long:0:8,p:string:8:4"

    (1 to 40).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "p")
      .write.format("fixedwidth").option("fields", layout)
      .partitionBy("p").mode("overwrite").save(data)

    val q = spark.readStream.format("fixedwidth").option("fields", layout).load(data)
      .filter($"p" === "p1")
      .select($"id", $"p")
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1)))
    rows.map(_._1).sorted shouldBe (1 to 40).filter(_ % 2 == 1).map(_.toLong).toArray
    all(rows.map(_._2)) shouldBe "p1"

    // Spark does not run filter pushdown for streaming relations (the
    // filter stays post-scan), so the file log records EVERY partition; the
    // stream's pruning path (FixedWidthMicroBatchStream.snapshot) is wired
    // for the day streaming pushdown lands, and the reader factory applies
    // pushed filters if any are ever handed down — asserted here as "both
    // partitions logged, results still exactly filtered".
    val logDir = new java.io.File(ckpt, "sources/0/graft-file-log")
    val logText = logDir.listFiles().filter(_.getName.endsWith(".json"))
      .map(f => { val s = scala.io.Source.fromFile(f); try s.mkString finally s.close() }).mkString
    logText should include("p=p1")
    logText should include("p=p0")
  }

  /** Write `n` single-file fixed-width batches of `recs` 10-byte records
    * each, file ids starting at `from` so successive calls stay distinct. */
  private def writeFiles(dir: String, n: Int, recs: Int, from: Int = 0): Unit = {
    import spark.implicits._
    (from until from + n).foreach { f =>
      (0 until recs).map(i => f"f$f%02dr$i%05d").toDF("value").coalesce(1)
        .write.format("fixedwidth").option("recordLength", 10).mode("append").save(dir)
    }
  }

  /** Drain under AvailableNow with the given reader options; return
    * (rows delivered, number of data micro-batches). Pass `into` to reuse a
    * (checkpoint, output) pair across runs — i.e. a query RESTART. */
  private def drainCounted(data: String, opts: Map[String, String],
      into: Option[(String, String)] = None): (Long, Int) = {
    val (ckpt, out) = into.getOrElse((
      Files.createTempDirectory("graft-admission-ckpt").toString,
      Files.createTempDirectory("graft-admission-out").toString))
    var reader = spark.readStream.format("fixedwidth").option("recordLength", 10)
    opts.foreach { case (k, v) => reader = reader.option(k, v) }
    val q = reader.load(data)
      .select(col("value").cast("string").as("value"))
      .writeStream.format("parquet").outputMode("append")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    (spark.read.parquet(out).count(), batches)
  }

  test("maxFilesPerTrigger chunks the AvailableNow backlog into per-file batches") {
    val data = Files.createTempDirectory("graft-admission-files").toString
    writeFiles(data, n = 3, recs = 10)
    val (rows, batches) = drainCounted(data, Map("maxFilesPerTrigger" -> "1"))
    rows shouldBe 30L
    batches shouldBe 3 // one data micro-batch per file
    // without admission options the same backlog is ONE batch (default path)
    val data2 = Files.createTempDirectory("graft-admission-files2").toString
    writeFiles(data2, n = 3, recs = 10)
    drainCounted(data2, Map.empty) shouldBe ((30L, 1))
  }

  test("maxRecordsPerTrigger admits a strict file prefix under the exact record count") {
    val data = Files.createTempDirectory("graft-admission-recs").toString
    writeFiles(data, n = 3, recs = 10)
    // 25-record cap: files of 10 records each -> batch1 = 2 files, batch2 = 1
    val (rows, batches) = drainCounted(data, Map("maxRecordsPerTrigger" -> "25"))
    rows shouldBe 30L
    batches shouldBe 2
    // a cap smaller than one file still makes progress (one file per batch)
    val data2 = Files.createTempDirectory("graft-admission-recs2").toString
    writeFiles(data2, n = 2, recs = 10)
    drainCounted(data2, Map("maxRecordsPerTrigger" -> "3")) shouldBe ((20L, 2))
  }

  test("maxBytesPerTrigger + composite with maxFilesPerTrigger: tightest limit wins") {
    val data = Files.createTempDirectory("graft-admission-bytes").toString
    writeFiles(data, n = 4, recs = 10) // 100 bytes per file
    // 250-byte cap -> 2 files per batch; composite with maxFiles=1 -> 1 per batch
    drainCounted(data, Map("maxBytesPerTrigger" -> "250")) shouldBe ((40L, 2))
    val data2 = Files.createTempDirectory("graft-admission-bytes2").toString
    writeFiles(data2, n = 4, recs = 10)
    drainCounted(data2,
      Map("maxBytesPerTrigger" -> "250", "maxFilesPerTrigger" -> "1")) shouldBe ((40L, 4))
  }

  test("admission options validate: non-positive or junk values fail fast") {
    val data = Files.createTempDirectory("graft-admission-bad").toString
    writeFiles(data, n = 1, recs = 1)
    def startWith(k: String, v: String) = {
      val ex = intercept[Exception] {
        val q = spark.readStream.format("fixedwidth").option("recordLength", 10)
          .option(k, v).load(data)
          .writeStream.format("memory").queryName(s"bad_${k}_${v.hashCode.abs}")
          .option("checkpointLocation", Files.createTempDirectory("graft-bad-ckpt").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      // the root IllegalArgumentException may arrive wrapped by the stream runner
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
      msgs(ex).mkString(" ") should include(s"'$k' must be a positive integer")
    }
    startWith("maxFilesPerTrigger", "0")
    startWith("maxRecordsPerTrigger", "-5")
    startWith("maxBytesPerTrigger", "ten")
  }

  test("admissiblePrefix invariants hold over randomized backlogs (property rounds)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val rng = new scala.util.Random(0xADA1)
    def files(n: Int, recLen: Int): Vector[(String, Long)] =
      (0 until n).map(i => (f"f$i%03d", (rng.nextInt(100) + 1).toLong * recLen)).toVector
    (1 to 300).foreach { round =>
      val recLen = rng.nextInt(64) + 1
      val fs = files(rng.nextInt(30), recLen)
      val rowCap = (rng.nextInt(400) + 1).toLong
      val byteCap = (rng.nextInt(400) + 1).toLong * recLen
      val byFiles = ReadLimit.maxFiles(rng.nextInt(10) + 1)
      val byRows = ReadLimit.maxRows(rowCap)
      val byBytes = ReadLimit.maxBytes(byteCap)
      def run(l: ReadLimit) = FixedWidthMicroBatchStream.admissiblePrefix(l, fs, recLen)
      withClue(s"round $round recLen=$recLen files=${fs.size}: ") {
        Seq(byFiles, byRows, byBytes).foreach { l =>
          val out = run(l)
          out shouldBe fs.take(out.size) // strict PREFIX, never a re-ordering
          if (fs.nonEmpty) out should not be empty // min-one-file progress
        }
        // caps hold except for the single-oversize-file progress case, and
        // the prefix is MAXIMAL: the next file would break the cap
        val rows = run(byRows)
        val nRows = rows.map(_._2 / recLen).sum
        if (rows.size > 1) nRows should be <= rowCap
        if (rows.size < fs.size)
          (nRows + fs(rows.size)._2 / recLen) should be > rowCap
        val bytes = run(byBytes)
        if (bytes.size > 1) bytes.map(_._2).sum should be <= byteCap
        if (bytes.size < fs.size)
          (bytes.map(_._2).sum + fs(bytes.size)._2) should be > byteCap
        // composite == tightest: the fold admits exactly the shortest prefix
        val comp = run(ReadLimit.compositeLimit(Array(byFiles, byRows, byBytes)))
        comp.size shouldBe Seq(run(byFiles).size, run(byRows).size, run(byBytes).size).min
        comp shouldBe fs.take(comp.size)
      }
    }
  }

  test("admission-controlled drain resumes across restarts without duplication") {
    val data = Files.createTempDirectory("graft-admission-restart").toString
    val ckpt = Files.createTempDirectory("graft-admission-restart-ckpt").toString
    val out = Files.createTempDirectory("graft-admission-restart-out").toString
    val target = Some((ckpt, out))
    val limits = Map("maxFilesPerTrigger" -> "2")

    writeFiles(data, n = 4, recs = 10)
    drainCounted(data, limits, target) shouldBe ((40L, 2)) // 4 files, 2 per batch

    // files landing AFTER the first drain: a restarted query on the same
    // checkpoint must admit exactly the unseen files (seen-set rebuilt from
    // the compacting log), never re-deliver, and still chunk under the cap
    writeFiles(data, n = 3, recs = 10, from = 4)
    val (rows, batches) = drainCounted(data, limits, target)
    rows shouldBe 70L // cumulative output: 40 prior + 30 new, no duplicates
    batches shouldBe 2 // the 3 NEW files as 2+1 under maxFilesPerTrigger=2
    val vals = spark.read.parquet(out).select("value").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    vals.distinct.length shouldBe 70 // every record distinct => nothing replayed
  }

  test("maxRecordsPerTrigger is EXACT for .fwz files (footer counts, not compressed length)") {
    import spark.implicits._
    val data = Files.createTempDirectory("graft-fwz-admission").toString
    // 4 framed files × 1000 records of width 10: compressed size is a few
    // hundred bytes, so len/recordLength would claim ~30 records per file
    // and admit the whole backlog in one batch — the footer count must
    // split it into exact 2000-record batches instead
    (0 until 4).foreach { f =>
      (0 until 1000).map(i => f"f$f%02dr$i%05d").toDF("value").coalesce(1)
        .write.format("fixedwidth").option("recordLength", 10)
        .option("compression", "zstd").mode("append").save(data)
    }
    val (rows, batches) = drainCounted(data, Map("maxRecordsPerTrigger" -> "2000"))
    rows shouldBe 4000L
    batches shouldBe 2 // 2 files per batch — exact under the record cap
  }

  test("partial .fwz (no trailer yet) is excluded until complete, then delivered once") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft-fwz-stage").toString
    val data = Files.createTempDirectory("graft-fwz-watch").toString
    val ckpt = Files.createTempDirectory("graft-fwz-watch-ckpt").toString
    val out = Files.createTempDirectory("graft-fwz-watch-out").toString
    val fieldsOpt = "id:long:0:10"

    def stageFwz(tag: String, ids: Range): Array[Byte] = {
      val d = s"$stage/$tag"
      ids.map(_.toLong).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", fieldsOpt)
        .option("compression", "zstd").option("frameBytes", "100")
        .mode("overwrite").save(d)
      val f = new java.io.File(d).listFiles.filter(_.getName.endsWith(".fwz")).head
      java.nio.file.Files.readAllBytes(f.toPath)
    }

    def drain(): Long = {
      val q = spark.readStream.format("fixedwidth").option("fields", fieldsOpt).load(data)
        .select(col("id"))
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }

    val complete = stageFwz("complete", 0 until 500)
    val partialFull = stageFwz("partial", 500 until 900)
    java.nio.file.Files.write(java.nio.file.Path.of(data, "a.fwz"), complete)
    // a foreign writer mid-stream: frames on disk, trailer not yet written —
    // the conservative cut is half the file, definitely footer-less
    java.nio.file.Files.write(java.nio.file.Path.of(data, "b.fwz"),
      java.util.Arrays.copyOf(partialFull, partialFull.length / 2))

    // the stream must SKIP the partial file (not crash, not deliver it)
    drain() shouldBe 500L

    // trailer lands (the file is now byte-complete): the next trigger
    // delivers exactly its records — once
    java.nio.file.Files.write(java.nio.file.Path.of(data, "b.fwz"), partialFull)
    drain() shouldBe 900L
    val ids = spark.read.parquet(out).select("id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    ids shouldBe (0L until 900L).toArray
  }

  test("a persistently unreadable .fwz fails the stream once the grace window lapses") {
    import spark.implicits._
    val data = Files.createTempDirectory("graft-fwz-corrupt").toString
    val ckpt = Files.createTempDirectory("graft-fwz-corrupt-ckpt").toString
    val fieldsOpt = "id:long:0:10"
    (0 until 100).map(_.toLong).toDF("id").coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("compression", "zstd").mode("append").save(data)
    // permanently corrupt: a stable-length file whose tail will never become
    // a valid trailer — without a grace bound the stream would exclude it
    // FOREVER on a WARN while the batch path fails loudly on the same dir
    java.nio.file.Files.write(java.nio.file.Path.of(data, "broken.fwz"),
      Array.fill[Byte](256)(0x42))
    val q = spark.readStream.format("fixedwidth").option("fields", fieldsOpt)
      .option("fwzUnreadableGraceMs", "1")
      .load(data)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000); fail("stream should have failed on the corrupt file")
    }
    q.stop()
    val msg = Option(ex.getCause).map(_.toString).getOrElse("") + ex.getMessage
    msg should include("broken.fwz")
    msg.toLowerCase should include("unreadable")
  }

  test("a corrupt .fwz FLAPPING out of the listing still hits the fail-loudly deadline") {
    // the r16-advice finding: deadline entries were evicted whenever a path
    // was not in the current trigger's failing set, so a permanently
    // corrupt file that intermittently drops out of the listing
    // (eventually-consistent store, flapping partition prune) had its
    // grace clock reset on each absence and the deadline never fired.
    // Eviction now requires absence LONGER than the grace window, so a
    // sub-grace flapper keeps its first-unreadable clock.
    import spark.implicits._
    val data = Files.createTempDirectory("graft-fwz-flap").toString
    val ckpt = Files.createTempDirectory("graft-fwz-flap-ckpt").toString
    val fieldsOpt = "id:long:0:10"
    (0 until 100).map(_.toLong).toDF("id").coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("compression", "zstd").mode("append").save(data)
    val corrupt = Array.fill[Byte](256)(0x42)
    val broken = java.nio.file.Path.of(data, "broken.fwz")
    java.nio.file.Files.write(broken, corrupt)
    val q = spark.readStream.format("fixedwidth").option("fields", fieldsOpt)
      .option("fwzUnreadableGraceMs", "800")
      .load(data)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    // flap the file out of the listing every ~200 ms — each absence well
    // under the 800 ms grace, so the clock must survive it. The flap is
    // simulated by MOVING the file aside and back (mtime preserved): a real
    // eventually-consistent listing omits an UNCHANGED object. A delete +
    // rewrite would be a genuinely recreated file, which correctly gets a
    // fresh clock since the stability key gained mtime (r18).
    val aside = java.nio.file.Path.of(data, "..", "broken.fwz.aside").normalize()
    val deadline = System.currentTimeMillis() + 45000
    var failure: Option[org.apache.spark.sql.streaming.StreamingQueryException] = None
    while (failure.isEmpty && System.currentTimeMillis() < deadline) {
      if (java.nio.file.Files.exists(broken))
        java.nio.file.Files.move(broken, aside,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(100)
      if (java.nio.file.Files.exists(aside))
        java.nio.file.Files.move(aside, broken,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Thread.sleep(100)
      failure = q.exception
    }
    q.stop()
    withClue("the deadline must fire despite the flapping (clock not reset by absences): ") {
      failure.isDefined shouldBe true
    }
    val msg = failure.map(e =>
      Option(e.getCause).map(_.toString).getOrElse("") + e.getMessage).get
    msg should include("broken.fwz")
    msg.toLowerCase should include("unreadable")
  }

  test("a RECREATED same-length file (new mtime) gets its own fresh grace clock") {
    // the r17-advice finding: the grace clock was keyed by (path, length)
    // only, so a genuinely deleted corrupt file replaced by a NEW
    // still-being-written file of the same length inherited the old
    // first-unreadable timestamp and could fail the stream before the new
    // file's own grace elapsed. The stability key now includes mtime: a
    // recreation resets the clock; a file frozen in ONE state past the
    // grace still fails loudly.
    import spark.implicits._
    val data = Files.createTempDirectory("graft-fwz-recreate").toString
    val ckpt = Files.createTempDirectory("graft-fwz-recreate-ckpt").toString
    val fieldsOpt = "id:long:0:10"
    (0 until 100).map(_.toLong).toDF("id").coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("compression", "zstd").mode("append").save(data)
    val broken = java.nio.file.Path.of(data, "broken.fwz")
    java.nio.file.Files.write(broken, Array.fill[Byte](256)(0x42))
    val q = spark.readStream.format("fixedwidth").option("fields", fieldsOpt)
      .option("fwzUnreadableGraceMs", "1200")
      .load(data)
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
      .start()
    // keep recreating a same-length corrupt file well inside the grace for
    // 4x the grace window: every recreation is a NEW upload whose own grace
    // restarts, so the stream must not fail while uploads keep arriving
    val keepUntil = System.currentTimeMillis() + 4800
    var i = 0
    while (System.currentTimeMillis() < keepUntil && q.exception.isEmpty) {
      Thread.sleep(500)
      java.nio.file.Files.delete(broken)
      java.nio.file.Files.write(broken, Array.fill[Byte](256)((0x43 + i).toByte))
      i += 1
    }
    withClue("recreated files must each get a fresh grace clock: ") {
      q.exception shouldBe empty
    }
    // uploads stop: the LAST recreation freezes and its own deadline fires
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000); fail("stream should have failed once the file froze")
    }
    q.stop()
    val msg = Option(ex.getCause).map(_.toString).getOrElse("") + ex.getMessage
    msg should include("broken.fwz")
    msg.toLowerCase should include("unreadable")
  }
}
