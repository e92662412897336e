package graft.sources

import java.io.{ByteArrayOutputStream, RandomAccessFile}
import java.nio.ByteBuffer
import java.nio.file.Files

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Differential parity for the `.fwz` layout against a FOREIGN decoder: the
  * bz2 path earned a differential test vs Hadoop's own
  * FixedLengthInputFormat (HadoopDifferentialSpec); `.fwz` is a novel
  * layout, so its analog is a from-the-spec reimplementation. The decoder
  * below is written ONLY from the byte-level format note (SURVEY §7.5 /
  * FwzFormat's scaladoc) using nothing but `java.*` and the codec
  * libraries — no graft classes on the DECODE path — and must reproduce
  * the exact record bytes for both codecs and both format versions. If
  * this spec compiles against a future format change but fails, the FORMAT
  * drifted from its published note; that is the failure it exists to
  * catch. */
class FwzForeignDecodeSpec extends SparkSpec with Matchers {

  // ------------------------------------------------------------------
  // The foreign decoder: from the format note, no graft classes.
  //
  //   file      := frame* [stats] frameTable trailer
  //   trailer   := [contentCrc: i64 (v3)] [statsLen: i32 (v2/v3)]
  //              | nFrames: i32 | codecId: u8 | version: u8
  //              | magic "GFZ1" (0x47465A31)
  //     (last 10 bytes are the same for v1/v2/v3; statsLen sits at EOF-14
  //      in v2 and v3; v3 prepends an 8-byte CRC-32 of all compressed
  //      frame bytes — trailer totals 10 / 14 / 22 bytes)
  //   frameTable := nFrames × (cLen: i64 BE, dLen: i64 BE)
  //   frames    := concatenated zstd frames (codec 0) / gzip members (1),
  //                frame i decompressing to exactly dLen_i bytes
  // ------------------------------------------------------------------
  private def foreignDecode(path: String): Array[Byte] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      val tail = new Array[Byte](10)
      raf.seek(len - 10); raf.readFully(tail)
      val tb = ByteBuffer.wrap(tail)
      val nFrames = tb.getInt
      val codec = tb.get
      val version = tb.get
      val magic = tb.getInt
      require(magic == 0x47465A31, "not an fwz file")
      require(version == 1 || version == 2 || version == 3, s"unknown version $version")
      val trailerLen = version match { case 3 => 22; case 2 => 14; case _ => 10 }
      val statsLen =
        if (version >= 2) {
          val sb = new Array[Byte](4)
          raf.seek(len - 14); raf.readFully(sb)
          ByteBuffer.wrap(sb).getInt.toLong
        } else 0L
      val table = new Array[Byte](16 * nFrames)
      raf.seek(len - trailerLen - table.length); raf.readFully(table)
      val fb = ByteBuffer.wrap(table)
      val cLens = new Array[Long](nFrames)
      val dLens = new Array[Long](nFrames)
      var cTotal = 0L
      for (i <- 0 until nFrames) {
        cLens(i) = fb.getLong; dLens(i) = fb.getLong; cTotal += cLens(i)
      }
      require(cTotal + statsLen + table.length + trailerLen == len, "bad tiling")
      // v3: the trailer's contentCrc must equal CRC-32 over the compressed
      // frame bytes we are about to read — checked at the end
      val expectCrc =
        if (version == 3) {
          val cb = new Array[Byte](8)
          raf.seek(len - 22); raf.readFully(cb)
          Some(ByteBuffer.wrap(cb).getLong)
        } else None
      val crc = new java.util.zip.CRC32
      // decompress frame by frame, each from its own compressed slice
      val out = new ByteArrayOutputStream()
      raf.seek(0)
      for (i <- 0 until nFrames) {
        val c = new Array[Byte](cLens(i).toInt)
        raf.readFully(c)
        crc.update(c)
        val d: Array[Byte] = codec match {
          case 0 => // zstd
            val dst = new Array[Byte](dLens(i).toInt)
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              dst, 0, dst.length, c, 0, c.length)
            require(n == dLens(i), s"frame $i decompressed to $n, footer says ${dLens(i)}")
            dst
          case 1 => // gzip
            val g = new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(c))
            val buf = new Array[Byte](64 * 1024)
            val bos = new ByteArrayOutputStream(dLens(i).toInt)
            var r = g.read(buf)
            while (r >= 0) { bos.write(buf, 0, r); r = g.read(buf) }
            val dst = bos.toByteArray
            require(dst.length == dLens(i), s"frame $i: ${dst.length} vs ${dLens(i)}")
            dst
          case other => fail(s"unknown codec $other")
        }
        out.write(d)
      }
      expectCrc.foreach { e =>
        require(e == crc.getValue, s"contentCrc mismatch: trailer $e, frames ${crc.getValue}")
      }
      out.toByteArray
    } finally raf.close()
  }

  /** Parse the v3 stats block from the note alone and return (charset,
    * trimId, fields as (name, ftype, start, width, ordered, perFrame
    * flags)). v3 field entries carry one `ordered` byte after `width`. */
  private def foreignStats(path: String): (String, Byte, Seq[(String, String, Int, Int, Boolean, Array[Byte])]) = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val len = raf.length()
      val tail = new Array[Byte](14)
      raf.seek(len - 14); raf.readFully(tail)
      val tb = ByteBuffer.wrap(tail)
      val statsLen = tb.getInt
      val nFrames = tb.getInt
      tb.get() // codec
      require(tb.get() == 3, "stats require version 3")
      val sbuf = new Array[Byte](statsLen)
      raf.seek(len - 22 - 16L * nFrames - statsLen); raf.readFully(sbuf)
      val bb = ByteBuffer.wrap(sbuf)
      def str(n: Int) = { val b = new Array[Byte](n); bb.get(b); new String(b, "UTF-8") }
      val charset = str(bb.get() & 0xff)
      val trimId = bb.get()
      val nFields = bb.getShort.toInt
      val fields = (0 until nFields).map { _ =>
        val name = str(bb.get() & 0xff)
        val ftype = str(bb.get() & 0xff)
        val start = bb.getInt
        val width = bb.getInt
        val ordered = bb.get() != 0
        val flags = new Array[Byte](nFrames)
        for (i <- 0 until nFrames) {
          flags(i) = bb.get()
          bb.position(bb.position() + 2 * width) // skip min+max slices
        }
        (name, ftype, start, width, ordered, flags)
      }
      require(bb.remaining() == 0, "trailing stats bytes")
      (charset, trimId, fields)
    } finally raf.close()
  }

  private val fieldsOpt = "id:long:0:8,payload:string:8:16"
  private val recLen = 24

  private def write(dir: String, codec: String, stats: Boolean): Unit = {
    import spark.implicits._
    val w = (0 until 30000).map(i => (i.toLong, s"v$i"))
      .toDF("id", "payload").coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", recLen.toString)
      .option("compression", codec).option("frameBytes", (1000 * recLen).toString)
    (if (stats) w.option("frameStats", "id") else w).mode("overwrite").save(dir)
  }

  private def fwzFile(dir: String): java.io.File =
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".fwz")).head

  test("foreign decoder reproduces exact record bytes for both codecs, v1 and v3") {
    for (codec <- Seq("zstd", "gzip"); stats <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"graft-foreign-$codec-$stats").toString
      write(dir, codec, stats)
      val bytes = foreignDecode(fwzFile(dir).getPath)
      withClue(s"$codec stats=$stats: ") {
        bytes.length shouldBe 30000 * recLen
        // spot-check the record grid: id column of records 0, 12345, 29999
        for (rec <- Seq(0, 12345, 29999)) {
          val id = new String(bytes, rec * recLen, 8, "US-ASCII").trim.toLong
          id shouldBe rec.toLong
          val pay = new String(bytes, rec * recLen + 8, 16, "US-ASCII").trim
          pay shouldBe s"v$rec"
        }
        // full-fidelity check vs the graft reader's own view of the file
        val viaGraft = spark.read.format("fixedwidth")
          .option("fields", fieldsOpt).option("recordLength", recLen.toString)
          .load(dir).selectExpr("id").collect().map(_.getLong(0)).sorted
        viaGraft shouldBe (0 until 30000).map(_.toLong).toArray
      }
    }
  }

  test("foreign stats parse: field meta and flags match the note") {
    val dir = Files.createTempDirectory("graft-foreign-stats").toString
    write(dir, "zstd", stats = true)
    val (charset, trimId, fields) = foreignStats(fwzFile(dir).getPath)
    charset shouldBe "UTF-8"
    trimId shouldBe 0 // right
    fields.map(f => (f._1, f._2, f._3, f._4)) shouldBe Seq(("id", "long", 0, 8))
    // ids are written ascending in one task: the writer must have PROVED
    // frame-orderedness and set the v3 ordered byte
    fields.head._5 shouldBe true
    // every frame holds non-null ids: bit0 set, bit1/bit2 clear
    fields.head._6.foreach { fl => (fl & 0x7) shouldBe 1 }
  }
}
