package graft.sources

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.fixedwidth.FwzFormat

/** The fwz footer memo's content fingerprint (r16): the footer now answers
  * count-star, global/grouped MIN-MAX and frame skipping DIRECTLY, so a
  * stale cache hit is a wrong answer, not just a bad plan. The cache key
  * therefore folds in a tail fingerprint (the same hazard class r14 closed
  * for Bz2SplitIndex with the bzip2 footer CRC): a rewrite at identical
  * length INSIDE the filesystem's mtime granularity must never be served
  * the old stats. The worst case pinned here mutates ONE byte of a stats
  * min slice and resets mtime — path, length and mtime all collide, only
  * the bytes differ. */
class FwzFooterCacheSpec extends SparkSpec with Matchers {

  private val conf = new Configuration()
  private val fieldsOpt = "id:long:0:10"

  private def writeFramed(dir: String): java.io.File = {
    import spark.implicits._
    (0 until 5000).map(_.toLong).toDF("id").orderBy("id").coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", "10")
      .option("compression", "zstd").option("frameBytes", "5000")
      .option("frameStats", "id")
      .mode("overwrite").save(dir)
    new java.io.File(dir).listFiles.filter(_.getName.endsWith(".fwz")).head
  }

  /** Byte offset of frame 0's min slice for the first stats field, from the
    * format note (v3): stats sit at len - trailer(22) - 16·nFrames -
    * statsLen; header is csLen|cs|trimId|nFields, field entry is
    * nameLen|name|ftypeLen|ftype|start|width|ordered, then per-frame
    * flags|min|max. */
  private def minSliceOffset(f: java.io.File): (Long, Int) = {
    val raf = new RandomAccessFile(f, "r")
    try {
      val len = raf.length()
      val tail = new Array[Byte](14)
      raf.seek(len - 14); raf.readFully(tail)
      val tb = ByteBuffer.wrap(tail)
      val statsLen = tb.getInt
      val nFrames = tb.getInt
      val statsOff = len - 22 - 16L * nFrames - statsLen
      raf.seek(statsOff)
      val csLen = raf.read()
      raf.seek(statsOff + 1 + csLen + 1 + 2)
      val nameLen = raf.read()
      raf.skipBytes(nameLen)
      val ftypeLen = raf.read()
      raf.skipBytes(ftypeLen + 4)
      val width = raf.readInt()
      raf.skipBytes(1) // ordered byte
      raf.skipBytes(1) // frame 0 flags
      (raf.getFilePointer, width)
    } finally raf.close()
  }

  test("same-length same-mtime stats mutation is never served stale") {
    val dir = Files.createTempDirectory("graft-fwzmemo").toString
    val file = writeFramed(dir)
    val p = new Path(file.getPath)
    val mtime = file.lastModified()

    val before = FwzFormat.readFooterCached(p, file.length(), mtime, conf)
    val (off, width) = minSliceOffset(file)
    val origMin = before.stats.get.fields.head.mins(0)
    origMin should have length width

    // rewrite one digit of frame 0's recorded min IN PLACE (same length),
    // then put the mtime back — the classic undetectable-without-
    // fingerprint rewrite
    val raf = new RandomAccessFile(file, "rw")
    val slice = new Array[Byte](width)
    try {
      raf.seek(off); raf.readFully(slice)
      val i = slice.lastIndexWhere(b => b >= '0' && b <= '8')
      i should be >= 0
      slice(i) = (slice(i) + 1).toByte
      raf.seek(off); raf.write(slice)
    } finally raf.close()
    // drop the local-FS checksum sidecar: the hand-edit must reach the
    // fingerprint read, not die in Hadoop's CRC layer
    new java.io.File(file.getParent, s".${file.getName}.crc").delete()
    file.setLastModified(mtime)

    val after = FwzFormat.readFooterCached(p, file.length(), mtime, conf)
    after.stats.get.fields.head.mins(0) shouldBe slice
    after.stats.get.fields.head.mins(0) should not equal origMin
  }

  test("unchanged file: repeated cached reads agree with a direct footer read") {
    val dir = Files.createTempDirectory("graft-fwzmemo2").toString
    val file = writeFramed(dir)
    val p = new Path(file.getPath)
    val a = FwzFormat.readFooterCached(p, file.length(), file.lastModified(), conf)
    val b = FwzFormat.readFooterCached(p, file.length(), file.lastModified(), conf)
    val direct = FwzFormat.readFooter(p, file.length(), conf)
    a.frames shouldBe direct.frames
    b.frames shouldBe direct.frames
    a.stats.get.fields.head.mins(0) shouldBe direct.stats.get.fields.head.mins(0)
  }
}
