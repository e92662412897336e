package graft.sources.fixedwidth

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The framed compressed fixed-width layout (`.fwz`) — the WRITE-side
  * compression story the reference never had (it REJECTS compressed input
  * outright, FixedLengthRecordReader.java:147-152, because record-aligned
  * splitting needs byte offsets; gzip/bz2 reads here are the opt-in
  * compatibility escape for FOREIGN files).
  *
  * For data this sink writes itself, a better contract is available: frame
  * the stream. Records are grouped into FRAMES — each frame an independent
  * zstd frame / gzip member whose DECOMPRESSED length is an exact record
  * multiple — and a footer records every frame's (compressed, decompressed)
  * length. A reader then plans record-aligned splits from ONE bounded
  * footer read per file (the parquet planning shape): no phase-1
  * decompression pass (the bz2 path's honest-floor cost), no spanning tail
  * records (frame boundaries ARE record boundaries), and any contiguous
  * frame run decompresses independently — which is exactly what makes a
  * 100 TB compressed feed scan as parallel as an uncompressed one.
  *
  * Layout:
  * {{{
  *   file    := frame* footer trailer
  *   frame   := one zstd frame | one gzip member   (a record-multiple group)
  *   footer  := nFrames × { cLen: int64 BE, dLen: int64 BE }
  *   trailer := nFrames: int32 BE | codecId: u8 | version: u8 | magic "GFZ1"
  * }}}
  * The trailer is fixed-size (10 bytes) at EOF, so a reader seeks to
  * `len-10`, validates magic/version, then reads the 16·nFrames-byte footer
  * — two bounded reads regardless of file size. Frame payloads are
  * self-framing codecs, so a chunk reader decompresses a frame RUN through
  * one continuous stream without per-frame bookkeeping.
  */
object FwzFormat {

  val Extension = ".fwz"
  val Magic: Int = 0x47465A31 // "GFZ1"
  val Version: Byte = 1
  val CodecZstd: Byte = 0
  val CodecGzip: Byte = 1
  val TrailerLen = 10

  def isFramed(p: Path): Boolean = p.getName.toLowerCase.endsWith(Extension)

  def codecIdOf(name: String): Byte = name match {
    case "zstd" => CodecZstd
    case "gzip" => CodecGzip
    case other => throw new IllegalArgumentException(
      s"fixedwidth: unsupported framed compression codec '$other' (zstd, gzip)")
  }

  def codecNameOf(id: Byte): String = id match {
    case CodecZstd => "zstd"
    case CodecGzip => "gzip"
    case other => throw new IllegalArgumentException(
      s"fixedwidth: unknown fwz codec id $other")
  }

  /** One frame as planned: compressed range [cOff, cOff+cLen) holds the
    * dLen decompressed bytes at logical offset dOff. */
  final case class FwzFrame(cOff: Long, cLen: Long, dOff: Long, dLen: Long)

  final case class FwzFooter(codec: Byte, frames: Seq[FwzFrame]) {
    def totalDLen: Long = if (frames.isEmpty) 0L else {
      val l = frames.last; l.dOff + l.dLen
    }
  }

  /** Compress one frame's decompressed bytes with `codec`. zstd level 3 —
    * the codec's own default, the ratio/speed point a feed writer wants. */
  def compressFrame(codec: Byte, bytes: Array[Byte], len: Int): Array[Byte] =
    codec match {
      case CodecZstd =>
        com.github.luben.zstd.Zstd.compress(
          java.util.Arrays.copyOf(bytes, len), 3)
      case CodecGzip =>
        val bos = new java.io.ByteArrayOutputStream(len / 2 + 64)
        val g = new java.util.zip.GZIPOutputStream(bos)
        g.write(bytes, 0, len); g.close()
        bos.toByteArray
    }

  /** Decompressing stream over a CONTIGUOUS frame run already positioned at
    * the run's first compressed byte; `in` must be bounded to the run. */
  def frameRunStream(codec: Byte, in: java.io.InputStream): java.io.InputStream =
    codec match {
      case CodecZstd =>
        val z = new com.github.luben.zstd.ZstdInputStream(in)
        z.setContinuous(true) // read ACROSS concatenated frames
        z
      case CodecGzip =>
        new java.util.zip.GZIPInputStream(in, 64 * 1024) // multi-member capable
    }

  /** Read and validate a file's footer: two bounded reads (trailer, then
    * frame table), magic/version/codec checks, and structural consistency
    * (compressed lengths + footer + trailer must tile the file exactly) so
    * a truncated or foreign file fails loudly at PLAN time, not mid-scan. */
  def readFooter(path: Path, fileLen: Long, conf: Configuration): FwzFooter = {
    require(fileLen >= TrailerLen,
      s"fixedwidth: $path is too short (${fileLen}B) for an fwz trailer")
    val in = path.getFileSystem(conf).open(path)
    try {
      val trailer = new Array[Byte](TrailerLen)
      in.readFully(fileLen - TrailerLen, trailer, 0, TrailerLen)
      val bb = java.nio.ByteBuffer.wrap(trailer)
      val nFrames = bb.getInt
      val codec = bb.get
      val version = bb.get
      val magic = bb.getInt
      if (magic != Magic)
        throw new IllegalArgumentException(
          s"fixedwidth: $path is not an fwz file (bad magic)")
      if (version != Version)
        throw new IllegalArgumentException(
          s"fixedwidth: $path has fwz version $version, this reader supports $Version")
      codecNameOf(codec) // validates
      require(nFrames >= 0 && TrailerLen + 16L * nFrames <= fileLen,
        s"fixedwidth: $path fwz trailer claims $nFrames frames, impossible for ${fileLen}B")
      val table = new Array[Byte](16 * nFrames)
      in.readFully(fileLen - TrailerLen - table.length, table, 0, table.length)
      val tb = java.nio.ByteBuffer.wrap(table)
      var cOff = 0L
      var dOff = 0L
      val frames = Seq.newBuilder[FwzFrame]
      var i = 0
      while (i < nFrames) {
        val cLen = tb.getLong
        val dLen = tb.getLong
        require(cLen > 0 && dLen > 0,
          s"fixedwidth: $path fwz frame $i has non-positive lengths ($cLen, $dLen)")
        frames += FwzFrame(cOff, cLen, dOff, dLen)
        cOff += cLen; dOff += dLen
        i += 1
      }
      require(cOff + table.length + TrailerLen == fileLen,
        s"fixedwidth: $path fwz frames cover ${cOff}B but the file holds " +
          s"${fileLen - table.length - TrailerLen}B of frame data — corrupt or truncated")
      FwzFooter(codec, frames.result())
    } finally in.close()
  }

  /** Append the footer + trailer for `frames` (written in order) to `out`. */
  def writeFooter(
      out: java.io.OutputStream, codec: Byte, frames: Seq[(Long, Long)]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(16 * frames.length + TrailerLen)
    frames.foreach { case (cLen, dLen) => bb.putLong(cLen).putLong(dLen) }
    bb.putInt(frames.length).put(codec).put(Version).putInt(Magic)
    out.write(bb.array())
  }
}

/** Reads at most `limit` bytes from `in` — bounds a frame run so the
  * decompressor can never read into the footer (or a later chunk's frames)
  * and misparse it as a frame header. */
private[fixedwidth] final class BoundedInputStream(
    in: java.io.InputStream, private var limit: Long) extends java.io.InputStream {
  override def read(): Int =
    if (limit <= 0) -1
    else { val r = in.read(); if (r >= 0) limit -= 1; r }
  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (limit <= 0) return -1
    val r = in.read(b, off, math.min(len.toLong, limit).toInt)
    if (r > 0) limit -= r
    r
  }
  override def close(): Unit = in.close()
}
