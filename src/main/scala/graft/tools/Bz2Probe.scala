package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.{BZip2Codec, CodecPool, SplittableCompressionCodec}

/** Throwaway empirical probe of BZip2 split-stream semantics (deleted after
  * use): adjusted bounds, whether a BYBLOCK stream stops at adjustedEnd or
  * continues, and getPos reporting.
  */
object Bz2Probe {
  def main(args: Array[String]): Unit = {
    val conf = new Configuration()
    val tmp = java.nio.file.Files.createTempDirectory("bz2probe")
    val file = new Path(tmp.toString, "data.fwb.bz2")
    val codec = new BZip2Codec()
    codec.setConf(conf)
    val fs = file.getFileSystem(conf)
    // 1M records x 12 bytes = 12 MB decompressed; record i payload derived
    // from i so content is verifiable
    val recLen = 12
    val nRec = 1000000
    val out = codec.createOutputStream(fs.create(file))
    val buf = new Array[Byte](recLen)
    var i = 0
    while (i < nRec) {
      val s = f"$i%011d,"
      System.arraycopy(s.getBytes("US-ASCII"), 0, buf, 0, recLen)
      out.write(buf)
      i += 1
    }
    out.close()
    val cLen = fs.getFileStatus(file).getLen
    println(s"compressed len: $cLen  decompressed: ${nRec * recLen}")

    // corner: stream created exactly AT a known block start (250926) and
    // one byte after — which block does it align to?
    var totalBytes = 0L
    Seq(250925L, 250926L, 250927L).foreach { st =>
      val in = fs.open(file)
      val d = CodecPool.getDecompressor(codec)
      try {
        val sp = codec.createInputStream(in, d, st, cLen,
          SplittableCompressionCodec.READ_MODE.BYBLOCK)
        val b = new Array[Byte](16)
        val n = sp.read(b)
        println(s"start=$st -> pos0(after create)=?, after 1 read: ret=$n pos=${sp.getPos}")
        sp.close()
      } finally CodecPool.returnDecompressor(d)
    }
    println(s"total decompressed across naive ranges: $totalBytes (expect ${nRec * recLen} if ranges partition blocks exactly once and streams stop at range end)")
    fs.delete(new Path(tmp.toString), true)
  }
}
