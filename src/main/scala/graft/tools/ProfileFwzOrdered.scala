package graft.tools

import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}

import graft.sources.fixedwidth.{FixedWidthOptions, FwzFormat, FwzStats}

/** Measures what the v3 `ordered` flag buys at PLAN time (dev tool): a
  * synthetic single-file stats block with N ascending frames (the 10^5+
  * frames-per-boundary-file regime SURVEY §7.5 flagged), one two-sided key
  * range, and the full skipper pass a plan would run — compile + evaluate
  * over every frame. The linear walk must DECODE up to 2N bounds (memoized,
  * but each decoded once); the binary search decodes O(log N) and answers
  * the rest from the interval. Driver-side only, no Spark session: this is
  * exactly the work `alignedPartitionsOf` does per framed file at plan
  * time. Usage: sbt "runMain graft.tools.ProfileFwzOrdered [nFrames]"
  */
object ProfileFwzOrdered {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val width = 10
    def slice(v: Long): Array[Byte] = {
      val s = v.toString
      (" " * (width - s.length) + s).getBytes("US-ASCII")
    }
    val flags = Array.fill[Byte](n)(FwzFormat.FlagHasValue.toByte)
    val mins = Array.tabulate(n)(i => slice(i.toLong * 10))
    val maxs = Array.tabulate(n)(i => slice(i.toLong * 10 + 9))
    def field(ordered: Boolean) = FwzFormat.FwzFieldStats(
      "k", "long", 0, width, flags, mins, maxs, ordered)
    val opts = {
      import scala.jdk.CollectionConverters._
      FixedWidthOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        Map("fields" -> s"k:long:0:$width").asJava))
    }
    val filters: Array[org.apache.spark.sql.sources.Filter] = Array(
      GreaterThanOrEqual("k", n.toLong * 5 - 1000L),
      LessThanOrEqual("k", n.toLong * 5 + 1000L))

    def pass(ordered: Boolean): (Double, Long) = {
      val block = FwzFormat.FwzStatsBlock("UTF-8", 0, Seq(field(ordered)))
      // warm JIT
      var kept0 = 0L
      val sk0 = FwzStats.compileSkipper(filters, opts, block).get
      var i = 0
      while (i < n) { if (sk0(i)) kept0 += 1; i += 1 }
      val times = (1 to 5).map { _ =>
        val b = FwzFormat.FwzStatsBlock("UTF-8", 0, Seq(field(ordered)))
        val t0 = System.nanoTime()
        val sk = FwzStats.compileSkipper(filters, opts, b).get
        var kept = 0L
        var j = 0
        while (j < n) { if (sk(j)) kept += 1; j += 1 }
        require(kept == kept0, "ordered and linear disagree")
        (System.nanoTime() - t0) / 1e9
      }
      (times.sorted.apply(times.size / 2), kept0)
    }

    val (tLin, keptLin) = pass(ordered = false)
    val (tOrd, keptOrd) = pass(ordered = true)
    require(keptLin == keptOrd, s"decision mismatch: linear kept $keptLin, ordered kept $keptOrd")
    println(f"PROFILE ordered-skip: nFrames=$n kept=$keptLin " +
      f"linear=${tLin}%.4fs ordered=${tOrd}%.4fs speedup=${tLin / tOrd}%.1fx")
  }
}
