package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.fixedwidth.{FixedWidthOptions, FixedWidthScan, FwzFormat, FwzStats}

/** The `framesOrderedBy` footer flag (SURVEY §7.5 open item 2, closed r16):
  * the fwz writer PROVES at file close that a stat field's per-frame
  * extremes are non-overlapping ascending (max_i ≤ min_{i+1}) and records
  * one `ordered` byte per field entry in the v3 stats block; the plan-time
  * skipper then resolves a pushed comparison to a frame INTERVAL by binary
  * search over the extremes — O(log frames) bound decodes instead of
  * O(frames) — which is what keeps driver planning flat past ~10^5 frames
  * per file. Soundness is pinned differentially: the binary-searched
  * keep/skip decisions must be IDENTICAL to the linear walk's, frame by
  * frame, under randomized data and predicates. */
class FwzOrderedSpec extends SparkSpec with Matchers {

  private val fieldsOpt = "id:long:0:10,v:string:10:6"
  private val recLen = 16

  private def write(dir: String, sorted: Boolean, nulls: Boolean = false): Unit = {
    import spark.implicits._
    val rnd = new java.util.Random(41)
    val rows = (0 until 12000).map { i =>
      val id = if (sorted) i.toLong else rnd.nextInt(12000).toLong
      (if (nulls && rnd.nextInt(17) == 0) None else Some(id), s"v$i")
    }
    val df = rows.toDF("id", "v")
    (if (sorted) df.orderBy(col("id")) else df).coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", recLen.toString)
      .option("compression", "zstd").option("frameBytes", (200 * recLen).toString)
      .option("frameStats", "id")
      .mode("overwrite").save(dir)
  }

  private def footerOf(dir: String) = {
    val f = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".fwz")).head
    FwzFormat.readFooter(
      new org.apache.hadoop.fs.Path(f.getPath), f.length(),
      new org.apache.hadoop.conf.Configuration())
  }

  private val opts = {
    import scala.jdk.CollectionConverters._
    FixedWidthOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      Map("fields" -> fieldsOpt, "recordLength" -> recLen.toString).asJava))
  }

  test("writer proves orderedness: sorted data sets the flag, shuffled data does not") {
    val sortedDir = Files.createTempDirectory("graft-ord-s").toString
    val shuffledDir = Files.createTempDirectory("graft-ord-u").toString
    write(sortedDir, sorted = true, nulls = true)
    write(shuffledDir, sorted = false)
    val sStats = footerOf(sortedDir).stats.get
    val uStats = footerOf(shuffledDir).stats.get
    sStats.fields.find(_.name == "id").get.ordered shouldBe true
    uStats.fields.find(_.name == "id").get.ordered shouldBe false
  }

  test("binary-searched keep/skip decisions are identical to the linear walk, frame by frame") {
    val dir = Files.createTempDirectory("graft-ord-diff").toString
    write(dir, sorted = true, nulls = true)
    val stats = footerOf(dir).stats.get
    stats.fields.head.ordered shouldBe true
    val nFrames = stats.fields.head.flags.length
    nFrames should be > 30
    // the same block with the flag stripped forces the linear path
    val linearStats = stats.copy(fields = stats.fields.map(_.copy(ordered = false)))
    val rnd = new java.util.Random(0x07de5ed)
    for (_ <- 0 until 300) {
      val lit = rnd.nextInt(14000).toLong - 1000L
      val f: Filter = rnd.nextInt(8) match {
        case 0 => EqualTo("id", lit)
        case 1 => GreaterThan("id", lit)
        case 2 => GreaterThanOrEqual("id", lit)
        case 3 => LessThan("id", lit)
        case 4 => LessThanOrEqual("id", lit)
        case 5 => And(GreaterThanOrEqual("id", lit), LessThanOrEqual("id", lit + rnd.nextInt(500)))
        // IN compiles to the union of per-literal binary-searched intervals
        // on an ordered field — scattered, clustered (forcing interval
        // merges), and out-of-range literals all must reproduce the linear
        // walk's decisions exactly
        case 6 => In("id",
          Array.fill(1 + rnd.nextInt(8))(rnd.nextInt(14000).toLong - 1000L: Any))
        case _ => In("id",
          Array.tabulate(2 + rnd.nextInt(6))(k => lit + k * (1 + rnd.nextInt(3)): Any))
      }
      val fast = FwzStats.compileSkipper(Array(f), opts, stats).get
      val slow = FwzStats.compileSkipper(Array(f), opts, linearStats).get
      withClue(s"filter=$f: ") {
        (0 until nFrames).map(fast) shouldBe (0 until nFrames).map(slow)
      }
    }
  }

  test("two-sided range on an ordered feed: results match the stats-less read and frames skip") {
    val dir = Files.createTempDirectory("graft-ord-range").toString
    write(dir, sorted = true)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".fwz"))
      .map(f => f.getPath -> f.length()).toSeq
    val f = And(GreaterThanOrEqual("id", 4000L), LessThanOrEqual("id", 4400L))
    val pm = new FwzStats.PlanMetrics
    FixedWidthScan.alignedPartitionsOf(files, opts, None, Array(f), pm)
    pm.framesSkipped should be > 30L // the interval excludes most of 60 frames
    val got = spark.read.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", recLen.toString).load(dir)
      .filter(col("id") >= 4000L && col("id") <= 4400L)
      .select(col("id")).collect().map(_.getLong(0)).sorted
    got shouldBe (4000L to 4400L).toArray
  }

  test("a foreign flag over a broken lattice (unknown frame) falls back to the linear gate") {
    val dir = Files.createTempDirectory("graft-ord-lie").toString
    write(dir, sorted = true)
    val stats = footerOf(dir).stats.get
    val st0 = stats.fields.head
    // forge: claim ordered but mark frame 0 UNKNOWN — an unknown frame has
    // no extremes and must always be kept, which no contiguous interval
    // over the others can express; the gate must refuse the license and
    // compile the linear predicate (which keeps frame 0 unconditionally)
    val forgedFlags = st0.flags.clone(); forgedFlags(0) = FwzFormat.FlagUnknown.toByte
    val forged = stats.copy(fields = Seq(st0.copy(flags = forgedFlags, ordered = true)))
    val control = stats.copy(fields = Seq(st0.copy(flags = forgedFlags, ordered = false)))
    val n = st0.flags.length
    for (f <- Seq[Filter](EqualTo("id", 10L), GreaterThan("id", 6000L), LessThan("id", 100L))) {
      val a = FwzStats.compileSkipper(Array(f), opts, forged).get
      val b = FwzStats.compileSkipper(Array(f), opts, control).get
      (0 until n).map(a) shouldBe (0 until n).map(b)
      a(0) shouldBe true // the unknown frame is never skipped
    }
  }

  test("ordered STRING field: IN and StartsWith binary-search to the linear decisions") {
    import org.apache.spark.sql.functions.col
    val fields2 = "k:string:0:8,id:long:8:10"
    val opts2 = {
      import scala.jdk.CollectionConverters._
      graft.sources.fixedwidth.FixedWidthOptions(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map("fields" -> fields2, "recordLength" -> "18").asJava))
    }
    val dir = Files.createTempDirectory("graft-ord-str").toString
    locally {
      import spark.implicits._
      (0 until 12000).map(i => (f"k$i%06d", i.toLong)).toDF("k", "id")
        .orderBy(col("k")).coalesce(1)
        .write.format("fixedwidth").option("fields", fields2)
        .option("recordLength", "18")
        .option("compression", "zstd").option("frameBytes", (200 * 18).toString)
        .option("frameStats", "k")
        .mode("overwrite").save(dir)
    }
    val stats = footerOf(dir).stats.get
    val kStat = stats.fields.find(_.name == "k").get
    kStat.ordered shouldBe true
    val nFrames = kStat.flags.length
    val linearStats = stats.copy(fields = stats.fields.map(_.copy(ordered = false)))
    val rnd = new java.util.Random(0x5742a11)
    for (t <- 0 until 200) {
      val r = rnd.nextInt(14000) - 1000
      val f: Filter = rnd.nextInt(4) match {
        // prefixes of every length, incl. "" (keeps all value frames), the
        // constant head "k" and prefixes past the data's range
        case 0 => StringStartsWith("k", f"k$r%06d".take(1 + rnd.nextInt(7)))
        case 1 => StringStartsWith("k", if (t % 2 == 0) "" else "z")
        case 2 => In("k",
          Array.fill(1 + rnd.nextInt(6))(f"k${rnd.nextInt(14000) - 1000}%06d": Any))
        case _ => EqualTo("k", f"k$r%06d")
      }
      val fast = FwzStats.compileSkipper(Array(f), opts2, stats).get
      val slow = FwzStats.compileSkipper(Array(f), opts2, linearStats).get
      withClue(s"filter=$f: ") {
        (0 until nFrames).map(fast) shouldBe (0 until nFrames).map(slow)
      }
    }
  }

  test("all-null leading frames (NULLS FIRST sort): ordered holds, null frames skip by flag") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft-ord-nulls").toString
    write(dir, sorted = true, nulls = true)
    val stats = footerOf(dir).stats.get
    stats.fields.head.ordered shouldBe true
    // some leading frames hold ONLY nulls under the nulls-first sort
    (stats.fields.head.flags(0) & FwzFormat.FlagHasValue) shouldBe 0
    // a compare predicate must skip them (null never matches a compare) —
    // and an IsNull predicate must still find every null row
    val df = spark.read.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", recLen.toString).load(dir)
    val nullCount = df.filter(col("id").isNull).count()
    nullCount should be > 0L
    // expected set from an UNFILTERED read (no pushed filters → no skipping)
    val expected = df.select("id").collect()
      .collect { case r if !r.isNullAt(0) && r.getLong(0) <= 50L => r.getLong(0) }.sorted
    val got = df.filter(col("id") <= 50L).select("id")
      .collect().map(_.getLong(0)).sorted
    got shouldBe expected
  }
}
