package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.fixedwidth.{FixedWidthInputPartition, FixedWidthOptions, FixedWidthScan, FwzStats}

/** Randomized differential proof that fwz per-frame statistics skipping is
  * SOUND: for seeded random data (clustered, shuffled, null-ridden, and
  * adversarial near-boundary values) and random predicate trees, the rows a
  * stats-framed read returns must be exactly the rows the same read returns
  * with statistics absent — while the planner-level skip count confirms the
  * machinery actually engages on the clustered layouts (a vacuous fuzz that
  * never skips would prove nothing). Complements FwzStatsSpec's pinned
  * cases the way FixedWidthPushdownFuzzSpec complements the pushdown spec. */
class FwzStatsFuzzSpec extends SparkSpec with Matchers {

  private val fieldsOpt =
    "k:long:0:8,cat:string:8:3,price:decimal(8,2):11:10,ts:timestamp:21:16," +
      "score:double:37:24,dt:date:61:8,n:int:69:7"
  private val recLen = 76

  /** Seeded rows; `clustered` sorts by k so frames get tight ranges. Nulls
    * land in every numeric column (incl. date and int — every declared
    * stat type's bound decode gets fuzzed); doubles include -0.0/extremes. */
  private def makeData(dir: String, seed: Long, clustered: Boolean): Unit = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val cats = Array("aa", "ab", "b", "cc", "zz")
    val rows = (0 until 20000).map { i =>
      val k = if (clustered) i.toLong else rnd.nextInt(20000).toLong
      (if (rnd.nextInt(20) == 0) None else Some(k),
        cats(rnd.nextInt(cats.length)),
        if (rnd.nextInt(15) == 0) None
        else Some(new java.math.BigDecimal(rnd.nextInt(900000)).movePointLeft(2)),
        if (rnd.nextInt(25) == 0) None else Some(1600000000000000L + k * 1000000L),
        if (rnd.nextInt(10) == 0) None
        else Some(rnd.nextInt(5) match {
          case 0 => -0.0d
          case 1 => 0.0d
          case _ => rnd.nextDouble() * 200 - 100
        }),
        if (rnd.nextInt(18) == 0) None else Some((18000 + k / 4).toInt),
        if (rnd.nextInt(22) == 0) None else Some(rnd.nextInt(100000) - 50000))
    }
    val df = rows.toDF("k", "cat", "price", "ts", "score", "dt", "n")
      .select(col("k"), col("cat"), col("price").cast("decimal(8,2)"),
        timestamp_micros(col("ts")).as("ts"), col("score"),
        date_add(lit(java.sql.Date.valueOf("1970-01-01")), col("dt")).as("dt"),
        col("n"))
    (if (clustered) df.orderBy(col("k")) else df).coalesce(1)
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", recLen.toString)
      .option("compression", if (seed % 2 == 0) "zstd" else "gzip")
      .option("frameBytes", (250 * recLen).toString)
      .option("frameStats", "all")
      .mode("overwrite").save(dir)
  }

  /** Strip the footer stats from every .fwz file by rewriting it as v1:
    * frames + 16n table + 10B trailer (drops the stats block), so the
    * no-stats control reads BYTE-IDENTICAL frame data. */
  private def stripStats(src: String, dst: String): Unit = {
    val conf = new org.apache.hadoop.conf.Configuration()
    new java.io.File(dst).mkdirs()
    new java.io.File(src).listFiles.filter(_.getName.endsWith(".fwz")).foreach { f =>
      val footer = graft.sources.fixedwidth.FwzFormat.readFooter(
        new org.apache.hadoop.fs.Path(f.getPath), f.length(), conf)
      val all = java.nio.file.Files.readAllBytes(f.toPath)
      val framesLen = footer.frames.map(_.cLen).sum
      val out = new java.io.FileOutputStream(s"$dst/${f.getName}")
      out.write(all, 0, framesLen.toInt)
      graft.sources.fixedwidth.FwzFormat.writeFooter(
        out, footer.codec, footer.frames.map(fr => (fr.cLen, fr.dLen)))
      out.close()
    }
  }

  private def randomFilter(rnd: java.util.Random, depth: Int): Filter = {
    def leaf(): Filter = rnd.nextInt(15) match {
      case 12 =>
        val d = java.time.LocalDate.ofEpochDay(18000 + rnd.nextInt(6000))
        if (rnd.nextBoolean()) GreaterThanOrEqual("dt", d)
        else LessThan("dt", java.sql.Date.valueOf(d))
      case 13 => EqualTo("dt", java.time.LocalDate.ofEpochDay(18000 + rnd.nextInt(6000)))
      case 14 =>
        if (rnd.nextBoolean()) GreaterThan("n", rnd.nextInt(120000) - 60000)
        else LessThanOrEqual("n", rnd.nextInt(120000) - 60000)
      case 0 => EqualTo("k", rnd.nextInt(22000).toLong)
      case 1 => GreaterThan("k", rnd.nextInt(22000).toLong)
      case 2 => LessThan("k", rnd.nextInt(22000).toLong)
      case 3 => GreaterThanOrEqual("price", new java.math.BigDecimal(rnd.nextInt(9000)))
      case 4 => LessThanOrEqual("price", new java.math.BigDecimal(rnd.nextInt(9000)))
      case 5 => EqualTo("cat", Seq("aa", "ab", "b", "cc", "zz", "nope")(rnd.nextInt(6)))
      case 6 => StringStartsWith("cat", Seq("a", "b", "z", "q")(rnd.nextInt(4)))
      case 7 => In("k", Array.fill(3)(rnd.nextInt(22000).toLong.asInstanceOf[Any]))
      case 8 => IsNull(Seq("k", "price", "ts", "score", "dt", "n")(rnd.nextInt(6)))
      case 9 => IsNotNull(Seq("k", "price", "ts", "score", "dt", "n")(rnd.nextInt(6)))
      case 10 => GreaterThan("score", rnd.nextDouble() * 200 - 100)
      case _ => LessThan("ts", java.time.Instant.ofEpochSecond(1600000000L + rnd.nextInt(20000)))
    }
    if (depth == 0 || rnd.nextInt(3) == 0) leaf()
    else if (rnd.nextBoolean()) And(randomFilter(rnd, depth - 1), randomFilter(rnd, depth - 1))
    else Or(randomFilter(rnd, depth - 1), randomFilter(rnd, depth - 1))
  }

  /** Equivalent Column expression for a sources.Filter (the fuzz evaluates
    * predicates through the normal read path, not hand-rolled). */
  private def toColumn(f: Filter): org.apache.spark.sql.Column = f match {
    case EqualTo(a, v) => col(a) === lit(v)
    case GreaterThan(a, v) => col(a) > lit(v)
    case GreaterThanOrEqual(a, v) => col(a) >= lit(v)
    case LessThan(a, v) => col(a) < lit(v)
    case LessThanOrEqual(a, v) => col(a) <= lit(v)
    case In(a, vs) => col(a).isin(vs: _*)
    case IsNull(a) => col(a).isNull
    case IsNotNull(a) => col(a).isNotNull
    case StringStartsWith(a, v) => col(a).startsWith(v)
    case And(l, r) => toColumn(l) && toColumn(r)
    case Or(l, r) => toColumn(l) || toColumn(r)
    case other => fail(s"unmapped filter $other")
  }

  private def readWhere(dir: String, cond: org.apache.spark.sql.Column): Array[String] =
    spark.read.format("fixedwidth").option("fields", fieldsOpt)
      .option("recordLength", recLen.toString).load(dir)
      .filter(cond)
      .selectExpr("concat_ws('|', k, cat, price, ts, score, dt, n)")
      .collect().map(_.getString(0)).sorted

  test("random predicates: stats-framed read == stats-less read, and skipping engages") {
    val rnd = new java.util.Random(0xf17e5)
    var totalSkipped = 0L
    for (seed <- 0 until 4) {
      val withStats = Files.createTempDirectory(s"graft-fwzfuzz-$seed").toString
      val noStats = Files.createTempDirectory(s"graft-fwzfuzz-ns-$seed").toString
      makeData(withStats, seed, clustered = seed < 2)
      stripStats(withStats, noStats)
      val o = {
        import scala.jdk.CollectionConverters._
        FixedWidthOptions(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          Map("fields" -> fieldsOpt, "recordLength" -> recLen.toString).asJava))
      }
      val files = new java.io.File(withStats).listFiles.filter(_.getName.endsWith(".fwz"))
        .map(f => f.getPath -> f.length()).toSeq
      for (_ <- 0 until 25) {
        val f = randomFilter(rnd, 2)
        val pm = new FwzStats.PlanMetrics
        FixedWidthScan.alignedPartitionsOf(files, o, None, Array(f), pm)
        totalSkipped += pm.framesSkipped
        val c = toColumn(f)
        withClue(s"seed=$seed filter=$f: ") {
          readWhere(withStats, c) shouldBe readWhere(noStats, c)
        }
      }
    }
    // non-vacuity: across 100 random predicates over clustered + shuffled
    // layouts, the planner must have skipped a healthy number of frames
    totalSkipped should be > 100L
  }
}
