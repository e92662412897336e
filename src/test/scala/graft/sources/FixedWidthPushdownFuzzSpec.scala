package graft.sources

import java.nio.file.{Files, Path => JPath}

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Differential fuzz for pushed FIELD predicates: across random record
  * bytes (valid, blank, malformed, pad-hostile), random predicate trees,
  * and both tolerant modes, the filtered fixedwidth scan — whose accepted
  * predicates compile onto the raw record buffer — must return exactly the
  * rows Catalyst keeps when the SAME predicate runs over the decoded
  * DataFrame. This mechanically generalizes the round-8 findings (leaf-
  * level malformed-as-NULL under OR, attempt-parse NULL-ness in tolerant
  * modes, In compilation): any byte-level/Catalyst semantic divergence on
  * any sampled path fails the trial with the predicate printed. */
class FixedWidthPushdownFuzzSpec extends SparkSpec with Matchers {

  // id long [0,6) always valid; s string [6,12); i int [12,17); d double [17,26)
  private val fields = "id:long:0:6,s:string:6:6,i:int:12:5,d:double:17:9"
  private val recLen = 26

  private def pad(v: String, w: Int): String = {
    require(v.length <= w, s"'$v' wider than $w")
    v + (" " * (w - v.length))
  }

  private val sPool = Seq("abc", "ab", "a", "", "  a", "zz", "m", "a b", "=x", "abcdef")
  private val iPool = Seq("1", "42", "-7", "00042", "99999", "-0", "", "x9", "1 2", "9z")
  private val dPool = Seq("1.5", "-0.25", "2", "0.0", "10.125", "-3.5", "", "2.x", "--1", "1.2.3")

  private def writeRandom(rng: Random, n: Int): String = {
    val dir = Files.createTempDirectory("graft-pdfuzz").toString
    val recs = (1 to n).map { i =>
      pad(i.toString, 6) + pad(sPool(rng.nextInt(sPool.length)), 6) +
        pad(iPool(rng.nextInt(iPool.length)), 5) + pad(dPool(rng.nextInt(dPool.length)), 9)
    }
    recs.foreach(r => assert(r.length == recLen))
    Files.write(JPath.of(dir, "data.fwb"), recs.mkString.getBytes("US-ASCII"))
    dir
  }

  /** Random predicate tree over (s, i, d): comparison/prefix/set/null
    * leaves composed with AND/OR/NOT to depth 3. */
  private def randomPred(rng: Random, depth: Int = 0): Column = {
    def leaf(): Column = rng.nextInt(12) match {
      case 0 => col("s") === sPool(rng.nextInt(sPool.length)).trim
      case 1 => col("s") < "m"
      case 2 => col("s").startsWith("a")
      case 3 => col("s").isNull
      case 4 => col("i") === (rng.nextInt(100) - 10)
      case 5 => col("i") > rng.nextInt(50)
      case 6 => col("i").isNotNull
      case 7 => col("i").isin(1, 42, -7, 99999)
      case 8 => col("d") >= (rng.nextInt(8) - 2) * 0.5
      case 9 => col("d") === 1.5
      case 10 => col("d").isNull
      case 11 => col("s").isin("abc", "zz", "a b")
    }
    if (depth >= 3 || rng.nextInt(3) == 0) leaf()
    else rng.nextInt(3) match {
      case 0 => randomPred(rng, depth + 1) && randomPred(rng, depth + 1)
      case 1 => randomPred(rng, depth + 1) || randomPred(rng, depth + 1)
      case 2 => !randomPred(rng, depth + 1)
    }
  }

  private def read(dir: String, mode: String): DataFrame =
    spark.read.format("fixedwidth").option("fields", fields)
      .option("mode", mode).load(dir)

  test("filtered scans equal Catalyst-on-decoded-rows across 40 random trials x 2 modes") {
    val rng = new Random(2608)
    for (trial <- 1 to 40; mode <- Seq("PERMISSIVE", "DROPMALFORMED")) {
      val dir = writeRandom(rng, 25 + rng.nextInt(50))
      val scan = read(dir, mode)
      // Ground truth: decode WITHOUT any pushable predicate, then let
      // Catalyst evaluate the same predicate over the materialized rows.
      val decoded = spark.createDataFrame(
        new java.util.ArrayList(java.util.Arrays.asList(scan.collect(): _*)), scan.schema)
      for (_ <- 1 to 4) {
        val pred = randomPred(rng)
        val got = scan.filter(pred).select("id").collect().map(_.getLong(0)).sorted
        val want = decoded.filter(pred).select("id").collect().map(_.getLong(0)).sorted
        withClue(s"trial=$trial mode=$mode pred=$pred: ") { got shouldBe want }
      }
    }
  }

  test("the fuzz exercises the compiled path: filters actually push") {
    val rng = new Random(1)
    val dir = writeRandom(rng, 30)
    val qe: QueryExecution =
      read(dir, "PERMISSIVE").filter(col("i") > 5 && col("s").startsWith("a")).queryExecution
    val plan = qe.executedPlan.toString
    plan should include("PushedFilters=[")
    plan.replaceAll("\\s", "") should not include "PushedFilters=[]"
    plan should include("GreaterThan(i,5)")
    plan should include("StringStartsWith(s,a)")
  }
}
