package graft.operators

import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The shared bounded-pull idiom: value-identity, the lineage cut (the
  * producing subtree runs ONCE, not once per consumer), and the loud
  * bound-violation failure that stops a broken scale argument from
  * materializing corpus-sized data on the driver. */
class BoundedPullSpec extends SparkSpec with Matchers {

  test("pull is value- and schema-identical to the source frame") {
    import spark.implicits._
    val src = Seq((1, "a", 1.5), (2, "b", -0.25), (3, null.asInstanceOf[String], 0.0))
      .toDF("id", "s", "x")
    val pulled = BoundedPull(src, maxRows = 10, what = "test frame")
    pulled.schema shouldBe src.schema
    pulled.collect().map(_.toSeq).toSet shouldBe src.collect().map(_.toSeq).toSet
  }

  test("pull cuts lineage: the producing subtree evaluates once, not per consumer") {
    import spark.implicits._
    val evals = spark.sparkContext.longAccumulator("boundedpull-evals")
    val bump = udf { (k: Int) => evals.add(1L); k % 3 }
    val produced = spark.range(30).select(bump(col("id").cast("int")).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("n"))
    val pulled = BoundedPull(produced, maxRows = 10, what = "grouped frame")
    // three derived consumers, the q206 shape
    pulled.agg(sum($"n")).collect()
    pulled.filter($"g" === 0).collect()
    pulled.agg(max($"n")).collect()
    // the UDF ran only during the single pull (30 source rows), not 3 more times
    evals.value shouldBe 30L
  }

  test("pulled frame plans as a local relation (no source re-scan)") {
    import spark.implicits._
    val pulled = BoundedPull(
      spark.range(5).select(col("id")), maxRows = 10, what = "range")
    val leaves = pulled.filter($"id" > 1).queryExecution.executedPlan.collectLeaves()
    all(leaves.map(_.getClass)) shouldBe classOf[LocalTableScanExec]
  }

  test("exceeding the asserted bound fails loudly, naming the intermediate") {
    val e = intercept[IllegalArgumentException] {
      BoundedPull(spark.range(100).toDF("id"), maxRows = 10, what = "too-big frame")
    }
    e.getMessage should include("too-big frame")
    e.getMessage should include("asserted bounded")
  }

  test("collect never exceeds maxRows + 1 rows even on an unbounded source") {
    // the guard itself must not OOM: the internal limit caps the pull
    val big = spark.range(1000000).toDF("id")
    val e = intercept[IllegalArgumentException] {
      BoundedPull(big, maxRows = 5, what = "million-row frame")
    }
    e.getMessage should include("million-row frame")
  }
}
