package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.Hashing

/** Physical-plan shape guarantees for the corpus-shaping operators — the
  * properties that make them 100 TB-viable. Value correctness lives in the
  * oracle queries; these specs fail if a future edit silently introduces a
  * shuffle, a sort, or a non-broadcast join into the map-side paths. */
class PipelinePlanSpec extends SparkSpec with Matchers {

  private lazy val corpus = {
    import spark.implicits._
    (0 until 1000).map(i => (i.toLong, s"src${i % 7}", 10L + i % 90)).toDF("id", "source", "n_tok")
  }

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force execution so AQE (if any) settles
    // under AQE the string renders the final AND the initial plan — keep only
    // the final one or every node would count twice
    val s = df.queryExecution.executedPlan.toString
    val i = s.indexOf("== Initial Plan ==")
    if (i >= 0) s.substring(0, i) else s
  }

  test("hashSample plans as scan+filter: no exchange, no sort, no aggregation") {
    val p = plan(Pipeline.hashSample(corpus, "id", keep = 512, bits = 10))
    withClue(p) {
      p should not include "Exchange"
      p should not include "Sort ["
      p should not include "HashAggregate"
    }
  }

  test("weightedMixture joins the rates table by broadcast, never by shuffle") {
    val rates = Map("src0" -> 512, "src1" -> 512, "src2" -> 512)
    val p = plan(Pipeline.weightedMixture(corpus, "id", "source", rates))
    withClue(p) {
      p should include("BroadcastHashJoin")
      p should not include "SortMergeJoin"
      p should not include "Exchange hashpartitioning"
    }
  }

  test("packSequences plans exactly one shuffle (the shard window)") {
    val sharded = corpus.withColumn("shard", Pipeline.hashBucket(col("id"), 2))
    val p = plan(Pipeline.packSequences(sharded, "id", col("n_tok"), 256, Seq(col("shard"))))
    withClue(p) {
      p.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    }
  }

  test("sketch builds aggregate map-side before their one tiny shuffle") {
    // partial_count before the exchange: the shuffle carries cells/registers,
    // not items — the property that keeps sketches cheap at corpus scale
    val cms = plan(Frequency.cmsCells(corpus, concat(lit("w"), col("id") % 40), 4, 8))
    withClue(cms) {
      cms should include("partial_count")
      cms.linesIterator.count(_.contains("Exchange hashpartitioning")) shouldBe 1
    }
    val hll = plan(Cardinality.hllDistinct(
      corpus.select(lit("g").as("g"), concat(lit("w"), col("id") % 40).as("item")),
      Seq("g"), col("item"), p = 8))
    withClue(hll) { hll should include("partial_max") }
  }

  test("bloom prefilter sits in the scan stage before any exchange") {
    // range scan, not a local relation (whose filters evaluate eagerly at
    // plan time and prove nothing about the distributed shape)
    val fact = spark.range(1000).select(col("id"))
    val dim = fact.filter(col("id") % 5 === 0)
    val words = BloomJoin.buildFilter(dim, col("id"), mBits = 1 << 14, k = 5)
    val p = plan(BloomJoin.prefilter(fact, col("id"), words, 1 << 14, 5))
    withClue(p) {
      // a pure row filter: the bit-test adds no shuffle, no agg, no sort —
      // at scale it runs inside the fact scan's stage, shedding rows
      // before the join's exchange
      p should include("bloommightcontain")
      p should not include "Exchange"
      p should not include "HashAggregate"
    }
  }

  test("hash bucketing stays inside whole-stage codegen") {
    // a range scan (LocalTableScan would evaluate eagerly with no codegen
    // stage at all, proving nothing)
    val df = spark.range(1000).select(Pipeline.hashBucket(col("id"), 10).as("b"))
    val p = plan(df)
    // the Mix64Of expression must not force a fallback out of codegen
    withClue(p) { p should include("*(1)") }
    // and the computed buckets equal the JVM reference
    df.collect().zipWithIndex.foreach { case (r, i) =>
      r.getLong(0) shouldBe (Hashing.mix64(i.toLong, 0) & 1023L)
    }
  }
}
