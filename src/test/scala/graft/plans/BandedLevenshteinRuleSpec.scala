package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class BandedLevenshteinRuleSpec extends SparkSpec with Matchers {

  // RDD-backed (NOT Seq.toDF): the optimizer's ConvertToLocalRelation
  // eagerly evaluates projections/filters over a LocalRelation, which would
  // erase the Levenshtein expression from the optimized plan entirely and
  // make the rewrite unobservable.
  private def corpus = {
    import spark.implicits._
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      ("kitten", "sitting"), ("abc", "abd"), ("same", "same"),
      ("abc", null.asInstanceOf[String]))))
      .toDF("a", "b")
  }

  private def levs(df: DataFrame): Seq[Levenshtein] =
    df.queryExecution.optimizedPlan
      .collect { case n => n.expressions }.flatten
      .flatMap(_.collect { case l: Levenshtein => l })

  private def bandedCount(df: DataFrame): Int = levs(df).count(_.threshold.isDefined)

  private def unbandedCount(df: DataFrame): Int = levs(df).count(_.threshold.isEmpty)

  test("<= k rewrites to the banded form and keeps results") {
    import spark.implicits._
    val q = corpus.filter(levenshtein($"a", $"b") <= 2)
    bandedCount(q) shouldBe 1
    unbandedCount(q) shouldBe 0
    q.collect().map(_.getString(0)).toSet shouldBe Set("abc", "same")
  }

  test("mirrored, strict, and equality comparisons rewrite too") {
    import spark.implicits._
    val mirrored = corpus.filter(lit(2) >= levenshtein($"a", $"b"))
    bandedCount(mirrored) shouldBe 1
    mirrored.count() shouldBe 2

    val strict = corpus.filter(levenshtein($"a", $"b") < 3) // band at 2
    bandedCount(strict) shouldBe 1
    strict.count() shouldBe 2

    val eq = corpus.filter(levenshtein($"a", $"b") === 1)
    bandedCount(eq) shouldBe 1
    eq.collect().map(_.getString(0)).toSeq shouldBe Seq("abc")

    val zero = corpus.filter(levenshtein($"a", $"b") <= 0)
    bandedCount(zero) shouldBe 1
    zero.collect().map(_.getString(0)).toSeq shouldBe Seq("same")
  }

  test("rewrite fires in projection context and preserves tri-state NULL semantics") {
    import spark.implicits._
    val proj = corpus.select($"a", (levenshtein($"a", $"b") <= 2).as("close"))
    bandedCount(proj) shouldBe 1
    val rows = proj.collect().map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getBoolean(1))).toSeq
    rows should contain("kitten" -> false) // dist 3 > 2: banded -1 >= 0 is false
    rows should contain("same" -> true)
    // NULL input stays NULL, not false
    rows.count(_._2 == null) shouldBe 1
  }

  test("non-threshold uses are left alone") {
    import spark.implicits._
    val plain = corpus.select(levenshtein($"a", $"b").as("d"))
    bandedCount(plain) shouldBe 0
    unbandedCount(plain) shouldBe 1
    // negative bound: not our rewrite (always-false), distance stays unbanded
    val neg = corpus.filter(levenshtein($"a", $"b") <= -1)
    bandedCount(neg) shouldBe 0
  }
}
