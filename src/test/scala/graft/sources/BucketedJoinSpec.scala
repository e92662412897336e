package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bucketed co-located join: pre-bucketing both sides on the join key must
  * remove BOTH exchanges from the sort-merge join — the layout contract
  * q97 relies on (there over real testdata; here pinned hermetically). */
class BucketedJoinSpec extends SparkSpec with Matchers {

  test("bucketed tables join with zero exchanges") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bucket-spec").toString
    val fact = (0L until 2000L).map(i => (i % 97, i.toDouble)).toDF("k", "v")
    val dim = (0L until 97L).map(i => (i, s"d$i")).toDF("k", "name")
    fact.write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$tmp/fact").mode("overwrite").saveAsTable("spec_fact_b")
    dim.write.bucketBy(4, "k").sortBy("k")
      .option("path", s"$tmp/dim").mode("overwrite").saveAsTable("spec_dim_b")
    try {
      val joined = spark.table("spec_fact_b").hint("merge")
        .join(spark.table("spec_dim_b"), "k")
      joined.count() shouldBe 2000L
      val plan = joined.queryExecution.executedPlan.toString
      withClue(plan) {
        plan should include("SortMergeJoin")
        plan should not include "Exchange"
        plan should include("Bucketed: true")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS spec_fact_b")
      spark.sql("DROP TABLE IF EXISTS spec_dim_b")
    }
  }
}
