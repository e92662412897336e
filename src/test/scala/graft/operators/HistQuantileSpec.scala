package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class HistQuantileSpec extends SparkSpec with Matchers {

  test("estimates land within one bucket width of the exact quantile") {
    import spark.implicits._
    // uniform [0, 1000): exact quantile q*1000, bucket width 1000/50 = 20
    val df = (0 until 10000).map(i => ("g", (i % 1000).toDouble)).toDF("g", "v")
    val out = HistQuantile.estimate(df, Seq("g"), "v", 0.0, 1000.0, 50, Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    out(0.25) shouldBe 250.0 +- 20.0
    out(0.5) shouldBe 500.0 +- 20.0
    out(0.9) shouldBe 900.0 +- 20.0
  }

  test("q=1.0 returns the top bucket's upper edge; out-of-domain values clamp") {
    import spark.implicits._
    val df = Seq(("g", -50.0), ("g", 5.0), ("g", 500.0), ("g", 99999.0)).toDF("g", "v")
    val rows = HistQuantile.estimate(df, Seq("g"), "v", 0.0, 100.0, 10, Seq(1.0)).collect()
    rows.length shouldBe 1
    // 99999 clamps into bucket 9 → est = upper edge of the domain
    rows(0).getAs[Double]("est") shouldBe 100.0
    rows(0).getAs[Long]("n_rows") shouldBe 4L
  }

  test("groups estimate independently and NULLs are excluded") {
    import spark.implicits._
    val df = (Seq(("a", Some(10.0)), ("a", Some(20.0)), ("a", None)) ++
      (0 until 100).map(i => ("b", Some(i.toDouble)))).toDF("g", "v")
    val out = HistQuantile.estimate(df, Seq("g"), "v", 0.0, 100.0, 20, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_rows")).toMap
    out("a") shouldBe 2L
    out("b") shouldBe 100L
  }

  test("invalid parameters rejected") {
    import spark.implicits._
    val df = Seq(("g", 1.0)).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      HistQuantile.estimate(df, Seq("g"), "v", 10.0, 10.0, 8, Seq(0.5))
    an[IllegalArgumentException] should be thrownBy
      HistQuantile.estimate(df, Seq("g"), "v", 0.0, 10.0, 0, Seq(0.5))
    an[IllegalArgumentException] should be thrownBy
      HistQuantile.estimate(df, Seq("g"), "v", 0.0, 10.0, 8, Seq(0.0))
  }
}
