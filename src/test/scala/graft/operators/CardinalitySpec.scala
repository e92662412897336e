package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** HLL sketch invariants: estimator accuracy in its design regime,
  * insertion idempotence (duplicates change nothing), and register-count
  * bounds. Cross-engine bit-equality of the estimate is covered by q48's
  * DuckDB oracle. */
class CardinalitySpec extends SparkSpec with Matchers {

  test("estimate lands within the standard error envelope for 10k distinct items") {
    import spark.implicits._
    val n = 10000
    val items = (0 until n).map(i => ("g", s"item-$i")).toDF("g", "item")
    val out = Cardinality.hllDistinct(items, Seq("g"), col("item"), p = 8).collect()(0)
    val est = out.getAs[Double]("hll_est")
    // p=8 -> ~1.04/16 = 6.5% relative error; allow 4 sigma
    est shouldBe n.toDouble +- (n * 0.26)
    out.getAs[Long]("n_used") should be <= 256L
  }

  test("duplicated input yields the identical sketch (insertion idempotence)") {
    import spark.implicits._
    val base = (0 until 2000).map(i => ("g", s"item-$i"))
    val once = base.toDF("g", "item")
    val thrice = (base ++ base ++ base).toDF("g", "item")
    val a = Cardinality.hllDistinct(once, Seq("g"), col("item"), p = 8).collect()(0)
    val b = Cardinality.hllDistinct(thrice, Seq("g"), col("item"), p = 8).collect()(0)
    a.getAs[Double]("hll_est") shouldBe b.getAs[Double]("hll_est")
    a.getAs[Long]("n_used") shouldBe b.getAs[Long]("n_used")
  }

  test("NULL items are excluded, matching count_distinct semantics") {
    import spark.implicits._
    val clean = (0 until 500).map(i => ("g", Some(s"item-$i")))
    val withNulls = clean ++ Seq.fill(50)(("g", None: Option[String]))
    val a = Cardinality.hllDistinct(clean.toDF("g", "item"), Seq("g"), col("item"), p = 8).collect()(0)
    val b = Cardinality.hllDistinct(withNulls.toDF("g", "item"), Seq("g"), col("item"), p = 8).collect()(0)
    // without the isNotNull filter the NULL rows minted a phantom maximal
    // register (bucket NULL, rho 57) inflating both n_used and the estimate
    b.getAs[Double]("hll_est") shouldBe a.getAs[Double]("hll_est")
    b.getAs[Long]("n_used") shouldBe a.getAs[Long]("n_used")
  }

  test("register max-merge of two sources equals sketching their union directly") {
    import spark.implicits._
    val a = (0 until 3000).map(i => ("a", s"item-$i"))          // [0, 3000)
    val b = (1500 until 5000).map(i => ("b", s"item-$i"))       // [1500, 5000) — true overlap 1500
    val df = (a ++ b).toDF("src", "item")
    val regs = Cardinality.hllRegisters(df, Seq("src"), col("item"), p = 8)
    val merged = regs.groupBy(col("_bucket")).agg(max(col("_rho")).as("_rho"))
      .withColumn("g", lit("u"))
    val viaMerge = Cardinality.estimateFromRegisters(merged, Seq("g"), p = 8)
      .collect()(0).getAs[Double]("hll_est")
    val direct = Cardinality.hllDistinct(
      df.select(lit("u").as("g"), col("item")), Seq("g"), col("item"), p = 8)
      .collect()(0).getAs[Double]("hll_est")
    viaMerge shouldBe direct // exact: merged registers ARE the union's registers
    viaMerge shouldBe 4500.0 +- 1200.0
  }

  test("groups sketch independently") {
    import spark.implicits._
    val df = ((0 until 5000).map(i => ("big", s"x-$i")) ++
      (0 until 50).map(i => ("small", s"y-$i"))).toDF("g", "item")
    val rows = Cardinality.hllDistinct(df, Seq("g"), col("item"), p = 8)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("hll_est")).toMap
    rows("big") shouldBe 5000.0 +- 1300.0
    // 50 items in the small-range regime: raw HLL overestimates by design
    // (documented: no linear-counting correction); just check monotone sanity
    rows("small") should be < rows("big")
  }
}
