package graft.plans

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.AsOfJoin

/** The physical as-of merge must be ROW-IDENTICAL to the union+window form
  * (the repo's semantic reference for as-of, itself oracle-verified by
  * q32/q113) across random data with NULL keys, NULL timestamps, keys
  * absent on either side, and shared-lineage inputs — and must plan as the
  * custom exec with no WindowExec and no union. */
class AsOfMergeJoinSpec extends SparkSpec with Matchers {

  import org.apache.spark.sql.DataFrame

  private def randomSides(seed: Int, nl: Int, nr: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rng = new Random(seed)
    def key() = if (rng.nextInt(12) == 0) null
      else java.lang.Long.valueOf(rng.nextInt(40).toLong)
    def ts() = if (rng.nextInt(15) == 0) null
      else java.lang.Long.valueOf(rng.nextInt(1000).toLong)
    val left = (0 until nl).map(i => (i.toLong, key(), ts())).toDF("lid", "k", "t")
    // tie-free right side: one row per (key, ts) — the determinism
    // precondition every as-of formulation shares
    // NULL-ts right rows stay IN: the declarative form filters them before
    // the union, and the physical merge must skip them identically
    val right = (0 until nr).map(i => (key(), ts(), i.toDouble))
      .filter { case (k, _, _) => k != null }
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "t", "v")
    (left, right)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  for (seed <- Seq(1, 2, 3)) {
    test(s"merge == union+window on random data with nulls (seed=$seed)") {
      val (left, right) = randomSides(seed, 300, 200)
      val want = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
        .select("lid", "k", "t", "asof_v")
      val got = AsOfJoin.asOfMerge(left, right, "k", "t", Seq("v"))
        .select("lid", "k", "t", "asof_v")
      got.schema.fieldNames shouldBe want.schema.fieldNames
      canon(got) shouldBe canon(want)
      got.count() shouldBe left.count() // left-outer: every left row survives
    }
  }

  test("shared-lineage sides (self as-of) work and match the window form") {
    import spark.implicits._
    val ev = (0 until 400).map { i =>
      (i.toLong, (i % 17).toLong, (i * 7 % 500).toLong, if (i % 3 == 0) "a" else "b")
    }.toDF("id", "k", "t", "side")
    val l = ev.filter($"side" === "a").select($"id", $"k", $"t")
    val r = ev.filter($"side" === "b")
      .groupBy($"k", $"t").agg(max($"id").as("rid")) // tie-free
    val want = AsOfJoin.asOf(l, r, "k", "t", Seq("rid")).select("id", "asof_rid")
    val got = AsOfJoin.asOfMerge(l, r, "k", "t", Seq("rid")).select("id", "asof_rid")
    canon(got) shouldBe canon(want)
  }

  test("multiple carried columns, including one that is NULL on the matched row") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 10L, null.asInstanceOf[java.lang.Double], "x"),
                (1L, 15L, java.lang.Double.valueOf(2.0), "y"))
      .toDF("k", "t", "v", "tag")
    val got = AsOfJoin.asOfMerge(l, r, "k", "t", Seq("v", "tag"))
      .orderBy($"k", $"t").collect()
    // (1,10) matches the ts=10 row: v stays NULL (the matched ROW wins,
    // not the latest non-null value), tag = x
    got(0).isNullAt(2) shouldBe true
    got(0).getString(3) shouldBe "x"
    // (1,20) matches ts=15
    got(1).getDouble(2) shouldBe 2.0
    got(1).getString(3) shouldBe "y"
    // key 2 has no right rows
    got(2).isNullAt(2) shouldBe true
    got(2).isNullAt(3) shouldBe true
  }

  test("mismatched key or ts types are rejected loudly (no analyzer coercion on this path)") {
    import spark.implicits._
    val l = Seq((1, 10L)).toDF("k", "t") // int key
    val r = Seq((1L, 5L, 1.0)).toDF("k", "t", "v") // bigint key
    val ex = intercept[IllegalArgumentException] {
      AsOfJoin.asOfMerge(l, r, "k", "t", Seq("v"))
    }
    ex.getMessage should include("key types differ")
    val l2 = Seq((1L, 10)).toDF("k", "t") // int ts
    val ex2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfMerge(l2, r, "k", "t", Seq("v"))
    }
    ex2.getMessage should include("ts types differ")
  }

  test("a NULL-ts right row never masks later matches for its key") {
    import spark.implicits._
    // NULL ts sorts FIRST within the key group (Ascending NullsFirst): the
    // merge scan must skip it, not stall on it — r.ts <= l.ts is never true
    // for NULL, so semantically the row does not exist (declarative parity)
    val l = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
    val r = Seq((1L, null.asInstanceOf[java.lang.Long], 9.0),
                (1L, java.lang.Long.valueOf(5L), 1.0),
                (2L, null.asInstanceOf[java.lang.Long], 7.0))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOfMerge(l, r, "k", "t", Seq("v"))
      .orderBy($"k").collect()
    got(0).getDouble(2) shouldBe 1.0 // (1,10) matches ts=5, not blocked
    got(1).isNullAt(2) shouldBe true // key 2 has only the NULL-ts row
  }

  test("plans as AsOfMergeJoin: no WindowExec, no Union, two child sorts") {
    val (left, right) = randomSides(9, 500, 300)
    val df = AsOfJoin.asOfMerge(left, right, "k", "t", Seq("v"))
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val p = { val i = s.indexOf("== Initial Plan =="); if (i >= 0) s.substring(0, i) else s }
    withClue(p) {
      p should include("AsOfMergeJoin")
      p should not include "Window"
      p should not include "Union"
    }
  }

  test("pre-partitioned + pre-sorted inputs: EnsureRequirements adds NO exchange and NO sort") {
    val (left, right) = randomSides(21, 400, 300)
    val lp = left.repartition(col("k")).sortWithinPartitions(col("k"), col("t"))
    val rp = right.repartition(col("k")).sortWithinPartitions(col("k"), col("t"))
    val df = AsOfJoin.asOfMerge(lp, rp, "k", "t", Seq("v"))
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    val p = { val i = s.indexOf("== Initial Plan =="); if (i >= 0) s.substring(0, i) else s }
    withClue(p) {
      // exactly the two explicit repartition exchanges and two explicit
      // sorts — the operator's requirements are satisfied and elided
      // (alias-aware: the right side is renamed inside asOfMerge)
      "Exchange".r.findAllIn(p).size shouldBe 2
      "Sort \\[".r.findAllIn(p).size shouldBe 2
      p should include("AsOfMergeJoin")
    }
    // and the result still matches the window form
    canon(df.select("lid", "asof_v")) shouldBe
      canon(AsOfJoin.asOf(left, right, "k", "t", Seq("v")).select("lid", "asof_v"))
  }

  test("AQE coalesces both children consistently (asymmetric side sizes, many shuffle partitions)") {
    import spark.implicits._
    // zipPartitions requires equal partition counts; this pins that AQE's
    // CoalesceShufflePartitions treats the exec's two shuffles as ONE
    // coalesce group even when the sides' data volumes differ by 100x.
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "37")
      val left = spark.range(100000).select(
        (col("id") % 500).as("k"), (col("id") % 1000).as("t"), col("id").as("lid"))
      val right = spark.range(1000).select(
        (col("id") % 500).as("k"), (col("id") % 97).as("t"), (col("id") * 2).as("rid"))
        .groupBy("k", "t").agg(max("rid").as("rid"))
      val got = AsOfJoin.asOfMerge(left, right, "k", "t", Seq("rid"))
      got.count() shouldBe 100000
      // spot-check against the window form
      canon(got.select("lid", "asof_rid")) shouldBe
        canon(AsOfJoin.asOf(left, right, "k", "t", Seq("rid")).select("lid", "asof_rid"))
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("asOfMergeWithin == asOfWithin (staleness masking on the physical path)") {
    import spark.implicits._
    val (left, right) = randomSides(31, 250, 150)
    val want = AsOfJoin.asOfWithin(left, right, "k", "t", Seq("v"), lit(50L))
      .select("lid", "asof_v")
    val got = AsOfJoin.asOfMergeWithin(left, right, "k", "t", Seq("v"), lit(50L))
      .select("lid", "asof_v")
    canon(got) shouldBe canon(want)
  }

  test("empty right side: all matches NULL, all left rows kept") {
    import spark.implicits._
    val l = Seq((1L, 1L), (2L, 2L)).toDF("k", "t")
    val r = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    val got = AsOfJoin.asOfMerge(l, r, "k", "t", Seq("v"))
    got.count() shouldBe 2
    got.filter(col("asof_v").isNull).count() shouldBe 2
  }
}
