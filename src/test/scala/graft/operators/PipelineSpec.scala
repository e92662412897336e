package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.Hashing

/** Invariants of the deterministic corpus-shaping operators (sampling,
  * mixture, packing). The cross-engine value checks live in the oracle
  * queries (q45–q47, q56–q59); these pin the operator CONTRACTS:
  * determinism, exact strata sizes, whitelist semantics, packing math. */
class PipelineSpec extends SparkSpec with Matchers {

  private lazy val corpus = {
    import spark.implicits._
    (0 until 1000).map { i =>
      (i.toLong, s"src${i % 7}", s"lang${i % 3}", 10L + (i % 90))
    }.toDF("id", "source", "lang", "n_tok")
  }

  test("hashSample is deterministic and partitions with its complement") {
    val kept = Pipeline.hashSample(corpus, "id", keep = 512, bits = 10)
    val keptIds = kept.select("id").collect().map(_.getLong(0)).toSet
    // re-running selects the identical set
    Pipeline.hashSample(corpus, "id", keep = 512, bits = 10)
      .select("id").collect().map(_.getLong(0)).toSet shouldBe keptIds
    // complement = rows whose bucket >= keep; together they tile the corpus
    val comp = corpus.filter(Pipeline.hashBucket(col("id"), 10) >= 512)
      .select("id").collect().map(_.getLong(0)).toSet
    (keptIds & comp) shouldBe empty
    (keptIds ++ comp).size shouldBe 1000
    // ~50% rate: binomial(1000, 0.5) stays within 5 sigma of the mean
    keptIds.size.toDouble shouldBe 500.0 +- 80.0
  }

  test("hashSample bucket matches the JVM mix64 low bits") {
    val rows = corpus.select(col("id"), Pipeline.hashBucket(col("id"), 10).as("b"))
      .collect()
    rows.foreach { r =>
      val expect = Hashing.mix64(r.getLong(0), 0) & 1023L
      r.getLong(1) shouldBe expect
    }
  }

  test("temperatureMixture: k_i ∝ n_i^alpha scaled to target, capped at n_i, deterministic") {
    import spark.implicits._
    // deliberately skewed sources: 700 / 200 / 60 / 40
    val skewed = (0 until 1000).map { i =>
      val s = if (i < 700) "web" else if (i < 900) "books" else if (i < 960) "code" else "law"
      (i.toLong, s)
    }.toDF("id", "source")
    val out = Pipeline.temperatureMixture(skewed, "id", "source", alpha = 0.5, totalTarget = 300L)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Map("web" -> 700L, "books" -> 200L, "code" -> 60L, "law" -> 40L)
    val totW = n.toSeq.sortBy(_._1).map(c => math.pow(c._2.toDouble, 0.5)).sum
    n.foreach { case (s, ni) =>
      val expect = math.min(ni, math.floor(300.0 * math.pow(ni.toDouble, 0.5) / totW).toLong)
      kept(s) shouldBe expect
    }
    // flattening: keep RATE must rise as source size falls
    val rates = n.map { case (s, ni) => s -> kept(s).toDouble / ni }
    rates("law") should be > rates("code")
    rates("code") should be > rates("books")
    rates("books") should be > rates("web")
    // determinism under repartition
    Pipeline.temperatureMixture(skewed.repartition(13), "id", "source", 0.5, 300L)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe
      out.select("id").collect().map(_.getLong(0)).sorted
  }

  test("temperatureMixture alpha=1 recovers (floored) natural proportions") {
    val out = Pipeline.temperatureMixture(corpus, "id", "source", alpha = 1.0, totalTarget = 500L)
    // every source has ~143 of 1000 rows; alpha=1 keep ≈ 500/7 each
    val kept = out.groupBy("source").count().collect().map(_.getLong(1))
    kept.length shouldBe 7
    all(kept) should (be >= 70L and be <= 72L)
  }

  test("stratifiedExact keeps exactly ceil(n*num/den) rows per stratum") {
    import spark.implicits._
    // strata of deliberately awkward sizes: 7, 333, 660
    val df = ((0 until 7).map(i => (i.toLong, "tiny")) ++
      (100 until 433).map(i => (i.toLong, "mid")) ++
      (1000 until 1660).map(i => (i.toLong, "big"))).toDF("id", "s")
    val out = Pipeline.stratifiedExact(df, "id", Seq("s"), 1, 5)
    val sizes = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes shouldBe Map("tiny" -> 2L, "mid" -> 67L, "big" -> 132L) // ceil(n/5)
    // sample is a subset of the input, chosen by ascending mix64 order
    val keptTiny = out.filter($"s" === "tiny").select("id").collect().map(_.getLong(0)).toSet
    val expectTiny = (0 until 7).map(_.toLong).sortBy(id => (Hashing.mix64(id, 0), id)).take(2).toSet
    keptTiny shouldBe expectTiny
  }

  test("weightedMixture applies per-source rates and drops unlisted sources") {
    val rates = Map("src0" -> 1024, "src1" -> 0, "src2" -> 512) // src3..6 absent
    val out = Pipeline.weightedMixture(corpus, "id", "source", rates)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // full rate keeps every row of src0 (1000/7 rounded across ids 0,7,14..)
    bySource("src0") shouldBe corpus.filter(col("source") === "src0").count()
    bySource.get("src1") shouldBe None // rate 0
    bySource.keySet should contain noneOf ("src3", "src4")
    // half rate: every kept src2 row has bucket < 512, none above
    val src2 = out.filter(col("source") === "src2")
      .select(Pipeline.hashBucket(col("id"), 10)).collect().map(_.getLong(0))
    all(src2.toSeq) should be < 512L
  }

  test("packSequences reproduces the sequential concat-and-chunk scan") {
    import spark.implicits._
    val out = Pipeline.packSequences(
      corpus, "id", col("n_tok"), budget = 256, shardCols = Seq(col("lang")))
      .select("lang", "id", "n_tok", "pack_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._2).foreach { case (_, _, tok, packId) =>
        packId shouldBe cum / 256 // floor over the tokens BEFORE this row
        cum += tok
      }
    }
    // pack ids are dense from 0 within each shard
    out.groupBy(_._1).foreach { case (_, rows) =>
      val ids = rows.map(_._4).distinct.sorted
      ids shouldBe (0L until ids.length)
    }
  }

  test("packSequences gives an oversized row its own pack slot without derailing successors") {
    import spark.implicits._
    val df = Seq(
      (1L, 100L), (2L, 999L), (3L, 50L), (4L, 50L)
    ).toDF("id", "n_tok").withColumn("g", lit(1))
    val packs = Pipeline.packSequences(df, "id", col("n_tok"), 256, Seq(col("g")))
      .select("id", "pack_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    packs shouldBe Map(1L -> 0L, 2L -> 0L, 3L -> 4L, 4L -> 4L)
  }
}
