package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SimilaritySpec extends SparkSpec with Matchers {

  private val dim = 32

  /** Planted-cluster corpus: 10 base directions, 10 small-noise variants
    * each (pairwise cos ≈ 0.99 within a cluster), plus 100 random vectors. */
  private lazy val corpus = {
    import spark.implicits._
    val rng = new Random(7)
    def randVec(): Array[Float] = Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat)
    val clustered = (0 until 10).flatMap { c =>
      val base = randVec()
      (0 until 10).map { v =>
        val noisy = base.map(x => x + (rng.nextDouble() * 0.1 - 0.05).toFloat)
        (c * 10 + v, noisy, c)
      }
    }
    val noise = (100 until 200).map(i => (i + 100, randVec(), -1))
    (clustered ++ noise).toDF("vec_id", "embedding", "cluster")
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0, opposite -1.0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 0f), Array(-1f, 0f)),
      (Array(3f, 4f), Array(3f, 4f))).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b")).collect().map(_.getDouble(0))
    out(0) shouldBe 1.0
    out(1) shouldBe 0.0
    out(2) shouldBe -1.0
    out(3) shouldBe 1.0 +- 1e-12
  }

  test("brute-force kNN ranks same-cluster vectors first") {
    val queries = corpus.filter(col("vec_id").isin(0, 10, 20))
    val out = Similarity.knnBruteForce(corpus, queries, "vec_id", "embedding", k = 9).collect()
    out.length shouldBe 27
    // every top-9 neighbor of query c*10 is from cluster c (ids c*10..c*10+9)
    out.foreach { r =>
      val q = r.getAs[Number]("query_id").longValue
      val n = r.getAs[Number]("neighbor_id").longValue
      n / 10 shouldBe q / 10
    }
  }

  private def pairOf(r: org.apache.spark.sql.Row): (Long, Long) =
    (r.getAs[Number]("query_id").longValue, r.getAs[Number]("neighbor_id").longValue)

  test("SRP-LSH kNN achieves high recall on clustered data") {
    val queries = corpus.filter(col("vec_id") < 30 && col("vec_id") % 10 === 0)
    val exact = Similarity.knnBruteForce(corpus, queries, "vec_id", "embedding", k = 9)
      .collect().map(pairOf).toSet
    val approx = Similarity.knnApproxLsh(corpus, queries, "vec_id", "embedding",
        k = 9, dim = dim, tables = 16, planes = 8)
      .collect().map(pairOf).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.9
  }

  test("IVF kNN achieves high recall on clustered data") {
    val queries = corpus.filter(col("vec_id") < 30 && col("vec_id") % 10 === 0)
    val exact = Similarity.knnBruteForce(corpus, queries, "vec_id", "embedding", k = 9)
      .collect().map(pairOf).toSet
    val approx = Similarity.knnApproxIvf(corpus, queries, "vec_id", "embedding",
        k = 9, nlist = 16, nprobe = 4)
      .collect().map(pairOf).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    recall should be >= 0.9
  }

  test("k-means refinement keeps recall and is usable with fewer probes") {
    val queries = corpus.filter(col("vec_id") < 30 && col("vec_id") % 10 === 0)
    val exact = Similarity.knnBruteForce(corpus, queries, "vec_id", "embedding", k = 9)
      .collect().map(pairOf).toSet
    // refined centroids adapt cells to the planted clusters: same probe
    // budget must stay at high recall after 2 Lloyd rounds
    val refined = Similarity.knnApproxIvf(corpus, queries, "vec_id", "embedding",
        k = 9, nlist = 16, nprobe = 4, kmeansIters = 2)
      .collect().map(pairOf).toSet
    val recall = (exact & refined).size.toDouble / exact.size
    recall should be >= 0.9
  }

  test("IVF Lloyd refinement plans relationally: no object operators, no per-group collect") {
    // the unified KMeans-path refinement (r11 verdict item): codegen'd
    // cosine folds against centroid literals + a plain partial-agg mean —
    // a mapPartitions/UDAF round would show as MapPartitions /
    // DeserializeToObject / ObjectHashAggregate in the executed plan
    val cents = corpus.orderBy("vec_id").limit(4)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val rows = corpus.select(col("vec_id").cast("long").as("id"),
      col("embedding").cast("array<float>").as("vec"))
    val df = Similarity.refineCells(rows, cents)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    withClue(p) {
      p should not include "MapPartitions"
      p should not include "DeserializeToObject"
      p should not include "ObjectHashAggregate"
      p should not include "collect_list"
      p should include("HashAggregate")
    }
  }

  test("SRP buckets: expression form and JVM fast path agree, deterministically") {
    import spark.implicits._
    val exprBuckets = corpus.orderBy("vec_id")
      .select(Similarity.srpBuckets(col("embedding"), 4, 8, dim)).collect()
      .map(_.getSeq[Long](0))
    val mat = Similarity.hyperplaneMatrix(4, 8, dim)
    val jvmBuckets = corpus.orderBy("vec_id")
      .select(col("embedding")).as[Array[Float]].collect()
      .map(v => Similarity.srpBucketsOf(v, 4, 8, dim, mat).toSeq)
    exprBuckets should contain theSameElementsInOrderAs jvmBuckets
  }

  test("near-dup pairs finds exactly the planted clusters at high threshold") {
    val pairs = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95).collect()
    pairs.length should be >= 400 // 10 clusters x C(10,2)=45 minus noise-edge cases
    pairs.foreach { r =>
      r.getAs[Int]("id_a") / 10 shouldBe r.getAs[Int]("id_b") / 10
    }
  }

  test("bucketed near-dups ⊇ exact pairs on planted clusters (scale path recall)") {
    val exact = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getAs[Int]("id_a").toLong, r.getAs[Int]("id_b").toLong)).toSet
    val bucketed = Similarity.cosineNearDupsBucketed(corpus, "vec_id", "embedding", 0.95,
        dim = dim, tables = 16, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    // in-cluster cosines ≈ 0.99 → miss probability per pair < 1e-8 with 16x4
    (exact -- bucketed) shouldBe empty
    // verification step: no false positives either
    bucketed.foreach { case (a, b) => a / 10 shouldBe b / 10 }
  }

  test("all-identical adversary: hot bucket is count-dropped before any collect_list") {
    import spark.implicits._
    // Every vector identical → every (table, bucket) holds the whole corpus.
    // The cap must fire on COUNTS, before any id array is materialized in a
    // single aggregation buffer (see Dedup.cappedBuckets).
    val same = (0L until 50L).map(i => (i, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val capped = Similarity.cosineNearDupsBucketed(same, "vec_id", "embedding", 0.9,
      dim = 8, tables = 4, planes = 3, bucketCap = 10)
    capped.count() shouldBe 0L
    val plan = capped.queryExecution.executedPlan.toString
    withClue(plan) {
      // r19: the count guard is a window over the bucket key below the
      // collect aggregate (see Dedup.cappedBuckets)
      plan.indexOf("collect_list") should be < plan.indexOf("Window")
    }
    // cap at corpus size: every identical pair comes out, cosine 1.0
    Similarity.cosineNearDupsBucketed(same, "vec_id", "embedding", 0.9999,
      dim = 8, tables = 4, planes = 3, bucketCap = 50)
      .count() shouldBe 50L * 49 / 2
  }

  test("autoPlanesOccupancy keeps recall on planted clusters while shrinking buckets") {
    // the sf1 rehearsal finding: fixed planes → occupancy (and pair cost)
    // grows n²/2^planes. With the auto knob, planes rise to
    // ceil(log2(n/occupancy)): for n=200, occupancy=8 → planes 5 (> the
    // base 4), and in-cluster pairs (cos ≈ 0.99) must still all surface.
    val exact = Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getAs[Int]("id_a").toLong, r.getAs[Int]("id_b").toLong)).toSet
    val auto = Similarity.cosineNearDupsBucketed(corpus, "vec_id", "embedding", 0.95,
        dim = dim, tables = 16, planes = 4, autoPlanesOccupancy = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    (exact -- auto) shouldBe empty
    auto.foreach { case (a, b) => a / 10 shouldBe b / 10 }
  }

  test("quadratic kernels enforce the bounded-input contract") {
    an[IllegalArgumentException] should be thrownBy
      Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding", 0.95, maxInput = 10)
  }

  test("PQ-ADC kNN keeps high recall vs exact kNN on clustered data") {
    val queries = corpus.filter(col("vec_id") < 30 && col("vec_id") % 10 === 0)
    val exact = Similarity.knnBruteForce(corpus, queries, "vec_id", "embedding", k = 9)
      .collect().map(pairOf).toSet
    val pq = Similarity.knnProductQuantized(corpus, queries, "vec_id", "embedding",
        k = 9, m = 8, ksub = 16)
      .collect().map(pairOf).toSet
    // 8-byte codes vs 128-byte vectors: lossy by design, but planted
    // clusters (in-cluster cos ≈ 0.99) must survive the quantization
    val recall = (exact & pq).size.toDouble / exact.size
    recall should be >= 0.7
  }

  test("PQ ranks are deterministic and distances non-negative ascending per query") {
    val queries = corpus.filter(col("vec_id") === 0)
    val rows = Similarity.knnProductQuantized(corpus, queries, "vec_id", "embedding",
        k = 5, m = 8, ksub = 16)
      .orderBy(col("rank")).collect()
    rows.map(_.getAs[Int]("rank")).toSeq shouldBe (1 to 5)
    val dists = rows.map(_.getAs[Double]("adist"))
    all(dists) should be >= 0.0
    dists.toSeq shouldBe dists.sorted.toSeq
  }

  test("IVF-PQ kNN keeps high recall on clustered data (residual codes + probed cells)") {
    val queries = corpus.filter(col("vec_id") < 30 && col("vec_id") % 10 === 0)
    val exact = Similarity.knnBruteForce(corpus, queries, "vec_id", "embedding", k = 9)
      .collect().map(pairOf).toSet
    val ivfpq = Similarity.knnIvfPq(corpus, queries, "vec_id", "embedding",
        k = 9, nlist = 16, nprobe = 8, m = 8, ksub = 16)
      .collect().map(pairOf).toSet
    // two lossy stages compose (cell restriction × residual codes); the
    // planted clusters (cos ≈ 0.99 in-cluster) must still dominate
    val recall = (exact & ivfpq).size.toDouble / exact.size
    recall should be >= 0.7
  }

  test("cosineContamination: planted-cluster members score ~1 vs their base, noise stays low") {
    // benchmark = the first vector of each planted cluster; corpus = the rest
    val bench = corpus.filter(col("vec_id") % 10 === 0 && col("cluster") >= 0)
    val rest = corpus.filter(!(col("vec_id") % 10 === 0 && col("cluster") >= 0))
    val scored = Similarity.cosineContamination(rest, bench, "vec_id", "embedding")
      .collect().map(r => r.getAs[Number]("id").longValue -> r.getAs[Double]("max_cos")).toMap
    scored.size shouldBe rest.count()
    // same-cluster variants sit within small noise of their benchmark base
    (0 until 10).flatMap(c => (1 until 10).map(v => c * 10L + v)).foreach { id =>
      scored(id) should be > 0.98
    }
    // random noise vectors never approach a benchmark direction
    (200L until 300L).foreach { id => scored(id) should be < 0.9 }
    // exact self-duplicate scores 1 up to the sqrt rounding of dot/(|v|·|v|)
    val dup = corpus.filter(col("vec_id") === 0).withColumn("vec_id", lit(999L))
    val one = Similarity.cosineContamination(dup, bench, "vec_id", "embedding")
      .collect().head.getAs[Double]("max_cos")
    one shouldBe 1.0 +- 1e-12
  }

  test("hardNegatives: never returns a same-label neighbor, equals kNN over the filtered corpus") {
    // corpus has cluster labels (-1 for noise); use cluster as the label
    val queries = corpus.filter(col("vec_id").isin(0, 10, 20))
    val got = Similarity.hardNegatives(corpus, queries, "vec_id", "embedding", "cluster", k = 5)
      .collect()
    got.length shouldBe 15
    val labelOf = corpus.select(col("vec_id").cast("long"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    got.foreach { r =>
      val q = r.getAs[Number]("query_id").longValue
      val n = r.getAs[Number]("neighbor_id").longValue
      labelOf(n) should not be labelOf(q)
    }
    // equivalent formulation: brute-force kNN over a pre-filtered corpus
    queries.collect().map(_.getAs[Number]("vec_id").longValue).foreach { qid =>
      val want = Similarity.knnBruteForce(
          corpus.filter(col("cluster") =!= labelOf(qid)),
          queries.filter(col("vec_id") === qid), "vec_id", "embedding", k = 5)
        .collect().map(r => (r.getAs[Number]("neighbor_id").longValue,
          r.getAs[Double]("cosine"))).toSet
      val have = got.filter(_.getAs[Number]("query_id").longValue == qid)
        .map(r => (r.getAs[Number]("neighbor_id").longValue,
          r.getAs[Double]("cosine"))).toSet
      have shouldBe want
    }
  }

  test("zero-norm and NULL vectors neither crash kNN (ANSI divide) nor rank as neighbors") {
    import spark.implicits._
    val zeroed = corpus.union(Seq(
      (900, Array.fill(dim)(0f), -1),                       // zero norm: cos undefined
      (901, null.asInstanceOf[Array[Float]], -1)).toDF("vec_id", "embedding", "cluster"))
    val queries = corpus.filter(col("vec_id") === 0)
    val out = Similarity.knnBruteForce(zeroed, queries, "vec_id", "embedding", k = 9).collect()
    out.length shouldBe 9
    out.map(_.getAs[Number]("neighbor_id").longValue) should contain noneOf (900L, 901L)
    // a zero-norm QUERY yields no neighbors at all (every cosine undefined)
    val zq = Seq((902, Array.fill(dim)(0f), -1)).toDF("vec_id", "embedding", "cluster")
    Similarity.knnBruteForce(corpus, zq, "vec_id", "embedding", k = 3).count() shouldBe 0L
    // contamination: the zero-norm doc keeps its row, max_cos NULL
    val scored = Similarity.cosineContamination(
      zq, corpus.limit(5), "vec_id", "embedding").collect()
    scored.length shouldBe 1
    scored.head.isNullAt(1) shouldBe true
  }

  test("PQ rejects a dim not divisible into m subspaces") {
    an[IllegalArgumentException] should be thrownBy
      Similarity.knnProductQuantized(corpus, corpus.limit(1), "vec_id", "embedding",
        k = 3, m = 7, ksub = 8).collect()
  }
}
