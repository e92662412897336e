package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Int8 quantization invariants: code range, the scale/2 reconstruction
  * error bound, constant-vector degeneracy, and ranking fidelity on
  * well-separated clusters. Cross-engine value equality is q65's oracle. */
class QuantizeSpec extends SparkSpec with Matchers {

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (0 until 200).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 10f - 5f))
    }.toDF("vec_id", "embedding")
  }

  test("codes stay in [0,255] and reconstruction error is bounded by scale/2") {
    import spark.implicits._
    val q = Quantize.quantizeInt8(vecs, "embedding")
      .withColumn("deq", Quantize.dequantize(col("q8_min"), col("q8_scale"), col("q8")))
    val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    q.collect().foreach { r =>
      val id = r.getLong(r.fieldIndex("vec_id"))
      val scale = r.getDouble(r.fieldIndex("q8_scale"))
      val codes = r.getSeq[Long](r.fieldIndex("q8"))
      val deq = r.getSeq[Double](r.fieldIndex("deq"))
      codes.foreach(c => c should (be >= 0L and be <= 255L))
      deq.zip(orig(id)).foreach { case (d, o) =>
        math.abs(d - o.toDouble) should be <= (scale / 2 + 1e-9)
      }
    }
  }

  test("constant vectors quantize to scale 0 / zero codes and reconstruct exactly") {
    import spark.implicits._
    val const = Seq((1L, Array(2.5f, 2.5f, 2.5f))).toDF("vec_id", "embedding")
    val r = Quantize.quantizeInt8(const, "embedding")
      .withColumn("deq", Quantize.dequantize(col("q8_min"), col("q8_scale"), col("q8")))
      .collect()(0)
    r.getDouble(r.fieldIndex("q8_scale")) shouldBe 0.0
    r.getSeq[Long](r.fieldIndex("q8")) shouldBe Seq(0L, 0L, 0L)
    r.getSeq[Double](r.fieldIndex("deq")) shouldBe Seq(2.5, 2.5, 2.5)
  }

  test("quantized kNN preserves neighbors of well-separated clusters") {
    import spark.implicits._
    // two tight clusters far apart: quantization noise (~scale/2 per dim)
    // must not flip any cross-cluster ranking
    val rnd = new scala.util.Random(11)
    def around(center: Float) = Array.fill(16)(center + rnd.nextFloat() * 0.1f)
    val df = ((0 until 20).map(i => (i.toLong, around(5f))) ++
      (100 until 120).map(i => (i.toLong, around(-5f)))).toDF("vec_id", "embedding")
    val corpus = Quantize.quantizeInt8(df, "embedding")
      .select(col("vec_id"),
        Quantize.dequantize(col("q8_min"), col("q8_scale"), col("q8")).as("embedding"))
    val top = Similarity.knnBruteForce(corpus, df.filter($"vec_id" === 0L), "vec_id", "embedding", k = 10)
      .select("neighbor_id").collect().map(_.getLong(0))
    all(top.toSeq) should be < 100L // every neighbor from the same cluster
  }
}
