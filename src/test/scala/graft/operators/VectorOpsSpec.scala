package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.Hashing

/** Standardization moments/guards and the JL projection against an exact
  * driver-side replay of the ordered fold + mix64 sign matrix. */
class VectorOpsSpec extends SparkSpec with Matchers {

  private def randomVecs(n: Int, d: Int, seed: Long): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(id => (id, Array.fill(d)(rnd.nextFloat() * 4f - 2f)))
  }

  test("standardize: z-scores have ~zero mean and ~unit variance per dim") {
    import spark.implicits._
    val d = 8
    val vecs = randomVecs(200, d, 42L)
    val out = VectorOps.standardize(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect().map(r => (r.getInt(1), r.getDouble(2)))
    out.length shouldBe 200 * d
    out.groupBy(_._1).foreach { case (_, zs) =>
      val m = zs.map(_._2).sum / zs.length
      val v = zs.map(z => (z._2 - m) * (z._2 - m)).sum / zs.length
      math.abs(m) should be < 1e-6 // rounding to 6 dp is the only slack
      math.abs(v - 1.0) should be < 1e-4
    }
  }

  test("standardize: a zero-variance dimension yields NULL z, not a crash") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1.0f, 5.0f)),
      (2L, Array(2.0f, 5.0f)),
      (3L, Array(3.0f, 5.0f)))
    val out = VectorOps.standardize(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .collect()
    out.filter(_.getInt(1) == 1).forall(_.isNullAt(2)) shouldBe true
    out.filter(_.getInt(1) == 0).forall(!_.isNullAt(2)) shouldBe true
  }

  test("jlProject matches the driver-side ordered-fold replay exactly") {
    import spark.implicits._
    val d = 16; val k = 5
    val vecs = randomVecs(50, d, 7L)
    val expected = (for ((id, v) <- vecs; j <- 0 until k) yield {
      var acc = 0.0
      var i = 0
      while (i < d) {
        val s = if (Hashing.mix64(i.toLong, j) < 0) -1.0 else 1.0
        acc += v(i).toDouble * s
        i += 1
      }
      ((id, j), BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toMap
    val got = VectorOps.jlProject(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", d, k)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    got shouldBe expected
  }

  test("jlProject drops vectors whose length differs from the declared dim") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
    val got = VectorOps.jlProject(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 2, k = 3)
    got.select("vec_id").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }
}
