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
    val out = VectorOps.standardize(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        SumMode.ExactFold)
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
    val out = VectorOps.standardize(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        SumMode.ExactFold)
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

  test("powerIteration matches a driver-side replay with identical fold orders") {
    import spark.implicits._
    val d = 6
    val vecs = randomVecs(80, d, 11L)
    // replay: same ordered folds (by id / by dim), same start, 3 iterations
    val byId = vecs.sortBy(_._1)
    val means = Array.tabulate(d) { j =>
      byId.map(_._2(j).toDouble).foldLeft(0.0)(_ + _) / byId.length
    }
    val xc = byId.map { case (id, v) => (id, Array.tabulate(d)(j => v(j).toDouble - means(j))) }
    var vv = Array.fill(d)(0.125)
    var nrm = 0.0
    for (_ <- 1 to 3) {
      val s = xc.map { case (id, r) =>
        (id, (0 until d).foldLeft(0.0)((a, j) => a + r(j) * vv(j)))
      }.toMap
      val u = Array.tabulate(d) { j =>
        xc.foldLeft(0.0) { case (a, (id, r)) => a + s(id) * r(j) }
      }
      nrm = math.sqrt((0 until d).foldLeft(0.0)((a, j) => a + u(j) * u(j)))
      vv = u.map(_ / nrm)
    }
    val expected = (0 until d).map(j => (j,
      BigDecimal(vv(j)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap

    val got = VectorOps.powerIteration(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        sumMode = SumMode.ExactFold)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    got.map(r => (r._1, r._2)).toMap shouldBe expected
    got.map(_._3).distinct.length shouldBe 1
    got.head._3 shouldBe BigDecimal(nrm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("powerIteration recovers a planted dominant direction") {
    import spark.implicits._
    val rnd = new scala.util.Random(5L)
    val d = 8
    // variance 100x along dim 2, noise elsewhere
    val vecs = (1L to 300L).map { id =>
      val v = Array.fill(d)(rnd.nextFloat() * 0.1f - 0.05f)
      v(2) = rnd.nextFloat() * 10f - 5f
      (id, v)
    }
    val out = VectorOps.powerIteration(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        sumMode = SumMode.ExactFold)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    math.abs(out(2)) should be > 0.99
    (0 until d).filter(_ != 2).foreach(j => math.abs(out(j)) should be < 0.15)
  }

  test("topTwoComponents: unit, orthogonal, lambda-ordered; planted dirs found") {
    import spark.implicits._
    val rnd = new scala.util.Random(17L)
    val d = 8
    // dominant variance on dim 2, second on dim 5, noise elsewhere
    val vecs = (1L to 250L).map { id =>
      val v = Array.fill(d)(rnd.nextFloat() * 0.1f - 0.05f)
      v(2) = rnd.nextFloat() * 10f - 5f
      v(5) = rnd.nextFloat() * 4f - 2f
      (id, v)
    }
    val out = VectorOps.topTwoComponents(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", sumMode = SumMode.ExactFold)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    val pc1 = out.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val pc2 = out.filter(_._1 == 2).sortBy(_._2).map(_._3)
    val l1 = out.find(_._1 == 1).get._4
    val l2 = out.find(_._1 == 2).get._4
    math.abs(pc1.map(x => x * x).sum - 1.0) should be < 1e-4
    math.abs(pc2.map(x => x * x).sum - 1.0) should be < 1e-4
    math.abs(pc1.zip(pc2).map { case (a, b) => a * b }.sum) should be < 1e-3
    l1 should be > l2
    math.abs(pc1(2)) should be > 0.99
    math.abs(pc2(5)) should be > 0.99
  }

  test("jlProject drops vectors whose length differs from the declared dim") {
    import spark.implicits._
    val vecs = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
    val got = VectorOps.jlProject(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
      dim = 2, k = 3)
    got.select("vec_id").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
  }
}
