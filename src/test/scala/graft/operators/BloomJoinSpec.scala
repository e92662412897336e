package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.Bloom

/** Bloom-filter join reduction invariants: zero false negatives (the
  * semantic guarantee the q67 oracle leans on), a sane false-positive rate
  * at the chosen sizing, and prefilter+join == plain join. */
class BloomJoinSpec extends SparkSpec with Matchers {

  private val mBits = 1 << 14
  private val k = 5

  test("every build key passes the probe (no false negatives)") {
    import spark.implicits._
    val keys = (0L until 1000L).map(_ * 37 + 11).toDF("key")
    val words = BloomJoin.buildFilter(keys, col("key"), mBits, k)
    val misses = BloomJoin.prefilter(keys, col("key"), words, mBits, k).count()
    misses shouldBe 1000L
  }

  test("false-positive rate is small at ~16 bits/key") {
    import spark.implicits._
    val keys = (0L until 1000L).toDF("key")
    val words = BloomJoin.buildFilter(keys, col("key"), mBits, k)
    val probes = (100000L until 110000L).toDF("key") // disjoint from build keys
    val fp = BloomJoin.prefilter(probes, col("key"), words, mBits, k).count()
    fp.toDouble / 10000 should be < 0.02 // theory ~0.5% at m/n=16.4, k=5
  }

  test("prefilter + join result-identical to the bare join") {
    import spark.implicits._
    val dim = (0L until 200L).filter(_ % 3 == 0).toDF("key")
    val fact = (0L until 5000L).map(i => (i % 211, i)).toDF("key", "v")
    val words = BloomJoin.buildFilter(dim, col("key"), mBits, k)
    val bare = fact.join(dim, "key").agg(count(lit(1)), sum($"v")).head()
    val pre = BloomJoin.prefilter(fact, col("key"), words, mBits, k)
      .join(dim, "key").agg(count(lit(1)), sum($"v")).head()
    pre shouldBe bare
  }

  test("NULL keys set no bits on build and drop on probe") {
    import spark.implicits._
    val keys = Seq(Some(1L), None, Some(2L)).toDF("key")
    val words = BloomJoin.buildFilter(keys, col("key"), mBits, k) // no NPE
    val kept = BloomJoin.prefilter(keys, col("key"), words, mBits, k)
      .collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 2L)
  }

  test("probe expression agrees with the JVM helper and rejects bad sizing") {
    val words = new Array[Long](mBits / 64)
    // set the bits of key 42 by hand via the shared hash family
    (0 until k).foreach { j =>
      val pos = java.lang.Math.floorMod(graft.functions.Hashing.mix64(42L, j), mBits.toLong).toInt
      words(pos >>> 6) |= 1L << (pos & 63)
    }
    Bloom.mightContain(words, mBits, k, 42L) shouldBe true
    an[IllegalArgumentException] should be thrownBy
      BloomJoin.buildFilter(null, col("key"), mBits = 100, k = k) // not a mult of 64
  }
}
