package graft.operators

import scala.util.Random

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The property the q164 oracle gate rests on: the SpaceSaving candidate
  * union NEVER omits a true heavy hitter (the omission bound), under
  * adversarial orderings, heavy eviction churn, and skewed partitioning.
  * The exact pass is then verified end-to-end against a brute-force
  * count. */
class HeavyHittersSpec extends SparkSpec with Matchers {

  private def bruteHH(words: Seq[String], k: Int): Set[String] = {
    val n = words.size.toLong
    words.groupBy(identity).collect { case (w, ws) if ws.size.toLong * k > n => w }.toSet
  }

  test("partition summary tracks at most capacity items and never loses a >n/cap item") {
    val rng = new Random(164)
    (1 to 50).foreach { _ =>
      // Zipf-ish stream: few hot items + a long tail, shuffled.
      val hot = (1 to 5).flatMap(i => Seq.fill(200 / i)(s"hot$i"))
      val tail = (1 to 300).map(i => s"t${rng.nextInt(1000)}")
      val stream = rng.shuffle(hot ++ tail)
      val cap = 20
      val tracked = HeavyHitters.spaceSavingPartition(stream.iterator, cap).toSet
      tracked.size should be <= cap
      val n = stream.size
      val counts = stream.groupBy(identity).view.mapValues(_.size).toMap
      counts.foreach { case (w, c) =>
        if (c.toLong * cap > n) withClue(s"item $w count $c of $n: ") {
          tracked should contain(w)
        }
      }
    }
  }

  test("heap compaction path: long streams with constant churn stay correct") {
    // 50k arrivals into capacity 8 forces thousands of evictions and many
    // heap rebuilds; the omission bound must still hold.
    val rng = new Random(41)
    val stream = Seq.fill(50000)(s"w${rng.nextInt(5000)}") ++ Seq.fill(10000)("anchor")
    val tracked = HeavyHitters.spaceSavingPartition(rng.shuffle(stream).iterator, 8).toSet
    tracked.size should be <= 8
    tracked should contain("anchor") // 10000/60000 >> 1/8
  }

  test("exact() equals brute force on a skewed corpus across partitionings") {
    import spark.implicits._
    val rng = new Random(7)
    val words = (1 to 8).flatMap(i => Seq.fill(1 << (12 - i))(s"h$i")) ++
      (1 to 4000).map(_ => s"r${rng.nextInt(3000)}")
    val expected = bruteHH(words, 50)
    Seq(1, 3, 32).foreach { parts =>
      val ds = spark.createDataset(rng.shuffle(words)).repartition(parts).as[String]
      val got = HeavyHitters.exact(ds, k = 50, capacity = 200)
        .collect().map(_.getString(0)).toSet
      withClue(s"parts=$parts: ") { got shouldBe expected }
    }
  }

  test("capacity must exceed k") {
    import spark.implicits._
    val ds = spark.createDataset(Seq("a", "b")).as[String]
    an[IllegalArgumentException] should be thrownBy
      HeavyHitters.exact(ds, k = 10, capacity = 10)
  }
}
