package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pure-function checks for the BPE trainer that back the q162/q163
  * oracle claims: greedy left-to-right application, overlap-counted pair
  * statistics, total-order tie-breaks, and trainer/encoder agreement. A
  * naive independently-written reference implementation cross-checks the
  * incremental one over seeded random dicts (the repo's randomized-rounds
  * style, seed logged in the test name). */
class BpeTrainSpec extends AnyFunSuite with Matchers {
  import BpeTrain._

  // --- independent reference implementations (different shapes on purpose)

  private def refApply(ps: List[String], a: String, b: String): List[String] = ps match {
    case x :: y :: rest if x == a && y == b => (a + b) :: refApply(rest, a, b)
    case x :: rest => x :: refApply(rest, a, b)
    case Nil => Nil
  }

  private def refTrain(dict: Seq[(String, Long)], k: Int): Vector[Merge] = {
    var segs = dict.map { case (w, c) => (toPieces(w).toList, c) }
    val out = Vector.newBuilder[Merge]
    var r = 1
    var stop = false
    while (r <= k && !stop) {
      val counts = segs.flatMap { case (ps, c) =>
        ps.zip(ps.drop(1)).map(p => (p, c))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), n) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }(BpeTrain.ArgmaxOrder)
        out += Merge(r, a, b, n)
        segs = segs.map { case (ps, c) => (refApply(ps, a, b), c) }
        r += 1
      }
    }
    out.result()
  }

  test("count-tied argmax breaks ties in UTF-8 byte order, not UTF-16 (oracle parity)") {
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞 U+1D11E, 4 UTF-8 bytes F0 9D 84 9E
    val pua = "" // U+F8FF, 3 UTF-8 bytes EF A3 BF — UTF-16 ranks it ABOVE the surrogate
    // JVM String order: clef (lead surrogate 0xD834) < pua (0xF8FF);
    // UTF-8 byte order (DuckDB, Spark UTF8String): pua (EF..) < clef (F0..)
    assert(clef < pua, "JVM order sanity")
    assert(BpeTrain.Utf8Order.compare(pua, clef) < 0, "UTF-8 order sanity")
    // two words with equal counts force a tie between (pua,pua) and (clef,clef):
    // the UTF-8 tie-break must choose the pua pair
    val merges = train(Seq(clef + clef -> 5L, pua + pua -> 5L), 1)
    merges.head.left shouldBe pua
    merges.head.right shouldBe pua
  }

  test("toPieces is codepoint-based (surrogate pairs stay whole)") {
    toPieces("ab") shouldBe Vector("a", "b")
    toPieces("") shouldBe Vector.empty
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, outside the BMP
    toPieces(s"a${clef}b") shouldBe Vector("a", clef, "b")
  }

  test("applyMerge is greedy left-to-right (the aaaa case)") {
    applyMerge(Vector("a", "a", "a", "a"), "a", "a") shouldBe Vector("aa", "aa")
    applyMerge(Vector("a", "a", "a"), "a", "a") shouldBe Vector("aa", "a")
    applyMerge(Vector("a", "b", "a", "b"), "a", "b") shouldBe Vector("ab", "ab")
    applyMerge(Vector("x"), "a", "b") shouldBe Vector("x")
    applyMerge(Vector.empty, "a", "b") shouldBe Vector.empty
  }

  test("pair counting includes overlapping positions, weighted by word count") {
    // "aaa" x 10: positions (1,2) and (2,3) both count -> (a,a) support 20.
    val m = train(Seq(("aaa", 10L)), 1)
    m should have size 1
    m.head shouldBe Merge(1, "a", "a", 20L)
  }

  test("tie-break is (count DESC, left ASC, right ASC)") {
    // "ab" and "ba" both appear 5 times; (a,b) < (b,a) lexicographically.
    val m = train(Seq(("ab", 5L), ("ba", 5L)), 1)
    m.head shouldBe Merge(1, "a", "b", 5L)
  }

  test("training stops early when no pair remains") {
    train(Seq(("ab", 3L)), 10).map(m => (m.left, m.right)) shouldBe Vector(("a", "b"))
    train(Seq(("x", 3L)), 10) shouldBe Vector.empty
  }

  test("classic Sennrich example learns es -> est -> lo ...") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = train(dict, 4).map(x => (x.left, x.right))
    // e+s appears in newest(6)+widest(3)=9, the max; then es+t (9); then l+o (7).
    m.take(3) shouldBe Vector(("e", "s"), ("es", "t"), ("l", "o"))
  }

  test("encode replays training segmentation for every dict word") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L), ("aaa", 4L))
    val merges = train(dict, 6)
    val pairs = merges.map(m => (m.left, m.right))
    // Re-run the trainer's segmentation evolution and compare with encode().
    var segs = dict.map { case (w, c) => (toPieces(w), c) }
    pairs.foreach { case (a, b) => segs = segs.map { case (ps, c) => (applyMerge(ps, a, b), c) } }
    dict.map(_._1).zip(segs.map(_._1)).foreach { case (w, expected) =>
      encode(w, pairs) shouldBe expected
    }
  }

  private def randomDict(rng: Random): Seq[(String, Long)] = {
    val n = 1 + rng.nextInt(12)
    Seq.fill(n) {
      val len = 1 + rng.nextInt(8)
      val w = Seq.fill(len)(('a' + rng.nextInt(3)).toChar).mkString
      (w, 1L + rng.nextInt(50))
    }.distinctBy(_._1)
  }

  test("randomized rounds: trainer matches the independent reference (seed=162, 200 rounds)") {
    val rng = new Random(162)
    (1 to 200).foreach { _ =>
      val dict = randomDict(rng)
      withClue(s"dict=$dict: ") { train(dict, 5) shouldBe refTrain(dict, 5) }
    }
  }

  test("randomized rounds: applyMerge matches the recursive reference (seed=163, 500 rounds)") {
    val rng = new Random(163)
    (1 to 500).foreach { _ =>
      val ps = Vector.fill(rng.nextInt(12))(Seq("a", "b", "ab")(rng.nextInt(3)))
      withClue(s"pieces=$ps: ") {
        applyMerge(ps, "a", "b") shouldBe refApply(ps.toList, "a", "b").toVector
        applyMerge(ps, "a", "a") shouldBe refApply(ps.toList, "a", "a").toVector
      }
    }
  }
}
