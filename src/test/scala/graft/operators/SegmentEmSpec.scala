package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The Viterbi DP against brute-force enumeration of every segmentation
  * (the oracle's form), totality, and the EM round mechanics. */
class SegmentEmSpec extends SparkSpec with Matchers {

  private val maxLen = 4

  /** All segmentations as (ntok, prod, path); multi-char pieces need a
    * positive score, single chars floor at 1 — the operator's contract. */
  private def enumerate(
      word: String, scores: Map[String, Long]): Seq[(Int, BigInt, String)] = {
    if (word.isEmpty) return Seq((0, BigInt(1), ""))
    (1 to math.min(maxLen, word.length)).flatMap { l =>
      val p = word.substring(0, l)
      val s = if (l == 1) math.max(scores.getOrElse(p, 0L), 1L)
              else scores.getOrElse(p, 0L)
      if (s <= 0) Seq.empty
      else enumerate(word.substring(l), scores).map { case (n, prod, path) =>
        (n + 1, prod * s, SegmentEm.Sep + p + path)
      }
    }
  }

  private def bestOf(cands: Seq[(Int, BigInt, String)]): (Int, BigInt, String) =
    cands.reduceLeft { (a, b) =>
      val better =
        b._1 < a._1 || (b._1 == a._1 &&
          (b._2 > a._2 || (b._2 == a._2 && b._3 < a._3)))
      if (better) b else a
    }

  test("viterbi DP equals enumeration argmax on random words and scores") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abc"
    for (trial <- 1 to 2000) {
      val word = Array.fill(rnd.nextInt(10))(alphabet(rnd.nextInt(alphabet.length))).mkString
      // random score map over random substrings (some zero/absent)
      val scores = (for (_ <- 0 until rnd.nextInt(12)) yield {
        val l = 1 + rnd.nextInt(maxLen)
        val p = Array.fill(l)(alphabet(rnd.nextInt(alphabet.length))).mkString
        p -> rnd.nextInt(50).toLong
      }).toMap
      val got = SegmentEm.viterbi(word, scores, maxLen)
      val want = bestOf(enumerate(word, scores))._3
        .split(SegmentEm.Sep).toList.filter(_.nonEmpty)
      withClue(s"trial=$trial word=$word scores=$scores: ") { got shouldBe want }
    }
  }

  test("segmentation is total: empty scores fall back to single chars") {
    SegmentEm.viterbi("abc", Map.empty, maxLen) shouldBe List("a", "b", "c")
    SegmentEm.viterbi("", Map("ab" -> 5L), maxLen) shouldBe Nil
  }

  test("fewest-pieces wins; count product breaks ties among minimal splits") {
    // "abcd": one 4-piece beats any 2x2 split
    SegmentEm.viterbi("abcd", Map("abcd" -> 1L, "ab" -> 99L, "cd" -> 99L), maxLen) shouldBe
      List("abcd")
    // two 2+2 splits of "abab": ("ab","ab") prod 9 vs ("a","bab")-style needs
    // 2 pieces too — "aba"+"b" prod 5*1=5 < 9
    SegmentEm.viterbi("abab", Map("ab" -> 3L, "aba" -> 5L), maxLen) shouldBe
      List("ab", "ab")
  }

  test("train runs two EM rounds and prunes unused pieces") {
    import spark.implicits._
    val docs = Seq.fill(6)("joinhash joinhash merge").toDF("text")
    val out = SegmentEm.train(docs, "text", maxLen = 4, rounds = 2,
      minSeedCount = 2, topK = 40).collect()
    val pieces = out.map(_.getString(1)).toSet
    // minimal segmentations of the two words under 4-char pieces
    pieces should contain allOf ("join", "hash", "merg", "e")
    // ranks are 1..n with counts non-increasing
    out.map(_.getInt(0)).toSeq shouldBe (1 to out.length)
    val cnts = out.map(_.getLong(2)).toSeq
    cnts.zip(cnts.drop(1)).foreach { case (a, b) => a should be >= b }
  }

  test("utf8Less ranks by UTF-8 bytes where Java String order diverges") {
    // U+1F600 (surrogate pair D83D DE00; UTF-8 F0 9F 98 80) vs U+E000
    // (UTF-8 EE 80 80): Java compareTo says the emoji sorts FIRST
    // (0xD83D < 0xE000), the engines' binary collation says it sorts LAST
    // (0xF0 > 0xEE) — the tie-break must follow the engines.
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    emoji.compareTo(pua) should be < 0 // the divergence this guards against
    SegmentEm.utf8Less(pua, emoji) shouldBe true
    SegmentEm.utf8Less(emoji, pua) shouldBe false
    // agreement on the common case: ASCII + prefix rule
    SegmentEm.utf8Less("ab", "b") shouldBe true
    SegmentEm.utf8Less("ab", "abc") shouldBe true
    SegmentEm.utf8Less("abc", "ab") shouldBe false
    SegmentEm.utf8Less("ab", "ab") shouldBe false
  }
}
