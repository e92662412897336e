package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Greedy maximal-munch properties (lossless, in-vocab, maximal) plus a
  * full-lane check of fertilityByGroup against a driver-side replay of the
  * same vocabulary derivation and encode. */
class WordpieceSpec extends SparkSpec with Matchers {

  private val maxLen = 4

  test("encode is lossless, in-vocab, and maximal on random words") {
    val rnd = new scala.util.Random(99L)
    val alphabet = "abcde"
    val grams = (for (_ <- 1 to 40) yield {
      val l = 2 + rnd.nextInt(3)
      Array.fill(l)(alphabet(rnd.nextInt(alphabet.length))).mkString
    }).toSet
    for (_ <- 1 to 500) {
      val w = Array.fill(rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.length))).mkString
      val pieces = Wordpiece.encode(w, grams, maxLen)
      pieces.mkString shouldBe w
      pieces.foreach { p =>
        (p.length == 1 || grams(p)) shouldBe true
      }
      // maximality: at each piece start, no LONGER vocab gram matches
      var pos = 0
      pieces.foreach { p =>
        ((p.length + 1) to math.min(maxLen, w.length - pos)).foreach { l =>
          grams(w.substring(pos, pos + l)) shouldBe false
        }
        pos += p.length
      }
    }
  }

  test("fertilityByGroup matches a driver-side replay of vocab + encode") {
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val words = Vector("scan", "merge", "joiner", "rows", "batch", "a", "scanner")
    val docs = (1L to 40L).map { id =>
      val src = s"s${id % 3}"
      (id, src, Vector.fill(3 + rnd.nextInt(6))(words(rnd.nextInt(words.size))).mkString(" "))
    }

    // driver-side replay: corpus word counts -> weighted gram counts ->
    // top-k (cnt desc, gram asc) -> greedy encode -> per-source sums
    val occ = docs.flatMap { case (_, s, t) => t.split("\\s+").map(w => (s, w)) }
    val wc = occ.groupBy(_._2).map { case (w, xs) => w -> xs.size.toLong }
    val gramCnt = collection.mutable.Map.empty[String, Long]
    for ((w, c) <- wc; l <- 2 to maxLen; i <- 0 to w.length - l)
      gramCnt(w.substring(i, i + l)) = gramCnt.getOrElse(w.substring(i, i + l), 0L) + c
    val k = 10
    val vocab = gramCnt.toSeq.sortBy { case (g, c) => (-c, g) }.take(k).map(_._1).toSet
    val ntok = wc.keys.map(w => w -> Wordpiece.encode(w, vocab, maxLen).size).toMap
    val expected = occ.groupBy(_._1).map { case (s, xs) =>
      val nW = xs.size.toLong
      val nT = xs.map(x => ntok(x._2).toLong).sum
      (s, nW, nT, BigDecimal(nT.toDouble / nW.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)

    val got = Wordpiece.fertilityByGroup(
        docs.toDF("doc_id", "source", "text"), "source", "text",
        minLen = 2, maxLen = maxLen, vocabSize = k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    got shouldBe expected
  }

  test("every single character is implicitly in-vocab (encode is total)") {
    Wordpiece.encode("zzz", Set.empty, maxLen) shouldBe List("z", "z", "z")
    Wordpiece.encode("", Set("ab"), maxLen) shouldBe Nil
  }
}
