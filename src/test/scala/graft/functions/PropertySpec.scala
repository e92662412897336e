package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.unsafe.types.UTF8String

/** Property-style hardening of the pure JVM kernels over seeded random
  * inputs (no Spark session — these are the static methods every codegen'd
  * expression calls, so the properties transfer to the distributed path
  * verbatim). Fixed seed: failures reproduce. */
class PropertySpec extends AnyFunSuite with Matchers {

  private val rnd = new scala.util.Random(0x5EED)
  private def randToken(): String =
    (0 until 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  private def randTokens(): List[String] =
    List.fill(rnd.nextInt(31))(randToken())
  private def strings(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    a.toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq

  test("spans concatenate back to the normalized text; all but last have n tokens") {
    for (_ <- 1 to 300) {
      val toks = randTokens()
      val n = 1 + rnd.nextInt(7)
      val spans = strings(Spans.spansOf(UTF8String.fromString(toks.mkString(" ")), n))
      withClue(s"toks=$toks n=$n: ") {
        spans.mkString(" ") shouldBe toks.mkString(" ")
        if (toks.nonEmpty) {
          spans.length shouldBe (toks.length + n - 1) / n
          spans.dropRight(1).foreach(_.split(" ").length shouldBe n)
        } else spans shouldBe empty
      }
    }
  }

  test("grams are every contiguous n-window, duplicates preserved") {
    for (_ <- 1 to 300) {
      val toks = randTokens()
      val n = 1 + rnd.nextInt(5)
      val grams = strings(Spans.gramsOf(UTF8String.fromString(toks.mkString(" ")), n))
      withClue(s"toks=$toks n=$n: ") {
        grams shouldBe toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSeq
      }
    }
  }

  test("zvalue2 is a bijection: de-interleaving recovers both inputs") {
    def unspread(z: Long): Long =
      (0 until 16).foldLeft(0L)((acc, b) => acc | (((z >> (2 * b)) & 1L) << b))
    for (_ <- 1 to 2000) {
      val x = rnd.nextLong() & 0xFFFFL
      val y = rnd.nextLong() & 0xFFFFL
      val z = ZOrder.interleave16(x, y)
      withClue(s"($x, $y): ") {
        unspread(z) shouldBe x
        unspread(z >> 1) shouldBe y
      }
    }
  }

  test("bloom probe never false-negatives a built key") {
    val mBits = 1 << 12
    val k = 4
    for (_ <- 1 to 50) {
      val keys = List.fill(rnd.nextInt(200))(rnd.nextLong())
      val words = new Array[Long](mBits / 64)
      keys.foreach { key =>
        (0 until k).foreach { j =>
          val pos = java.lang.Math.floorMod(Hashing.mix64(key, j), mBits.toLong).toInt
          words(pos >>> 6) |= 1L << (pos & 63)
        }
      }
      keys.foreach(key => Bloom.mightContain(words, mBits, k, key) shouldBe true)
    }
  }

  test("fixedwidth layout grammar: render/parse round-trips any layout") {
    import graft.sources.fixedwidth.{FieldSpec, FixedWidthOptions}
    val types = Vector("string", "int", "long", "double", "date", "timestamp")
    def randType(): String =
      if (rnd.nextInt(4) == 0) { val p = 1 + rnd.nextInt(38); s"decimal($p,${rnd.nextInt(p + 1)})" }
      else types(rnd.nextInt(types.length))
    for (_ <- 1 to 200) {
      var off = 0
      val layout = (0 until rnd.nextInt(12)).map { i =>
        val len = 1 + rnd.nextInt(30)
        val f = FieldSpec(s"f${i}_${randToken()}", randType(), off, len)
        off += len
        f
      }
      val rendered = FixedWidthOptions.renderFields(layout)
      withClue(s"'$rendered': ") {
        FixedWidthOptions.parseFields(if (layout.isEmpty) None else Some(rendered)) shouldBe layout
      }
    }
  }

  test("rolling hash is order-sensitive but whitespace-normalization-invariant") {
    for (_ <- 1 to 300) {
      val toks = randTokens()
      if (toks.nonEmpty) {
        val a = Hashing.rollingHashOf(toks.mkString(" "))
        Hashing.rollingHashOf("  " + toks.mkString("\t") + " ") shouldBe a
        val rev = toks.reverse
        if (rev != toks) Hashing.rollingHashOf(rev.mkString(" ")) should not be a
      }
    }
  }
}
