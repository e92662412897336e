package graft.functions

import org.scalatest.matchers.should.Matchers
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** NFC normalization contract: the JVM kernel composes decomposed
  * sequences, is the identity (SAME instance — no allocation) on
  * already-normal text, and the codegen'd expression + its SQL
  * registration agree with the kernel. Decomposed fixtures are built with
  * explicit unicode escape sequences so source-file normalization can
  * never silently blank the test. */
class TextNormSpec extends SparkSpec with Matchers {

  private val Decomposed = "cafe\u0301 x" // e + combining acute
  private val Composed = "caf\u00e9 x" // precomposed e-acute

  test("kernel composes e + U+0301 into é, shrinking by one code point") {
    val in = UTF8String.fromString(Decomposed)
    TextNorm.nfcOf(in).toString shouldBe Composed
    TextNorm.nfcOf(in).numChars() shouldBe in.numChars() - 1
  }

  test("kernel returns the INPUT INSTANCE for already-NFC text (no allocation)") {
    val ascii = UTF8String.fromString("plain ascii text")
    TextNorm.nfcOf(ascii) should be theSameInstanceAs ascii
    val composed = UTF8String.fromString(Composed)
    TextNorm.nfcOf(composed) should be theSameInstanceAs composed
  }

  test("expression, SQL registration, and kernel agree; NULL propagates") {
    import spark.implicits._
    val df = Seq(Some(Decomposed), Some("abc"), None).toDF("t")
    df.createOrReplaceTempView("norm_in")
    val viaCol = df.select(TextNorm.nfc($"t")).collect().map(r => Option(r.getString(0)))
    val viaSql = spark.sql("SELECT nfc_normalize(t) FROM norm_in")
      .collect().map(r => Option(r.getString(0)))
    viaCol shouldBe Array(Some(Composed), Some("abc"), None)
    viaSql shouldBe viaCol
  }

  test("idempotent and matches java.text.Normalizer over a seeded unicode sweep") {
    val rnd = new scala.util.Random(0x0FC0)
    val pool = "abc ́̈éüe你好" // ascii, combiners, precomposed, CJK
    (1 to 500).foreach { _ =>
      val s = (0 until rnd.nextInt(12)).map(_ => pool(rnd.nextInt(pool.length))).mkString
      val once = TextNorm.nfcOf(UTF8String.fromString(s)).toString
      once shouldBe java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      TextNorm.nfcOf(UTF8String.fromString(once)).toString shouldBe once
    }
  }
}
