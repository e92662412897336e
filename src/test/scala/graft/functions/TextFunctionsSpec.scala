package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec with Matchers {

  private def one(c: org.apache.spark.sql.Column, text: String): Any = {
    import spark.implicits._
    Seq(text).toDF("t").select(c).head.get(0)
  }

  test("token counts: whitespace and BPE-ish") {
    import spark.implicits._
    one(TextFunctions.tokenCount($"t"), "the quick  brown\tfox") shouldBe 4L
    // "don't stop!" → [don] ['] [t] [stop] [!] — whitespace must NOT count
    // (the round-1 expr() escaping bug made it count)
    one(TextFunctions.bpeishTokenCount($"t"), "don't stop!") shouldBe 5L
    one(TextFunctions.bpeishTokenCount($"t"), "a1b22") shouldBe 5L // a,1,b,2,2
  }

  test("stopword ratio, punct ratio, mean token length") {
    import spark.implicits._
    one(TextFunctions.stopwordRatio($"t"), "the cat and the hat") shouldBe 0.6
    one(TextFunctions.punctRatio($"t"), "ab, cd!") shouldBe 0.333333 // 2 of 6 non-space
    one(TextFunctions.meanTokenLen($"t"), "ab cdef") shouldBe 3.0
  }

  test("language id picks the max-marker language, und when none") {
    import spark.implicits._
    one(TextFunctions.langId($"t"), "the house and the tree is that old") shouldBe "en"
    one(TextFunctions.langId($"t"), "der hund und die katze ist nicht da") shouldBe "de"
    one(TextFunctions.langId($"t"), "qwerty zxcvb asdfgh") shouldBe "und"
  }

  test("fingerprint is whitespace/case insensitive; rolling hash is order sensitive") {
    import spark.implicits._
    val fp1 = one(TextFunctions.fingerprint($"t"), "Hello   World")
    val fp2 = one(TextFunctions.fingerprint($"t"), "hello world")
    fp1 shouldBe fp2
    val rh1 = one(TextFunctions.rollingHash($"t"), "alpha beta")
    val rh2 = one(TextFunctions.rollingHash($"t"), "beta alpha")
    rh1 should not be rh2
  }

  test("codegen'd hash expressions agree with the JVM loops (same value through a plan)") {
    import spark.implicits._
    val t = "key agg row scan slow fast"
    one(TextFunctions.rollingHash($"t"), t) shouldBe Hashing.rollingHashOf(t)
    one(Hashing.simhash($"t"), t) shouldBe Hashing.simhashOf(t)
    // null propagates as null, not 0
    Seq(Option.empty[String]).toDF("t")
      .select(Hashing.rollingHash($"t")).head.isNullAt(0) shouldBe true
  }
}
