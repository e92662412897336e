package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.sources.fixedwidth.AsciiParse

class AsciiParseSpec extends AnyFunSuite with Matchers {

  private def bytes(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def parse(s: String): Long = AsciiParse.parseLong(bytes(s), 0, s.length)

  test("property: any long round-trips through its decimal rendering (seeded sweep)") {
    val rng = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val v = rng.nextLong()
      parse(v.toString) shouldBe v
      parse(s"  ${v.toString}  ") shouldBe v // padded both sides
    }
  }

  test("boundary values parse exactly") {
    parse("-9223372036854775808") shouldBe Long.MinValue
    parse("9223372036854775807") shouldBe Long.MaxValue
    parse("+7") shouldBe 7L
    parse("-0") shouldBe 0L
  }

  test("overflow throws instead of wrapping") {
    a[NumberFormatException] should be thrownBy parse("9223372036854775808")
    a[NumberFormatException] should be thrownBy parse("-9223372036854775809")
    a[NumberFormatException] should be thrownBy parse("99999999999999999999")
  }

  test("garbage throws") {
    a[NumberFormatException] should be thrownBy parse("12a4")
    a[NumberFormatException] should be thrownBy parse("-")
    a[NumberFormatException] should be thrownBy parse("1.5")
  }

  test("isBlank detects all-space ranges only") {
    AsciiParse.isBlank(bytes("    "), 0, 4) shouldBe true
    AsciiParse.isBlank(bytes("  x "), 0, 4) shouldBe false
    AsciiParse.isBlank(bytes("ab"), 0, 0) shouldBe true // empty range
  }

  test("parseInt range-checks") {
    AsciiParse.parseInt(bytes("2147483647"), 0, 10) shouldBe Int.MaxValue
    a[NumberFormatException] should be thrownBy AsciiParse.parseInt(bytes("2147483648"), 0, 10)
    a[NumberFormatException] should be thrownBy AsciiParse.parseInt(bytes("-2147483649"), 0, 11)
  }

  test("parseDouble inverts Double.toString and handles blanks") {
    val d = "1.7976931348623157E308"
    AsciiParse.parseDouble(bytes(d), 0, d.length) shouldBe Double.MaxValue
    AsciiParse.parseDouble(bytes("    "), 0, 4) shouldBe null
  }
}
