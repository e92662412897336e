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

  test("property: trimRange equals the naive String.trim views (seeded sweep)") {
    val rng = new scala.util.Random(0x721B)
    (0 until 2000).foreach { _ =>
      // random mix of spaces and letters, often space-heavy at the edges
      val body = (0 until rng.nextInt(12))
        .map(_ => if (rng.nextBoolean()) ' ' else ('a' + rng.nextInt(26)).toChar).mkString
      val s = (" " * rng.nextInt(4)) + body + (" " * rng.nextInt(4))
      val buf = bytes("XX" + s + "Y") // offsets exercise the from/until window
      val (from, until) = (2, 2 + s.length)
      for {
        tl <- Seq(false, true)
        tr <- Seq(false, true)
      } {
        val r = AsciiParse.trimRange(buf, from, until, tl, tr)
        val (ts, te) = ((r >>> 32).toInt, (r & 0xffffffffL).toInt)
        val expect = {
          var a = 0; var b = s.length
          if (tr) while (b > a && s(b - 1) == ' ') b -= 1
          if (tl) while (a < b && s(a) == ' ') a += 1
          s.substring(a, b)
        }
        withClue(s"s='$s' tl=$tl tr=$tr: ") {
          new String(buf, ts, te - ts, "US-ASCII") shouldBe expect
          // decodeString agrees with trimRange byte-for-byte (UTF-8 path)
          AsciiParse.decodeString(buf, from, until, tl, tr,
            java.nio.charset.StandardCharsets.UTF_8).toString shouldBe expect
        }
      }
    }
  }

  test("decodeString honors non-UTF-8 charsets after the trim") {
    val cs = java.nio.charset.Charset.forName("ISO-8859-1")
    val raw = "  café ".getBytes(cs) // é is one byte in latin-1, invalid UTF-8
    AsciiParse.decodeString(raw, 0, raw.length, true, true, cs)
      .toString shouldBe "café"
  }
}
