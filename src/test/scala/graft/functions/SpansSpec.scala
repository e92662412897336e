package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins [[WordSpansOf]]/[[WordGramsOf]] semantics: span reassembly
  * reproduces the whitespace-normalized text, grams keep duplicates, and
  * both match their declarative (HOF) twins on arbitrary-ish inputs. */
class SpansSpec extends SparkSpec with Matchers {

  private val texts = Seq(
    "a b c d e f g",            // partial tail (7 = 3+3+1)
    "a b c",                    // exactly one span at n=3
    "x",                        // shorter than n
    "  padded   with\tmixed \n whitespace  ",
    "r r r r r r",              // all-duplicate grams
    "")                         // empty

  test("spans are non-overlapping, in order, partial tail included; join reproduces text") {
    import spark.implicits._
    val out = texts.toDF("text")
      .select($"text", Spans.wordSpans($"text", 3).as("spans"))
      .collect()
    out.foreach { r =>
      val toks = r.getString(0).trim.split("\\s+").filter(_.nonEmpty)
      val spans = r.getSeq[String](1)
      spans.mkString(" ") shouldBe toks.mkString(" ")
      if (toks.nonEmpty) {
        spans.length shouldBe (toks.length + 2) / 3
        spans.dropRight(1).foreach(_.split(" ").length shouldBe 3)
      } else spans shouldBe empty
    }
  }

  test("grams keep duplicates in order and match the declarative form") {
    import spark.implicits._
    val out = texts.toDF("text").select(
      Spans.wordGrams($"text", 2).as("fast"),
      // declarative twin (interpreted HOFs — test-only); the size guard is
      // needed because sequence(1, 0) DESCENDS in Spark rather than being empty
      expr("""CASE WHEN size(split(trim(text), '\\s+')) < 2 THEN array()
        ELSE transform(
          sequence(1, size(split(trim(text), '\\s+')) - 1),
          i -> concat_ws(' ', element_at(split(trim(text), '\\s+'), i),
                              element_at(split(trim(text), '\\s+'), i + 1))) END""").as("slow"),
      $"text").collect()
    out.foreach { r =>
      withClue(s"text='${r.getString(2)}': ") { r.getSeq[String](0) shouldBe r.getSeq[String](1) }
    }
    // duplicates preserved: "r r" appears 5x in the all-duplicate line
    val dup = Seq("r r r r r r").toDF("text")
      .select(Spans.wordGrams($"text", 2)).head.getSeq[String](0)
    dup shouldBe Seq.fill(5)("r r")
  }

  test("SQL registration matches the Column API") {
    import spark.implicits._
    val df = Seq("one two three four five").toDF("text")
    df.createOrReplaceTempView("spans_sql_t")
    spark.sql("SELECT word_spans(text, 2) AS s, word_grams(text, 2) AS g FROM spans_sql_t")
      .head() shouldBe df.select(
        Spans.wordSpans($"text", 2).as("s"), Spans.wordGrams($"text", 2).as("g")).head()
  }
}
