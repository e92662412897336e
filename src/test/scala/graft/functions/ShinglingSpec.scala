package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the codegen'd [[ShinglesOf]] expression to the declarative
  * `array_distinct(transform(...))` formulation it replaced (the reference
  * semantics the DuckDB oracle's gramsSql mirrors): same tokens, same gram
  * join, same distinct order, same short-doc guard. */
class ShinglingSpec extends SparkSpec with Matchers {

  /** The original declarative form, kept verbatim as the semantic oracle. */
  private def declarativeShingles(text: org.apache.spark.sql.Column, n: Int) = {
    import org.apache.spark.sql.{functions => F}
    val toks = split(trim(text), "\\s+")
    val grams = when(F.size(toks) >= n,
      transform(
        sequence(lit(1), F.size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array())
    array_distinct(grams)
  }

  private lazy val docs = {
    import spark.implicits._
    Seq(
      "the quick brown fox jumps over the lazy dog",
      "a a a a a a", // repeats collapse to one gram per distinct window
      "  leading and trailing   whitespace   everywhere  ",
      "one two", // shorter than n=3 -> empty
      "exact", // single token
      "", // empty text
      "tab\tseparated\ttokens and\nnewlines too"
    ).zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "text")
  }

  test("codegen'd shingles == declarative array_distinct(transform(...)) for n=2,3,8") {
    for (n <- Seq(2, 3, 8)) {
      val both = docs.select(
        col("id"),
        Shingling.shingles(col("text"), n).as("fast"),
        declarativeShingles(col("text"), n).as("ref"))
      val rows = both.collect()
      rows.foreach { r =>
        withClue(s"n=$n id=${r.getInt(0)}: ") {
          r.getSeq[String](1) shouldBe r.getSeq[String](2)
        }
      }
    }
  }

  test("SQL-registered shingles function matches the Column API") {
    docs.createOrReplaceTempView("shingling_docs")
    val viaSql = spark.sql(
      "SELECT id, shingles(text, 3) AS g FROM shingling_docs ORDER BY id")
      .collect().map(_.getSeq[String](1))
    val viaCol = docs.select(col("id"), Shingling.shingles(col("text"), 3).as("g"))
      .orderBy("id").collect().map(_.getSeq[String](1))
    viaSql should contain theSameElementsInOrderAs viaCol
  }

  test("null text yields null, not a crash") {
    import spark.implicits._
    val df = Seq((1, Option.empty[String]), (2, Some("a b c"))).toDF("id", "text")
    val out = df.select(Shingling.shingles(col("text"), 2)).collect()
    out(0).isNullAt(0) shouldBe true
    out(1).getSeq[String](0) shouldBe Seq("a b", "b c")
  }
}
