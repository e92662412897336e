package graft.plans

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.CharStatsFns
import graft.queries.CurationQueries

/** Plan + semantics pins for the q141 one-pass char-stats lane.
  *
  * The lane used to explode one row per corpus CHARACTER (two shuffled
  * groupBys over ~10¹⁴ rows at 100 TB); the fused
  * [[graft.functions.CharStatsOf]] expression keeps it map-side. These
  * tests pin (a) no Generate/explode and no aggregate exchange in the
  * executed plan, and (b) exact agreement with the relational
  * explode→groupBy form the DuckDB oracle still uses — including the
  * non-ASCII fallback path and surrogate-pair (code point, not code unit)
  * counting.
  */
class CharStatsPlanSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  test("q141 plan has no explode and no aggregate — one codegen'd pass") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    val df = CurationQueries.charStats(spark, sfDir)
    df.collect()
    val p = {
      val s = df.queryExecution.executedPlan.toString
      val i = s.indexOf("== Initial Plan ==")
      if (i >= 0) s.substring(0, i) else s
    }
    withClue(p) {
      p should not include "Generate"
      p should not include "HashAggregate"
      p should not include "ObjectHashAggregate"
      p should not include "SortAggregate"
      p should include("char_stats_of")
    }
  }

  test("fused pass matches the explode+groupBy form exactly (sf0.001)") {
    assume(new java.io.File(s"$sfDir/documents.parquet").exists())
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val fused = CurationQueries.charStats(spark, sfDir).collect()
    val naive = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", regexp_replace(lower($"text"), "\\s", "").as("s"))
      .filter(org.apache.spark.sql.functions.length($"s") > 0)
      .select($"doc_id", explode(split($"s", "")).as("ch"))
      .filter($"ch" =!= "")
      .groupBy($"doc_id", $"ch").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(
        sum($"c").cast("long").as("m"),
        count(lit(1)).as("distinct_chars"),
        round(sum($"c" * $"c").cast("double") /
          (sum($"c").cast("double") * sum($"c").cast("double")), 6).as("collision_p"))
      .orderBy($"doc_id")
      .collect()
    assert(fused.length == naive.length)
    fused.zip(naive).foreach { case (f, n) => f shouldBe n }
  }

  test("statsOf counts code points, not code units, and handles non-ASCII") {
    import org.apache.spark.unsafe.types.UTF8String
    // "aab" + é (2 UTF-8 bytes) + 𝄞 (surrogate pair) + 𝄞 again
    val r = CharStatsFns.statsOf(UTF8String.fromString("aabé𝄞𝄞"))
    r.getLong(0) shouldBe 6L // m: a a b é 𝄞 𝄞
    r.getLong(1) shouldBe 4L // distinct: a b é 𝄞
    r.getLong(2) shouldBe (4L + 1L + 1L + 4L) // 2² + 1 + 1 + 2²
  }

  test("statsOf on empty string is all zeros") {
    import org.apache.spark.unsafe.types.UTF8String
    val r = CharStatsFns.statsOf(UTF8String.fromString(""))
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((0L, 0L, 0L))
  }

  test("statsOf fuzz: agrees with a map-based reference on random unicode") {
    import org.apache.spark.unsafe.types.UTF8String
    val rng = new scala.util.Random(99)
    // alphabet spanning the ascii fast path, the boxed fallback, and a
    // surrogate-pair code point
    val alphabet: Array[String] =
      (('a' to 'e').map(_.toString) ++ Seq("é", "ß", "日", "本", "𝄞", " ", "!")).toArray
    for (_ <- 0 until 300) {
      val s = Array.fill(rng.nextInt(80))(alphabet(rng.nextInt(alphabet.length))).mkString
      val counts = s.codePoints().toArray.groupBy(identity).map { case (_, v) => v.length.toLong }
      val r = CharStatsFns.statsOf(UTF8String.fromString(s))
      withClue(s"input=$s") {
        r.getLong(0) shouldBe counts.sum
        r.getLong(1) shouldBe counts.size.toLong
        r.getLong(2) shouldBe counts.map(c => c * c).sum
      }
    }
  }
}
