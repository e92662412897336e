package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.PipelineQueries

/** Contract tests for the round-8 pipeline lanes (q165–q168) on hand-built
  * fixtures: classifier accounting (every doc counted, admission = margin
  * sign), CMS inner-product one-sidedness (estimate ≥ exact, exact when
  * collision-free), overlap-fraction thresholds (any-hit vs ≥50%), and
  * OOV-curve monotonicity with the saturated tail pinned to exactly zero.
  * Cross-engine value equality lives in the DuckDB oracle gate. */
class PipelineLanesSpec extends SparkSpec with Matchers {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-lanes-fixture").toString
    // doc 0 seeds the benchmark slice (doc_id % 10 == 0); doc 11 repeats
    // doc 0's text verbatim (full overlap), doc 12 shares a long prefix
    // (partial overlap), docs 13/14 are disjoint; doc 15 is sub-8-token.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (0L, base, "en", "web", 10L),
      (11L, base, "en", "web", 10L),
      (12L, base + " lambda mu nu xi omicron pi rho sigma", "en", "books", 18L),
      (13L, "one two three four five six seven eight nine ten", "en", "books", 10L),
      (14L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "es", "web", 10L),
      (15L, "tiny doc", "en", "code", 2L),
      // whitespace-only doc: zero tokens after trim+split — exercises the
      // classifier's nullif zero-denominator guard (its group has no mass)
      (16L, "   ", "en", "emptysrc", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // events: user 1 ×3, user 2 ×2, user 3 ×1 → F2 = 9+4+1 = 14
    Seq(
      (1L, 0L, 1L, "view", 1.0, "{}"),
      (2L, 1000000000L, 1L, "view", 1.0, "{}"),
      (3L, 2000000000L, 1L, "view", 1.0, "{}"),
      (4L, 3000000000L, 2L, "view", 1.0, "{}"),
      (5L, 4000000000L, 2L, "view", 1.0, "{}"),
      (6L, 5000000000L, 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // orders: custkey 1 ×2, custkey 3 ×1, custkey 9 ×1
    // join size = 3·2 (u1) + 1·1 (u3) = 7
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    Seq(
      (100L, 1L, "O", 10.0, ts, "1-URGENT"),
      (101L, 1L, "O", 11.0, ts, "1-URGENT"),
      (102L, 3L, "F", 12.0, ts, "2-HIGH"),
      (103L, 9L, "F", 13.0, ts, "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("qualityClassifier: every doc counted once, admission bounded, margins consistent") {
    val rows = PipelineQueries.qualityClassifier(spark, dir).collect()
    rows.map(_.getLong(2)).sum shouldBe 7 // n_docs covers all fixture docs
    rows.foreach { r =>
      val (nDocs, nAdmitted) = (r.getLong(2), r.getLong(3))
      nAdmitted should be <= nDocs
      val (num, den) = (r.getLong(4), r.getLong(5))
      if (den == 0) {
        // the whitespace-only group: present, zero mass, NULL margin (the
        // nullif guard — an ANSI divide-by-zero would kill the whole lane)
        r.isNullAt(6) shouldBe true
      } else {
        r.getDouble(6) shouldBe (num.toDouble / (den.toDouble * 1024.0) +- 1e-7)
      }
    }
    // the zero-token group really is exercised
    rows.count(_.getLong(5) == 0) shouldBe 1
  }

  test("cmsJoinSize: estimates are one-sided and exact at fixture scale") {
    val r = PipelineQueries.cmsJoinSize(spark, dir).head
    val (jEst, jExact, f2Est, f2Exact) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    jExact shouldBe 7
    f2Exact shouldBe 14
    jEst should be >= jExact   // CMS inner product never underestimates
    f2Est should be >= f2Exact
    // 3 and 4 distinct keys in 2^16 buckets: collision-free with the fixed
    // hash family -> the min-over-d estimate is exactly the true product
    jEst shouldBe jExact
    f2Est shouldBe f2Exact
  }

  test("overlapContamination: verbatim copy trips 50% rule, partial prefix only any-hit") {
    val bySource = PipelineQueries.overlapContamination(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    // web: doc 11 (verbatim copy of benchmark doc 0, frac 1.0) + doc 14
    // (disjoint); doc 0 itself is benchmark-side, not evaluated
    bySource("web").getLong(1) shouldBe 2  // n_docs
    bySource("web").getLong(2) shouldBe 1  // n_any_hit
    bySource("web").getLong(3) shouldBe 1  // n_contaminated
    // books: doc 12 has 11 grams, 3 hit (prefix) -> any-hit but < 50%;
    // doc 13 disjoint
    bySource("books").getLong(1) shouldBe 2
    bySource("books").getLong(2) shouldBe 1
    bySource("books").getLong(3) shouldBe 0
    // code: doc 15 has < 8 tokens -> zero grams, present, never contaminated
    bySource("code").getLong(1) shouldBe 1
    bySource("code").getLong(2) shouldBe 0
    bySource("code").getLong(3) shouldBe 0
    bySource("code").getLong(5) shouldBe 0 // sum_grams
  }

  test("tokenDrift: disjoint-support pairs hit exactly 1.0, overlapping pairs sit inside (0,1)") {
    val rows = PipelineQueries.tokenDrift(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(5), r.getDouble(6)))).toMap
    rows.keySet shouldBe Set(("books", "code"), ("books", "web"), ("code", "web"))
    // code's tokens {tiny, doc} are disjoint from both other sources:
    // zero shared types, TVD exactly 1.0 (whole mass moved) — the edge the
    // pairs-frame LEFT join exists for
    for (p <- Seq(("books", "code"), ("code", "web"))) {
      rows(p)._1 shouldBe 0
      rows(p)._3 shouldBe 1.0
    }
    // books and web share the benchmark prefix but differ: strict interior
    val (shared, num, tvd) = rows(("books", "web"))
    shared should be > 0L
    num should be > 0L
    tvd should (be > 0.0 and be < 1.0)
  }

  test("vocabCoverage: OOV rate monotone non-increasing, saturated tail exactly zero") {
    val rows = PipelineQueries.vocabCoverage(spark, dir).collect()
    rows.map(_.getInt(0)) shouldBe Array(5, 10, 20, 40)
    val rates = rows.map(_.getDouble(4))
    rates.sliding(2).foreach { case Array(a, b) => b should be <= a }
    // fixture has exactly 40 distinct types -> the V=40 row covers everything
    rows.last.getLong(3) shouldBe 0 // oov_mass
    rows.last.getDouble(4) shouldBe 0.0
    // covered_mass + oov_mass is the same total on every row
    rows.map(r => r.getLong(2) + r.getLong(3)).distinct.length shouldBe 1
  }

  test("aucOf: rank-sum AUC handles ties with the mid-rank convention") {
    import spark.implicits._
    // P=2, N=2; pos@2.0 vs negs {1.0 win, 2.0 tie=0.5} = 1.5; pos@3.0 = 2.0
    // -> AUC = 3.5/4 = 0.875, gini = 0.75 (hand-computed pair count).
    val tied = Seq((1.0, 0L), (2.0, 1L), (2.0, 0L), (3.0, 1L)).toDF("m", "y")
    val r = PipelineQueries.aucOf(tied).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2)) shouldBe ((2L, 2L, 3L))
    r.getDouble(3) shouldBe 0.875
    r.getDouble(4) shouldBe 0.75
    // perfect separation -> 1.0; a single shared score -> exactly chance
    val sep = Seq((1.0, 0L), (2.0, 0L), (3.0, 1L), (4.0, 1L)).toDF("m", "y")
    PipelineQueries.aucOf(sep).collect().head.getDouble(3) shouldBe 1.0
    val flat = Seq((5.0, 0L), (5.0, 1L), (5.0, 0L), (5.0, 1L)).toDF("m", "y")
    PipelineQueries.aucOf(flat).collect().head.getDouble(3) shouldBe 0.5
  }

  test("kappaAgreement: constant annotators -> pe=1, kappa NULL (nullif edge)") {
    // every fixture doc is short on both axes (n_chars < 300, tokens < 55),
    // so both rules vote 0 everywhere: po=1, pe=1, kappa must be NULL --
    // the agreement-by-chance degenerate case the nullif convention guards.
    val rows = PipelineQueries.kappaAgreement(spark, dir).collect()
    rows should not be empty
    rows.foreach { r =>
      r.getLong(1) shouldBe r.getLong(5) // n == n00
      r.getDouble(6) shouldBe 1.0        // po
      r.getDouble(7) shouldBe 1.0        // pe
      r.isNullAt(8) shouldBe true        // kappa
    }
  }
}
