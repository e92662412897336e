package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.CurationQueries

/** Contract tests for the curation lanes (q139–q144, q149–q152) on
  * hand-built fixtures where every expected value is computable by eye —
  * the cross-engine value checks live in the DuckDB oracle gate; these pin
  * the SEMANTICS: chunk tiling, session splitting, collision-probability
  * math, containment asymmetry, sample determinism, bucket boundaries,
  * BPE pair weighting, per-group admission cutoffs, epoch capping, and
  * snapshot-diff classification. */
class CurationQueriesSpec extends SparkSpec with Matchers {

  /** Write tiny documents/events parquet fixtures once, shaped like the
    * driver's testdata (events.ts is INT64 nanoseconds, the post-nanosAsLong
    * representation QueryRegistry.events expects). */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-curation-fixture").toString
    Seq(
      (0L, "alpha beta gamma delta", "en", "web", 22L),
      (1L, (1 to 70).map(i => s"t$i").mkString(" "), "en", "web", 0L),
      (2L, "aa bb", "de", "books", 5L),
      (3L, "x y z w", "en", "books", 7L),
      (4L, "x y z w extra tokens here", "en", "web", 25L),
      (5L, "solo", "fr", "code", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // one user, two sessions (gap 3900 s > 1800 s); ts in nanoseconds
    Seq(
      (1L, 0L, 7L, "view", 1.0, "{}"),
      (2L, 100L * 1000000000L, 7L, "view", 1.0, "{}"),
      (3L, 4000L * 1000000000L, 7L, "view", 1.0, "{}"),
      (4L, 4100L * 1000000000L, 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("docChunks tiles every document: 70 tokens -> 40/40/10 at stride 30") {
    val rows = CurationQueries.docChunks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    rows.filter(_._1 == 1L) shouldBe Array((1L, 0, 40L), (1L, 1, 40L), (1L, 2, 10L))
    // every doc yields at least one chunk, chunk 0 first
    rows.groupBy(_._1).keySet shouldBe Set(0L, 1L, 2L, 3L, 4L, 5L)
    rows.filter(_._2 == 0).map(_._1).sorted shouldBe Array(0L, 1L, 2L, 3L, 4L, 5L)
  }

  test("sessionize splits on the 30-min gap and sums durations per user") {
    val r = CurationQueries.sessionize(spark, dir).collect()
    r.length shouldBe 1
    val row = r.head
    row.getLong(0) shouldBe 7L // user_id
    row.getLong(1) shouldBe 2L // n_sessions
    row.getLong(2) shouldBe 4L // n_events
    row.getLong(3) shouldBe 2L // max_session_events
    row.getLong(4) shouldBe 200L // total_dur_s = 100 + 100
    row.getLong(5) shouldBe 100L // max_dur_s
  }

  test("charStats: 'aa bb' -> m=4, 2 distinct chars, collision 0.5") {
    val r = CurationQueries.charStats(spark, dir).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    r(2L) shouldBe ((4L, 2L, 0.5))
    // repeated-char doc scores higher than varied text
    r(2L)._3 should be > r(1L)._3
  }

  test("shingleContainment is asymmetric: quoted doc hits 1.0 toward its superset") {
    val rows = CurationQueries.shingleContainment(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    // doc 3 ("x y z w") fully contained in doc 4 -> containment 1.0
    rows((3L, 4L)) shouldBe 1.0
    // reverse direction is diluted: 2 shared grams of doc 4's 5 grams
    rows((4L, 3L)) shouldBe 0.4
  }

  test("groupSample keeps at most 5 per source, ranks contiguous, deterministic") {
    val out = CurationQueries.groupSample(spark, dir)
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    rows.groupBy(_._1).foreach { case (_, g) =>
      g.length should be <= 5
      g.map(_._3).sorted shouldBe (1 to g.length).toArray
    }
    CurationQueries.groupSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))) shouldBe rows
  }

  test("bpePairs weights pairs by word frequency and skips single-char words") {
    val pairs = CurationQueries.bpePairs(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'ta' occurs in beta AND delta -> weight 2
    pairs("ta") shouldBe 2L
    // 't1' = word "t1" (1) + prefix of t10..t19 (10)
    pairs("t1") shouldBe 11L
    // single-char words (x y z w) contribute no pairs at all
    pairs.keySet.exists(p => Set("xy", "yz", "zw").contains(p)) shouldBe false
  }

  test("quantileAdmission keeps singleton languages and drops en's worst quartile") {
    val rows = CurationQueries.quantileAdmission(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // de and fr have one doc each: percent_rank 0 <= 0.75 admits them
    rows("de") shouldBe 1L
    rows("fr") shouldBe 1L
    // en has 4 docs: pr in {0, 1/3, 2/3, 1}; the worst (pr=1) is dropped
    rows("en") shouldBe 3L
  }

  test("mixtureEpochs caps every fixture source at 4 passes of its own tokens") {
    val rows = CurationQueries.mixtureEpochs(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
    rows.map(_._1).sorted shouldBe Array("books", "code", "web")
    rows.foreach { case (_, nTokens, mixFrac, epochs, eff) =>
      // non-numeric sources all get weight 1 -> equal thirds of the mix
      mixFrac shouldBe 0.333333
      // budget/3 >> 4*n_tokens for every fixture source -> epoch cap binds
      epochs shouldBe 4.0
      eff shouldBe 4L * nTokens
    }
    // web = docs 0 (4 tok) + 1 (70) + 4 (7)
    rows.find(_._1 == "web").get._2 shouldBe 81L
  }

  test("snapshotDiff classifies added/removed/modified/unchanged by id rule") {
    val m = CurationQueries.snapshotDiff(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    m("added") shouldBe ((1L, 1L)) // id 1 only in new
    m("removed") shouldBe ((1L, 2L)) // id 2 only in old
    m("modified") shouldBe ((1L, 3L)) // id 3 rewritten in new
    m("unchanged") shouldBe ((3L, 0L + 4L + 5L))
  }

  test("snapshotDiff prunes the documents scan to (doc_id, text) only") {
    val df = CurationQueries.snapshotDiff(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    withClue(p) {
      p should include regex "ReadSchema:.*doc_id.*text"
      p should not include "lang"
      p should not include "n_chars"
    }
  }

  test("paddingWaste bucket boundaries: 4 tokens -> 16-bucket, waste 12") {
    val byBucket = CurationQueries.paddingWaste(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 0 (4 tok), 2 (2), 3 (4), 5 (1), 4 (7) all fit the 16 bucket
    val (nDocs16, sumTok16, waste16) = byBucket(16)
    nDocs16 shouldBe 5L
    sumTok16 shouldBe (4L + 2L + 4L + 1L + 7L)
    waste16 shouldBe (5L * 16L - sumTok16)
    // doc 1 (70 tokens) lands in the 128 bucket
    byBucket(128) shouldBe ((1L, 70L, 58L))
  }

  test("leakageSafeSplit co-assigns every copy of a fingerprint; naive split is the foil") {
    // fixture: 6 distinct docs; the lane re-injects doc 0 under id 10000,
    // so the corpus is 7 docs over 6 fingerprints
    val rows = CurationQueries.leakageSafeSplit(spark, dir).collect()
    rows.map(_.getLong(1)).sum shouldBe 7L // n_docs
    // fp-keyed split puts both copies of doc 0's text in ONE split, so the
    // per-split distinct-fp counts add up to exactly the 6 distinct texts
    rows.map(_.getLong(2)).sum shouldBe 6L // n_fps
    // the fp-keyed leak audit is computed, not assumed — and must be 0
    rows.map(_.getLong(3)).distinct shouldBe Array(0L)
    // the naive audit counts the same fingerprint set split by doc_id
    // hashing; with one duplicated fp it is 0 or 1, never negative/multiple
    val naive = rows.map(_.getLong(4)).distinct
    naive.length shouldBe 1
    naive.head should be <= 1L
  }

  test("q194 pareto frontier equals the brute-force domination check") {
    import spark.implicits._
    val rnd = new scala.util.Random(31L)
    for (trial <- 1 to 5) {
      // random (score, len) docs with deliberate ties on both axes
      val docs = (0L until 60L).map { id =>
        (id, rnd.nextInt(6) / 10.0, (20 + rnd.nextInt(5) * 10).toLong)
      }
      val d = java.nio.file.Files.createTempDirectory("graft-pareto").toString
      // encode score as alphabetic density: text of len chars with
      // round(score*len) letters, rest '1's — reproduces the lane formula
      docs.map { case (id, s, len) =>
        val letters = math.round(s * len).toInt
        (id, "a" * letters + "1" * (len.toInt - letters), "en", "web", len)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$d/documents.parquet")

      val got = CurationQueries.paretoFrontier(spark, d)
        .collect().map(_.getLong(0)).toSet
      val exact = docs.map { case (id, s, len) =>
        val score = BigDecimal(math.round(s * len).toDouble / len)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, score, len)
      }
      val expected = exact.filter { case (id, s, l) =>
        !exact.exists { case (id2, s2, l2) =>
          id2 != id && s2 >= s && l2 <= l && (s2 > s || l2 < l)
        }
      }.map(_._1).toSet
      withClue(s"trial=$trial: ") { got shouldBe expected }
    }
  }
}
