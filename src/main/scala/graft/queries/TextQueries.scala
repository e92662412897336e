package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Dedup
import QueryRegistry.table

/** Text-analysis over the `documents` table: token counting, quality
  * scoring, language ID, fingerprinting — every computation is a pure
  * Catalyst expression pipeline (no UDFs, map-side only, no shuffle until
  * the final small aggregate), each replicated exactly in DuckDB SQL.
  */
object TextQueries {

  def tokenCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        $"doc_id",
        TextFunctions.tokenCount($"text").as("ws_tokens"),
        TextFunctions.bpeishTokenCount($"text").as("bpeish_tokens"),
        length($"text").cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  val tokenCountsOracle: String =
    s"""SELECT doc_id,
       |  cast(len(string_split_regex(trim(text), '\\s+')) AS bigint) AS ws_tokens,
       |  cast(len(regexp_extract_all(lower(text), '${TextFunctions.BpeishPattern}')) AS bigint) AS bpeish_tokens,
       |  cast(length(text) AS bigint) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(
        $"doc_id", $"lang",
        TextFunctions.stopwordRatio($"text").as("stopword_ratio"),
        TextFunctions.punctRatio($"text").as("punct_ratio"),
        TextFunctions.meanTokenLen($"text").as("mean_token_len"))
      .orderBy($"doc_id")
  }

  val qualityScoresOracle: String = {
    val sw = TextFunctions.QualityStopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""SELECT doc_id, lang,
       |  round(cast(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> list_contains($sw, x))) AS double)
       |    / len(string_split_regex(trim(text), '\\s+')), 6) AS stopword_ratio,
       |  round(cast(length(regexp_replace(regexp_replace(text, '\\s', '', 'g'), '[a-zA-Z0-9]', '', 'g')) AS double)
       |    / length(regexp_replace(text, '\\s', '', 'g')), 6) AS punct_ratio,
       |  round(cast(list_sum(list_transform(string_split_regex(trim(text), '\\s+'), x -> length(x))) AS double)
       |    / len(string_split_regex(trim(text), '\\s+')), 6) AS mean_token_len
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Language ID vs the labeled lang column: confusion-matrix counts. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"lang", TextFunctions.langId($"text").as("detected"))
      .groupBy($"lang", $"detected")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"lang", $"detected")
  }

  val langIdConfusionOracle: String =
    s"""SELECT lang, ${TextFunctions.langIdSql("text")} AS detected, count(*) AS n_docs
       |FROM documents GROUP BY 1, 2 ORDER BY lang, detected""".stripMargin

  // ---------------------------------------------------------------- q206
  /** Multi-class classification report for the q42 language-ID heuristic —
    * the per-class grading step the binary q199 sweep can't express: per
    * language, support (true count), predicted (detection count), tp, and
    * precision/recall/F1 as single exact-integer ratios (precision NULL
    * when the class is never predicted, the q199 nullif convention; F1 in
    * its direct 2tp/(support+predicted) form so no rounded value is
    * composed). Classes are the FULL OUTER union of true and predicted
    * labels, so a hallucinated detection (predicted but never true) still
    * gets a row with support 0. Scale shape: one corpus pass builds the
    * |langs|²-bounded confusion table, which is then MATERIALIZED by a
    * bounded pull (the shared [[graft.operators.BoundedPull]]
    * helper — left lazy, the three
    * derived aggregates would each re-run the corpus langId scan; measured
    * 31 s vs 2 s at sf1); every join after that is over ≤ |langs| rows of
    * a local relation. */
  def langIdReport(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val confRaw = table(spark, dir, "documents")
      .select($"lang", TextFunctions.langId($"text").as("detected"))
      .groupBy($"lang", $"detected")
      .agg(count(lit(1)).as("n"))
    val conf = graft.operators.BoundedPull(confRaw,
      maxRows = 1 << 16, what = "langId confusion table (|langs|^2 rows)")
    val support = conf.groupBy($"lang".as("cls")).agg(sum($"n").as("support"))
    val predicted = conf.groupBy($"detected".as("cls")).agg(sum($"n").as("predicted"))
    val tp = conf.filter($"lang" === $"detected")
      .select($"lang".as("cls"), $"n".as("tp"))
    support.join(predicted, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left_outer")
      .select(
        $"cls",
        coalesce($"support", lit(0L)).as("support"),
        coalesce($"predicted", lit(0L)).as("predicted"),
        coalesce($"tp", lit(0L)).as("tp"))
      .select($"cls", $"support", $"predicted", $"tp",
        round($"tp".cast("double") /
          nullif($"predicted".cast("double"), lit(0.0)), 6).as("precision"),
        round($"tp".cast("double") /
          nullif($"support".cast("double"), lit(0.0)), 6).as("recall"),
        round(lit(2.0) * $"tp".cast("double") /
          nullif(($"support" + $"predicted").cast("double"), lit(0.0)), 6).as("f1"))
      .orderBy($"cls")
  }

  val langIdReportOracle: String =
    s"""WITH conf AS (
       |  SELECT lang, ${TextFunctions.langIdSql("text")} AS detected,
       |    cast(count(*) AS BIGINT) AS n
       |  FROM documents GROUP BY 1, 2
       |), sup AS (
       |  SELECT lang AS cls, cast(sum(n) AS BIGINT) AS support FROM conf GROUP BY 1
       |), pred AS (
       |  SELECT detected AS cls, cast(sum(n) AS BIGINT) AS predicted FROM conf GROUP BY 1
       |), tpc AS (
       |  SELECT lang AS cls, n AS tp FROM conf WHERE lang = detected
       |), cls AS (
       |  SELECT coalesce(s.cls, p.cls) AS cls,
       |    coalesce(s.support, 0) AS support, coalesce(p.predicted, 0) AS predicted
       |  FROM sup s FULL OUTER JOIN pred p ON s.cls = p.cls
       |)
       |SELECT c.cls, c.support, c.predicted, coalesce(t.tp, 0) AS tp,
       |  round(coalesce(t.tp, 0)::DOUBLE / nullif(c.predicted::DOUBLE, 0.0), 6) AS precision,
       |  round(coalesce(t.tp, 0)::DOUBLE / nullif(c.support::DOUBLE, 0.0), 6) AS recall,
       |  round(2.0 * coalesce(t.tp, 0)::DOUBLE / nullif((c.support + c.predicted)::DOUBLE, 0.0), 6) AS f1
       |FROM cls c LEFT JOIN tpc t USING (cls) ORDER BY cls""".stripMargin

  /** Content fingerprints: md5 of normalized text + order-sensitive rolling
    * hash (the rolling hash has no cross-engine twin — verified by the
    * ScalaTest suite instead, so this query exposes only the md5 side). */
  def fingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"doc_id", TextFunctions.fingerprint($"text").as("fp_md5"))
      .orderBy($"doc_id")
  }

  val fingerprintsOracle: String =
    """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Order-sensitive rolling-hash fingerprints (hash64/mix64 fold via the
    * codegen'd RollingHash64 expression). Groups by fingerprint to surface
    * exact-duplicate token sequences. The DuckDB oracle recomputes the exact
    * same fold in hugeint SQL (see DuckHashSql), making this a true
    * cross-engine hash check of the sketch math. */
  def rollingFingerprints(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"doc_id", TextFunctions.rollingHash($"text").as("rh"))
      .groupBy($"rh")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("rep_id"))
      .orderBy($"rep_id")
  }

  val rollingFingerprintsOracle: String =
    s"""WITH rh AS (
       |  SELECT doc_id, ${DuckHashSql.signedSql(DuckHashSql.rollingHashSql("text"))} AS rh FROM documents
       |)
       |SELECT rh, count(*) AS n_docs, min(doc_id) AS rep_id
       |FROM rh GROUP BY rh ORDER BY rep_id""".stripMargin

  /** Distinguishing terms per language, ranked by the tf/df ratio — the
    * log-free core of tf-idf (idf is monotone in 1/df, so the RANKING is
    * identical while the score stays an exact integer-ratio double that
    * hash-matches cross-engine; `ln()` would differ in the last ulp between
    * libm implementations). tf = term count within the language, df =
    * corpus-wide document frequency. One narrow shuffle per aggregation;
    * the window ranks within tiny per-language term lists. */
  def distinguishingTerms(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val toks = table(spark, dir, "documents")
      .select($"doc_id", $"lang", explode(TextFunctions.tokens($"text")).as("tok"))
    val tf = toks.groupBy($"lang", $"tok").agg(count(lit(1)).as("tf"))
    val df = toks.select($"doc_id", $"tok").distinct()
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val ranked = tf.join(df, "tok")
      .withColumn("score", $"tf".cast("double") / $"df".cast("double"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang").orderBy($"score".desc, $"tok")))
    ranked.filter($"rk" <= 3)
      .select($"lang", $"rk", $"tok", $"tf", $"df", $"score")
      .orderBy($"lang", $"rk")
  }

  val distinguishingTermsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents
      |), tf AS (
      |  SELECT lang, tok, count(*) AS tf FROM toks GROUP BY 1, 2
      |), df AS (
      |  SELECT tok, count(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY 1
      |), ranked AS (
      |  SELECT lang, tok, tf, df, tf::DOUBLE / df::DOUBLE AS score,
      |    row_number() OVER (PARTITION BY lang ORDER BY tf::DOUBLE / df::DOUBLE DESC, tok) AS rk
      |  FROM tf JOIN df USING (tok)
      |)
      |SELECT lang, rk, tok, tf, df, score
      |FROM ranked WHERE rk <= 3 ORDER BY lang, rk""".stripMargin

  /** Token-count histogram: documents binned into fixed-width buckets by
    * whitespace token count (integer bucket math — identical in any engine),
    * with per-bucket extremes. Map-side bucket assignment, one tiny
    * aggregation shuffle — the corpus-profiling pass run before choosing
    * packing budgets and length filters. */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select(TextFunctions.tokenCount($"text").as("n_tokens"))
      // integer div (`/` on longs is double in Spark); clamped at the range
      // floor because Spark's `div` TRUNCATES while DuckDB's `//` FLOORS —
      // they diverge on negative numerators, so below-range docs must never
      // produce one
      .withColumn("bucket", expr("(greatest(n_tokens, 10) - 10) div 9"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"),
        min($"n_tokens").as("min_tokens"), max($"n_tokens").as("max_tokens"))
      .orderBy($"bucket")
  }

  val lengthHistogramOracle: String =
    """WITH t AS (
      |  SELECT cast(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      |  FROM documents
      |)
      |SELECT (greatest(n_tokens, 10) - 10) // 9 AS bucket, count(*) AS n_docs,
      |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** Inverted-index build (token → sorted posting list): the IR-prep
    * reshape behind every sparse retrieval system. One explode + one
    * distinct, then the df cutoff fires on COUNTS before any posting list
    * exists: df per token is a combinable count aggregate (constant state
    * per token), tokens outside the band are dropped by a LEFT SEMI join,
    * and only surviving tokens' postings are collected — every
    * collect_set buffer is bounded by the band's upper edge. The earlier
    * collect-then-filter shape built a stopword token's FULL corpus-sized
    * posting list in one non-spillable aggregation buffer before the df
    * filter could drop it (the same defect class as the pre-r18 LSH
    * banding — `Dedup.cappedBuckets` is the shared pattern). The semi-join
    * output stays hash-partitioned on token, so the final collect reuses
    * that partitioning. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = table(spark, dir, "documents")
      .select($"doc_id", explode(TextFunctions.tokens($"text")).as("token"))
      .filter(length($"token") > 0)
      .distinct()
    val banded = pairs.groupBy($"token")
      .agg(count(lit(1)).as("_df"))
      .filter($"_df".between(5L, 60L))
      .select($"token")
    pairs.join(banded, Seq("token"), "left_semi")
      .groupBy($"token")
      .agg(sort_array(collect_set($"doc_id")).as("ids"))
      .select($"token", size($"ids").cast("long").as("df"),
        concat_ws(",", transform($"ids", _.cast("string"))).as("postings"))
      .orderBy($"token")
  }

  val invertedIndexOracle: String =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents
      |), p AS (
      |  SELECT token, count(DISTINCT doc_id) AS df,
      |    array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
      |  FROM t WHERE length(token) > 0 GROUP BY token
      |)
      |SELECT token, df, postings FROM p WHERE df BETWEEN 5 AND 60
      |ORDER BY token""".stripMargin

  /** Collocation mining — log-free PMI ratio per adjacent token pair:
    * score = p(ab) / (p(a)·p(b)) from exact corpus counts, the association
    * measure behind phrase detection (log-PMI is monotone in it; `ln` would
    * drift an ulp between libm builds, the q39 argument). Counts come from
    * one unigram and one bigram aggregation (codegen'd `word_grams`); the
    * score expression is textually identical cross-engine, so ranking AND
    * values hash-match. Bounded output via the min-count cutoff + top-50. */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = table(spark, dir, "documents").select($"doc_id", $"text")
    val toks = docs.select(explode(TextFunctions.tokens($"text")).as("tok"))
    val uni = toks.groupBy($"tok").agg(count(lit(1)).as("n_tok"))
    val bi = docs.select(explode(graft.functions.Spans.wordGrams($"text", 2)).as("g"))
      .groupBy($"g").agg(count(lit(1)).as("n_ab"))
    val totals = broadcast(
      uni.agg(sum($"n_tok").as("n_uni")).crossJoin(bi.agg(sum($"n_ab").as("n_bi"))))
    bi.filter($"n_ab" >= 20)
      .withColumn("a", split($"g", " ")(0))
      .withColumn("b", split($"g", " ")(1))
      .join(uni.select($"tok".as("a"), $"n_tok".as("n_a")), "a")
      .join(uni.select($"tok".as("b"), $"n_tok".as("n_b")), "b")
      .crossJoin(totals)
      .select($"g", $"n_ab",
        round(($"n_ab".cast("double") / $"n_bi".cast("double")) /
          (($"n_a".cast("double") / $"n_uni".cast("double")) *
            ($"n_b".cast("double") / $"n_uni".cast("double"))), 6).as("pmi_ratio"))
      .orderBy($"pmi_ratio".desc, $"g")
      .limit(50)
  }

  val collocationsOracle: String =
    """WITH toks AS (
      |  SELECT doc_id, u.tok, u.ord
      |  FROM documents,
      |  LATERAL (SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok,
      |                  generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord) u
      |), uni AS (
      |  SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1
      |), bi AS (
      |  SELECT a.tok || ' ' || b.tok AS g, a.tok AS ta, b.tok AS tb, count(*) AS n_ab
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
      |  GROUP BY 1, 2, 3
      |), tot AS (
      |  SELECT (SELECT sum(n_tok) FROM uni) AS n_uni, (SELECT sum(n_ab) FROM bi) AS n_bi
      |)
      |SELECT g, n_ab,
      |  round((n_ab::DOUBLE / n_bi::DOUBLE) /
      |    ((ua.n_tok::DOUBLE / n_uni::DOUBLE) * (ub.n_tok::DOUBLE / n_uni::DOUBLE)), 6) AS pmi_ratio
      |FROM bi
      |JOIN uni ua ON ua.tok = bi.ta
      |JOIN uni ub ON ub.tok = bi.tb
      |CROSS JOIN tot
      |WHERE n_ab >= 20
      |ORDER BY pmi_ratio DESC, g LIMIT 50""".stripMargin

  /** explode_outer semantics: 100-token shingles over ~60-token documents —
    * MOST rows produce an EMPTY array, and explode_outer keeps them as one
    * NULL row each (plain explode would silently drop those documents from
    * any per-document accounting). The oracle states the row algebra
    * directly: rows-per-doc = max(n_grams, 1). */
  def explodeOuter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    table(spark, dir, "documents")
      .select($"lang", explode_outer(Dedup.shingles($"text", 100)).as("gram"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_rows"), count($"gram").as("n_grams"),
        count(when($"gram".isNull, 1)).as("n_gramless_docs"))
      .orderBy($"lang")
  }

  // gram strings via list_slice + array_to_string, NOT the gramsSql
  // concat chain: 100 nested `||` operators exceed DuckDB's binder
  // recursion limit (128); the slice form is flat and value-identical
  // (same tokens joined by single spaces).
  val explodeOuterOracle: String =
    s"""WITH toks AS (
       |  SELECT lang, string_split_regex(trim(text), '\\s+') AS t FROM documents
       |), g AS (
       |  SELECT lang, len(list_distinct(list_transform(
       |    generate_series(1, len(t) - 99),
       |    gi -> array_to_string(t[gi:gi+99], ' ')))) AS n
       |  FROM toks
       |)
       |SELECT lang,
       |  cast(sum(CASE WHEN n = 0 THEN 1 ELSE n END) AS BIGINT) AS n_rows,
       |  cast(sum(n) AS BIGINT) AS n_grams,
       |  count(CASE WHEN n = 0 THEN 1 END) AS n_gramless_docs
       |FROM g GROUP BY lang ORDER BY lang""".stripMargin

  /** regexp_extract_all + explode: every digit run in the events' JSON
    * props, aggregated per event type — the multi-match regex surface q45's
    * single-pattern scrub doesn't cover. Identical regex dialect subset
    * (character classes + quantifiers) in both engines. */
  def regexpExtractAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    QueryRegistry.events(spark, dir)
      .select($"event_type",
        explode(regexp_extract_all($"props", lit("[0-9]+"), lit(0))).as("num"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_nums"),
        countDistinct($"num").as("n_distinct"),
        min($"num".cast("long")).as("min_num"), max($"num".cast("long")).as("max_num"))
      .orderBy($"event_type")
  }

  val regexpExtractAllOracle: String =
    """WITH n AS (
      |  SELECT event_type, unnest(regexp_extract_all(props, '[0-9]+')) AS num FROM events
      |)
      |SELECT event_type, count(*) AS n_nums, count(DISTINCT num) AS n_distinct,
      |  min(num::BIGINT) AS min_num, max(num::BIGINT) AS max_num
      |FROM n GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------- q154
  /** Unicode NFC canonicalization (the codegen'd [[graft.functions.NfcNormalize]]
    * expression vs DuckDB's built-in `nfc_normalize`): the corpus text gets
    * a DECOMPOSED suffix appended ("cafe" + combining acute U+0301, built
    * identically in both engines — the synthetic corpus alone is mostly
    * ASCII, where NFC is the identity and the check would be vacuous), then
    * both engines normalize and md5 the result. n_chars_norm ==
    * n_chars_raw − 1 for every row proves composition actually HAPPENED
    * (e + U+0301 → é collapses one code point); the md5 proves the bytes
    * agree, i.e. the JDK's Normalizer and DuckDB's utf8proc produce
    * identical NFC for this text. Map-side only — the canonicalization
    * every cross-crawl dedup must run before fingerprints are comparable. */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // decomposed on purpose: "e" + combining acute U+0301 (see scaladoc)
    val raw = concat($"text", lit(" cafe\u0301"))
    table(spark, dir, "documents")
      .select(
        $"doc_id",
        md5(graft.functions.TextNorm.nfc(raw).cast("binary")).as("norm_md5"),
        length(graft.functions.TextNorm.nfc(raw)).cast("long").as("n_chars_norm"),
        length(raw).cast("long").as("n_chars_raw"))
      .orderBy($"doc_id")
  }

  val normalizeTextOracle: String =
    """SELECT doc_id,
      |  md5(nfc_normalize(text || ' cafe' || chr(769))) AS norm_md5,
      |  cast(length(nfc_normalize(text || ' cafe' || chr(769))) AS BIGINT) AS n_chars_norm,
      |  cast(length(text || ' cafe' || chr(769)) AS BIGINT) AS n_chars_raw
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q155
  /** BM25 ranked retrieval — the scoring layer over the q121 inverted-index
    * machinery: for a literal query set, the top-10 documents per query by
    * the standard Okapi BM25 (k1=1.2, b=0.75). The scale shape, stage by
    * stage: the query-term whitelist joins BROADCAST against the exploded
    * token stream, so all non-query tokens die inside the scan task (at
    * 100 TB the tf table is |matching docs|·|terms|, not the corpus token
    * count); per-doc length comes from the map-side `tokenCount` (no
    * second explode); df and the corpus stats are tiny aggregates that
    * broadcast back; and the final per-query ranking is the bounded
    * [[graft.functions.TopKByScore]] partial-agg — O(queries·k) shuffled
    * rows, never a corpus-sized per-query Window.
    *
    * Cross-engine determinism: the score formula is textually identical in
    * both engines over identical doubles (exact integer tf/df/dl and the
    * exact-rational avgdl), so `ln` sees bit-equal inputs; contributions
    * sum via the order-free decimal [[CoreQueries.dsum]] (a double sum
    * would be partial-order-dependent), and ranking ties break on doc_id. */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = table(spark, dir, "documents").select($"doc_id", $"text")
    val dl = docs.select($"doc_id", TextFunctions.tokenCount($"text").as("dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum($"dl").cast("double").as("sum_dl"))
    val qterms = Seq(
      ("q1", "hash"), ("q1", "join"),
      ("q2", "window"), ("q2", "sort"), ("q2", "merge"),
      ("q3", "vector"), ("q3", "scan")).toDF("query_id", "term")
    val tf = docs.select($"doc_id", explode(TextFunctions.tokens($"text")).as("tok"))
      .join(broadcast(qterms), $"tok" === $"term")
      .groupBy($"query_id", $"term", $"doc_id")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.select($"term", $"doc_id").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select($"query_id", $"doc_id",
        (log(($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)) + lit(1.0)) *
          ($"tf" * lit(2.2)) /
          ($"tf" + lit(1.2) * (lit(0.25) + lit(0.75) * $"dl" / ($"sum_dl" / $"n_docs"))))
          .as("contrib"))
    val scored = contrib.groupBy($"query_id", $"doc_id")
      .agg(CoreQueries.dsum($"contrib").as("score"))
    val topk = udaf(new graft.functions.TopKByScore(10))
    scored.groupBy($"query_id")
      .agg(topk($"score", $"doc_id").as("tk"))
      .select($"query_id", posexplode($"tk").as(Seq("pos", "p")))
      .select($"query_id", ($"pos" + 1).cast("int").as("rk"),
        $"p._2".as("doc_id"), $"p._1".as("score"))
      .orderBy($"query_id", $"rk")
  }

  val bm25TopKOracle: String =
    s"""WITH dl AS (
       |  SELECT doc_id, cast(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS dl
       |  FROM documents
       |), stats AS (
       |  SELECT count(*)::DOUBLE AS n_docs, sum(dl)::DOUBLE AS sum_dl FROM dl
       |), qt(query_id, term) AS (
       |  VALUES ('q1','hash'),('q1','join'),('q2','window'),('q2','sort'),('q2','merge'),
       |         ('q3','vector'),('q3','scan')
       |), toks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
       |), tf AS (
       |  SELECT query_id, term, doc_id, count(*) AS tf
       |  FROM toks JOIN qt ON tok = term GROUP BY 1, 2, 3
       |), dfreq AS (
       |  SELECT term, count(*) AS df FROM (SELECT DISTINCT term, doc_id FROM tf) GROUP BY 1
       |), c AS (
       |  SELECT query_id, doc_id,
       |    ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2)
       |      / (tf + 1.2 * (0.25 + 0.75 * dl / (sum_dl / n_docs))) AS contrib
       |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
       |), s AS (
       |  SELECT query_id, doc_id, ${CoreQueries.dsumSql("contrib")} AS score
       |  FROM c GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rk
       |  FROM s
       |)
       |SELECT query_id, rk, doc_id, score FROM r WHERE rk <= 10
       |ORDER BY query_id, rk""".stripMargin

  /** Zipf's-law audit per source: least-squares slope and R² of
    * ln(freq) vs ln(rank) over the source's token-frequency table — the
    * classic corpus-health check (natural text fits slope ≈ −1; templated
    * or machine-generated text flattens or steepens the curve), used as a
    * cheap generation/spam detector in large-scale pretraining pipelines.
    *
    * Scale shape: the only corpus-sized work is the (source, token)
    * word-count — the canonical map-side-combine aggregation. Everything
    * after operates on the VOCABULARY (|types| ≪ corpus): ranks are a
    * per-source window over type rows, and the regression is covar/var
    * aggregates over those same skinny rows. No corpus-sized shuffle, no
    * window over raw tokens.
    *
    * Determinism: ranks tie-break on the token string, so the (rank, freq)
    * pairs are identical cross-engine; ln inputs are rounded to 8 places
    * (both engines' ln is correctly rounded on these small-int inputs —
    * the round is belt-and-braces), and the regression outputs to 4,
    * because Spark's CentralMomentAgg and DuckDB's covar/var use different
    * single-pass update orders and differ in low-order bits. */
  def zipfAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val freqs = table(spark, dir, "documents")
      .select($"source", explode(TextFunctions.tokens($"text")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    val ranked = freqs.withColumn("rk",
        row_number().over(Window.partitionBy($"source").orderBy($"c".desc, $"tok")))
      .select($"source", $"c",
        round(log($"rk".cast("double")), 8).as("x"),
        round(log($"c".cast("double")), 8).as("y"))
    ranked.groupBy($"source")
      .agg(count(lit(1)).as("n_types"), sum($"c").as("n_tokens"),
        round(covar_pop($"x", $"y") / var_pop($"x"), 4).as("zipf_slope"),
        round(pow(corr($"x", $"y"), 2), 4).as("zipf_r2"))
      .orderBy($"source")
  }

  val zipfAuditOracle: String =
    """WITH freqs AS (
      |  SELECT source, tok, count(*) AS c
      |  FROM (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2
      |), ranked AS (
      |  SELECT source, c,
      |    round(ln(cast(row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS DOUBLE)), 8) AS x,
      |    round(ln(cast(c AS DOUBLE)), 8) AS y
      |  FROM freqs
      |)
      |SELECT source, count(*) AS n_types, cast(sum(c) AS BIGINT) AS n_tokens,
      |  round(covar_pop(x, y) / var_pop(x), 4) AS zipf_slope,
      |  round(pow(corr(x, y), 2), 4) AS zipf_r2
      |FROM ranked GROUP BY 1 ORDER BY source""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q175_zipf_audit", zipfAudit, Some(zipfAuditOracle)),
    Q("q39_tfidf_terms", distinguishingTerms, Some(distinguishingTermsOracle)),
    Q("q154_normalize_text", normalizeText, Some(normalizeTextOracle)),
    Q("q155_bm25_topk", bm25TopK, Some(bm25TopKOracle)),
    Q("q40_token_counts", tokenCounts, Some(tokenCountsOracle)),
    Q("q41_quality_scores", qualityScores, Some(qualityScoresOracle)),
    Q("q42_lang_id", langIdConfusion, Some(langIdConfusionOracle)),
    Q("q43_fingerprints", fingerprints, Some(fingerprintsOracle)),
    Q("q44_rolling_fingerprint", rollingFingerprints, Some(rollingFingerprintsOracle)),
    Q("q104_length_histogram", lengthHistogram, Some(lengthHistogramOracle)),
    Q("q121_inverted_index", invertedIndex, Some(invertedIndexOracle)),
    Q("q124_collocations", collocations, Some(collocationsOracle)),
    Q("q131_explode_outer", explodeOuter, Some(explodeOuterOracle)),
    Q("q132_regexp_extract_all", regexpExtractAll, Some(regexpExtractAllOracle)),
    Q("q206_langid_report", langIdReport, Some(langIdReportOracle)))
}
