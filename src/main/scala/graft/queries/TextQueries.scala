package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
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

  def all: Seq[Q] = Seq(
    Q("q39_tfidf_terms", distinguishingTerms, Some(distinguishingTermsOracle)),
    Q("q40_token_counts", tokenCounts, Some(tokenCountsOracle)),
    Q("q41_quality_scores", qualityScores, Some(qualityScoresOracle)),
    Q("q42_lang_id", langIdConfusion, Some(langIdConfusionOracle)),
    Q("q43_fingerprints", fingerprints, Some(fingerprintsOracle)),
    Q("q44_rolling_fingerprint", rollingFingerprints, Some(rollingFingerprintsOracle)),
    Q("q104_length_histogram", lengthHistogram, Some(lengthHistogramOracle)))
}
