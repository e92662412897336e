package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, token counting (whitespace + BPE-ish regex), quality
  * scoring, language ID (stopword-marker heuristic), and document
  * fingerprinting. All pure Catalyst column expressions — codegen'd, no
  * UDFs, no shuffles — so they stream through a scan at full width on any
  * cluster size.
  */
object TextFunctions {

  /** Whitespace tokens of a trimmed document. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish token count: letter runs, single digits, single punctuation —
    * the classic pre-tokenizer shape (approximation of a trained BPE; kept
    * regex-only so it is engine-portable and codegen-friendly).
    *
    * NOTE: must go through the `regexp_extract_all(Column, Column, Column)`
    * function form, NOT `expr("... '$pattern' ...")` — Spark SQL string
    * literals escape-process backslashes, which silently turned `\s` into
    * `s` and made whitespace count as tokens (round-1 q40 hash mismatch). */
  val BpeishPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeishPattern), lit(0))).cast("long")

  /** English-ish stopwords used by the quality score. */
  val QualityStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with")

  /** Fraction of tokens that are stopwords (multiset semantics). */
  def stopwordRatio(text: Column): Column = {
    val t = tokens(text)
    val sw = array(QualityStopwords.map(lit): _*)
    round(size(filter(t, x => array_contains(sw, x))).cast("double") / size(t), 6)
  }

  /** Fraction of non-space characters that are punctuation. NULL for empty
    * or whitespace-only text (0/0 — under ANSI mode a bare division aborts
    * the scan; DuckDB's float division by zero is NULL, so the oracle
    * agrees). */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(regexp_replace(text, "\\s", ""), "[a-zA-Z0-9]", ""))
    round(punct.cast("double") / nullif(nonSpace, lit(0)), 6)
  }

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    round(aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t), 6)
  }

  /** Marker stopwords per language for the n-gram/stopword language-ID
    * heuristic. Score = number of *distinct* marker words present. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "una", "que", "y", "es"),
    "fr" -> Seq("le", "les", "des", "et", "est", "dans"),
    "zh" -> Seq("de", "shi", "le", "wo", "zai", "you"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)), array(markers.map(lit): _*)))

  /** Detected language: argmax marker score, ties resolved in LangMarkers
    * order (en first) — deterministic and exactly replicable in SQL. */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, m) => l -> langScore(text, m) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) => when(s === best && best > 0, lit(l)).otherwise(acc) }
  }

  /** SQL (DuckDB) rendering of the same language-ID computation. */
  def langIdSql(textExpr: String): String = {
    def score(markers: Seq[String]): String = {
      val arr = markers.map(m => s"'$m'").mkString("[", ", ", "]")
      s"len(list_intersect(list_distinct(string_split_regex(trim($textExpr), '\\s+')), $arr))"
    }
    val scores = TextFunctions.LangMarkers.map { case (l, m) => l -> score(m) }
    val best = s"greatest(${scores.map(_._2).mkString(", ")})"
    val cases = scores.map { case (l, s) => s"WHEN $s = $best AND $best > 0 THEN '$l'" }
    s"CASE ${cases.mkString(" ")} ELSE 'und' END"
  }

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Stable across engines (DuckDB: md5(lower(regexp_replace(text,
    * '\s+', ' ', 'g')))). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " ").cast("binary"))

  /** PII-scrub patterns. The syntax is the COMMON SUBSET of Java regex
    * (Spark) and RE2 (DuckDB) — char classes, `+`, bounded repeats — so both
    * engines match byte-identically and the redaction query gets a true
    * cross-engine oracle. Both engines replace non-overlapping matches
    * left-to-right with greedy (leftmost-longest-via-backtracking-semantics)
    * matching, so the redacted TEXT is identical, not just the counts. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\b555-[0-9]{4}\\b"

  /** Replace every match of `pattern` with `token` (e.g. "<EMAIL>"). Pure
    * codegen'd expression — scrubbing streams map-side at full scan width. */
  def redact(text: Column, pattern: String, token: String): Column =
    regexp_replace(text, pattern, token)

  /** Number of matches of `pattern` — the redaction audit counter. */
  def patternCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern))

  /** 64-bit rolling-hash content fingerprint — order-sensitive unlike the
    * md5 of the sorted token set. Folds acc' = mix64(acc ^ hash64(token))
    * via the codegen'd [[graft.functions.RollingHash64]] expression (one
    * static call per row — no interpreted higher-order functions, no
    * overflow under ANSI mode), and the same fold is rendered in DuckDB
    * hugeint SQL by [[graft.queries.DuckHashSql.rollingHashSql]] so the
    * fingerprint query has a true cross-engine oracle. */
  def rollingHash(text: Column): Column = Hashing.rollingHash(text)
}
