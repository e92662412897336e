package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Spans

/** C4-style span-level exact deduplication: cut every document into
  * consecutive non-overlapping n-token spans, keep each distinct span's
  * FIRST occurrence corpus-wide (ordered by document id, then position), and
  * reassemble the surviving spans into cleaned documents — the classic
  * boilerplate-removal pass of web-corpus curation, at span rather than
  * whole-document granularity (that one is [[Dedup.exact]]).
  *
  * Scale shape: span extraction is a codegen'd primitive loop in the scan
  * stage ([[graft.functions.WordSpansOf]]); first-occurrence selection is ONE
  * shuffle keyed by the span text (inherent — corpus-wide dedup must co-locate
  * identical spans); reassembly is one shuffle back on the document id. No
  * driver-side state, no all-pairs anything. The per-document reassembly sort
  * runs over a tiny array (spans-per-doc, ~tokens/n), where an interpreted
  * lambda is harmless — the per-TOKEN work all sits in codegen. */
object SpanDedup {

  /** Returns (idCol, clean_text, n_spans): documents rebuilt from their
    * surviving spans; documents whose every span was claimed earlier
    * disappear (their text would be empty), and so do NULL-text documents
    * (posexplode of a NULL span array yields no rows — SQL semantics: NULL
    * text has no spans to keep). */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spans = docs.select(col(idCol),
      posexplode(Spans.wordSpans(col(textCol), n)).as(Seq("span_no", "span")))
    val firstOccurrence = Window.partitionBy(col("span")).orderBy(col(idCol), col("span_no"))
    spans.withColumn("rn", row_number().over(firstOccurrence))
      .filter(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("span_no"), col("span")))),
            s => s.getField("span"))).as("clean_text"),
        count(lit(1)).as("n_spans"))
  }

  /** CCNet/RefinedWeb-style boilerplate removal by DOCUMENT FREQUENCY: a
    * span occurring in more than `maxDf` distinct documents is boilerplate
    * (navigation chrome, license banners, templated headers) and is removed
    * from EVERY document — including its first occurrence, which is what
    * separates this rule from [[dedupSpans]]'s first-occurrence-wins
    * dedup: here popularity itself is the evidence of worthlessness, and
    * rare duplicates are left alone entirely.
    *
    * Returns (idCol, clean_text, n_spans_kept, n_spans_removed); documents
    * whose every span is boilerplate disappear (empty text), mirroring
    * [[dedupSpans]], and NULL-text documents contribute no spans.
    *
    * Scale shape: the DF count is ONE shuffle keyed by span text with
    * map-side partial distinct (inherent — corpus-wide frequency needs
    * co-location), but the removal itself is a BROADCAST left-anti join:
    * the boilerplate list is small BY CONSTRUCTION (spans with df > maxDf
    * are the heavy hitters of the span distribution — bounded by
    * total_spans / maxDf distinct values, and in practice by the far
    * smaller set of truly templated text), so the per-document rebuild
    * never reshuffles the corpus on span text a second time. */
  def removeBoilerplate(
      docs: DataFrame, idCol: String, textCol: String, n: Int, maxDf: Int): DataFrame = {
    val spans = docs.select(col(idCol),
      posexplode(Spans.wordSpans(col(textCol), n)).as(Seq("span_no", "span")))
    val boiler = spans.groupBy(col("span"))
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("span"))
    spans.join(broadcast(boiler), Seq("span"), "left_anti")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("span_no"), col("span")))),
            s => s.getField("span"))).as("clean_text"),
        count(lit(1)).as("n_spans_kept"))
      .join(
        docs.select(col(idCol),
          size(Spans.wordSpans(col(textCol), n)).as("n_total")), Seq(idCol))
      .select(col(idCol), col("clean_text"), col("n_spans_kept"),
        (col("n_total") - col("n_spans_kept")).as("n_spans_removed"))
  }
}
