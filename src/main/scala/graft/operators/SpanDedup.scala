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
}
