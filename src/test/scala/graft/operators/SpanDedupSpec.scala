package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Span-dedup semantics: first occurrence wins corpus-wide, reassembly
  * preserves surviving-span order, and fully-claimed documents vanish. */
class SpanDedupSpec extends SparkSpec with Matchers {

  test("first occurrence wins; later duplicate spans are cut out") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),          // spans (n=3): "a b c", "d e f"
      (2L, "a b c x y z"),          // first span duplicates doc 1's -> cut
      (3L, "d e f")                 // whole doc claimed by doc 1 -> vanishes
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    out shouldBe Array(
      (1L, "a b c d e f", 2L),
      (2L, "x y z", 1L))
  }

  test("position order survives when a MIDDLE span is cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "dup span one"),
      (2L, "k1 k2 k3 dup span one k7 k8 k9")
    ).toDF("doc_id", "text")
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    out shouldBe Array(
      (1L, "dup span one"),
      (2L, "k1 k2 k3 k7 k8 k9"))
  }

  test("within a document, a repeated span keeps only its first position") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text") // spans: "a b" x3 at n=2
    val out = SpanDedup.dedupSpans(docs, "doc_id", "text", n = 2).collect()
    out.length shouldBe 1
    out.head.getString(1) shouldBe "a b"
    out.head.getLong(2) shouldBe 1L
  }
}
