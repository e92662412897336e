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

  test("boilerplate removal cuts df>maxDf spans EVERYWHERE, keeps rare dups") {
    import spark.implicits._
    val docs = Seq(
      (1L, "nav bar x1 x2"), // "nav bar" in docs 1,2,3 (df=3 > 2) -> cut everywhere
      (2L, "nav bar y1 y2"), // "y1 y2" also in doc 4 (df=2 <= 2) -> kept BOTH places
      (3L, "nav bar z1 z2"),
      (4L, "y1 y2 w1 w2"),
      (5L, "nav bar")        // fully boilerplate -> vanishes
    ).toDF("doc_id", "text")
    val out = SpanDedup.removeBoilerplate(docs, "doc_id", "text", n = 2, maxDf = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    out shouldBe Array(
      (1L, "x1 x2", 1L, 1L),
      (2L, "y1 y2", 1L, 1L),
      (3L, "z1 z2", 1L, 1L),
      (4L, "y1 y2 w1 w2", 2L, 0L))
  }

  test("boilerplate removal matches a brute-force reference on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("a", "b", "c", "d")
    for (trial <- 1 to 5) {
      val n = 1 + rnd.nextInt(3)
      val maxDf = 1 + rnd.nextInt(2)
      val docs = (1L to 30L).map(id =>
        (id, Vector.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))

      def spansOf(t: String): Vector[String] =
        t.trim.split("\\s+").grouped(n).map(_.mkString(" ")).toVector
      val df = docs.flatMap { case (id, t) => spansOf(t).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).distinct.size }
      val boiler = df.filter(_._2 > maxDf).keySet
      val expected = docs.flatMap { case (id, t) =>
        val sp = spansOf(t)
        val kept = sp.filterNot(boiler)
        if (kept.isEmpty) None
        else Some((id, kept.mkString(" "), kept.size.toLong, (sp.size - kept.size).toLong))
      }.sortBy(_._1)

      val got = SpanDedup.removeBoilerplate(docs.toDF("doc_id", "text"), "doc_id", "text", n, maxDf)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      withClue(s"trial=$trial n=$n maxDf=$maxDf: ") { got shouldBe expected }
    }
  }
}
