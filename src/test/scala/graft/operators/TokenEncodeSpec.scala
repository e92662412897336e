package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.queries.PipelineQueries

/** Token-id encoding semantics: identical token sequences encode to the
  * same md5, a PERMUTED sequence encodes differently (order is part of the
  * encoding — the property the shuffle could silently destroy if ids were
  * not re-sorted by position inside the aggregate), and OOV tokens are
  * counted, not dropped. Cross-engine byte-equality of the id sequences is
  * the DuckDB oracle's job. */
class TokenEncodeSpec extends SparkSpec with Matchers {

  /** 'alpha'/'beta' dominate the counts and land in-vocab; 'rare1'..'rareN'
    * appear once each, so with maxVocab=20 the 25 distinct rares force some
    * tokens out of vocab deterministically. Docs 0 and 1 are identical,
    * doc 2 is doc 0 reversed. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-tokenc-fixture").toString
    val rares = (1 to 25).map(i => s"rare$i").mkString(" ")
    Seq(
      (0L, "alpha beta alpha gamma"),
      (1L, "alpha beta alpha gamma"),
      (2L, "gamma alpha beta alpha"),
      (3L, rares))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private lazy val rows = PipelineQueries.tokenIdEncode(spark, dir)
    .collect()
    .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
    .toMap

  test("identical docs encode identically; a permutation encodes differently") {
    rows(0L)._3 shouldBe rows(1L)._3
    rows(2L)._3 should not be rows(0L)._3
    // same multiset of ids -> same token/oov counts even though md5 differs
    rows(2L)._1 shouldBe rows(0L)._1
    rows(2L)._2 shouldBe rows(0L)._2
  }

  test("OOV tokens are counted against the reserved id, never dropped") {
    // docs 0-2 use only the 3 dominant tokens -> fully in-vocab
    rows(0L)._2 shouldBe 0L
    // doc 3 is 25 singleton tokens against a vocab of 20; 17 stay in vocab
    // (3 dominants + 17 rares by (count desc, token) order), 8 fall out
    rows(3L)._1 shouldBe 25L
    rows(3L)._2 shouldBe 8L
  }
}
