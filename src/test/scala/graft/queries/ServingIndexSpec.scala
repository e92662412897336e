package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Dedup

/** The dedup members of the artifact/serving family (q222–q225): the Bloom
  * membership filter and the MinHash band index, persisted through the
  * fixedwidth sink and served to streams. The driver oracle hash-checks the
  * lane outputs; these tests pin the OPERATOR properties the oracle can't
  * state — no false negatives, round-trip value identity, and serving
  * recall against the batch near-dup sweep.
  */
class ServingIndexSpec extends SparkSpec with Matchers {

  private val dir = "/root/testdata/sf0.001"

  test("bloom filter has no false negatives over the indexed half") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val bits = DedupQueries.persistedBloomLookup(spark, dir)
    bits.length shouldBe DedupQueries.BloomBits
    val fps = QueryRegistry.table(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 0 && col("text").isNotNull)
      .select(graft.functions.Hashing.rollingHash(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    fps should not be empty
    fps.foreach { fp =>
      (0 until DedupQueries.BloomK).foreach { i =>
        val bit = java.lang.Math.floorMod(
          graft.functions.Hashing.mix64(fp, i), DedupQueries.BloomBits.toLong)
        assert(bits(bit.toInt),
          s"indexed fingerprint $fp probe $i bit $bit not set — false negative")
      }
    }
  }

  test("minhash band index round-trips the sketch pipeline exactly") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val reloaded = DedupQueries.minhashIndexArtifact(spark, dir)
    val expected = Dedup.minhashSketches(
        QueryRegistry.table(spark, dir, "documents")
          .filter(col("doc_id") % 2 === 0),
        "doc_id", "text",
        DedupQueries.IdxShingle, DedupQueries.IdxHashes, DedupQueries.IdxBands)
      .select(col("id").as("doc_id"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    reloaded.count() shouldBe expected.count()
    reloaded.except(expected).count() shouldBe 0L
    expected.except(reloaded).count() shouldBe 0L
  }

  test("stream serving confirms every cross-half batch near-dup pair") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    // Batch truth: near-dup pairs over the WHOLE corpus at the index params;
    // any pair with one indexed (even) and one arriving (odd) member must
    // surface as a confirmed dup for the arrival in the serving lane.
    val pairs = Dedup.minhashNearDups(
        QueryRegistry.table(spark, dir, "documents"),
        "doc_id", "text",
        shingleLen = DedupQueries.IdxShingle, numHashes = DedupQueries.IdxHashes,
        bands = DedupQueries.IdxBands, threshold = 0.5)
      .collect()
      .flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        if (a % 2 != b % 2) Some(if (a % 2 == 1) a else b) else None
      }.toSet
    val served = StreamingQueries.streamNearDupServe(spark, dir)
      .filter(col("n_dup") >= 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    pairs.foreach { odd =>
      assert(served.contains(odd),
        s"arrival $odd near-dups an indexed doc in batch but not in serving")
    }
  }
}
