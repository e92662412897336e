package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The q64/q174 oracle-consistency guard (SURVEY §7.5 open item, now a
  * test): both near-dup lanes run `cosineNearDupsBucketed` in auto mode —
  * q64 at (minPlanes=5, occupancy=16), q174 at (minPlanes=4,
  * occupancy=32) — and each DuckDB oracle replays the banding at the
  * CONSTANT planes its configuration resolves at the verify SF. Auto mode
  * resolves max(minPlanes, ceil(log2(n/occupancy))) from the corpus size,
  * and both configurations share the n ≤ 512 boundary. If the driver ever
  * regenerates testdata past that, this spec fails with the regeneration
  * instruction instead of the oracle diverging opaquely at judging time. */
class AutoPlanesGuardSpec extends SparkSpec with Matchers {

  private val verifySf = "/root/testdata/sf0.01"
  // (lane, oracle's planes constant = the lane's minPlanes, occupancy)
  private val Lanes = Seq(
    ("q64_neardup_bucketed", 5, 16),
    ("q174_neardup_bucketed_auto", 4, 32))

  test("pure resolution math: constant below the boundary, grows past it") {
    for ((_, oraclePlanes, occupancy) <- Lanes) {
      Similarity.resolvedAutoPlanes(0, occupancy, oraclePlanes) shouldBe oraclePlanes
      Similarity.resolvedAutoPlanes(512, occupancy, oraclePlanes) shouldBe oraclePlanes
      Similarity.resolvedAutoPlanes(513, occupancy, oraclePlanes) shouldBe (oraclePlanes + 1)
      Similarity.resolvedAutoPlanes(5120, occupancy, oraclePlanes) shouldBe (oraclePlanes + 4)
      Similarity.resolvedAutoPlanes(100, 0, oraclePlanes) shouldBe oraclePlanes // auto off
    }
  }

  test("verify-SF embeddings still resolve to each lane oracle's planes constant") {
    assume(new java.io.File(s"$verifySf/embeddings.parquet").exists())
    import org.apache.spark.sql.functions.col
    val n = spark.read.parquet(s"$verifySf/embeddings.parquet")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull).count()
    for ((lane, oraclePlanes, occupancy) <- Lanes) {
      val resolved = Similarity.resolvedAutoPlanes(n, occupancy, oraclePlanes)
      withClue(
        s"embeddings at $verifySf grew to $n rows: $lane's auto mode now resolves " +
          s"$resolved planes but its oracle bands at $oraclePlanes — regenerate the " +
          "lane's oracle (srpBandedCte planes constant in SimilarityQueries) to the " +
          "resolved value, or raise the lane's occupancy so the verify SF stays " +
          "below the boundary: ") {
        resolved shouldBe oraclePlanes
      }
    }
  }
}
