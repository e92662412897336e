package graft.operators

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The q174 oracle-consistency guard (SURVEY §7.5 open item, now a test):
  * `q174_neardup_bucketed_auto` runs `cosineNearDupsBucketed` with
  * planes=4 and autoPlanesOccupancy=32, and its DuckDB oracle replays the
  * banding at the CONSTANT planes=4. Auto mode resolves
  * max(4, ceil(log2(n/32))) from the corpus size, so the two agree only
  * while the verify-SF embeddings table holds ≤ 512 non-null vectors. If
  * the driver ever regenerates testdata past that, this spec fails with
  * the regeneration instruction instead of the oracle diverging opaquely
  * at judging time. */
class AutoPlanesGuardSpec extends SparkSpec with Matchers {

  private val verifySf = "/root/testdata/sf0.01"
  private val OraclePlanes = 4
  private val LaneOccupancy = 32

  test("pure resolution math: constant below the boundary, grows past it") {
    Similarity.resolvedAutoPlanes(0, LaneOccupancy, OraclePlanes) shouldBe OraclePlanes
    Similarity.resolvedAutoPlanes(512, LaneOccupancy, OraclePlanes) shouldBe OraclePlanes
    Similarity.resolvedAutoPlanes(513, LaneOccupancy, OraclePlanes) shouldBe 5
    Similarity.resolvedAutoPlanes(5120, LaneOccupancy, OraclePlanes) shouldBe 8
    Similarity.resolvedAutoPlanes(100, 0, OraclePlanes) shouldBe OraclePlanes // auto off
  }

  test("verify-SF embeddings still resolve to the q174 oracle's planes constant") {
    assume(new java.io.File(s"$verifySf/embeddings.parquet").exists())
    import org.apache.spark.sql.functions.col
    val n = spark.read.parquet(s"$verifySf/embeddings.parquet")
      .filter(col("vec_id").isNotNull && col("embedding").isNotNull).count()
    val resolved = Similarity.resolvedAutoPlanes(n, LaneOccupancy, OraclePlanes)
    withClue(
      s"embeddings at $verifySf grew to $n rows: q174's auto mode now resolves " +
        s"$resolved planes but its oracle bands at $OraclePlanes — regenerate the " +
        "q174 oracle (srpBandedCte planes constant in SimilarityQueries." +
        "nearDupsBucketedAutoOracle) to the resolved value, or raise the lane's " +
        "occupancy so the verify SF stays below the boundary: ") {
      resolved shouldBe OraclePlanes
    }
  }
}
