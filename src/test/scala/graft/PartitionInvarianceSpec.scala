package graft

import org.scalatest.matchers.should.Matchers

import graft.queries.QueryRegistry

/** The repo's central cross-engine claim — results are exact functions of
  * the DATA, not of the physical plan — tested directly: representative
  * lanes from every float-convention family (decimal-exact sums, ordered
  * folds, integer-ratio doubles, bounded driver pulls, hash-derived
  * sampling) must return IDENTICAL rows under different
  * `spark.sql.shuffle.partitions`. A lane that leaked partial-aggregation
  * order into a double, or iterated a driver loop over an
  * ordering-dependent collect, fails here before it can flake in the
  * oracle gate. Sessions are isolated via `newSession()` (own SQLConf,
  * shared context) — the streaming lanes manage their own sessions and
  * are exercised by their micro-batch-split specs instead. */
class PartitionInvarianceSpec extends SparkSpec with Matchers {

  private val sfDir = "/root/testdata/sf0.001"

  // one lane per convention family; kept cheap (sf0.001)
  private val lanes = Seq(
    "q01_fw_pricing_summary",      // fixedwidth scan + decimal-exact sums
    "q34_median_agg",              // typed Aggregator
    "q52_minhash_lsh_neardup",     // sketch + band shuffle + verification
    "q56_hash_sample",             // mix64-keyed selection
    "q60_knn_bruteforce",          // double cosine folds + top-k
    "q103_label_centroids",        // per-group ordered fold
    "q141_char_stats",             // codegen'd one-pass expression
    "q164_heavy_hitters",          // per-partition SpaceSaving + verify
    "q175_zipf_audit",             // regression over vocabulary rows
    "q187_embedding_standardize",  // corpus moments broadcast back
    "q189_segment_em_train",       // driver EM loop over collected dict
    "q193_power_iteration",        // iterated joins + ordered folds
    "q194_pareto_frontier")        // window sweep + broadcast join back

  private def run(name: String, partitions: Int): Seq[String] = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    QueryRegistry.queries(name)(ss, sfDir)
      .collect().map(_.toString).sorted.toSeq
  }

  test("lane results are identical under 3-way vs 13-way shuffle partitioning") {
    lanes.foreach { name =>
      withClue(s"$name: ") { run(name, 3) shouldBe run(name, 13) }
    }
  }

  test("lane results are identical with AQE disabled") {
    // AQE coalesces/replans at runtime — a second physical-plan axis the
    // conventions must be invariant to
    val sample = Seq("q103_label_centroids", "q187_embedding_standardize",
      "q193_power_iteration", "q52_minhash_lsh_neardup", "q189_segment_em_train")
    sample.foreach { name =>
      val ss = spark.newSession()
      ss.conf.set("spark.sql.adaptive.enabled", "false")
      ss.conf.set("spark.sql.shuffle.partitions", "7")
      val noAqe = QueryRegistry.queries(name)(ss, sfDir)
        .collect().map(_.toString).sorted.toSeq
      withClue(s"$name: ") { noAqe shouldBe run(name, 7) }
    }
  }
}
