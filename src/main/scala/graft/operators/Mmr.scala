package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998) —
  * diversify a per-query candidate list by greedily selecting
  * argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), the standard last-stage
  * diversifier for retrieval/RAG pipelines on top of a kNN or BM25
  * candidate generator.
  *
  * Scale shape: MMR is quadratic in the CANDIDATE list, so it must run
  * after a bounded top-C candidate stage (kNN/BM25 — both bounded in this
  * library). Each query group carries ≤ C (id, rel, vector) rows through
  * one `groupByKey.flatMapGroups` — the greedy loop is O(k·C·dim) per
  * group, embarrassingly parallel across queries, with no driver
  * participation and nothing shuffled but the candidate rows themselves.
  * This is the (d)-tier `mapGroups` escape hatch used deliberately:
  * iterative argmax over a mutable selected set has no declarative
  * equivalent that Catalyst wouldn't expand to k self-joins.
  *
  * Determinism (cross-engine oracle): candidate sims use the library's
  * double cosine convention — left-to-right fold, dot/(√·√) in exactly
  * that association — ties break on lowest candidate id, the diversity
  * term is 0 for the first pick, and μ is computed as 1.0 − λ (NOT a
  * pre-rounded literal: 1.0 − 0.7 ≠ 0.3 in binary64, and the oracle
  * replays the subtraction so both engines weigh with identical bits).
  */
object Mmr {

  /** Greedy double-precision cosine, same convention as
    * [[Similarity.cosine]]'s codegen'd column form. */
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Re-rank `candidates` (one row per (query, candidate) with a relevance
    * score and the candidate's vector) down to the `k` most
    * relevant-yet-diverse per query. Returns
    * (query_id, mmr_rank, neighbor_id, mmr_score).
    *
    * PRECONDITION: the per-query candidate list is bounded (top-C from a
    * retrieval stage) and candidate ids are unique per query. NULL vectors
    * or relevance scores are dropped (no cosine → not a candidate). */
  def rerank(
      candidates: DataFrame,
      queryCol: String,
      idCol: String,
      relCol: String,
      vecCol: String,
      k: Int,
      lambda: Double): DataFrame = {
    require(k >= 1, s"mmr: k must be >= 1, got $k")
    require(lambda >= 0.0 && lambda <= 1.0, s"mmr: lambda must be in [0,1], got $lambda")
    val spark = candidates.sparkSession
    import spark.implicits._
    val mu = 1.0 - lambda
    candidates
      .select(col(queryCol).cast("long").as("q"), col(idCol).cast("long").as("id"),
        col(relCol).cast("double").as("rel"), col(vecCol).cast("array<double>").as("v"))
      .filter(col("q").isNotNull && col("id").isNotNull &&
        col("rel").isNotNull && col("v").isNotNull &&
        forall(col("v"), x => x.isNotNull))
      .as[(Long, Long, Double, Array[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (q, it) =>
        // id-ascending iteration + strict > keeps the lowest id on ties
        val cands = it.toArray.sortBy(_._2)
        val used = new Array[Boolean](cands.length)
        val selVecs = ArrayBuffer.empty[Array[Double]]
        val out = ArrayBuffer.empty[(Long, Int, Long, Double)]
        var rank = 1
        var stuck = false
        while (rank <= k && out.length < cands.length && !stuck) {
          var best = -1
          var bestScore = Double.NegativeInfinity
          var i = 0
          while (i < cands.length) {
            if (!used(i)) {
              // true max over the selected set (can be negative — first
              // assigns unconditionally); a NaN cosine (zero-norm vector on
              // either side) carries no diversity information and is
              // SKIPPED — folding it in would NaN-poison the score and
              // silently wedge the whole group after one bad row
              var maxSim = 0.0
              var first = true
              selVecs.foreach { s =>
                val c = cos(s, cands(i)._4)
                if (!c.isNaN && (first || c > maxSim)) { maxSim = c; first = false }
              }
              val score = lambda * cands(i)._3 - mu * maxSim
              if (score > bestScore) { bestScore = score; best = i }
            }
            i += 1
          }
          // unreachable unless a NaN rel slips through the null filter —
          // stop emitting rather than index with best = -1
          if (best < 0) stuck = true
          else {
            used(best) = true
            selVecs += cands(best)._4
            out += ((q, rank, cands(best)._2, bestScore))
            rank += 1
          }
        }
        out
      }
      .toDF("query_id", "mmr_rank", "neighbor_id", "mmr_score")
  }
}
