package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Farthest-point sampling (greedy k-center, Gonzalez 1985) over an
  * embedding column — the diversity-coreset selection primitive used in
  * training-data curation to pick a maximally-spread subset (seed set for
  * active learning, eval-set selection, prototype picking). Greedy FPS is
  * the classic 2-approximation to the k-center objective.
  *
  * Scale shape: the selected set is k-bounded BY DEFINITION, so the driver
  * loop is k bounded pulls of one (id, vector) row each — the same pattern
  * as [[KMeans]] seeding / IVF centroids. Round r is ONE map-side corpus
  * pass: the r−1 selected vectors ride into the plan as array literals and
  * every row computes codegen'd squared-L2 folds ([[graft.functions.FloatSqDist]])
  * reduced with `least` — no join, no shuffle; the argmax is a
  * TakeOrderedAndProject (top-1 per partition, merge on the driver). Total
  * work is Σr = O(k²·n/2) distance folds; at large k the standard
  * refinement is a persisted running-min column updated with ONE new fold
  * per round (O(k·n)) — not needed at the k this library targets, where
  * the re-fold keeps the operator stateless between rounds.
  *
  * Determinism (cross-engine oracle): seed = lowest id; distance = the
  * left-to-right squared-L2 fold; argmax tie-breaks on lowest id; `least`
  * over selected centers equals set-min (order-free for non-NaN doubles) —
  * every round replays identically in DuckDB SQL (recursive CTE).
  *
  * PRECONDITION: ids are unique and numeric (cast to long); rows with a
  * NULL vector or any NULL element are excluded up front (they cannot be
  * scored — the [[KMeans]] stance).
  */
object Coreset {

  /** Select `k` rows by greedy farthest-point sampling. Returns
    * (sel_rank, vec_id, min_sq_dist): 1-based selection order, the chosen
    * id, and its min squared-L2 distance to the previously-selected set at
    * selection time (NULL for the seed). Stops early if the corpus has
    * fewer than k scoreable rows. */
  def farthestPointSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"fps: k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // the id cast NULLs non-numeric ids — drop them here or the driver
    // pull would NPE on getLong; same stance as the null-vector filter
    val rows = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .filter(col("id").isNotNull &&
        col("v").isNotNull && forall(col("v"), x => x.isNotNull))
      .persist()
    try {
      def vecOf(r: Row): Array[Double] = r.getSeq[Any](1).map {
        case f: java.lang.Float  => f.toDouble
        case d: java.lang.Double => d.doubleValue()
        case other => throw new IllegalArgumentException(
          s"fps: vector elements must be float/double, got ${other.getClass}")
      }.toArray

      val seedRows = rows.orderBy(col("id")).limit(1).collect()
      val sel = ArrayBuffer.empty[(Int, Long, Option[Double])]
      if (seedRows.nonEmpty) {
        var centers = Vector(vecOf(seedRows(0)))
        sel += ((1, seedRows(0).getLong(0), None))
        var rank = 2
        var exhausted = false
        while (rank <= k && !exhausted) {
          val md = centers
            .map(c => VectorOps.sqDist(col("v"), typedlit(c.toSeq)))
            .reduce(least(_, _))
          val next = rows.filter(!col("id").isin(sel.map(_._2).toSeq: _*))
            .select(col("id"), col("v"), md.as("md"))
            .orderBy(desc("md"), asc("id")).limit(1).collect()
          if (next.isEmpty) exhausted = true
          else {
            sel += ((rank, next(0).getLong(0), Some(next(0).getDouble(2))))
            centers :+= vecOf(next(0))
            rank += 1
          }
        }
      }
      spark.createDataset(sel.toSeq).toDF("sel_rank", "vec_id", "min_sq_dist")
    } finally rows.unpersist(blocking = false)
  }
}
