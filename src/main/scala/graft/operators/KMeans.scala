package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Deterministic distributed Lloyd's k-means over an embedding column, plus
  * the SemDeDup pruning step that motivates it for training-data curation
  * (cluster the corpus, then drop near-duplicate members WITHIN each
  * cluster — Abbas et al. 2023, "SemDeDup": the clustering bounds the pair
  * expansion that an all-pairs cosine sweep could never afford).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - seeding is a bounded driver pull: the k lowest-id vectors (k × dim
  *    doubles), the same bounded-centroid pattern as the IVF index
  *    ([[Similarity]]);
  *  - each ASSIGNMENT round is map-side only: the k centroids ride into the
  *    plan as array literals and every row computes k codegen'd squared-L2
  *    folds ([[graft.functions.FloatSqDist]]) + an argmin — no join, no
  *    shuffle, one streaming pass over the corpus;
  *  - each UPDATE round shuffles (cluster, dim) cells — k × dim rows out of
  *    the partial aggregation, not corpus rows;
  *  - SemDeDup's pair expansion is an equi-join on the cluster id, so its
  *    cost is sum(|cluster|²) — operators choose k so clusters stay small
  *    (the paper uses k ≈ √N to n/1000), never the corpus cross product.
  *
  * Determinism, for the cross-engine oracle: seeds are the k lowest ids
  * (not random), distance folds are left-to-right element order, argmin
  * tie-breaks on (distance, cluster id), and — under [[SumMode.ExactFold]]
  * — centroid means fold members in id order, so every step replays
  * identically in DuckDB SQL. At corpus scale pass [[SumMode.PlaneSums]]
  * instead: the update means become plain partial-agg double sums (bounded
  * per-group state, map-side combine, no per-(cluster, dim) member
  * collect) with last-ulp summation-order drift accepted — the same
  * two-mode contract as [[VectorOps]], pinned by `SumModePlanSpec`-style
  * tests in `KMeansSpec`.
  */
object KMeans {

  /** The trained coarse model on its own: centroids after `rounds - 1`
    * update rounds (the centroids that `assignments(k, rounds)` scores its
    * final assignment against). Bounded — k × dim doubles — which is what
    * makes it an [[ArtifactStore]]/persistence candidate: train once, ship
    * the table, every consumer calls [[assignWith]]. */
  def trainCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int,
      sumMode: SumMode): Seq[(Int, Array[Double])] = {
    require(k >= 1, s"kmeans: k must be >= 1, got $k")
    require(rounds >= 1, s"kmeans: rounds must be >= 1, got $rounds")
    val rows = prep(df, idCol, vecCol)

    // Deterministic seeding: cluster i = the i-th lowest-id vector with no
    // NULL elements (a seed must be scoreable against every row — a NULL
    // element would NULL every distance). Bounded driver pull (k x dim
    // doubles) — the IVF centroid pattern.
    var centroids: Seq[(Int, Array[Double])] =
      rows.filter(forall(col("v"), x => x.isNotNull))
        .orderBy(col("id")).limit(k).collect().toSeq.zipWithIndex.map {
        case (r, i) =>
          i -> r.getSeq[Any](1).map {
            case f: java.lang.Float  => f.toDouble
            case d: java.lang.Double => d.doubleValue()
            case other => throw new IllegalArgumentException(
              s"kmeans: vector elements must be float/double, got " +
                (if (other == null) "NULL" else other.getClass.toString))
          }.toArray
      }

    for (_ <- 1 until rounds) {
      // Centroid update: mean per (cluster, dim) under `sumMode`. One
      // shuffle of (cluster, dim) cells; the k x dim mean cells come back
      // as ONE bounded driver pull and assemble into vectors driver-side
      // (a second per-cluster shuffle just to collect_list dims would be
      // pure overhead at any scale).
      val cells = updateCells(assignedFrame(rows, centroids), sumMode).collect()
      // Clusters that lost every member simply disappear (same in the SQL
      // oracle: the update GROUP BY has no row for them).
      centroids = cells.groupBy(_.getInt(0)).map { case (cid, rs) =>
        cid -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
      }.toSeq.sortBy(_._1)
    }
    centroids
  }

  /** The Lloyd update's (cluster, dim, m) mean cells for one assigned
    * round, under the corpus-sum convention:
    * [[SumMode.ExactFold]] folds members in id order (the oracle-replayable
    * verify convention — per-group collect, unbounded state);
    * [[SumMode.PlaneSums]] is a plain partial-agg double sum / count
    * (bounded state, map-side combine — the 100 TB mode). Exposed to
    * `KMeansSpec` so the PlaneSums plan can be pinned collect_list-free. */
  private[operators] def updateCells(
      assigned: DataFrame, sumMode: SumMode): DataFrame = {
    val ex = assigned
      .select(col("id"), col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
    sumMode match {
      case SumMode.ExactFold =>
        ex.groupBy(col("cluster"), col("dim"))
          .agg(
            sort_array(collect_list(struct(col("id"), col("x")))).as("xs"),
            count(lit(1)).as("n"))
          .select(col("cluster"), col("dim"),
            (aggregate(col("xs"), lit(0.0), (a, s) => a + s.getField("x")) / col("n")).as("m"))
      case SumMode.PlaneSums =>
        ex.groupBy(col("cluster"), col("dim"))
          .agg((sum(col("x")) / count(lit(1))).as("m"))
    }
  }

  /** Score `df` against an already-trained centroid table — the consumer
    * half of train-once: one map-side pass (centroids ride as plan
    * literals), no training jobs. Returns (id, cluster, dist). */
  def assignWith(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Array[Double])]): DataFrame =
    assignedFrame(prep(df, idCol, vecCol), centroids)
      .select(col("id"), col("cluster"), col("dist"))

  /** Cluster assignments after `rounds` assignment rounds (with a centroid
    * update between consecutive rounds — `rounds = 2` means assign → update
    * → assign): [[trainCentroids]] + [[assignWith]] in one call. Returns
    * (id, cluster, dist): the member's cluster id in [0, k) keyed by seed
    * order, and its squared-L2 distance to that centroid. Rows with NULL
    * vectors (or a dimension that matches no centroid) are dropped — a
    * vector that cannot be scored is not a cluster member.
    */
  def assignments(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int,
      sumMode: SumMode): DataFrame =
    assignWith(df, idCol, vecCol, trainCentroids(df, idCol, vecCol, k, rounds, sumMode))

  private def prep(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)

  /** (id, v, cluster, dist) under `centroids`: argmin over k codegen'd
    * squared-L2 distances, tie-break on cluster id — array_sort on
    * struct(d, cluster) is field-lexicographic, so element 0 is exactly
    * row_number() OVER (ORDER BY d, cid) = 1. */
  private def assignedFrame(
      rows: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val scored = centroids.map { case (cid, c) =>
      struct(VectorOps.sqDist(col("v"), typedlit(c.toSeq)).as("d"),
        lit(cid).as("cluster"))
    }
    rows.withColumn("best", array_sort(array(scored: _*)).getItem(0))
      .select(col("id"), col("v"),
        col("best.cluster").as("cluster"), col("best.d").as("dist"))
      .filter(col("dist").isNotNull)
  }

  /** SemDeDup: cluster, then mark within-cluster near-duplicates. A row is
    * dropped iff some LOWER-id member of its cluster has cosine >=
    * `threshold` with it (keep-lowest-id — deterministic, and one member of
    * every duplicate group always survives). Returns
    * (id, cluster, dist, dropped). Pair expansion is bucketed by cluster —
    * sum(|cluster|²) work, never corpus all-pairs.
    *
    * PRECONDITION: ids are unique (shared with the kNN family) — the
    * re-join of assignments to vectors and the `id_a < id_b` pair order
    * both key on it. */
  def semDeDup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      rounds: Int,
      threshold: Double,
      sumMode: SumMode): DataFrame =
    semDeDupWith(df, idCol, vecCol,
      trainCentroids(df, idCol, vecCol, k, rounds, sumMode), threshold)

  /** [[semDeDup]] against an already-trained centroid table (the
    * train-once consumer form — see [[assignWith]]). */
  def semDeDupWith(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[(Int, Array[Double])],
      threshold: Double): DataFrame = {
    val asg = assignWith(df, idCol, vecCol, centroids)
    val members = asg.join(
        df.select(col(idCol).as("id"), col(vecCol).as("v")), Seq("id"))
    val a = members.select(col("cluster"), col("id").as("id_a"), col("v").as("v_a"))
    val b = members.select(col("cluster"), col("id").as("id_b"), col("v").as("v_b"))
    val droppedIds = a.join(b,
        a("cluster") === b("cluster") && col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("id")).distinct()
        .withColumn("is_dropped", lit(true))
    asg.join(droppedIds, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("dist"),
        coalesce(col("is_dropped"), lit(false)).as("dropped"))
  }
}
