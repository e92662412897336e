package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), designed for
  * the 100 TB regime:
  *
  *  - brute-force cosine top-k: the exactness baseline — broadcast the
  *    (small) query set, one streaming pass over the corpus computing
  *    cosines map-side, then a per-query top-k;
  *  - sign-random-projection LSH (SRP) ANN: the scale path — per-row bucket
  *    signatures are pure column expressions (map-side), candidate
  *    generation is an equi-join on (table, bucket) instead of the full
  *    cross product, exact cosine is computed for candidates only.
  *
  * All math is double-precision with a deterministic left-to-right fold, so
  * results are bit-identical across engines (the DuckDB oracle replicates
  * the same generate_series fold; DuckDB's builtin list_dot_product is
  * float-precision and does NOT match).
  */
object Similarity {

  /** Double-precision dot product of two equal-length numeric arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact k-nearest-neighbors by cosine for every query vector.
    *
    * `queries` MUST be small (it is broadcast): the corpus is streamed once
    * and never shuffled at full width — only the (|queries| x |corpus|)
    * similarity rows move through the per-query top-k. At cluster scale the
    * window's shuffle carries Q x N skinny rows; for very large Q, swap the
    * window for a two-phase per-partition heap merge.
    */
  def knnBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val e = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("e_vec"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("e_vec")).as("cos"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1): component
    * `j` of hyperplane `p` of table `t`. Derived from xxhash64 so every
    * executor materializes the same hyperplanes with no broadcast state. */
  private def hyperplane(t: Int, p: Int, tables: Int, planes: Int)(j: Column): Column =
    pmod(xxhash64(lit(t * planes + p), j), lit(2000001L)).cast("double") / 1000000.0 - 1.0

  /** SRP-LSH bucket ids, one per table: bit p of table t's bucket is the
    * sign of the projection onto pseudo-random hyperplane (t, p). Returns an
    * array<long> of length `tables`. Pure map-side expression; works for any
    * vector dimensionality (the index-aware `transform` supplies j). */
  def srpBuckets(vec: Column, tables: Int, planes: Int): Column = {
    def bucketFor(t: Int): Column =
      (0 until planes).map { p =>
        val proj = aggregate(
          transform(vec, (x, j) => x.cast("double") * hyperplane(t, p, tables, planes)(j)),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    array((0 until tables).map(bucketFor): _*)
  }

  /** Approximate k-NN via SRP-LSH: candidates are corpus vectors sharing at
    * least one (table, bucket) with the query; exact cosine is computed on
    * candidates only. Recall/cost is tuned by (tables, planes): more planes
    * = smaller buckets = fewer candidates, more tables = higher recall.
    *
    * Scale shape: corpus signatures are map-side; the ONLY wide operation is
    * an equi-shuffle-join on (table, bucket) against the exploded query
    * signatures (broadcast when queries are small), then a distinct and the
    * candidate-only cosine. The full cross product never materializes.
    */
  def knnApproxLsh(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      tables: Int = 16,
      planes: Int = 8): DataFrame = {
    def banded(df: DataFrame, id: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(s"${id}_vec"))
        .select(col(id), col(s"${id}_vec"),
          posexplode(srpBuckets(col(s"${id}_vec"), tables, planes)).as(Seq("t", "bucket")))

    val qb = broadcast(banded(queries, "query_id"))
    val eb = banded(corpus, "neighbor_id")

    val sims = eb.join(qb, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_id_vec"), col("neighbor_id_vec"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_id_vec"), col("neighbor_id_vec")).as("cos"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    sims.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("cos"), 6).as("cosine"))
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-duplicate
    * detection. Quadratic: bound the input or use knnApproxLsh's bucketing
    * for the billion-row regime. */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}
