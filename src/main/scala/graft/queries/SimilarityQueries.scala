package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import QueryRegistry.table

/** Similarity search over the `embeddings` table (`array<float>`, dim 64):
  * brute-force cosine top-k (exact, DuckDB-checked) and SRP-LSH approximate
  * top-k (the scale path — checked for recall by the ScalaTest suite, since
  * hash-bucket membership has no cross-engine twin), plus embedding-cosine
  * near-duplicate pairs (exact, DuckDB-checked).
  *
  * All cosines are computed in double precision with a left-to-right fold;
  * the oracle replicates the exact same fold via generate_series (DuckDB's
  * builtin list_cosine_similarity is float-precision and does not match).
  */
object SimilarityQueries {

  /** SQL rendering of the same double-precision dot product / cosine. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> cast($a[i] AS double) * cast($b[i] AS double)))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnBruteForce(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val knnBruteOracle: String =
    s"""WITH sims AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "e.embedding")} AS cos
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sims
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  def knnLsh(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnApproxLsh(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, dim = 64, tables = 16, planes = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnApproxIvf(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nlist = 32, nprobe = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  def nearDupPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(
        table(spark, dir, "embeddings").filter(col("vec_id") < 500),
        "vec_id", "embedding", threshold = 0.35)
      .orderBy(col("id_a"), col("id_b"))

  val nearDupPairsOracle: String =
    s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cosine
       |FROM embeddings a, embeddings b
       |WHERE a.vec_id < b.vec_id AND a.vec_id < 500 AND b.vec_id < 500
       |  AND ${cosSql("a.embedding", "b.embedding")} >= 0.35
       |ORDER BY id_a, id_b""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q60_knn_bruteforce", knnBrute, Some(knnBruteOracle)),
    Q("q61_knn_lsh", knnLsh, None),
    Q("q62_embedding_neardup", nearDupPairs, Some(nearDupPairsOracle)),
    Q("q63_knn_ivf", knnIvf, None))
}
