package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Quantize, Similarity, VectorOps}
import QueryRegistry.table

/** Similarity search over the `embeddings` table (`array<float>`, dim 64):
  * brute-force cosine top-k, SRP-LSH and IVF approximate top-k, plus
  * embedding-cosine near-duplicate pairs (bounded all-pairs kernel AND the
  * SRP-bucketed scale path). ALL are DuckDB-checked — the ANN oracles embed
  * the deterministic hyperplanes as SQL literals / recompute the centroid
  * hash-sample with the hugeint mix64 twin, so approximate results are
  * hash-compared exactly, not merely recall-tested (the ScalaTest suite
  * keeps the recall properties as semantic checks on planted clusters).
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

  /** The SRP hyperplanes are deterministic driver-side constants
    * (Similarity.hyperplaneMatrix) — so the oracle can embed them as SQL
    * double literals (shortest round-trip rendering; DuckDB's parser
    * restores the exact bit pattern) and recompute the very same buckets:
    * even LSH candidate generation is hash-checked cross-engine. */
  private def planeLit(w: Array[Double]): String = w.map(_.toString).mkString("[", ", ", "]")

  /** CTE: per (vec_id, t) rows with the SRP bucket. The hyperplanes sit in a
    * VALUES table (one row per (t, p) with the weight list as a column) and
    * each projection is one left-to-right list_sum fold per (vector, plane)
    * row — bit-exact vs srpBucketsOf, and ~300× faster than inlining the
    * literal array inside the lambda (DuckDB rebuilt the 64-element literal
    * per element eval: 90 s → 0.3 s at sf0.01). Bucket assembly sums
    * disjoint bit values — integer arithmetic, order-free. */
  private def srpBandedCte(tables: Int, planes: Int, dim: Int, whereClause: String): String = {
    val mat = graft.operators.Similarity.hyperplaneMatrix(tables, planes, dim)
    val values = (0 until tables * planes).map { k =>
      s"(${k / planes}, ${k % planes}, ${planeLit(mat(k))})"
    }.mkString(",\n    ")
    val dot = s"list_sum(list_transform(generate_series(1, $dim), i -> cast(e.embedding[i] AS double) * pl.w[i]))"
    s"""pl(t, p, w) AS (VALUES
       |    $values
       |), srp_proj AS (
       |  SELECT e.vec_id, pl.t,
       |    CASE WHEN $dot >= 0 THEN (1::BIGINT << pl.p) ELSE 0 END AS bit
       |  FROM embeddings e CROSS JOIN pl $whereClause
       |), srp_buckets AS (
       |  SELECT vec_id, t, sum(bit)::BIGINT AS bucket FROM srp_proj GROUP BY vec_id, t
       |), banded AS (
       |  SELECT b.vec_id, e.embedding, b.t, b.bucket
       |  FROM srp_buckets b JOIN embeddings e USING (vec_id)
       |)""".stripMargin
  }

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

  /** The full ANN pipeline in SQL: literal-hyperplane buckets for corpus and
    * queries, candidate equi-join on (t, bucket), distinct, exact cosine,
    * per-query rank — byte-identical to the Spark plan's result. */
  val knnLshOracle: String =
    s"""WITH ${srpBandedCte(tables = 16, planes = 8, dim = 64, whereClause = "")},
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    q.embedding AS q_emb, e.embedding AS e_emb
       |  FROM banded q JOIN banded e ON q.t = e.t AND q.bucket = e.bucket
       |  WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
       |), sims AS (
       |  SELECT query_id, neighbor_id, ${cosSql("q_emb", "e_emb")} AS cos FROM cand
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sims
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnApproxIvf(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nlist = 32, nprobe = 8)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF replicated relationally: the centroid sample is the nlist rows with
    * the smallest signed mix64(vec_id) (hugeint hash twin — same sample as
    * the Spark driver's collect), cell assignment/probing are rank-1/rank-N
    * over the same double cosine fold, then candidate join + per-query
    * top-k. Parameterized on nprobe for the q221 recall-vs-cost curve. */
  private[queries] def knnIvfOracleAt(nprobe: Int): String = {
    val h = DuckHashSql.signedSql(DuckHashSql.mix64Sql("cast(vec_id AS HUGEINT)", "0"))
    s"""WITH cents AS (
       |  SELECT embedding AS c_emb, row_number() OVER (ORDER BY $h) - 1 AS ci
       |  FROM embeddings QUALIFY ci < 32
       |), cells AS (
       |  SELECT vec_id AS neighbor_id, embedding AS n_emb, ci AS cell
       |  FROM embeddings CROSS JOIN cents
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "c_emb")} DESC, ci) = 1
       |), probes AS (
       |  SELECT vec_id AS query_id, embedding AS q_emb, ci AS cell
       |  FROM embeddings CROSS JOIN cents
       |  WHERE vec_id < 5
       |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY ${cosSql("embedding", "c_emb")} DESC, ci) <= $nprobe
       |), sims AS (
       |  SELECT query_id, neighbor_id, ${cosSql("q_emb", "n_emb")} AS cos
       |  FROM cells JOIN probes USING (cell)
       |  WHERE neighbor_id != query_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sims
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  val knnIvfOracle: String = knnIvfOracleAt(8)

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

  /** Embedding near-dups over the FULL table via SRP-bucket candidates +
    * exact cosine — the scale path (q62 stays as the bounded all-pairs
    * exactness kernel). Oracle replicates bucket generation from the same
    * literal hyperplanes, so the candidate set itself is cross-checked.
    *
    * AUTO-SIZED since r12: this lane originally pinned planes=6, and the
    * r11 sf1 rehearsal measured the documented n²/2^planes blow-up (101.7 s,
    * 91× for 10× data — 25% of the whole suite in one lane). It now runs
    * the same `autoPlanesOccupancy` scale knob as q174 at a TIGHTER
    * occupancy target (16 vs q174's 32): one more plane, so buckets hold
    * half the members — roughly half the candidate pairs, cheaper, at
    * slightly lower recall (sf1 measured: q64 37.5k pairs vs q174's
    * 58.1k) — and the two lanes pin the knob at two operating points. At the
    * verify SF (≤512 vectors) auto resolves planes=5, which the oracle's
    * literal-hyperplane CTE replays exactly; `AutoPlanesGuardSpec` guards
    * the boundary for BOTH lanes. */
  def nearDupsBucketed(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupsBucketed(table(spark, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35, dim = 64, tables = 16, planes = 5,
        autoPlanesOccupancy = 16)
      .orderBy(col("id_a"), col("id_b"))

  /** q64's looser-occupancy sibling (32 vs 16) — denser buckets, ~2× the
    * candidate pairs, higher recall, same scale law. Fixed planes fix the
    * bucket space, so
    * occupancy and pair cost grow n²/2^planes (the sf1 rehearsals measured
    * the then-fixed-planes q64 at 91–185× for 10× data — every bucket 10×
    * denser, none degenerate). `autoPlanesOccupancy` counts the corpus and
    * raises planes to ceil(log2(n/32)) so expected occupancy stays
    * constant: at the verify SF (500 vectors) that resolves to planes=4 —
    * which the oracle's literal-hyperplane CTE replays exactly — while at
    * sf0.1/sf1 the same lane self-sizes to 8/11+ planes and its rehearsal
    * ratio stays ~linear. (The oracle SQL is the auto-sizing EVALUATED at
    * n=500; it is correct for any n ≤ 512 and regenerates per-SF beyond.) */
  def nearDupsBucketedAuto(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupsBucketed(table(spark, dir, "embeddings"),
        "vec_id", "embedding", threshold = 0.35, dim = 64, tables = 16, planes = 4,
        autoPlanesOccupancy = 32)
      .orderBy(col("id_a"), col("id_b"))

  val nearDupsBucketedAutoOracle: String =
    s"""WITH ${srpBandedCte(tables = 16, planes = 4, dim = 64, whereClause = "")},
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    a.embedding AS e_a, b.embedding AS e_b
       |  FROM banded a JOIN banded b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |), scored AS (
       |  SELECT id_a, id_b, ${cosSql("e_a", "e_b")} AS cos FROM cand
       |)
       |SELECT id_a, id_b, round(cos, 6) AS cosine
       |FROM scored WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin

  val nearDupsBucketedOracle: String =
    s"""WITH ${srpBandedCte(tables = 16, planes = 5, dim = 64, whereClause = "")},
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    a.embedding AS e_a, b.embedding AS e_b
       |  FROM banded a JOIN banded b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
       |), scored AS (
       |  SELECT id_a, id_b, ${cosSql("e_a", "e_b")} AS cos FROM cand
       |)
       |SELECT id_a, id_b, round(cos, 6) AS cosine
       |FROM scored WHERE cos >= 0.35 ORDER BY id_a, id_b""".stripMargin

  /** kNN over the int8-quantized corpus (float queries, reconstructed
    * corpus vectors) — measures what 4× storage compression does to
    * neighbor ranking, under the hash gate: the oracle rebuilds codes and
    * reconstructions from the same closed-form math. */
  def quantizedKnn(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val corpus = Quantize.quantizeInt8(embs, "embedding")
      .select(col("vec_id"),
        Quantize.dequantize(col("q8_min"), col("q8_scale"), col("q8")).as("embedding"))
    Similarity.knnBruteForce(corpus, embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val quantizedKnnOracle: String =
    s"""WITH v AS (
       |  SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS e FROM embeddings
       |), st AS (
       |  SELECT vec_id, e, list_min(e) AS mn,
       |    (list_max(e) - list_min(e)) / cast(255 AS DOUBLE) AS scale
       |  FROM v
       |), qz AS (
       |  SELECT vec_id, mn, scale,
       |    list_transform(e, x ->
       |      CASE WHEN scale = 0 THEN 0 ELSE cast(round((x - mn) / scale) AS BIGINT) END) AS q
       |  FROM st
       |), dq AS (
       |  SELECT vec_id, list_transform(q, qe -> mn + cast(qe AS DOUBLE) * scale) AS d FROM qz
       |), sims AS (
       |  SELECT qr.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${dotSql("qr.embedding", "c.d")} /
       |      (sqrt(${dotSql("qr.embedding", "qr.embedding")}) * sqrt(${dotSql("c.d", "c.d")})) AS cos
       |  FROM embeddings qr, dq c
       |  WHERE qr.vec_id < 5 AND c.vec_id != qr.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sims
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** FILTERED vector search: top-5 among label=3 vectors only — the
    * predicate+ANN composition every vector store needs (metadata filter
    * first, similarity second). The label filter composes BEFORE the corpus
    * pass, so it pushes to the parquet scan (`PushedFilters: [EqualTo(label,
    * 3)]`) and the vector math touches only matching rows — pre-filtering,
    * not the post-filter-k-til-full workaround; at 100 TB this is the
    * difference between scanning a label partition and scanning the world. */
  def filteredKnn(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnBruteForce(embs.filter(col("label") === 3),
        embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  val filteredKnnOracle: String =
    s"""WITH sims AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "e.embedding")} AS cos
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 5 AND e.label = 3 AND e.vec_id != q.vec_id
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sims
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Per-label embedding centroids: explode to (label, dim, x) and fold each
    * dimension LEFT-TO-RIGHT in vec_id order (sorted collect + ordered
    * double fold — the HLL-denominator pattern). The usual decimal-sum trick
    * does NOT work here: DuckDB's double→decimal cast rounds through double
    * multiplication and lands one decimal-ulp off Spark's exact BigDecimal
    * HALF_UP for arbitrary float inputs (2-dp money values never hit the
    * edge, embeddings do) — an ordered IEEE fold is exact in both engines by
    * construction. One shuffle of labels × 64 groups; at corpus scale, where
    * per-group collect is unbounded, swap the fold for a plain double sum
    * and accept last-ulp partial-agg drift. */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ExactFold is the verify convention; the 100 TB path is the same call
    // with SumMode.PlaneSums (plain partial-agg sums — see SumModePlanSpec)
    graft.operators.VectorOps
      .labelMeans(table(spark, dir, "embeddings"), "vec_id", "label", "embedding",
        graft.operators.SumMode.ExactFold)
      .orderBy($"label", $"dim")
  }

  val labelCentroidsOracle: String =
    """WITH ex AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS dim, unnest(embedding) AS x
      |  FROM embeddings
      |)
      |SELECT label, dim,
      |  list_reduce(list_prepend(0.0::DOUBLE, list(cast(x AS DOUBLE) ORDER BY vec_id)),
      |    (a, b) -> a + b) / count(*) AS mean,
      |  count(*) AS n
      |FROM ex GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Product-quantization ANN (m=8 subspaces × ksub=16 centroids): corpus
    * vectors become 8 codes, queries score via per-subspace distance
    * tables — no per-pair dot products. The oracle rebuilds the codebook
    * sample (mix64 order), every chunk-distance argmin, the query distance
    * tables, and the ADC sums, so codes AND approximate distances are
    * value-checked cross-engine. */
  def knnPq(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnProductQuantized(embs, embs.filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 10, m = 8, ksub = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  val knnPqOracle: String = {
    val h = DuckHashSql.signedSql(DuckHashSql.mix64Sql("cast(vec_id AS HUGEINT)", "0"))
    s"""WITH cents AS (
       |  SELECT embedding AS c_emb, row_number() OVER (ORDER BY $h) - 1 AS j
       |  FROM embeddings QUALIFY j < 16
       |), sub AS (
       |  SELECT unnest(range(0, 8)) AS s
       |), cd AS (
       |  SELECT e.vec_id, sub.s, c.j,
       |    list_sum(list_transform(generate_series(1, 8), i ->
       |      (e.embedding[sub.s * 8 + i]::DOUBLE - c.c_emb[sub.s * 8 + i]::DOUBLE) *
       |      (e.embedding[sub.s * 8 + i]::DOUBLE - c.c_emb[sub.s * 8 + i]::DOUBLE))) AS d2
       |  FROM embeddings e CROSS JOIN sub CROSS JOIN cents c
       |), codes AS (
       |  SELECT vec_id AS neighbor_id, s, j AS code FROM cd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) = 1
       |), dt AS (
       |  SELECT vec_id AS query_id, s, j, d2 FROM cd WHERE vec_id < 5
       |), pair AS (
       |  SELECT dt.query_id, codes.neighbor_id,
       |    list_sum(list(dt.d2 ORDER BY dt.s)) AS adist
       |  FROM codes JOIN dt ON codes.s = dt.s AND codes.code = dt.j
       |  WHERE codes.neighbor_id != dt.query_id
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM pair
       |)
       |SELECT query_id, rank, neighbor_id, round(adist, 6) AS adist
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** IVF-PQ ANN — the FAISS-style composition: coarse cells bound the
    * candidate set (nprobe=4 of 16), PQ codes over CELL RESIDUALS score it
    * (m=8 × ksub=16). The oracle re-derives the shared mix64 sample prefix,
    * cell assignments, codebook residuals, every chunk-distance argmin, the
    * per-(query, cell) tables, and the ADC sums — the entire two-level
    * quantizer is value-checked cross-engine. */
  def knnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.knnIvfPq(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nlist = 16, nprobe = 4, m = 8, ksub = 16)
      .orderBy(col("query_id"), col("rank"))
  }

  val knnIvfPqOracle: String = {
    val h = DuckHashSql.signedSql(DuckHashSql.mix64Sql("cast(vec_id AS HUGEINT)", "0"))
    def resD2(emb: String, cemb: String): String =
      s"""list_sum(list_transform(generate_series(1, 8), i ->
         |      ($emb[sub.s * 8 + i]::DOUBLE - $cemb[sub.s * 8 + i]::DOUBLE - cb.res[sub.s * 8 + i]) *
         |      ($emb[sub.s * 8 + i]::DOUBLE - $cemb[sub.s * 8 + i]::DOUBLE - cb.res[sub.s * 8 + i])))""".stripMargin
    s"""WITH samp AS (
       |  SELECT vec_id, embedding, row_number() OVER (ORDER BY $h) - 1 AS sj
       |  FROM embeddings QUALIFY sj < 16
       |), cents AS (
       |  SELECT sj AS ci, embedding AS c_emb FROM samp WHERE sj < 16
       |), assign AS (
       |  SELECT e.vec_id, e.embedding, c.ci AS cell, c.c_emb
       |  FROM embeddings e CROSS JOIN cents c
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.ci) = 1
       |), cb AS (
       |  SELECT s.sj AS j, list_transform(generate_series(1, 64), i ->
       |    s.embedding[i]::DOUBLE - a.c_emb[i]::DOUBLE) AS res
       |  FROM samp s JOIN assign a ON a.vec_id = s.vec_id
       |  WHERE s.sj < 16
       |), sub AS (
       |  SELECT unnest(range(0, 8)) AS s
       |), cd AS (
       |  SELECT a.vec_id, a.cell, sub.s, cb.j, ${resD2("a.embedding", "a.c_emb")} AS d2
       |  FROM assign a CROSS JOIN sub CROSS JOIN cb
       |), codes AS (
       |  SELECT vec_id AS neighbor_id, cell, s, j AS code FROM cd
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) = 1
       |), probes AS (
       |  SELECT e.vec_id AS query_id, e.embedding AS q_emb, c.ci AS cell, c.c_emb
       |  FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5
       |  QUALIFY row_number() OVER (PARTITION BY e.vec_id
       |    ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.ci) <= 4
       |), qdt AS (
       |  SELECT p.query_id, p.cell, sub.s, cb.j, ${resD2("p.q_emb", "p.c_emb")} AS d2
       |  FROM probes p CROSS JOIN sub CROSS JOIN cb
       |), pair AS (
       |  SELECT q.query_id, c.neighbor_id,
       |    list_sum(list(q.d2 ORDER BY q.s)) AS adist
       |  FROM codes c JOIN qdt q ON q.cell = c.cell AND q.s = c.s AND q.j = c.code
       |  WHERE c.neighbor_id != q.query_id
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, neighbor_id, adist,
       |    row_number() OVER (PARTITION BY query_id ORDER BY adist, neighbor_id) AS rank
       |  FROM pair
       |)
       |SELECT query_id, rank, neighbor_id, round(adist, 6) AS adist
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- q221
  /** ANN recall audit — the quality-evaluation loop a deployed ANN index
    * needs: recall@10 of the IVF (q63 config) and PQ-ADC (q111 config)
    * indexes against the exact brute-force top-10 (q60), per query. Both
    * engines rerun all three rankers deterministically, so the recall
    * numbers themselves are hash-checkable — this is an OPERATOR (index
    * quality audit), not a test. Scale shape: the audit runs on a sampled
    * query panel (here vec_id < 5 — at 100 TB a fixed few-hundred-query
    * sample), so the exact side is one bounded map-side corpus pass per
    * audit and the approximate sides cost what production queries cost;
    * the join/aggregate touches ≤ panel·k rows. The oracle composes the
    * three lanes' full oracle CTE chains as derived tables and replays the
    * same left-join hit counting. */
  def annRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val qs = embs.filter(col("vec_id") < 5)
    val exact = Similarity
      .knnBruteForce(embs, qs, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
    def recallOf(method: String, approx: DataFrame): DataFrame =
      exact.join(
          approx.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(col("hit")).as("n_hit"))
        .select(lit(method).as("method"), col("query_id"), col("n_hit"),
          round(col("n_hit") / 10.0, 6).as("recall"))
    val ivf = Similarity.knnApproxIvf(embs, qs, "vec_id", "embedding",
      k = 10, nlist = 32, nprobe = 8)
    val pq = Similarity.knnProductQuantized(embs, qs, "vec_id", "embedding",
      k = 10, m = 8, ksub = 16)
    // Multi-probe recall CURVE (r14): the same IVF index probed at
    // nprobe ∈ {1, 2, 4} — the recall-vs-cost trade a deployed ANN
    // service actually tunes. Probe selection stays map-side against the
    // broadcast centroids; only the candidate fan-in changes. Recall is
    // provably monotone in nprobe (more probes → superset of candidates →
    // every exact-top-10 member present in the candidate set makes the
    // approximate top-10), which `IvfNprobeCurveSpec` asserts.
    val curve = Seq(1, 2, 4).map { np =>
      recallOf(s"ivf_np$np", Similarity.knnApproxIvf(
        embs, qs, "vec_id", "embedding", k = 10, nlist = 32, nprobe = np))
    }
    (recallOf("ivf", ivf) +: curve :+ recallOf("pq", pq))
      .reduce(_ unionByName _)
      .orderBy(col("method"), col("query_id"))
  }

  lazy val annRecallAuditOracle: String = {
    val curveCtes = Seq(1, 2, 4).map { np =>
      s"""ivf_np${np}_t AS (
         |  SELECT query_id, neighbor_id FROM (${knnIvfOracleAt(np)})
         |)""".stripMargin
    }.mkString(", ")
    val curveRecs = Seq(1, 2, 4).map { np =>
      s"""SELECT 'ivf_np$np' AS method, e.query_id, count(t.neighbor_id) AS n_hit
         |  FROM exact_t e LEFT JOIN ivf_np${np}_t t USING (query_id, neighbor_id)
         |  GROUP BY 2""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH exact_t AS (
       |  SELECT query_id, neighbor_id FROM ($knnBruteOracle)
       |), ivf_t AS (
       |  SELECT query_id, neighbor_id FROM ($knnIvfOracle)
       |), pq_t AS (
       |  SELECT query_id, neighbor_id FROM ($knnPqOracle)
       |), $curveCtes, rec AS (
       |  SELECT 'ivf' AS method, e.query_id, count(i.neighbor_id) AS n_hit
       |  FROM exact_t e LEFT JOIN ivf_t i USING (query_id, neighbor_id)
       |  GROUP BY 2
       |  UNION ALL
       |  $curveRecs
       |  UNION ALL
       |  SELECT 'pq' AS method, e.query_id, count(p.neighbor_id) AS n_hit
       |  FROM exact_t e LEFT JOIN pq_t p USING (query_id, neighbor_id)
       |  GROUP BY 2
       |)
       |SELECT method, query_id, cast(n_hit AS BIGINT) AS n_hit,
       |  round(n_hit / 10.0, 6) AS recall
       |FROM rec ORDER BY method, query_id""".stripMargin
  }

  /** Semantic (embedding-level) benchmark decontamination — the paraphrase
    * complement to q47's verbatim shingle semi-join: docs whose embedding
    * lands within cosine 0.3 of ANY benchmark vector are flagged, counted
    * per source. Benchmark = vec_id < 20 (a fixed small eval set),
    * corpus = the rest; doc_id aligns with vec_id 1:1. One corpus pass
    * (bench broadcast), per-doc max-cos shuffled skinny, then a tiny
    * per-source rollup. */
  def semanticDecontam(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val scored = Similarity.cosineContamination(
      embs.filter(col("vec_id") >= 20), embs.filter(col("vec_id") < 20),
      "vec_id", "embedding")
    scored.join(table(spark, dir, "documents"), scored("id") === col("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("max_cos") >= 0.3, 1)).as("n_contaminated"),
        round(max(col("max_cos")), 6).as("top_cos"))
      .orderBy(col("source"))
  }

  val semanticDecontamOracle: String =
    s"""WITH bench AS (
       |  SELECT embedding FROM embeddings WHERE vec_id < 20
       |), scored AS (
       |  SELECT c.vec_id, max(${cosSql("c.embedding", "b.embedding")}) AS max_cos
       |  FROM embeddings c CROSS JOIN bench b
       |  WHERE c.vec_id >= 20 GROUP BY 1
       |)
       |SELECT d.source, count(*) AS n_docs,
       |  count(CASE WHEN s.max_cos >= 0.3 THEN 1 END) AS n_contaminated,
       |  round(max(s.max_cos), 6) AS top_cos
       |FROM scored s JOIN documents d ON d.doc_id = s.vec_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Hard-negative mining (contrastive-pair prep): top-10 most-similar
    * DIFFERENT-label vectors per query — the near-miss negatives that
    * matter for embedding training. Labels make self-exclusion implicit
    * and give the lane a semi-join flavor the plain kNN lanes lack. */
  def hardNegativeMining(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    Similarity.hardNegatives(embs, embs.filter(col("vec_id") < 5),
        "vec_id", "embedding", "label", k = 10)
      .orderBy(col("query_id"), col("rank"))
  }

  val hardNegativeMiningOracle: String =
    s"""WITH sims AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "e.embedding")} AS cos
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 5 AND e.label IS DISTINCT FROM q.label
       |), ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM sims
       |)
       |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cosine
       |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Shared oracle CTE chain replaying KMeans.assignments(k, rounds = 2)
    * exactly: lowest-id seeding, squared-L2 folds in element order, argmin
    * tie-broken on (d, cid), and an id-ordered centroid mean fold — so
    * cluster ids, memberships AND distances hash-match cross-engine. */
  private def kmeansCte(k: Int): String = {
    def sq(e: String, c: String): String =
      s"list_sum(list_transform(generate_series(1, 64), j -> ($e[j] - $c[j]) * ($e[j] - $c[j])))"
    s"""ex AS (
       |  SELECT vec_id, list_transform(embedding, x -> cast(x AS DOUBLE)) AS e FROM embeddings
       |), init AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, e AS c
       |  FROM (SELECT vec_id, e FROM ex ORDER BY vec_id LIMIT $k)
       |), a0 AS (
       |  SELECT vec_id, e, cid, d FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM (SELECT x.vec_id, x.e, i.cid, ${sq("x.e", "i.c")} AS d
       |          FROM ex x CROSS JOIN init i)
       |  ) WHERE rn = 1
       |), up AS (
       |  SELECT cid, dim,
       |    list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY vec_id)), (a, b) -> a + b)
       |      / count(*) AS m
       |  FROM (SELECT cid, vec_id, generate_subscripts(e, 1) - 1 AS dim, unnest(e) AS x FROM a0)
       |  GROUP BY cid, dim
       |), c1 AS (
       |  SELECT cid, list(m ORDER BY dim) AS c FROM up GROUP BY cid
       |), a1 AS (
       |  SELECT vec_id, e, cid, d FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM (SELECT x.vec_id, x.e, i.cid, ${sq("x.e", "i.c")} AS d
       |          FROM ex x CROSS JOIN c1 i)
       |  ) WHERE rn = 1
       |)""".stripMargin
  }

  /** Train-once memo of the k-means coarse model (k × dim doubles — see
    * [[graft.operators.ArtifactStore]]): q147/q148/q209 all need the SAME
    * trained centroids; the first lane to run pays the Lloyd update
    * round(s), the rest score against the cached table. Sound because
    * training is fully deterministic (lowest-id seeding, ordered mean
    * folds) and the artifact is k × dim by construction. */
  private def kmeansCentroidsCached(
      spark: SparkSession, dir: String): Seq[(Int, Array[Double])] =
    graft.operators.ArtifactStore.cached("kmeans_k8_r2", dir)(
      graft.operators.KMeans.trainCentroids(
        table(spark, dir, "embeddings"), "vec_id", "embedding", k = 8, rounds = 2,
        // the verify convention: the oracle CTE replays the id-ordered
        // update fold; PlaneSums is the corpus-scale knob (KMeansSpec
        // pins plan + agreement)
        sumMode = graft.operators.SumMode.ExactFold))

  /** Deterministic Lloyd's k-means over the corpus embeddings (k=8, two
    * assignment rounds) — the clustering stage of SemDeDup-style curation.
    * Assignment is map-side (centroids ride as plan literals into codegen'd
    * squared-L2 folds); the update shuffles only (cluster, dim) cells. The
    * oracle unrolls both rounds, so every membership and distance is
    * hash-checked cross-engine. */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KMeans.assignWith(
        table(spark, dir, "embeddings"), "vec_id", "embedding",
        kmeansCentroidsCached(spark, dir))
      .select(col("id").as("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
      .orderBy(col("vec_id"))

  val kmeansClustersOracle: String =
    s"""WITH ${kmeansCte(8)}
       |SELECT vec_id, cast(cid AS INT) AS cluster, round(d, 6) AS dist
       |FROM a1 ORDER BY vec_id""".stripMargin

  /** SemDeDup (Abbas et al. 2023): within each k-means cluster, drop every
    * member that has a LOWER-id near-duplicate (cosine >= 0.35) in the same
    * cluster. The clustering bounds the pair expansion to sum(|cluster|^2)
    * — the property that makes semantic dedup affordable at corpus scale —
    * and keep-lowest-id makes the survivor set deterministic. */
  def semDeDupPrune(spark: SparkSession, dir: String): DataFrame =
    graft.operators.KMeans.semDeDupWith(
        table(spark, dir, "embeddings"), "vec_id", "embedding",
        kmeansCentroidsCached(spark, dir), threshold = 0.35)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("dropped"), 1)).as("n_dropped"))
      .orderBy(col("cluster"))

  val semDeDupPruneOracle: String =
    s"""WITH ${kmeansCte(8)},
       |pairs AS (
       |  SELECT b.vec_id AS id_b
       |  FROM a1 a JOIN a1 b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |  WHERE ${cosSql("a.e", "b.e")} >= 0.35
       |), dropped AS (SELECT DISTINCT id_b FROM pairs)
       |SELECT cast(a.cid AS INT) AS cluster, count(*) AS n_docs,
       |  count(dr.id_b) AS n_dropped
       |FROM a1 a LEFT JOIN dropped dr ON dr.id_b = a.vec_id
       |GROUP BY a.cid ORDER BY cluster""".stripMargin

  /** q216 — the [[graft.operators.KMeans]] PlaneSums (100 TB) training
    * mode under the driver gate (the q214/q217 agreement pattern): train
    * the SAME (k=8, rounds=2) model under both update-fold modes and
    * output the ExactFold centroid cells plus a deterministic agreement
    * boolean — |m_exact − m_plain| ≤ 1e-9 relative per (cluster, dim),
    * the `KMeansSpec` bound (the two modes differ only by double
    * summation order inside each cluster's member fold). The oracle
    * replays the ExactFold Lloyd update (the shared k-means CTE's `up`
    * means) and pins the boolean to TRUE. Both trainings are the bounded
    * k × dim pulls; the ExactFold side rides the `kmeans_k8_r2` memo. */
  def kmeansPlaneSumsAgreement(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val exact = kmeansCentroidsCached(spark, dir)
    val plain = graft.operators.KMeans.trainCentroids(
      table(spark, dir, "embeddings"), "vec_id", "embedding", k = 8, rounds = 2,
      sumMode = graft.operators.SumMode.PlaneSums).toMap
    exact.flatMap { case (cid, c) =>
      c.zipWithIndex.map { case (m, d) =>
        // relative bound with an absolute floor: a near-zero mean (member
        // components cancelling) would otherwise divide a last-ulp
        // summation-order difference by a tiny |m| and flake the gate —
        // the q215 greatest(rel, abs) convention
        val agree = plain.get(cid).filter(_.length > d).map(_(d)).exists(p =>
          math.abs(m - p) <= math.max(1e-9 * math.abs(m), 1e-12))
        (cid, d, m, agree)
      }
    }.toDF("cluster", "dim", "m_raw", "within_tol")
      .select($"cluster", $"dim", round($"m_raw", 6).as("m"), $"within_tol")
      .orderBy($"cluster", $"dim")
  }

  val kmeansPlaneSumsAgreementOracle: String =
    s"""WITH ${kmeansCte(8)}
       |SELECT cast(cid AS INT) AS cluster, cast(dim AS INT) AS dim,
       |  round(m, 6) AS m, TRUE AS within_tol
       |FROM up ORDER BY cluster, dim""".stripMargin

  // ---------------------------------------------------------------- q209
  /** Centroid-artifact PERSISTENCE round trip (the q207/q208 pattern for
    * the k-means coarse model): the trained k × dim centroid table written
    * through the repo's own fixedwidth sink and read back as the lane's
    * answer, while the oracle re-derives the centroids from the corpus by
    * replaying the Lloyd update (the `up` means of the shared k-means CTE
    * chain). Equality certifies that a persisted coarse quantizer reloads
    * value-identically — the deployment step that lets a 100 TB pipeline
    * train cluster centroids once and ship them to every assignment /
    * SemDeDup / IVF consumer. Elements are round(·, 8) doubles carried as
    * decimal(12,8) (the q207 losslessness argument: the cast rounds to the
    * 8-dp value the double already represents, and the read-back cast
    * restores the identical bit pattern); strictWidth makes an element
    * ≥ 1000 a loud write error. Scale shape: the artifact is k × dim rows —
    * IO is trivially bounded; the lane's cost is the (memoized) training. */
  private val centroidsLayout = Seq(
    graft.sources.fixedwidth.FieldSpec("cluster", "int", 0, 4),
    graft.sources.fixedwidth.FieldSpec("dim", "int", 4, 4),
    graft.sources.fixedwidth.FieldSpec("c", "decimal(12,8)", 8, 16))

  /** The q209 persistence path as a reusable step: memoized training →
    * round(·,8) through the fixedwidth sink → read back as
    * (cluster, dim, c double). q209 hash-checks this round trip; q213
    * serves a stream from it. */
  private[queries] def persistedCentroidTable(
      spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = QueryRegistry.scratch(dir, "kmeans_centroids_fw")
    val fieldsOpt =
      graft.sources.fixedwidth.FixedWidthOptions.renderFields(centroidsLayout)
    kmeansCentroidsCached(spark, dir)
      .flatMap { case (cid, c) =>
        c.zipWithIndex.map { case (x, d) => (cid, d, x) } }
      .toDF("cluster", "dim", "c")
      .select($"cluster", $"dim", round($"c", 8).cast("decimal(12,8)").as("c"))
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("strictWidth", "true")
      .mode("overwrite").save(out)
    spark.read.format("fixedwidth").option("fields", fieldsOpt).load(out)
      .select($"cluster", $"dim", $"c".cast("double").as("c"))
  }

  /** The PERSISTED coarse model as centroid vectors — the bounded
    * (k × dim doubles) pull a serving process does at startup. Values are
    * the artifact's round(·,8) elements, NOT the in-process full-precision
    * memo: a consumer of the deployed model sees exactly what the file
    * carries. Memoized — q209 still measures the persistence round trip
    * each rep, but the q213 serving reps must not rewrite the artifact. */
  private[queries] def persistedCentroidVectors(
      spark: SparkSession, dir: String): Seq[(Int, Array[Double])] =
    graft.operators.ArtifactStore.cached("kmeans_centroid_file_values", dir) {
      persistedCentroidTable(spark, dir).collect()
        .groupBy(_.getInt(0)).map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
        }.toSeq.sortBy(_._1)
    }

  def centroidsArtifact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    persistedCentroidTable(spark, dir).orderBy($"cluster", $"dim")
  }

  /** The oracle replays seeding + one Lloyd update from the corpus — the
    * `up` CTE of the shared k-means chain IS the rounds=2 centroid table. */
  val centroidsArtifactOracle: String =
    s"""WITH ${kmeansCte(8)}
       |SELECT cast(cid AS INT) AS cluster, cast(dim AS INT) AS dim,
       |  round(m, 8) AS c
       |FROM up ORDER BY cluster, dim""".stripMargin

  /** Oracle for the q213 streaming centroid-serving lane (the lane lives
    * in [[StreamingQueries]]; the oracle here with the shared k-means
    * CTEs): every embedding assigned to its nearest centroid FROM THE
    * PERSISTED ARTIFACT — i.e. the round(·,8) values the file carries
    * (`cr`), not the full-precision update means. q209 proves the file's
    * values equal `round(m, 8)` exactly, so replaying the assignment
    * under `cr` is replaying the deployed model. Same squared-L2
    * element-order fold and (d, cid) tie-break as the q147 chain. */
  val streamCentroidAssignOracle: String = {
    def sq(e: String, c: String): String =
      s"list_sum(list_transform(generate_series(1, 64), j -> ($e[j] - $c[j]) * ($e[j] - $c[j])))"
    s"""WITH ${kmeansCte(8)},
       |cr AS (
       |  SELECT cid, list(round(m, 8) ORDER BY dim) AS c FROM up GROUP BY cid
       |), af AS (
       |  SELECT vec_id, cid, d FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM (SELECT x.vec_id, i.cid, ${sq("x.e", "i.c")} AS d
       |          FROM ex x CROSS JOIN cr i)
       |  ) WHERE rn = 1
       |)
       |SELECT vec_id, cast(cid AS INT) AS cluster, round(d, 6) AS dist
       |FROM af ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------- q228/q229
  /** IVF ASSIGNMENT-INDEX artifact — the coarse-quantizer member of the
    * index-maintenance family (the q224/q226/q227 MinHash pattern applied
    * to the k-means/IVF chain): the (vec_id, cluster) inverted-list table
    * of the even-vec_id corpus half, every row a MAP-SIDE argmin against
    * the PERSISTED centroid artifact's round(·,8) values (the q213
    * serving convention — the deployed model is the file, not the
    * in-process memo), written once through the repo's own fixedwidth
    * sink. Unlike the bounded centroid artifact the index is CORPUS-SIZED
    * by design (one row per indexed vector); only the path string is
    * memoized. */
  private val ivfIdxLayout = Seq(
    graft.sources.fixedwidth.FieldSpec("vec_id", "long", 0, 8),
    graft.sources.fixedwidth.FieldSpec("cluster", "int", 8, 2))
  private[queries] def ivfIdxFields: String =
    graft.sources.fixedwidth.FixedWidthOptions.renderFields(ivfIdxLayout)

  private[queries] def persistedIvfIndexPath(
      spark: SparkSession, dir: String): String =
    graft.operators.ArtifactStore.cached("ivf_assign_index", dir) {
      val out = QueryRegistry.scratch(dir, "ivf_idx_fw")
      graft.operators.KMeans.assignWith(
          table(spark, dir, "embeddings").filter(col("vec_id") % 2 === 0),
          "vec_id", "embedding", persistedCentroidVectors(spark, dir))
        .select(col("id").as("vec_id"), col("cluster"))
        .write.format("fixedwidth").option("fields", ivfIdxFields)
        .option("strictWidth", "true").mode("overwrite").save(out)
      out
    }

  /** q228: IVF assignment-index REFRESH — the maintenance loop the
    * centroid chain was missing (q147 trains, q209 persists, q213 serves,
    * this lane keeps the inverted lists current): arrivals (the odd half)
    * are assigned map-side against the SAME persisted centroids and
    * MERGED with the reloaded prior index into a new index generation,
    * written back through the fixedwidth sink and reloaded. The oracle
    * re-derives the FULL-corpus assignment from scratch under the
    * artifact's round(·,8) centroid values, so equality is precisely the
    * refresh-correctness claim: incremental maintenance (prior + delta)
    * equals a full rebuild — a 100 TB ANN service never re-assigns its
    * corpus when vectors arrive. Sound because assignment is a pure
    * per-row function of a FIXED model generation; a centroid retrain is
    * a NEW artifact and a new index (the q209 chain), never an in-place
    * mutation of this one. */
  def ivfIndexRefresh(spark: SparkSession, dir: String): DataFrame = {
    val prior = spark.read.format("fixedwidth").option("fields", ivfIdxFields)
      .load(persistedIvfIndexPath(spark, dir))
      .select(col("vec_id"), col("cluster"))
    val arrivals = graft.operators.KMeans.assignWith(
        table(spark, dir, "embeddings").filter(col("vec_id") % 2 === 1),
        "vec_id", "embedding", persistedCentroidVectors(spark, dir))
      .select(col("id").as("vec_id"), col("cluster"))
    val out = QueryRegistry.scratch(dir, "ivf_idx_v2_fw")
    prior.unionByName(arrivals)
      .write.format("fixedwidth").option("fields", ivfIdxFields)
      .option("strictWidth", "true").mode("overwrite").save(out)
    spark.read.format("fixedwidth").option("fields", ivfIdxFields).load(out)
      .select(col("vec_id"), col("cluster"))
      .orderBy(col("vec_id"))
  }

  /** q232: IVF-index COMPACTION — the vector twin of q231 and the last
    * step of the maintenance lifecycle (q228 proves one delta merge ≡
    * rebuild; a deployed service accumulates MANY q229 batchId-subdir
    * generations): four delta generations (the odd-vec arrivals split by
    * vec_id % 8, each assigned MAP-SIDE against the persisted centroid
    * artifact and written to its own generation subdir) are folded with
    * the base index into ONE new base generation through the sink. The
    * oracle re-derives the full-corpus assignment from scratch, so
    * equality is the compaction-correctness claim: N-generation fold ≡
    * rebuild — pure IO reshaping under a FIXED model generation. */
  def ivfIndexCompaction(spark: SparkSession, dir: String): DataFrame = {
    val base = persistedIvfIndexPath(spark, dir)
    val cents = persistedCentroidVectors(spark, dir)
    val deltaRoot = QueryRegistry.scratch(dir, "ivf_idx_gens_fw")
    val rootPath = new org.apache.hadoop.fs.Path(deltaRoot)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(rootPath, true) // invocation-start wipe (q227 convention)
    Seq(1L, 3L, 5L, 7L).foreach { g =>
      graft.operators.KMeans.assignWith(
          table(spark, dir, "embeddings").filter(col("vec_id") % 8 === g),
          "vec_id", "embedding", cents)
        .select(col("id").as("vec_id"), col("cluster"))
        .write.format("fixedwidth").option("fields", ivfIdxFields)
        .option("strictWidth", "true").mode("overwrite").save(s"$deltaRoot/gen-$g")
    }
    def load(path: String) =
      spark.read.format("fixedwidth").option("fields", ivfIdxFields).load(path)
        .select(col("vec_id"), col("cluster"))
    val out = QueryRegistry.scratch(dir, "ivf_idx_compacted_fw")
    load(base).unionByName(load(deltaRoot)) // reader recurses into gen-* subdirs
      .write.format("fixedwidth").option("fields", ivfIdxFields)
      .option("strictWidth", "true").mode("overwrite").save(out)
    load(out).orderBy(col("vec_id"))
  }

  /** Shared by q228 (batch refresh) and q229 (streaming append): the
    * full-corpus re-assignment under the persisted model's round(·,8)
    * values — the q213 chain minus the dist column. */
  val ivfIndexRefreshOracle: String = {
    def sq(e: String, c: String): String =
      s"list_sum(list_transform(generate_series(1, 64), j -> ($e[j] - $c[j]) * ($e[j] - $c[j])))"
    s"""WITH ${kmeansCte(8)},
       |cr AS (
       |  SELECT cid, list(round(m, 8) ORDER BY dim) AS c FROM up GROUP BY cid
       |), af AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
       |    FROM (SELECT x.vec_id, i.cid, ${sq("x.e", "i.c")} AS d
       |          FROM ex x CROSS JOIN cr i)
       |  ) WHERE rn = 1
       |)
       |SELECT vec_id, cast(cid AS INT) AS cluster
       |FROM af ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q219
  /** PQ-codebook artifact persistence (the q209 pattern for the product
    * quantizer): the closed-form m=8 × ksub=16 codebook of the q111 PQ-ADC
    * lane — cents(s)(j)(i), 1024 doubles — written through the repo's own
    * fixedwidth sink and read back as the lane's answer, while the oracle
    * re-derives every element from the corpus (the mix64-smallest sample,
    * chunked). Equality certifies that a persisted product quantizer
    * reloads value-identically — the deployment step that lets a 100 TB
    * pipeline build the codebook once and ship it to every encoder (q220
    * serves a stream from this file). Elements are round(·,8) doubles as
    * decimal(12,8) (the q207/q209 losslessness argument); strictWidth makes
    * an element ≥ 1000 a loud write error. Scale shape: the artifact is
    * m·ksub·dsub rows regardless of corpus size; the codebook pull is the
    * bounded O(ksub·dim) collect. */
  private[queries] val PqM = 8
  private[queries] val PqKsub = 16
  private val pqLayout = Seq(
    graft.sources.fixedwidth.FieldSpec("s", "int", 0, 2),
    graft.sources.fixedwidth.FieldSpec("j", "int", 2, 2),
    graft.sources.fixedwidth.FieldSpec("i", "int", 4, 2),
    graft.sources.fixedwidth.FieldSpec("c", "decimal(12,8)", 6, 16))

  /** Train-once memo of the codebook (see [[graft.operators.ArtifactStore]];
    * `train_pq_codebook` is trainer-registered so the bench pays the cold
    * build explicitly). Deterministic: the mix64 sample order is total. */
  private def pqCodebookCached(
      spark: SparkSession, dir: String): Array[Array[Array[Double]]] =
    graft.operators.ArtifactStore.cached("pq_codebook_m8_k16", dir)(
      Similarity.pqCodebook(
        table(spark, dir, "embeddings"), "vec_id", "embedding", PqM, PqKsub))

  /** The q219 persistence path as a reusable step: memoized codebook →
    * round(·,8) through the fixedwidth sink → read back as
    * (s, j, i, c double). q219 hash-checks this round trip; q220 encodes a
    * stream from it. */
  private[queries] def persistedPqCodebookTable(
      spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = QueryRegistry.scratch(dir, "pq_codebook_fw")
    val fieldsOpt =
      graft.sources.fixedwidth.FixedWidthOptions.renderFields(pqLayout)
    pqCodebookCached(spark, dir).zipWithIndex.flatMap { case (subs, s) =>
      subs.zipWithIndex.flatMap { case (cent, j) =>
        cent.zipWithIndex.map { case (x, i) => (s, j, i, x) } }
    }.toSeq.toDF("s", "j", "i", "c")
      .select($"s", $"j", $"i", round($"c", 8).cast("decimal(12,8)").as("c"))
      .write.format("fixedwidth").option("fields", fieldsOpt)
      .option("strictWidth", "true")
      .mode("overwrite").save(out)
    spark.read.format("fixedwidth").option("fields", fieldsOpt).load(out)
      .select($"s", $"j", $"i", $"c".cast("double").as("c"))
  }

  /** The PERSISTED codebook as cents(s)(j)(i) — the bounded pull a serving
    * encoder does at startup. Values are the artifact's round(·,8)
    * elements, NOT the in-process full-precision memo: a consumer of the
    * deployed model sees exactly what the file carries (the q213
    * convention). Memoized (the q219 lane still measures the full
    * persistence round trip each rep — its job — but serving reps must
    * not rewrite the artifact); j/i dimensions are sized FROM THE FILE,
    * never padded to PqKsub: a corpus smaller than ksub must not grow
    * phantom all-zero centroids the oracle's sample can never encode to. */
  private[queries] def persistedPqCodebook(
      spark: SparkSession, dir: String): Array[Array[Array[Double]]] =
    graft.operators.ArtifactStore.cached("pq_codebook_file_values", dir) {
      val rows = persistedPqCodebookTable(spark, dir).collect()
      val dsub = rows.iterator.map(_.getInt(2)).max + 1
      val ksub = rows.iterator.map(_.getInt(1)).max + 1
      val cb = Array.fill(PqM, ksub, dsub)(0.0)
      rows.foreach(r => cb(r.getInt(0))(r.getInt(1))(r.getInt(2)) = r.getDouble(3))
      cb
    }

  def pqCodebookArtifact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    persistedPqCodebookTable(spark, dir).orderBy($"s", $"j", $"i")
  }

  /** The oracle replays the whole codebook from the corpus: the
    * mix64-smallest ksub vectors, chunked into m subspaces of dsub=8
    * elements (1-based DuckDB indexing: element s·8+i+1 is cents(s)(j)(i)). */
  val pqCodebookArtifactOracle: String = {
    val h = DuckHashSql.signedSql(DuckHashSql.mix64Sql("cast(vec_id AS HUGEINT)", "0"))
    s"""WITH cents AS (
       |  SELECT embedding AS c_emb, row_number() OVER (ORDER BY $h) - 1 AS j
       |  FROM embeddings QUALIFY j < $PqKsub
       |)
       |SELECT cast(sub.s AS INT) AS s, cast(c.j AS INT) AS j, cast(ii.i AS INT) AS i,
       |  round(c.c_emb[sub.s * 8 + ii.i + 1]::DOUBLE, 8) AS c
       |FROM cents c
       |CROSS JOIN (SELECT unnest(range(0, $PqM)) AS s) sub
       |CROSS JOIN (SELECT unnest(range(0, 8)) AS i) ii
       |ORDER BY s, j, i""".stripMargin
  }

  /** Oracle for the q220 streaming PQ-encode lane (the lane lives in
    * [[StreamingQueries]]; the oracle here with the shared sample CTE):
    * every corpus vector encoded against the PERSISTED codebook — i.e. the
    * round(·,8) values the file carries (`cb`), not the full-precision
    * sample. q219 proves the file's values equal `round(elem, 8)` exactly,
    * so replaying the per-subspace argmin under `cb` is replaying the
    * deployed encoder. Same left-to-right chunk-distance fold and
    * ties-to-smallest-j rule as the q111 chain. */
  val streamPqEncodeOracle: String = {
    val h = DuckHashSql.signedSql(DuckHashSql.mix64Sql("cast(vec_id AS HUGEINT)", "0"))
    s"""WITH cents AS (
       |  SELECT embedding AS c_emb, row_number() OVER (ORDER BY $h) - 1 AS j
       |  FROM embeddings QUALIFY j < $PqKsub
       |), cb AS (
       |  SELECT sub.s, c.j, list_transform(generate_series(1, 8), i ->
       |    round(c.c_emb[sub.s * 8 + i]::DOUBLE, 8)) AS cc
       |  FROM cents c CROSS JOIN (SELECT unnest(range(0, $PqM)) AS s) sub
       |), cd AS (
       |  SELECT e.vec_id, cb.s, cb.j,
       |    list_sum(list_transform(generate_series(1, 8), i ->
       |      (e.embedding[cb.s * 8 + i]::DOUBLE - cb.cc[i]) *
       |      (e.embedding[cb.s * 8 + i]::DOUBLE - cb.cc[i]))) AS d2
       |  FROM embeddings e CROSS JOIN cb
       |)
       |SELECT vec_id, cast(s AS INT) AS s, cast(j AS INT) AS code FROM cd
       |QUALIFY row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, j) = 1
       |ORDER BY vec_id, s""".stripMargin
  }

  // ---------------------------------------------------------------- q157
  /** Hybrid retrieval via reciprocal-rank fusion — the standard RAG
    * composition of a dense and a lexical ranker: for each query document
    * (query-by-example, vec_id/doc_id < 5), the semantic list is the q60
    * brute-force cosine top-20 over `embeddings` and the lexical list is
    * the word-3-gram Jaccard top-20 over `documents` (query gram sets
    * broadcast — the corpus side is one map-side pass, no pairwise
    * self-join); fusion score = Σ 1/(60 + rank) over the lists that
    * contain the candidate. RRF needs only RANKS, never comparable scores —
    * which is the point: cosine and Jaccard live on different scales.
    *
    * Scale shape: both rankers end in the bounded TopKByScore partial-agg
    * (O(queries·k) shuffled rows); the fusion full-outer join and window
    * touch ≤ 2k candidates per query, so the post-ranker cost is
    * independent of corpus size. Determinism: 1/(60+rank) over small ints
    * is an exact double both engines compute identically, the two-term sum
    * has a fixed association, and ties break on neighbor_id. */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val sem = Similarity
      .knnBruteForce(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("r_sem"))
    // Gram sets are xxhash64'd once per doc and SORTED so the per-pair
    // Jaccard runs as the codegen'd two-pointer merge (SetOps) instead of
    // a per-pair string-array hash set — |A∩B| unchanged modulo ~2^-64
    // collisions (the q47/q51/q52 argument), values bit-identical.
    val grams = table(spark, dir, "documents")
      .select(col("doc_id"),
        array_sort(transform(Dedup.shingles(col("text"), 3), g => xxhash64(g))).as("grams"))
    val qgrams = grams.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("grams").as("q_grams"))
    val lexSims = grams.crossJoin(broadcast(qgrams))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        graft.functions.SetOps.sortedJaccard(col("q_grams"), col("grams")).as("jac"))
      .filter(col("jac") > 0.0)
    val topk = udaf(new graft.functions.TopKByScore(20))
    val lex = lexSims.groupBy(col("query_id"))
      .agg(topk(col("jac"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("r_lex"),
        col("p._2").as("neighbor_id"))
    sem.join(lex, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("neighbor_id"))))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("rrf"), 6).as("rrf"), col("r_sem"), col("r_lex"))
      .orderBy(col("query_id"), col("rk"))
  }

  val hybridRrfOracle: String =
    s"""WITH semranked AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS r_sem
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
       |), sem AS (
       |  SELECT query_id, neighbor_id, r_sem FROM semranked WHERE r_sem <= 20
       |), toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       |), grams AS (
       |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
       |  FROM toks WHERE len(t) >= 3
       |), lexsims AS (
       |  SELECT q.doc_id AS query_id, e.doc_id AS neighbor_id,
       |    round(cast(len(list_intersect(q.g, e.g)) AS double)
       |      / (len(q.g) + len(e.g) - len(list_intersect(q.g, e.g))), 6) AS jac
       |  FROM grams q, grams e
       |  WHERE q.doc_id < 5 AND e.doc_id != q.doc_id
       |), lexranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY jac DESC, neighbor_id) AS r_lex
       |  FROM lexsims WHERE jac > 0
       |), lex AS (
       |  SELECT query_id, neighbor_id, r_lex FROM lexranked WHERE r_lex <= 20
       |), fused AS (
       |  SELECT query_id, neighbor_id, r_sem, r_lex,
       |    coalesce(1.0 / (60 + r_sem), 0.0) + coalesce(1.0 / (60 + r_lex), 0.0) AS rrf
       |  FROM sem FULL JOIN lex USING (query_id, neighbor_id)
       |), ranked AS (
       |  SELECT query_id, neighbor_id, r_sem, r_lex, rrf,
       |    row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS rk
       |  FROM fused
       |)
       |SELECT query_id, rk, neighbor_id, round(rrf, 6) AS rrf, r_sem, r_lex
       |FROM ranked WHERE rk <= 10 ORDER BY query_id, rk""".stripMargin

  // ---------------------------------------------------------------- q192
  /** Rank-biased overlap (Webber et al. 2010) between the two retrieval
    * rankings q157 fuses — the EVALUATION metric beside the fusion
    * operator: how much do semantic (cosine) and lexical (Jaccard) top-10
    * agree per query? RBO@10 = Σ_{d=1..10} p^d · |A_{1..d} ∩ B_{1..d}|/d
    * with p = 1/2 — an exact binary power, so every term is an
    * integer-ratio double scaled by 2^-d and the d-ordered fold is
    * bit-identical cross-engine (the paper's usual p≈0.9 would drag
    * libm `pow` into the hash). An item common to both lists enters the
    * overlap at depth max(r_sem, r_lex), which turns the prefix
    * intersection into one equi-join plus a count — no per-depth set
    * materialization. Scale shape: both rankings are the q157 pipelines
    * (bounded top-k per query); everything after is queries × 10 rows. */
  def rboAgreement(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val sem = Similarity
      .knnBruteForce(embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("r_sem"))
    val grams = table(spark, dir, "documents")
      .select(col("doc_id"),
        array_sort(transform(Dedup.shingles(col("text"), 3), g => xxhash64(g))).as("grams"))
    val qgrams = grams.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("grams").as("q_grams"))
    val lexSims = grams.crossJoin(broadcast(qgrams))
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        graft.functions.SetOps.sortedJaccard(col("q_grams"), col("grams")).as("jac"))
      .filter(col("jac") > 0.0)
    val topk = udaf(new graft.functions.TopKByScore(10))
    val lex = lexSims.groupBy(col("query_id"))
      .agg(topk(col("jac"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("r_lex"),
        col("p._2").as("neighbor_id"))

    val common = sem.join(lex, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), greatest(col("r_sem"), col("r_lex")).as("m"))
    val queries = embs.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"))
    val xd = queries
      .crossJoin(spark.range(1, 11).select(col("id").cast("int").as("d")))
      .join(common, Seq("query_id"), "left")
      .groupBy(col("query_id"), col("d"))
      .agg(count(when(col("m") <= col("d"), 1)).as("x"))
    xd.select(col("query_id"), col("d"),
        ((lit(1.0) / pow(lit(2.0), col("d"))) *
          (col("x").cast("double") / col("d").cast("double"))).as("term"),
        col("x"))
      .groupBy(col("query_id"))
      .agg(
        round(aggregate(
          sort_array(collect_list(struct(col("d"), col("term")))),
          lit(0.0), (a, s) => a + s.getField("term")), 6).as("rbo"),
        max(when(col("d") === 10, col("x"))).as("n_common10"))
      .orderBy(col("query_id"))
  }

  val rboAgreementOracle: String =
    s"""WITH semranked AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${cosSql("q.embedding", "e.embedding")} DESC, e.vec_id) AS r_sem
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
       |), sem AS (
       |  SELECT query_id, neighbor_id, r_sem FROM semranked WHERE r_sem <= 10
       |), toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       |), grams AS (
       |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(t) - 2),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
       |  FROM toks WHERE len(t) >= 3
       |), lexsims AS (
       |  SELECT q.doc_id AS query_id, e.doc_id AS neighbor_id,
       |    round(cast(len(list_intersect(q.g, e.g)) AS double)
       |      / (len(q.g) + len(e.g) - len(list_intersect(q.g, e.g))), 6) AS jac
       |  FROM grams q, grams e
       |  WHERE q.doc_id < 5 AND e.doc_id != q.doc_id
       |), lexranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY jac DESC, neighbor_id) AS r_lex
       |  FROM lexsims WHERE jac > 0
       |), lex AS (
       |  SELECT query_id, neighbor_id, r_lex FROM lexranked WHERE r_lex <= 10
       |), common AS (
       |  SELECT query_id, neighbor_id, greatest(r_sem, r_lex) AS m
       |  FROM sem JOIN lex USING (query_id, neighbor_id)
       |), xd AS (
       |  SELECT q.query_id, d.d, count(CASE WHEN c.m <= d.d THEN 1 END) AS x
       |  FROM (SELECT vec_id AS query_id FROM embeddings WHERE vec_id < 5) q
       |  CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS d) d
       |  LEFT JOIN common c ON c.query_id = q.query_id
       |  GROUP BY 1, 2
       |), terms AS (
       |  SELECT query_id, d, (1.0 / power(2.0, d)) * (x::DOUBLE / d::DOUBLE) AS term, x
       |  FROM xd
       |)
       |SELECT query_id,
       |  round(list_reduce(list_prepend(0.0::DOUBLE, list(term ORDER BY d)),
       |    (a, b) -> a + b), 6) AS rbo,
       |  cast(max(CASE WHEN d = 10 THEN x END) AS BIGINT) AS n_common10
       |FROM terms GROUP BY query_id ORDER BY query_id""".stripMargin

  // ---------------------------------------------------------------- q193
  /** Top principal direction by 3 rounds of power iteration over the
    * mean-centered embeddings ([[VectorOps.powerIteration]]) — the
    * spectral lane: variance structure without materializing a d×d
    * covariance. Every reduction is a keyed ordered fold and the start
    * vector is the exact ⅛ constant, so the full 3-iteration trajectory
    * (loadings AND the Rayleigh-style eigenvalue estimate) hash-matches
    * the oracle's CTE-unrolled replay. */
  def powerIterationLane(spark: SparkSession, dir: String): DataFrame =
    VectorOps.powerIteration(table(spark, dir, "embeddings"), "vec_id", "embedding",
      iters = 3, sumMode = graft.operators.SumMode.ExactFold)

  val powerIterationOracle: String = {
    def fold(expr: String, ord: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list($expr ORDER BY $ord)), (a, b) -> a + b)"
    def iter(k: Int, vPrev: String): String =
      s"""s$k AS (
         |  SELECT vec_id, ${fold("xc * v", "dim")} AS s
         |  FROM exc JOIN $vPrev USING (dim) GROUP BY vec_id
         |), u$k AS (
         |  SELECT dim, ${fold("s * xc", "vec_id")} AS u
         |  FROM exc JOIN s$k USING (vec_id) GROUP BY dim
         |), n$k AS (
         |  SELECT sqrt(${fold("u * u", "dim")}) AS nrm FROM u$k
         |), v$k AS (
         |  SELECT dim, u / nrm AS v FROM u$k CROSS JOIN n$k
         |)""".stripMargin
    s"""WITH ex0 AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
       |    cast(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings
       |), means AS (
       |  SELECT dim, ${fold("x", "vec_id")} / count(*)::DOUBLE AS mean
       |  FROM ex0 GROUP BY dim
       |), exc AS (
       |  SELECT vec_id, ex0.dim, x - mean AS xc FROM ex0 JOIN means USING (dim)
       |), v0 AS (
       |  SELECT dim, 0.125::DOUBLE AS v FROM means
       |), ${iter(1, "v0")}, ${iter(2, "v1")}, ${iter(3, "v2")}
       |SELECT dim, round(v, 6) AS loading, round(nrm, 6) AS lambda
       |FROM v3 CROSS JOIN n3 ORDER BY dim""".stripMargin
  }

  // ---------------------------------------------------------------- q201
  /** Top-2 principal components by power iteration + ORTHOGONAL DEFLATION
    * ([[VectorOps.topTwoComponents]]): PC2 iterates with every
    * un-normalized step re-projected off PC1 (u ← u − (u·v₁)v₁) — the
    * orthogonal complement without a deflated matrix — from the exact
    * alternating ±⅛ start. Both components' full trajectories (loadings
    * AND λ estimates) hash-match the oracle's CTE-unrolled replay. */
  def topTwoPcsLane(spark: SparkSession, dir: String): DataFrame =
    VectorOps.topTwoComponents(table(spark, dir, "embeddings"), "vec_id", "embedding",
      iters = 2, sumMode = graft.operators.SumMode.ExactFold)

  val topTwoPcsOracle: String = {
    def fold(expr: String, ord: String): String =
      s"list_reduce(list_prepend(0.0::DOUBLE, list($expr ORDER BY $ord)), (a, b) -> a + b)"
    def iter1(k: Int, vPrev: String): String =
      s"""s$k AS MATERIALIZED (
         |  SELECT vec_id, ${fold("xc * v", "dim")} AS s
         |  FROM exc JOIN $vPrev USING (dim) GROUP BY vec_id
         |), u$k AS MATERIALIZED (
         |  SELECT dim, ${fold("s * xc", "vec_id")} AS u
         |  FROM exc JOIN s$k USING (vec_id) GROUP BY dim
         |), n$k AS MATERIALIZED (
         |  SELECT sqrt(${fold("u * u", "dim")}) AS nrm FROM u$k
         |), v$k AS MATERIALIZED (
         |  SELECT dim, u / nrm AS v FROM u$k CROSS JOIN n$k
         |)""".stripMargin
    def iter2(k: Int, vPrev: String): String =
      s"""t$k AS MATERIALIZED (
         |  SELECT vec_id, ${fold("xc * v", "dim")} AS s
         |  FROM exc JOIN $vPrev USING (dim) GROUP BY vec_id
         |), w$k AS MATERIALIZED (
         |  SELECT dim, ${fold("s * xc", "vec_id")} AS u
         |  FROM exc JOIN t$k USING (vec_id) GROUP BY dim
         |), dt$k AS MATERIALIZED (
         |  SELECT ${fold(s"w$k.u * v2.v", "dim")} AS dt
         |  FROM w$k JOIN v2 USING (dim)
         |), wo$k AS MATERIALIZED (
         |  SELECT w$k.dim, w$k.u - dt * v2.v AS u
         |  FROM w$k JOIN v2 USING (dim) CROSS JOIN dt$k
         |), m$k AS MATERIALIZED (
         |  SELECT sqrt(${fold("u * u", "dim")}) AS nrm FROM wo$k
         |), z$k AS MATERIALIZED (
         |  SELECT dim, u / nrm AS v FROM wo$k CROSS JOIN m$k
         |)""".stripMargin
    val pc1 = (1 to 2).map(i => iter1(i, if (i == 1) "v0" else s"v${i - 1}"))
    val pc2 = (1 to 2).map(i => iter2(i, if (i == 1) "z0" else s"z${i - 1}"))
    s"""WITH ex0 AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
       |    cast(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings
       |), means AS (
       |  SELECT dim, ${fold("x", "vec_id")} / count(*)::DOUBLE AS mean
       |  FROM ex0 GROUP BY dim
       |), exc AS MATERIALIZED (
       |  SELECT vec_id, ex0.dim, x - mean AS xc FROM ex0 JOIN means USING (dim)
       |), v0 AS (
       |  SELECT dim, 0.125::DOUBLE AS v FROM means
       |), ${pc1.mkString(", ")}, z0 AS (
       |  SELECT dim, CASE WHEN dim % 2 = 0 THEN 0.125::DOUBLE ELSE -0.125::DOUBLE END AS v
       |  FROM means
       |), ${pc2.mkString(", ")}
       |SELECT 1 AS pc, dim, round(v, 6) AS loading, round(nrm, 6) AS lambda
       |FROM v2 CROSS JOIN n2
       |UNION ALL
       |SELECT 2 AS pc, dim, round(v, 6) AS loading, round(nrm, 6) AS lambda
       |FROM z2 CROSS JOIN m2
       |ORDER BY pc, dim""".stripMargin
  }

  /** Farthest-point-sampling diversity coreset (greedy k-center) — k = 8
    * maximally-spread embedding rows. The oracle replays the greedy loop
    * exactly with a recursive CTE: same lowest-id seed, same left-to-right
    * squared-L2 fold, same (max distance, lowest id) selection each round,
    * so even the selection ORDER is hash-checked cross-engine. */
  def fpsCoreset(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Coreset.farthestPointSample(
        table(spark, dir, "embeddings"), "vec_id", "embedding", k = 8)
      .select(col("sel_rank"), col("vec_id"),
        round(col("min_sq_dist"), 6).as("min_sq_dist"))
      .orderBy(col("sel_rank"))

  val fpsCoresetOracle: String = {
    // the min-over-chosen is a join + GROUP BY (not a correlated scalar
    // subquery): DuckDB cannot bind a lambda that captures a column two
    // correlation levels up, and min over the chosen set equals the Spark
    // side's least-fold (order-free for non-NaN doubles)
    val sq = "list_sum(list_transform(generate_series(1, 64), j -> (cand.e[j] - x.e[j]) * (cand.e[j] - x.e[j])))"
    s"""WITH RECURSIVE ex AS (
       |  SELECT vec_id, list_transform(embedding, v -> cast(v AS DOUBLE)) AS e
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(list_filter(embedding, v -> v IS NULL)) = 0
       |), sel AS (
       |  SELECT 1 AS sel_rank, vec_id, CAST(NULL AS DOUBLE) AS md, [vec_id] AS chosen
       |  FROM ex WHERE vec_id = (SELECT min(vec_id) FROM ex)
       |  UNION ALL
       |  SELECT s.sel_rank + 1, c.vec_id, c.md, list_append(s.chosen, c.vec_id)
       |  FROM sel s JOIN LATERAL (
       |    SELECT cand.vec_id, min($sq) AS md
       |    FROM ex cand JOIN ex x ON list_contains(s.chosen, x.vec_id)
       |    WHERE NOT list_contains(s.chosen, cand.vec_id)
       |    GROUP BY cand.vec_id
       |    ORDER BY md DESC, cand.vec_id
       |    LIMIT 1
       |  ) c ON true
       |  WHERE s.sel_rank < 8
       |)
       |SELECT sel_rank, vec_id, round(md, 6) AS min_sq_dist
       |FROM sel ORDER BY sel_rank""".stripMargin
  }

  /** MMR-diversified retrieval: brute-force top-20 cosine candidates per
    * query (the q60 kernel), then Maximal-Marginal-Relevance re-ranking to
    * 8 with λ = 0.7. The oracle replays the greedy argmax loop with a
    * recursive CTE — same double cosine fold for both terms, same
    * (1.0 − 0.7) weight bits, same lowest-id tie-break — so the selection
    * order itself is hash-checked.
    *
    * The rel score is the UNROUNDED cosine (recomputed from the vectors,
    * bit-identical to the fold that ranked the top-20): weighting the
    * 6-decimal presentation value by λ = 0.7 would make every score an
    * exact 7-decimal number, i.e. a round-half TIE at round(…, 6) for one
    * value in ten — the two engines' round implementations disagree on
    * exact ties, and the first verify run hit one. Unrounded doubles put
    * the boundary probability back at ~ulp scale. */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val knn = Similarity.knnBruteForce(
      embs, embs.filter(col("vec_id") < 5), "vec_id", "embedding", k = 20)
    // candidates are ≤ |queries|·k rows by construction — broadcast THEM,
    // not the corpus: the static planner only sees parquet stats, so at
    // test scale it would broadcast the embeddings side (fine here, wrong
    // at 100 TB where it flips to sort-merging the corpus to serve ~100
    // candidate rows)
    val cands = broadcast(knn.select(col("query_id"), col("neighbor_id")))
      .join(embs.select(col("vec_id").as("neighbor_id"), col("embedding")), "neighbor_id")
      .join(broadcast(embs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))), "query_id")
      .withColumn("rel", Similarity.cosine(col("q_emb"), col("embedding")))
    graft.operators.Mmr.rerank(cands, "query_id", "neighbor_id", "rel", "embedding",
        k = 8, lambda = 0.7)
      .select(col("query_id"), col("mmr_rank"), col("neighbor_id"),
        round(col("mmr_score"), 6).as("mmr_score"))
      .orderBy(col("query_id"), col("mmr_rank"))
  }

  val mmrRerankOracle: String = {
    val dotDD = "list_sum(list_transform(generate_series(1, 64), j -> cand.e[j] * x.e[j]))"
    val nrm = (t: String) =>
      s"sqrt(list_sum(list_transform(generate_series(1, 64), j -> $t.e[j] * $t.e[j])))"
    s"""WITH RECURSIVE rel0 AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    ${cosSql("q.embedding", "e.embedding")} AS cos
       |  FROM embeddings q, embeddings e
       |  WHERE q.vec_id < 5 AND e.vec_id != q.vec_id
       |), rel AS (
       |  SELECT query_id, neighbor_id, cos AS rel
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
       |        FROM rel0)
       |  WHERE rk <= 20
       |), relv AS (
       |  SELECT r.query_id, r.neighbor_id, r.rel,
       |    list_transform(e.embedding, v -> cast(v AS DOUBLE)) AS e
       |  FROM rel r JOIN embeddings e ON e.vec_id = r.neighbor_id
       |), sel AS (
       |  SELECT query_id, 1 AS mmr_rank, neighbor_id, 0.7 * rel AS score, [neighbor_id] AS chosen
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, neighbor_id) AS rn
       |        FROM rel)
       |  WHERE rn = 1
       |  UNION ALL
       |  SELECT s.query_id, s.mmr_rank + 1, c.neighbor_id, c.score,
       |    list_append(s.chosen, c.neighbor_id)
       |  FROM sel s JOIN LATERAL (
       |    SELECT cand.neighbor_id,
       |      0.7 * cand.rel - (1.0 - 0.7) * max($dotDD / (${nrm("cand")} * ${nrm("x")})) AS score
       |    FROM relv cand JOIN relv x
       |      ON x.query_id = s.query_id AND list_contains(s.chosen, x.neighbor_id)
       |    WHERE cand.query_id = s.query_id AND NOT list_contains(s.chosen, cand.neighbor_id)
       |    GROUP BY cand.neighbor_id, cand.rel
       |    ORDER BY score DESC, cand.neighbor_id
       |    LIMIT 1
       |  ) c ON true
       |  WHERE s.mmr_rank < 8
       |)
       |SELECT query_id, mmr_rank, neighbor_id, round(score, 6) AS mmr_score
       |FROM sel ORDER BY query_id, mmr_rank""".stripMargin
  }

  // ---------------------------------------------------------------- q187
  /** Per-dimension corpus standardization (z-scores): the feature-scaling
    * pass upstream of any distance-based curation (k-means, SemDeDup,
    * kNN) — a dimension with 10× the variance silently dominates every
    * Euclidean decision until this runs. Moments use the ordered-fold
    * convention (q103); zero-variance dims are NULL by the nullif guard.
    */
  def embeddingStandardize(spark: SparkSession, dir: String): DataFrame = {
    VectorOps.standardize(table(spark, dir, "embeddings"), "vec_id", "embedding",
        graft.operators.SumMode.ExactFold)
      .orderBy(col("vec_id"), col("dim"))
  }

  /** The exact-fold standardize CTE chain, shared by the q187 oracle and
    * the q217 agreement oracle. */
  private val standardizeCte: String =
    """WITH ex AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
      |    cast(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings
      |), moments AS (
      |  SELECT dim,
      |    list_reduce(list_prepend(0.0::DOUBLE, list(x ORDER BY vec_id)),
      |      (a, b) -> a + b) AS sx,
      |    list_reduce(list_prepend(0.0::DOUBLE, list(x * x ORDER BY vec_id)),
      |      (a, b) -> a + b) AS sxx,
      |    count(*)::DOUBLE AS n
      |  FROM ex GROUP BY dim
      |), stats AS (
      |  SELECT dim, sx / n AS mean,
      |    sqrt(greatest(sxx / n - (sx / n) * (sx / n), 0.0::DOUBLE)) AS sd
      |  FROM moments
      |)""".stripMargin

  val embeddingStandardizeOracle: String =
    s"""$standardizeCte
       |SELECT e.vec_id, e.dim, round((e.x - s.mean) / nullif(s.sd, 0.0::DOUBLE), 6) AS z
       |FROM ex e JOIN stats s USING (dim)
       |ORDER BY vec_id, dim""".stripMargin

  /** q217 — the [[VectorOps.standardize]] PlaneSums (100 TB) mode under
    * the driver gate, by the q214 agreement pattern: the lane runs BOTH
    * sum modes and outputs the ExactFold z-scores plus a deterministic
    * agreement boolean — NULL iff NULL (zero-variance dims agree on
    * NULL), otherwise |z_exact − z_plain| within one 6-dp ulp (the
    * `SumModePlanSpec` bound for rounded columns; partial-agg summation
    * order shifts last ulps only, and the rounded values can straddle at
    * most one rounding boundary). The oracle replays the ExactFold side
    * and pins the boolean to literal TRUE, so PlaneSums drift past the
    * bound fails the gate. Bound caveat: NULL-iff-NULL assumes a dim is
    * either truly constant (variance exactly cancels under BOTH fold
    * orders — the driver's generators produce no near-constant dims) or
    * has non-negligible variance; a dataset with variance within one ulp
    * of zero could clamp sd to 0 under one mode only, which would need a
    * shared variance floor in `VectorOps.standardize` to tolerate. */
  def standardizeAgreement(spark: SparkSession, dir: String): DataFrame = {
    val embs = table(spark, dir, "embeddings")
    val exact = VectorOps.standardize(embs, "vec_id", "embedding",
      graft.operators.SumMode.ExactFold)
    val plain = VectorOps.standardize(embs, "vec_id", "embedding",
        graft.operators.SumMode.PlaneSums)
      .select(col("vec_id"), col("dim"), col("z").as("z_plain"))
    exact.join(plain, Seq("vec_id", "dim"))
      .select(col("vec_id"), col("dim"), col("z"),
        when(col("z").isNull || col("z_plain").isNull,
          col("z").isNull && col("z_plain").isNull)
          .otherwise(abs(col("z") - col("z_plain")) <= lit(1.000001e-6))
          .as("within_tol"))
      .orderBy(col("vec_id"), col("dim"))
  }

  val standardizeAgreementOracle: String =
    s"""$standardizeCte
       |SELECT e.vec_id, e.dim, round((e.x - s.mean) / nullif(s.sd, 0.0::DOUBLE), 6) AS z,
       |  TRUE AS within_tol
       |FROM ex e JOIN stats s USING (dim)
       |ORDER BY vec_id, dim""".stripMargin

  // ---------------------------------------------------------------- q188
  /** Johnson–Lindenstrauss ±1 random projection to k=8 dims (Achlioptas
    * 2003): the cheap-at-100-TB dimensionality reduction in front of
    * clustering or coarse ANN. The sign matrix is mix64(dim, j) — the
    * oracle replays it with the hugeint twin — and each output is an
    * in-order fold over the vector, so values hash-match exactly. The
    * whole projection is one map-side codegen'd pass: no shuffle at all.
    */
  def jlProjection(spark: SparkSession, dir: String): DataFrame = {
    VectorOps.jlProject(table(spark, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, k = 8)
      .orderBy(col("vec_id"), col("j"))
  }

  val jlProjectionOracle: String = {
    val sign = DuckHashSql.signedSql(DuckHashSql.mix64Sql("dim::HUGEINT", "j.j"))
    s"""WITH ex AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
       |    cast(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings
       |  WHERE len(embedding) = 64
       |)
       |SELECT vec_id, j.j AS j,
       |  round(list_reduce(list_prepend(0.0::DOUBLE,
       |    list(x * (CASE WHEN $sign < 0 THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END)
       |         ORDER BY dim)),
       |    (a, b) -> a + b), 6) AS y
       |FROM ex CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) j
       |GROUP BY vec_id, j.j
       |ORDER BY vec_id, j""".stripMargin
  }

  /** Bench hook (see [[graft.Bench]]): the shared trained artifact this
    * module memoizes, exposed so the bench can pay and RECORD its cold
    * training cost once, explicitly, instead of letting the memo hide it
    * inside whichever lane happens to run first. */
  val artifactTrainers: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    // each trainer drives the SERVING pull, which transitively populates
    // every memo key on its chain (training + persisted file values) — the
    // bench's trainer-coverage assertion holds only if no cached key first
    // appears inside the lane sweep
    "train_kmeans_centroids" -> ((s: SparkSession, d: String) => {
      persistedCentroidVectors(s, d); () }),
    "train_pq_codebook" -> ((s: SparkSession, d: String) => {
      persistedPqCodebook(s, d); () }),
    "train_ivf_index" -> ((s: SparkSession, d: String) => {
      persistedIvfIndexPath(s, d); () }))

  def all: Seq[Q] = Seq(
    Q("q176_fps_coreset", fpsCoreset, Some(fpsCoresetOracle)),
    Q("q187_embedding_standardize", embeddingStandardize, Some(embeddingStandardizeOracle)),
    Q("q217_standardize_agreement", standardizeAgreement, Some(standardizeAgreementOracle)),
    Q("q216_kmeans_planesums_agreement", kmeansPlaneSumsAgreement,
      Some(kmeansPlaneSumsAgreementOracle)),
    Q("q188_jl_projection", jlProjection, Some(jlProjectionOracle)),
    Q("q192_rbo_agreement", rboAgreement, Some(rboAgreementOracle)),
    Q("q193_power_iteration", powerIterationLane, Some(powerIterationOracle)),
    Q("q201_top_two_pcs", topTwoPcsLane, Some(topTwoPcsOracle)),
    Q("q177_mmr_rerank", mmrRerank, Some(mmrRerankOracle)),
    Q("q60_knn_bruteforce", knnBrute, Some(knnBruteOracle)),
    Q("q61_knn_lsh", knnLsh, Some(knnLshOracle)),
    Q("q62_embedding_neardup", nearDupPairs, Some(nearDupPairsOracle)),
    Q("q63_knn_ivf", knnIvf, Some(knnIvfOracle)),
    Q("q64_neardup_bucketed", nearDupsBucketed, Some(nearDupsBucketedOracle)),
    Q("q65_quantized_knn", quantizedKnn, Some(quantizedKnnOracle)),
    Q("q89_filtered_knn", filteredKnn, Some(filteredKnnOracle)),
    Q("q103_label_centroids", labelCentroids, Some(labelCentroidsOracle)),
    Q("q111_knn_pq", knnPq, Some(knnPqOracle)),
    Q("q221_ann_recall_audit", annRecallAudit, Some(annRecallAuditOracle)),
    Q("q126_knn_ivfpq", knnIvfPq, Some(knnIvfPqOracle)),
    Q("q145_semantic_decontam", semanticDecontam, Some(semanticDecontamOracle)),
    Q("q146_hard_negatives", hardNegativeMining, Some(hardNegativeMiningOracle)),
    Q("q147_kmeans_clusters", kmeansClusters, Some(kmeansClustersOracle)),
    Q("q148_semdedup_prune", semDeDupPrune, Some(semDeDupPruneOracle)),
    Q("q209_centroids_artifact", centroidsArtifact, Some(centroidsArtifactOracle)),
    Q("q228_ivf_index_refresh", ivfIndexRefresh, Some(ivfIndexRefreshOracle)),
    Q("q232_ivf_index_compaction", ivfIndexCompaction, Some(ivfIndexRefreshOracle)),
    Q("q219_pq_codebook_artifact", pqCodebookArtifact, Some(pqCodebookArtifactOracle)),
    Q("q157_hybrid_rrf", hybridRrf, Some(hybridRrfOracle)),
    Q("q174_neardup_bucketed_auto", nearDupsBucketedAuto, Some(nearDupsBucketedAutoOracle)))
}
