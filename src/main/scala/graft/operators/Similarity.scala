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

  /** Double-precision dot product of two equal-length numeric arrays — a
    * codegen'd primitive loop ([[graft.functions.FloatDot]]), NOT the
    * interpreted `aggregate(zip_with(...))` HOF fold (identical values: same
    * left-to-right accumulation; the HOF form cost one interpreted lambda
    * eval per element per row and dominated candidate verification). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NULL when either vector has zero norm (guarded —
    * bare IEEE division would yield NaN/Infinity and leak into top-k
    * rankings). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (nullif(norm(a), lit(0.0)) * nullif(norm(b), lit(0.0)))

  /** Exact k-nearest-neighbors by cosine for every query vector.
    *
    * `queries` MUST be small (it is broadcast): the corpus is streamed once
    * and never shuffled at full width — only the (|queries| x |corpus|)
    * similarity rows move through the per-query top-k. At cluster scale the
    * window's shuffle carries Q x N skinny rows; for very large Q, swap the
    * window for a two-phase per-partition heap merge.
    *
    * Norms are computed once per row BEFORE the pairing (N + Q sqrt-dots
    * instead of 2·N·Q) — the per-pair math is a single dot product. The
    * factoring changes no IEEE result: each norm is the same double wherever
    * it is computed.
    *
    * The per-query top-k is a bounded typed Aggregator with map-side partial
    * aggregation: each task keeps ≤ 2k candidates per query, so the shuffle
    * carries O(Q·k) rows — NOT the Q·N similarity rows a window over the
    * cross product would move. That is the property that survives a 100×
    * corpus. (score desc, id) is a total order → result identical to the
    * window formulation.
    *
    * PRECONDITION (here and in the ANN variants): queries share the corpus
    * id space — self-matches are excluded by ID equality, so an external
    * query set must carry ids disjoint from the corpus or a colliding id
    * would silently drop that one true neighbor.
    */
  def knnBruteForce(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      norm(col(vecCol)).as("q_nrm"))
    val e = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("e_vec"),
      norm(col(vecCol)).as("e_nrm"))
    val sims = e.crossJoin(broadcast(q))
      .filter(col("query_id").cast("long") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("e_vec")) / nullif(col("q_nrm") * col("e_nrm"), lit(0.0))).as("cos"))
    topKPerGroup(sims, k)
  }

  /** Per-query bounded top-k + rank/rounding shared by exact and ANN kNN.
    * NULL scores (zero-norm or NULL vectors — the guarded cosine returns
    * NULL for both) are dropped BEFORE the aggregator: its (Double, Long)
    * encoder is non-nullable, and a no-cosine pair is not a neighbor. */
  private def topKPerGroup(sims: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    sims.filter(col("cos").isNotNull)
      .groupBy(col("query_id"))
      .agg(topk(col("cos"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("p._2").as("neighbor_id"),
        round(col("p._1"), 6).as("cosine"))
  }

  /** Hard-negative mining for contrastive training pairs: for each query
    * vector, the k most-similar corpus vectors with a DIFFERENT label —
    * the near-miss negatives that carry the gradient signal, vs the easy
    * negatives uniform sampling returns. Same scale shape as
    * [[knnBruteForce]]: queries broadcast, one corpus pass, label filter
    * applied BEFORE the pair rows exist (inside the broadcast-join task),
    * bounded per-query top-k so the shuffle carries O(Q·k) rows. Label
    * comparison is null-safe: a NULL label counts as its own class, so
    * NULL-labeled rows are negatives for every labeled query and vice
    * versa. Self-pairs drop out via the label condition (a row shares its
    * own label). */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(labelCol).as("q_lbl"),
      col(vecCol).as("q_vec"), norm(col(vecCol)).as("q_nrm"))
    val e = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(labelCol).as("e_lbl"),
      col(vecCol).as("e_vec"), norm(col(vecCol)).as("e_nrm"))
    val sims = e.crossJoin(broadcast(q))
      .filter(!(col("e_lbl") <=> col("q_lbl")))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("q_vec"), col("e_vec")) / nullif(col("q_nrm") * col("e_nrm"), lit(0.0))).as("cos"))
    topKPerGroup(sims, k)
  }

  /** Semantic decontamination score: for every corpus vector, the maximum
    * cosine to ANY vector of a (small, broadcast) benchmark set. The n-gram
    * decontamination semi-join catches verbatim leakage; this catches
    * paraphrased leakage the lexical match misses.
    *
    * Scale shape: the benchmark side broadcasts (eval suites are thousands
    * of rows, not millions), the corpus is streamed ONCE computing all
    * |bench| cosines map-side inside the broadcast-join task, and the
    * per-id max is a partial-then-final aggregate — the shuffle carries one
    * (id, max_cos) row per corpus vector, never the |corpus|x|bench| pair
    * rows. Downstream a threshold turns the score into a keep/drop
    * decision; keeping the raw max lets one corpus pass serve any
    * threshold sweep. A zero-norm or NULL corpus vector yields a NULL
    * max_cos (no cosine is defined for it) — it still gets its output row,
    * and a `max_cos >= t` keep/drop predicate treats it as uncontaminated. */
  def cosineContamination(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    // the id is only a group key — keep its input type (a cast("long") here
    // would NULL out string ids and silently collapse the corpus to one row)
    val b = benchmark.select(col(vecCol).as("b_vec"), norm(col(vecCol)).as("b_nrm"))
    corpus.select(col(idCol).as("id"), col(vecCol).as("c_vec"),
        norm(col(vecCol)).as("c_nrm"))
      .crossJoin(broadcast(b))
      .select(col("id"),
        (dot(col("c_vec"), col("b_vec")) / nullif(col("c_nrm") * col("b_nrm"), lit(0.0))).as("cos"))
      .groupBy(col("id"))
      .agg(max(col("cos")).as("max_cos"))
  }

  /** Deterministic pseudo-random hyperplanes, materialized DRIVER-SIDE as
    * literal coefficient arrays and folded into the plan as constants.
    * (Deriving each coefficient from xxhash64 per row — the first version —
    * recomputed tables*planes*dim hashes for every vector; with 16x8x64
    * that was 8k hashes per row and dominated the ANN stage.) */
  private[graft] def hyperplaneMatrix(tables: Int, planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(tables * planes) { k =>
      val rng = new java.util.Random(0x5EED00000000L + k) // JDK algorithm is specified → same planes everywhere
      Array.fill(dim)(rng.nextDouble() * 2 - 1)
    }

  /** SRP-LSH bucket ids, one per table: bit p of table t's bucket is the
    * sign of the projection onto pseudo-random hyperplane (t, p). Returns an
    * array<long> of length `tables`. Pure map-side expression over literal
    * hyperplane constants. `dim` must match the embedding dimensionality.
    *
    * NOTE: kept as the reference/API form; the hot path in [[knnApproxLsh]]
    * uses [[srpBucketsOf]] inside mapPartitions instead — Spark's
    * higher-order functions are interpreted (not codegen'd), and
    * tables*planes*dim interpreted lambda evals per row dominated the ANN
    * stage. Both produce identical buckets (same matrix, same fold order). */
  def srpBuckets(vec: Column, tables: Int, planes: Int, dim: Int): Column = {
    val mat = hyperplaneMatrix(tables, planes, dim)
    def bucketFor(t: Int): Column =
      (0 until planes).map { p =>
        val plane = typedlit(mat(t * planes + p).toIndexedSeq)
        val proj = aggregate(
          zip_with(vec, plane, (x, w) => x.cast("double") * w),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    array((0 until tables).map(bucketFor): _*)
  }

  /** JVM-side twin of [[srpBuckets]]: same matrix, same left-to-right
    * accumulation order, primitive loops. */
  def srpBucketsOf(vec: Array[Float], tables: Int, planes: Int, dim: Int,
      mat: Array[Array[Double]]): Array[Long] = {
    require(vec.length >= dim,
      s"srpBucketsOf: vector has ${vec.length} dims, expected >= $dim (silent truncation would mask a dimension mismatch)")
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val plane = mat(t * planes + p)
        var proj = 0.0
        var j = 0
        val n = dim
        while (j < n) { proj += vec(j).toDouble * plane(j); j += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    out
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
      dim: Int,
      tables: Int = 16,
      planes: Int = 8): DataFrame = {
    val mat = hyperplaneMatrix(tables, planes, dim)
    def banded(df: DataFrame, id: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      df.filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          it.flatMap { case (rid, vec) =>
            val buckets = srpBucketsOf(vec, tables, planes, dim, mat)
            Iterator.tabulate(tables)(t => (rid, vec, t, buckets(t)))
          }
        }
        .toDF(id, s"${id}_vec", "t", "bucket")
    }

    val qb = broadcast(banded(queries, "query_id"))
    val eb = banded(corpus, "neighbor_id")

    val sims = eb.join(qb, Seq("t", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_id_vec"), col("neighbor_id_vec"))
      .dropDuplicates("query_id", "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("query_id_vec"), col("neighbor_id_vec")).as("cos"))

    topKPerGroup(sims, k)
  }

  /** Approximate k-NN via IVF (inverted file) coarse quantization: corpus
    * vectors are assigned map-side to their nearest of `nlist` centroids;
    * each query probes its `nprobe` nearest cells and exact-scores only the
    * vectors inside them. Complements SRP-LSH: IVF adapts to the data
    * distribution (centroids are corpus points) where SRP's hyperplanes are
    * data-independent.
    *
    * Centroids are a deterministic corpus sample — the `nlist` vectors with
    * the smallest mix64(id) (reproducible everywhere INCLUDING the DuckDB
    * oracle, which recomputes the same sample via the hugeint hash twin; no
    * training loop — swap in k-means iterations for production-grade
    * cells). Scale shape:
    * centroids broadcast, assignment is one map-side pass in primitive
    * loops, the only wide op is the (cell) equi-join of corpus cells against
    * the exploded query probes — the full cross product never materializes.
    */
  /** Nearest `n` centroid indices by cosine, ties broken by index — one
    * primitive-loop pass, shared by assignment, probing, and refinement. */
  private def nearestCellsIn(vec: Array[Float], cents: Array[Array[Double]], n: Int): Array[Int] = {
    val sims = cents.zipWithIndex.map { case (c, ci) =>
      var dotV = 0.0; var na = 0.0; var nb = 0.0
      var j = 0
      while (j < math.min(vec.length, c.length)) {
        dotV += vec(j).toDouble * c(j); na += vec(j).toDouble * vec(j); nb += c(j) * c(j)
        j += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      (if (denom == 0) -2.0 else dotV / denom, ci)
    }
    sims.sortBy { case (s, ci) => (-s, ci) }.take(n).map(_._2)
  }

  /** @param kmeansIters optional Lloyd refinement rounds for the coarse
    *   quantizer, on the relational KMeans path: assignment is one
    *   map-side pass of codegen'd cosine folds against the nlist centroid
    *   LITERALS (argmax via array_sort on struct(-cos, cell) — the same
    *   plan shape as `KMeans.assignWith`, no `mapPartitions`, no UDAF),
    *   the update is a plain partial-agg mean per (cell, dim) — the
    *   shuffle carries O(cells × dim) cells, not O(N) vectors — and the
    *   nlist × dim means come back as one bounded driver pull. Default 0
    *   keeps the deterministic hash-sample centroids, which the DuckDB
    *   oracle reproduces exactly (double-sum order inside a refinement
    *   mean is partition-dependent, so refined centroids are adaptive but
    *   not bit-reproducible cross-engine — the classic trade). Empty cells
    *   keep their previous centroid. */
  /** One Lloyd refinement round's (cell, dim, m) mean cells, on the
    * relational KMeans path: every corpus row scores the centroid LITERALS
    * with the codegen'd cosine fold and takes the argmax via array_sort on
    * struct(-cos, cell) — tie-break to the lowest cell, a zero-norm
    * vector's NULL cosine coerced to the -2.0 sentinel `nearestCellsIn`
    * also produces (both paths then tie to cell 0, so the two assignment
    * rules stay identical). Vectors whose LENGTH differs from the centroid
    * dim are EXCLUDED from the update: the codegen'd dot is NULL on a
    * length mismatch while `nearestCellsIn` partial-folds over the common
    * prefix, so folding them in would both skew a ragged mean and land
    * them in a cell the final assignment disagrees with. The update is a
    * plain partial-agg mean per (cell, dim) — bounded state, map-side
    * combine, no `mapPartitions`, no UDAF (`IvfPlanSpec` pins the shape). */
  private[operators] def refineCells(
      rows: DataFrame, cents: Array[Array[Double]]): DataFrame = {
    val dim = cents.headOption.map(_.length).getOrElse(0)
    val scored = cents.toIndexedSeq.zipWithIndex.map { case (c, ci) =>
      struct(
        (-coalesce(cosine(col("vec"), typedlit(c.toSeq)), lit(-2.0))).as("negcos"),
        lit(ci).as("cell"))
    }
    rows.filter(size(col("vec")) === dim)
      .withColumn("best", array_sort(array(scored: _*)).getItem(0))
      .select(col("best.cell").as("cell"), posexplode(col("vec")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("x").cast("double")).as("m"))
  }

  def knnApproxIvf(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 64,
      nprobe: Int = 8,
      kmeansIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val typed = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    var cents: Array[Array[Double]] = typed
      .withColumn("h", graft.functions.Hashing.mix64Col(col(idCol)))
      .orderBy(col("h"))
      .limit(nlist)
      .select(col(vecCol))
      .as[Array[Float]]
      .collect()
      .map(_.map(_.toDouble))

    var iter = 0
    while (iter < kmeansIters && cents.nonEmpty) {
      val updated = refineCells(typed.toDF("id", "vec"), cents).collect()
        .groupBy(_.getInt(0)).map { case (ci, rs) =>
          ci -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      val cur = cents
      cents = Array.tabulate(cur.length)(ci => updated.getOrElse(ci, cur(ci)))
      iter += 1
    }
    val finalCents = cents

    val assigned = typed.mapPartitions { it =>
      it.map { case (id, vec) => (id, vec, nearestCellsIn(vec, finalCents, 1)(0)) }
    }.toDF("neighbor_id", "neighbor_vec", "cell")

    val probes = broadcast(
      queries.filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
        .as[(Long, Array[Float])]
        .mapPartitions(_.flatMap { case (id, vec) =>
          nearestCellsIn(vec, finalCents, nprobe).map(cell => (id, vec, cell))
        })
        .toDF("query_id", "q_vec", "cell"))

    val sims = assigned.join(probes, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_vec"), col("neighbor_vec")).as("cos"))

    topKPerGroup(sims, k)
  }

  /** Product-quantization ANN with asymmetric distance computation (ADC) —
    * the memory-scale path beyond int8: the vector column is replaced by m
    * sub-codes (m bytes/vector vs 4·dim), and query scoring never touches a
    * float vector, only a per-query (m × ksub) distance table.
    *
    *  1. Codebook: the ksub corpus vectors with the smallest mix64(id) (the
    *     same deterministic sample rule as the IVF coarse quantizer — a
    *     bounded O(ksub·dim) collect, replayable in SQL), chunked into m
    *     subspaces of dim/m elements; no Lloyd training, so the whole
    *     codebook is closed-form.
    *  2. Encode (map-side, one corpus pass): code_s = argmin_j
    *     ‖chunk_s(x) − cent_{s,j}‖² with ties to the smallest j.
    *  3. Score (map-side, one encoded pass): for each query, dt[s][j] =
    *     ‖chunk_s(q) − cent_{s,j}‖² is precomputed once (m·ksub doubles);
    *     a corpus row costs m table lookups: adist = Σ_s dt[s][code_s] —
    *     no per-pair dot products at all.
    *  4. Per-query bounded top-k by (adist asc, id asc) — the same
    *     O(groups·k) shuffle as the exact kNN.
    *
    * All chunk distances accumulate left-to-right in doubles, so the DuckDB
    * oracle replays codes, distance tables, and the final sums bit-exactly.
    */
  /** The closed-form PQ codebook of [[knnProductQuantized]], exposed as a
    * deployable artifact (the persisted-model lane trains it once and ships
    * it): the `ksub` corpus vectors with the smallest mix64(id), chunked
    * into `m` subspaces — `cents(s)(j)(i)` = subspace s, centroid j,
    * element i. A bounded O(ksub·dim) pull; fully replayable in SQL (no
    * Lloyd training), which is what lets an oracle hash-check the persisted
    * file against the corpus. */
  def pqCodebook(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ksub: Int): Array[Array[Array[Double]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("vec"))
      .withColumn("h", graft.functions.Hashing.mix64Col(col("id")))
      .orderBy(col("h"))
      .limit(ksub)
      .select(col("vec")).as[Array[Float]]
      .collect().map(_.map(_.toDouble))
    val dim = sample.headOption.map(_.length).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"embedding dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    Array.tabulate(m, sample.length, dsub)((s, j, i) => sample(j)(s * dsub + i))
  }

  def knnProductQuantized(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      m: Int = 8,
      ksub: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val typed = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]

    // cents(s)(j)(i): subspace s, centroid j, element i
    val cents = pqCodebook(corpus, idCol, vecCol, m, ksub)
    val dsub = cents.headOption.map(_.head.length).getOrElse(0)
    val bCents = spark.sparkContext.broadcast(cents)

    def chunkD2(c: Array[Array[Array[Double]]], vec: Array[Float], s: Int, j: Int): Double = {
      var d = 0.0
      var i = 0
      while (i < dsub) {
        val diff = vec(s * dsub + i).toDouble - c(s)(j)(i)
        d += diff * diff
        i += 1
      }
      d
    }

    val encoded = typed.mapPartitions { it =>
      val c = bCents.value
      it.map { case (id, vec) =>
        val codes = Array.tabulate(m) { s =>
          var best = 0
          var bestD = Double.PositiveInfinity
          var j = 0
          while (j < c(s).length) {
            val d = chunkD2(c, vec, s, j)
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          best
        }
        (id, codes)
      }
    }

    // per-query distance tables — m·ksub doubles each, built once driver-side
    // from the (small, broadcastable by contract) query set
    val dts: Array[(Long, Array[Array[Double]])] = queries
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (qid, qvec) =>
        qid -> Array.tabulate(m, cents(0).length)((s, j) => chunkD2(cents, qvec, s, j))
      }
    val bDts = spark.sparkContext.broadcast(dts)

    val sims = encoded.mapPartitions { it =>
      val tables = bDts.value
      it.flatMap { case (nid, codes) =>
        tables.iterator.filter(_._1 != nid).map { case (qid, dt) =>
          var acc = 0.0
          var s = 0
          while (s < m) { acc += dt(s)(codes(s)); s += 1 }
          (qid, nid, acc)
        }
      }
    }.toDF("query_id", "neighbor_id", "adist")

    val topk = udaf(new graft.functions.TopKByScore(k))
    sims.groupBy(col("query_id"))
      .agg(topk(-col("adist"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("p._2").as("neighbor_id"),
        round(-col("p._1"), 6).as("adist"))
  }

  /** IVF-PQ ANN — the production FAISS composition of the two quantizers
    * already built separately here: the coarse IVF quantizer restricts each
    * query to `nprobe` cells, and PQ codes encode each vector's RESIDUAL
    * (vector − its cell centroid) — residuals are tighter than raw vectors,
    * so the same m bytes carry more precision. Scoring is pure ADC: a
    * per-(query, probed-cell) distance table, m lookups per candidate, no
    * float vectors touched after encode.
    *
    * Everything stays closed-form and SQL-replayable: coarse centroids =
    * the `nlist` mix64-smallest corpus vectors, the PQ codebook = residuals
    * of the `ksub` mix64-smallest vectors w.r.t. their OWN assigned cells
    * (one shared ordered sample prefix, one bounded collect). Candidates =
    * corpus rows whose cell is probed; rank by (adist asc, id asc).
    */
  def knnIvfPq(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      ksub: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val typed = corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]

    val nSample = math.max(nlist, ksub)
    val sample: Array[(Long, Array[Float])] = typed.toDF("id", "vec")
      .withColumn("h", graft.functions.Hashing.mix64Col(col("id")))
      .orderBy(col("h")).limit(nSample)
      .select(col("id"), col("vec")).as[(Long, Array[Float])]
      .collect()
    val dim = sample.headOption.map(_._2.length).getOrElse(0)
    require(dim > 0 && dim % m == 0, s"embedding dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val cents: Array[Array[Double]] = sample.take(nlist).map(_._2.map(_.toDouble))
    // PQ codebook: FULL-dim residual of each codebook vector vs its own cell
    val cbRes: Array[Array[Double]] = sample.take(ksub).map { case (_, v) =>
      val cell = nearestCellsIn(v, cents, 1)(0)
      Array.tabulate(dim)(i => v(i).toDouble - cents(cell)(i))
    }
    val bCents = spark.sparkContext.broadcast(cents)
    val bCb = spark.sparkContext.broadcast(cbRes)

    // d2 of one subspace chunk between a residual-producing (vec, cell) pair
    // and codebook entry j: Σ_i ((vec_i − cent_i) − cb_j,i)², i ascending
    def chunkD2(vec: Array[Float], cent: Array[Double], cb: Array[Double], s: Int): Double = {
      var d = 0.0
      var i = s * dsub
      val end = i + dsub
      while (i < end) {
        val diff = vec(i).toDouble - cent(i) - cb(i)
        d += diff * diff
        i += 1
      }
      d
    }

    val encoded = typed.mapPartitions { it =>
      val cs = bCents.value
      val cb = bCb.value
      it.map { case (id, vec) =>
        val cell = nearestCellsIn(vec, cs, 1)(0)
        val codes = Array.tabulate(m) { s =>
          var best = 0
          var bestD = Double.PositiveInfinity
          var j = 0
          while (j < cb.length) {
            val d = chunkD2(vec, cs(cell), cb(j), s)
            if (d < bestD) { bestD = d; best = j }
            j += 1
          }
          best
        }
        (id, cell, codes)
      }
    }

    // per-(query, probed cell) ADC tables: m × ksub doubles each
    val qTables: Array[(Long, Map[Int, Array[Array[Double]]])] = queries
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull) // JVM paths NPE on null vec, non-null Long encoder on null id
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])]
      .collect()
      .map { case (qid, qvec) =>
        val probed = nearestCellsIn(qvec, cents, nprobe)
        qid -> probed.map { cell =>
          cell -> Array.tabulate(m, cbRes.length)((s, j) => chunkD2(qvec, cents(cell), cbRes(j), s))
        }.toMap
      }
    val bQt = spark.sparkContext.broadcast(qTables)

    val sims = encoded.mapPartitions { it =>
      val tables = bQt.value
      it.flatMap { case (nid, cell, codes) =>
        tables.iterator.flatMap { case (qid, byCell) =>
          byCell.get(cell) match {
            case Some(dt) if qid != nid =>
              var acc = 0.0
              var s = 0
              while (s < m) { acc += dt(s)(codes(s)); s += 1 }
              Iterator.single((qid, nid, acc))
            case _ => Iterator.empty
          }
        }
      }
    }.toDF("query_id", "neighbor_id", "adist")

    val topk = udaf(new graft.functions.TopKByScore(k))
    sims.groupBy(col("query_id"))
      .agg(topk(-col("adist"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("p._2").as("neighbor_id"),
        round(-col("p._1"), 6).as("adist"))
  }

  /** Embedding near-duplicates AT SCALE: SRP-bucket candidate generation +
    * exact cosine verification over candidates only — the scale path that
    * replaces [[cosineNearDupPairs]]'s all-pairs join for unbounded corpora.
    *
    * Plan shape (mirrors MinHash LSH): map-side bucket signatures in
    * primitive loops, ONE shuffle on (table, bucket), in-bucket pair
    * expansion (never a self-join of the exploded table), distinct, then the
    * exact double-precision cosine for candidates only. `bucketCap` bounds a
    * degenerate bucket. Recall is tuned by (tables, planes): for pairs at
    * cosine c, P(candidate) = 1 - (1 - (1 - arccos(c)/π)^planes)^tables —
    * fewer planes = bigger buckets = more candidates = higher recall.
    *
    * SCALE WARNING, measured: `planes` fixes the bucket space at 2^planes
    * per table, so AVERAGE occupancy — and with it candidate-pair count —
    * grows as n²/2^planes. The sf1 rehearsal caught exactly this: 10× the
    * corpus at planes=6 cost 185× (every bucket ~10× denser, none over
    * `bucketCap`, pairs ×100). `autoPlanesOccupancy` is the scale knob:
    * when > 0 the operator counts the corpus (one cheap scan against a
    * pair-gen stage that dwarfs it) and raises `planes` to
    * ceil(log2(n / occupancy)) so expected occupancy — and per-bucket pair
    * cost — stays CONSTANT as the corpus grows; recall for true near-dups
    * (cosine → 1) stays high since their per-table collision probability
    * (1 − θ/π)^planes degrades only polynomially in planes while bucket
    * density drops exponentially. Both registered lanes (q64 occupancy=16,
    * q174 occupancy=32) run auto mode since r12; their oracles replay the
    * banding at the planes constant auto resolves at the verify SF
    * (`AutoPlanesGuardSpec` guards the boundary). Fixed `planes`
    * (autoPlanesOccupancy=0) stays available for replayable pinned
    * configurations on bounded inputs.
    */
  /** The plane count [[cosineNearDupsBucketed]] resolves under auto mode
    * for a corpus of `n` vectors: enough planes to hold expected bucket
    * occupancy at `occupancy`, never fewer than `minPlanes`. Exposed so
    * `AutoPlanesGuardSpec` can pin that the verify-SF corpus still
    * resolves to the constant the q174 oracle was built at. */
  def resolvedAutoPlanes(n: Long, occupancy: Int, minPlanes: Int): Int =
    if (occupancy <= 0) minPlanes
    else math.max(minPlanes, math.ceil(
      math.log(math.max(1.0, n.toDouble / occupancy)) / math.log(2.0)).toInt)

  def cosineNearDupsBucketed(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      tables: Int = 16,
      planes: Int = 4,
      bucketCap: Int = 2000,
      checkpointDir: Option[String] = None,
      autoPlanesOccupancy: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val effPlanes =
      if (autoPlanesOccupancy <= 0) planes
      else resolvedAutoPlanes(
        corpus.filter(col(idCol).isNotNull && col(vecCol).isNotNull).count(),
        autoPlanesOccupancy, planes)
    val mat = hyperplaneMatrix(tables, effPlanes, dim)

    // Materialized once for the three consumers below; pass `checkpointDir`
    // on a real cluster so the sketches survive executor loss
    // (Dedup.truncateLineage).
    val sigs = Dedup.truncateLineage(Dedup.ensureParallelism(corpus
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("vec")))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, vec) =>
        (id, vec, srpBucketsOf(vec, tables, effPlanes, dim, mat))
      })
      .toDF("id", "vec", "buckets"), checkpointDir)

    val candidates = Dedup.cappedBuckets(
        sigs.select(col("id"), posexplode(col("buckets")).as(Seq("t", "bucket"))),
        "t", "bucket", "id", bucketCap)
      .select(explode(Dedup.pairsOf(array_sort(col("ids")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

    // Verification: sigs carries the full vector per row — hint SHUFFLE_HASH
    // so the join builds a hash map instead of SORT-MERGING the
    // vector-laden rows (the same reasoning as Dedup.minhashNearDups'
    // verify join; measured at sf4: the SMJ's sort buffers were the
    // family's largest per-task memory acquisition).
    candidates
      .join(sigs.select(col("id").as("id_a"), col("vec").as("v_a")).hint("shuffle_hash"), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("vec").as("v_b")).hint("shuffle_hash"), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }

  /** All pairs (a < b) with cosine >= threshold — embedding near-duplicate
    * detection. Quadratic: bounded input enforced (inputs larger than
    * `maxInput` throw — use [[cosineNearDupsBucketed]] for the billion-row
    * regime). Norms are computed once per row before the self-join (N
    * instead of N² sqrt-dots; identical IEEE doubles). */
  def cosineNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxInput: Long = 10000): DataFrame = {
    val bounded = graft.operators.Dedup.requireBounded(corpus, maxInput, "cosineNearDupPairs")
    val withNorm = bounded.select(col(idCol).as("_id"), col(vecCol).as("_v"),
      norm(col(vecCol)).as("_n"))
    val a = withNorm.select(col("_id").as("id_a"), col("_v").as("v_a"), col("_n").as("n_a"))
    val b = withNorm.select(col("_id").as("id_b"), col("_v").as("v_b"), col("_n").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("v_a"), col("v_b")) / nullif(col("n_a") * col("n_b"), lit(0.0))).as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}
