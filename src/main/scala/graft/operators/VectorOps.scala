package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Corpus-sum convention for the vector-moment operators: how a per-group
  * floating-point reduction is computed.
  *
  *  - [[SumMode.ExactFold]] — ordered left-to-right IEEE double fold over a
  *    `sort_array(collect_list(...))` of the group. Bit-exact in Spark AND
  *    DuckDB by construction (the q103 float convention), which is what
  *    lets the verify oracle hash-match arbitrary-float moments. The
  *    per-group collect is UNBOUNDED — this mode exists for the oracle SF
  *    and must not run against a 100 TB corpus.
  *  - [[SumMode.PlaneSums]] — plain `sum(...)` double aggregation:
  *    partial-agg map-side combine, bounded state per group, whole-stage
  *    codegen. Summation order is partition-dependent, so results carry
  *    last-ulp drift vs the fold (≈1e-15 relative) — the documented,
  *    accepted trade at scale. This is the 100 TB mode.
  *
  * There is deliberately NO default: the r10 API defaulted to ExactFold,
  * which contradicted its own scaladoc — a caller reaching for the operator
  * bare at corpus scale silently got the unbounded per-group collect. Every
  * caller now states which contract it wants.
  *
  * `SumModePlanSpec` pins both halves of the contract: PlaneSums plans
  * contain no `collect_list`/`sort_array`, and the two modes agree within
  * the operators' 6-dp output granularity at the verify SF.
  */
sealed trait SumMode
object SumMode {
  case object ExactFold extends SumMode
  case object PlaneSums extends SumMode
}

/** Whole-corpus vector feature engineering: per-dimension standardization
  * (z-scores under corpus moments) and Johnson–Lindenstrauss random
  * projection with a ±1 sign matrix (Achlioptas 2003 — database-friendly
  * random projections: E[y·y'] preserves inner products at k ≪ d with
  * nothing heavier than sign flips and adds).
  *
  * Cross-engine float conventions (the q103 lesson, see [[labelMeans]]):
  * arbitrary float inputs cannot ride the decimal-sum trick, so under the
  * default [[SumMode.ExactFold]] every corpus sum here is an ORDERED
  * left-to-right IEEE double fold — exact in both engines by
  * construction — and derived quantities are computed with textually
  * identical expressions. At corpus scale pass [[SumMode.PlaneSums]]
  * instead: plain partial-agg sums, no per-group collect, last-ulp order
  * drift accepted. The JL sign matrix is [[Hashing.mix64]] of
  * (dimension, output column), which the DuckDB oracle replays bit-for-bit
  * via its hugeint twin.
  */
object VectorOps {

  /** Bound for the per-round direction pull: d rows — no real embedding
    * family approaches this, and [[BoundedPull]] turns a violation into a
    * loud error instead of a driver OOM. */
  private val MaxPulledDims = 1 << 16

  /** Group-sum of `t` under `mode`: ordered fold by `ord` (exact, q103
    * convention) or plain partial-agg double sum (scale). Usable wherever
    * an aggregate expression is (groupBy.agg or global agg). */
  private def foldSum(mode: SumMode, ord: Column, t: Column): Column = mode match {
    case SumMode.ExactFold =>
      aggregate(sort_array(collect_list(struct(ord.as("o"), t.as("t")))),
        lit(0.0), (a, s) => a + s.getField("t"))
    case SumMode.PlaneSums => sum(t)
  }

  /** Per-label embedding centroids (the q103 operator): explode to
    * (label, dim, x), reduce each (label, dim) group under `mode`, return
    * (label, dim, mean, n). One shuffle of labels × d groups; the d×labels
    * stats frame is always tiny. ExactFold is the verify convention
    * (DuckDB replays the vec_id-ordered fold bit-for-bit); PlaneSums is
    * the corpus-scale shape — bounded state, map-side combine. */
  def labelMeans(
      embs: DataFrame, idCol: String, labelCol: String, vecCol: String,
      sumMode: SumMode): DataFrame = {
    val ex = embs
      .select(col(idCol), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
    ex.groupBy(col("label"), col("dim"))
      .agg(foldSum(sumMode, col(idCol), col("x")).as("sx"),
        count(lit(1)).as("n"))
      .select(col("label"), col("dim"), (col("sx") / col("n")).as("mean"), col("n"))
  }

  /** Per-dimension corpus z-scores: (idCol, dim, z) with
    * z = (x − mean_dim) / sd_dim rounded to 6 dp; sd is the population
    * standard deviation, and zero-variance dimensions yield NULL z (the
    * nullif guard — ANSI division would abort on the degenerate constant
    * column, and NULL states "no information" the same way the quality
    * ratios do).
    *
    * Scale shape: one explode to (dim, x) and ONE shuffle into d groups.
    * Under ExactFold the moments collect each dimension's column —
    * unbounded per group, verify-SF only; under PlaneSums they are plain
    * double sums (partial-agg map-side, last-ulp order drift accepted)
    * exactly as the q103 caveat prescribes. The d-row stats frame
    * broadcasts back onto the exploded corpus, so the transform itself is
    * map-side in both modes. */
  def standardize(
      embs: DataFrame, idCol: String, vecCol: String,
      sumMode: SumMode): DataFrame = {
    val ex = embs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
    val stats = (sumMode match {
      case SumMode.ExactFold =>
        // one collect per group, folded twice (sx, sxx) — collecting twice
        // would double the per-group state for no exactness gain
        ex.groupBy(col("dim"))
          .agg(
            sort_array(collect_list(struct(col(idCol), col("x")))).as("xs"),
            count(lit(1)).cast("double").as("n"))
          .select(col("dim"),
            aggregate(col("xs"), lit(0.0), (a, s) => a + s.getField("x")).as("sx"),
            aggregate(col("xs"), lit(0.0),
              (a, s) => a + s.getField("x") * s.getField("x")).as("sxx"),
            col("n"))
      case SumMode.PlaneSums =>
        ex.groupBy(col("dim"))
          .agg(sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"),
            count(lit(1)).cast("double").as("n"))
    })
      .select(col("dim"), (col("sx") / col("n")).as("mean"),
        sqrt(greatest(
          col("sxx") / col("n") - (col("sx") / col("n")) * (col("sx") / col("n")),
          lit(0.0))).as("sd"))
    ex.join(broadcast(stats), Seq("dim")) // d rows — always broadcastable
      .select(col(idCol), col("dim"),
        round((col("x") - col("mean")) / nullif(col("sd"), lit(0.0)), 6).as("z"))
  }

  /** Top principal direction of the mean-centered corpus by POWER
    * ITERATION (the PCA workhorse at matrix sizes where covariance
    * materialization — d² folds — is the wrong shape): iterate
    * v ← X'ᵀ(X'v) / ‖X'ᵀ(X'v)‖ from the exact all-⅛ start vector,
    * without ever materializing d×d. Returns (dim, loading, lambda) —
    * the unit loading vector after `iters` rounds and ‖u‖ of the final
    * un-normalized step (the Rayleigh-style estimate of the top scatter
    * eigenvalue).
    *
    * Under ExactFold every corpus reduction (per-dim mean, per-row score
    * x'·v, per-dim re-projection Σᵢ sᵢx'ᵢ, the norm) is an ORDERED
    * left-to-right fold (the q103 float convention), and the start vector
    * and normalization are exact/textually-identical expressions — so a
    * 3-iteration TRAJECTORY hash-matches the oracle, not just a converged
    * direction. Under PlaneSums the same reductions are plain partial-agg
    * sums — the corpus-scale shape. Scale shape: each iteration is two
    * skinny shuffles over (id, dim, x) rows — a d-row broadcast join for
    * the scores, an id-keyed join for the re-projection. */
  def powerIteration(
      embs: DataFrame, idCol: String, vecCol: String, iters: Int = 3,
      sumMode: SumMode): DataFrame = {
    // the lazy path never reaches leadingDirection's materializing guard,
    // so probe the input here — a limit-1 job (first valid row short-
    // circuits the scan), loud on zero rows / all-empty vectors. This is
    // the ONLY probe site: topTwoComponents (materializeEachRound = true)
    // relies on the in-loop take(1) guard instead, so the deflated path
    // never pays a duplicate probe job
    require(!embs.filter(col(idCol).isNotNull && col(vecCol).isNotNull &&
        size(col(vecCol)) > 0).isEmpty,
      "power iteration over empty input: zero embedding rows (or empty " +
        "vectors) — nothing to decompose")
    // single-component run stays fully LAZY (one action at the end): the
    // subtree duplication is a bounded 2^iters here, cheaper than per-round
    // materializing actions — only the deflated run needs those.
    // r18 re-measured this trade at sf0.1/iters=3 and the comment stands:
    // lazy 2.6 s warm vs 3.0 s (persist + per-round pulls) vs 5.7 s
    // (persist + lazy — cache encode plus planning the duplicated tree)
    // vs 5.4 s (repartition-by-id persist — pinned partitions defeat AQE
    // coalescing of the d-bounded round exchanges). At corpus scale the
    // 2^iters re-execution of the centering pass is the known cost of
    // this mode; callers with a big corpus use topTwoComponents' shape.
    val ex = centeredRows(embs, idCol, vecCol, sumMode)
    val (v, lambda) = leadingDirection(ex, idCol,
      startVector(ex, alternate = false), iters, None,
      materializeEachRound = false, sumMode)
    v.crossJoin(broadcast(lambda))
      .select(col("dim"), round(col("v"), 6).as("loading"), round(col("nrm"), 6).as("lambda"))
      .orderBy(col("dim"))
  }

  /** Top TWO principal directions: PC1 as [[powerIteration]], then PC2 by
    * ORTHOGONAL DEFLATION — the same iteration with each un-normalized
    * step re-projected off PC1 (u ← u − (u·v₁)v₁) before normalizing, so
    * the iterate converges in the orthogonal complement without ever
    * materializing a deflated matrix. PC2 starts from the exact
    * alternating ±⅛ vector (the all-⅛ start lives mostly inside PC1's
    * span). Returns (pc, dim, loading, lambda) — under ExactFold the same
    * fold-exactness contract as [[powerIteration]]: the whole
    * two-component trajectory hash-matches the oracle's unrolled replay. */
  def topTwoComponents(
      embs: DataFrame, idCol: String, vecCol: String, iters: Int = 3,
      sumMode: SumMode): DataFrame = {
    // NOT repartitioned by id (r18 measured): pre-hashing the persisted
    // rows by id would let every round's score aggregate and re-projection
    // join reuse one layout (guide §2.4), but it PINS the partition count —
    // the per-round exchanges this removes are exactly the ones AQE
    // coalesces to the data's actual size, and the pinned layout ran the
    // d-bounded rounds 2× slower at bench scale (32 near-empty tasks per
    // stage). The AQE-sized exchanges are the scale-adaptive choice.
    val ex = centeredRows(embs, idCol, vecCol, sumMode).persist()
    try {
      val (v1, l1) = leadingDirection(ex, idCol,
        startVector(ex, alternate = false), iters, None,
        materializeEachRound = true, sumMode)
      val (v2, l2) = leadingDirection(ex, idCol,
        startVector(ex, alternate = true), iters, Some(v1),
        materializeEachRound = true, sumMode)
      def out(pc: Int, v: DataFrame, l: DataFrame) =
        v.crossJoin(broadcast(l)).select(lit(pc).as("pc"), col("dim"),
          round(col("v"), 6).as("loading"), round(col("nrm"), 6).as("lambda"))
      out(1, v1, l1).unionByName(out(2, v2, l2)).orderBy(col("pc"), col("dim"))
    } finally ex.unpersist(blocking = false)
  }

  /** Mean-centered (idCol, dim, xc) rows — per-dim means under `mode`. */
  private def centeredRows(
      embs: DataFrame, idCol: String, vecCol: String, sumMode: SumMode): DataFrame = {
    val ex0 = embs
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("x", col("x").cast("double"))
    val means = ex0.groupBy(col("dim"))
      .agg(foldSum(sumMode, col(idCol), col("x")).as("sx"),
        count(lit(1)).cast("double").as("n"))
      .select(col("dim"), (col("sx") / col("n")).as("mean"))
    ex0.join(broadcast(means), Seq("dim"))
      .select(col(idCol), col("dim"), (col("x") - col("mean")).as("xc"))
  }

  /** Exact start vector over the dims of `ex`: all ⅛, or alternating ±⅛. */
  private def startVector(ex: DataFrame, alternate: Boolean): DataFrame = {
    val dims = ex.select(col("dim")).distinct()
    if (alternate)
      dims.select(col("dim"),
        when(col("dim") % 2 === 0, 0.125).otherwise(-0.125).as("v"))
    else dims.select(col("dim"), lit(0.125).as("v"))
  }

  /** `iters` power-iteration rounds from `v0`; when `orthoTo` is given,
    * every un-normalized step is re-projected off that unit direction
    * before normalizing. Returns the UNROUNDED (dim, v) direction and the
    * single-row (nrm) of the final step. */
  private def leadingDirection(
      ex: DataFrame, idCol: String, v0: DataFrame, iters: Int,
      orthoTo: Option[DataFrame], materializeEachRound: Boolean,
      sumMode: SumMode): (DataFrame, DataFrame) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var v = v0
    var lambda: DataFrame = null
    for (_ <- 1 to iters) {
      val s = ex.join(broadcast(v), Seq("dim"))
        .groupBy(col(idCol))
        .agg(foldSum(sumMode, col("dim"), col("xc") * col("v")).as("s"))
      var u = ex.join(s, Seq(idCol))
        .groupBy(col("dim"))
        .agg(foldSum(sumMode, col(idCol), col("s") * col("xc")).as("u"))
      orthoTo.foreach { v1 =>
        val dot = u.join(broadcast(v1.select(col("dim"), col("v").as("v1"))), Seq("dim"))
          .agg(foldSum(sumMode, col("dim"), col("u") * col("v1")).as("dt"))
        u = u.join(broadcast(v1.select(col("dim"), col("v").as("v1"))), Seq("dim"))
          .crossJoin(broadcast(dot))
          .select(col("dim"), (col("u") - col("dt") * col("v1")).as("u"))
      }
      lambda = u
        .agg(sqrt(foldSum(sumMode, col("dim"), col("u") * col("u"))).as("nrm"))
      v = u.crossJoin(broadcast(lambda)).select(col("dim"), (col("u") / col("nrm")).as("v"))
      if (materializeEachRound) {
        // materialize the d-row direction (and 1-row norm) each round —
        // ONE bounded pull that CUTS the lineage: left lazy, every
        // iteration re-derives all prior subtrees (u is referenced by
        // dot/ortho/norm/v, each reference duplicating the tree →
        // combinatorial plan growth by round 3 of the deflated run).
        // Values are unchanged — the pull is after the exact folds.
        val pulled = BoundedPull(v.crossJoin(broadcast(lambda)),
          maxRows = MaxPulledDims, what = "power-iteration direction (d rows)")
        require(pulled.take(1).nonEmpty, // local relation — a driver-side peek
          "power iteration over empty input: zero embedding rows (or empty " +
            "vectors) reached leadingDirection — nothing to decompose")
        v = pulled.select(col("dim"), col("v"))
        lambda = pulled.select(col("nrm")).limit(1)
      }
    }
    (v, lambda)
  }

  /** JL projection to `k` dimensions: (idCol, j, y) where
    * y_j = Σ_i x_i · sign(mix64(i, j)), folded in element order (exact
    * cross-engine — sign flips introduce no rounding), rounded to 6 dp.
    * The d×k sign matrix is derived on the driver from the deterministic
    * hash (bounded — it never touches the corpus) and enters the plan as
    * k literal arrays, so the whole projection is ONE codegen'd map-side
    * pass over the vectors: no shuffle, no join, no explode. */
  def jlProject(embs: DataFrame, idCol: String, vecCol: String, dim: Int, k: Int): DataFrame = {
    val signs: IndexedSeq[Array[Double]] = (0 until k).map { j =>
      Array.tabulate(dim)(i => if (Hashing.mix64(i.toLong, j) < 0) -1.0 else 1.0)
    }
    val ys = array((0 until k).map { j =>
      round(aggregate(
        zip_with(col(vecCol).cast("array<double>"), typedLit(signs(j)), (x, s) => x * s),
        lit(0.0), (a, b) => a + b), 6)
    }: _*)
    embs.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .filter(size(col(vecCol)) === dim) // the sign matrix is dim-indexed
      .select(col(idCol), posexplode(ys).as(Seq("j", "y")))
  }
}
