package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic corpus-shaping operators for large-scale training-data
  * pipelines: hash sampling, exact stratified sampling, weighted source
  * mixing, and sequence packing.
  *
  * Everything here is DETERMINISTIC — no `rand()`, no `sampleBy`: selection
  * is a pure function of the row's id via the splitmix-style
  * [[graft.functions.Hashing.mix64]] (the codegen'd `Mix64Of` expression), so
  * results are identical across runs, task retries, cluster layouts and
  * partitionings — the reproducibility property a training-data pipeline
  * needs (re-running a 100 TB sampling job after an executor loss must not
  * change the corpus). Determinism is also what makes these operators
  * cross-engine verifiable: the DuckDB oracle replays the same hash in
  * hugeint SQL ([[graft.queries.DuckHashSql.mix64Sql]]).
  *
  * Reference analog: the reference format is the record FEED of MapReduce
  * shaping jobs (`FixedLengthInputFormat.java:26-40` positions it as input
  * plumbing); these operators are the Spark-native downstream stages.
  */
object Pipeline {

  /** `pmod(mix64(id), 2^bits)`: a uniform deterministic bucket in
    * [0, 2^bits). The modulus is a power of two ON PURPOSE: the bucket is
    * then the hash's low `bits` bits, identical for the signed (Java long)
    * and unsigned (oracle hugeint) views of the same 64-bit pattern — a
    * general modulus would make the two engines disagree on negative hashes.
    */
  def hashBucket(id: Column, bits: Int): Column = {
    require(bits > 0 && bits < 63, s"bits must be in (0, 63), got $bits")
    pmod(Hashing.mix64Col(id), lit(1L << bits))
  }

  /** Deterministic Bernoulli sample at rate keep/2^bits: keep rows whose
    * [[hashBucket]] falls below `keep`. Map-side only — no shuffle, no
    * state, embarrassingly parallel at any scale; the rate is exact in
    * expectation per row. For exact per-group sample SIZES use
    * [[stratifiedExact]]. */
  def hashSample(df: DataFrame, idCol: String, keep: Int, bits: Int = 10): DataFrame = {
    require(keep >= 0 && keep <= (1L << bits), s"keep must be in [0, 2^$bits], got $keep")
    df.filter(hashBucket(col(idCol), bits) < keep)
  }

  /** Exact-size stratified sample: each stratum keeps `ceil(n·num/den)`
    * rows, the ones with the smallest `mix64(id)` (a deterministic uniform
    * permutation of the stratum, tie-broken by id). The fraction is a
    * RATIONAL, not a double: `ceil(0.2·70)` is 15 under binary-double math
    * but 14 under decimal math — integer `(n·num + den−1) div den` is exact
    * in every engine. Cost: ONE shuffle on the strata columns; ranking
    * happens inside each stratum's task, so strata must individually fit a
    * task — fine for categorical strata (language, source, quality band).
    * For a handful of monster strata, pre-split them with a [[hashBucket]]
    * sub-shard column or fall back to [[hashSample]], which needs no
    * coordination at all. */
  def stratifiedExact(
      df: DataFrame, idCol: String, strataCols: Seq[String], num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0 && num <= den, s"need 0 < num <= den, got $num/$den")
    val strata = strataCols.map(col)
    val rank = Window.partitionBy(strata: _*)
      .orderBy(Hashing.mix64Col(col(idCol)), col(idCol))
    // floor of an exact-integer double division: exact while n·num < 2^53
    // and den is small — see the scaladoc; ceil(a/b) == floor((a+b-1)/b).
    val keep = floor((col("_n") * num + (den - 1)) / den)
    df.withColumn("_rk", row_number().over(rank))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(strata: _*)))
      .filter(col("_rk") <= keep)
      .drop("_rk", "_n")
  }

  /** Weighted source mixture: per-source sampling rates `keep_i / 2^bits`
    * (e.g. upsample books, downsample web). The rates table is tiny by
    * construction and broadcast — the corpus-side scan stays map-only with
    * no shuffle. Sources ABSENT from `rates` are dropped (rate 0), so the
    * map doubles as the mixture's source whitelist. */
  def weightedMixture(
      df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Int], bits: Int = 10): DataFrame = {
    require(rates.values.forall(k => k >= 0 && k <= (1L << bits)),
      s"every rate must be in [0, 2^$bits]")
    val spark = df.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.toDF(sourceCol, "_keep")
    df.join(broadcast(ratesDf), sourceCol)
      .filter(hashBucket(col(idCol), bits) < col("_keep"))
      .drop("_keep")
  }

  /** Temperature-flattened source mixture (the pretraining-mix standard:
    * keep counts k_i ∝ n_i^alpha, alpha ∈ (0,1] — 1 keeps natural
    * proportions, smaller alpha flattens toward uniform so low-resource
    * sources punch above their byte count), scaled to `totalTarget` rows
    * and capped at n_i. Selection within a source is the smallest-mix64
    * rank (the same deterministic permutation as [[stratifiedExact]] —
    * retry/repartition-proof). The per-source count table is collected and
    * normalized ON THE DRIVER in source-sorted order: it is bounded by the
    * source vocabulary (tiny by construction), and the ordered fold makes
    * the double normalization deterministic and SQL-replayable. One tiny
    * agg + one broadcast join + one rank window per source — the corpus
    * never shuffles except for the per-source ranking, and monster sources
    * can pre-shard exactly like stratifiedExact's scaladoc describes.
    * `sourceCol` must be a string column. */
  def temperatureMixture(
      df: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, totalTarget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(totalTarget > 0, s"totalTarget must be positive, got $totalTarget")
    val spark = df.sparkSession
    import spark.implicits._
    val raw = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // a NULL source would NPE the sort, skew totW, then silently drop out at
    // the inner join below — fail loudly instead of mis-sharing the budget
    require(raw.forall(_._1 != null),
      s"temperatureMixture: NULL '$sourceCol' rows cannot take a mixture share; filter or impute upstream")
    val counts = raw.sortBy(_._1) // deterministic fold order (and the oracle's ORDER BY)
    val ws = counts.map { case (s, n) => (s, n, math.pow(n.toDouble, alpha)) }
    val totW = ws.foldLeft(0.0)(_ + _._3)
    val ks = ws.map { case (s, n, w) =>
      (s, math.min(n, math.floor(totalTarget.toDouble * w / totW).toLong))
    }.toSeq
    val kDf = ks.toDF(sourceCol, "_k")
    val rank = Window.partitionBy(col(sourceCol))
      .orderBy(Hashing.mix64Col(col(idCol)), col(idCol))
    df.join(broadcast(kDf), sourceCol)
      .withColumn("_rk", row_number().over(rank))
      .filter(col("_rk") <= col("_k"))
      .drop("_rk", "_k")
  }

  /** Concat-and-chunk sequence packing (the standard pretraining layout):
    * within each shard, rows ordered by id form one virtual token stream,
    * and each row joins the pack its FIRST token lands in:
    * `pack_id = floor(tokens_before_this_row / budget)`. A row is never
    * split across packs; a pack may overflow `budget` by at most one row's
    * tail (the straddling row) — the usual trade against padding waste.
    *
    * Scale shape: the running sum is a window per (shardCols), ONE shuffle;
    * shard columns must bound each window partition to task size (e.g. a
    * [[hashBucket]] of the id — shards are independent token streams, which
    * is exactly how multi-worker pretraining shards its data anyway).
    * Returns the input plus a `pack_id` column. */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: Column,
      budget: Int, shardCols: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shardCols.nonEmpty,
      "packSequences needs shard columns: an unsharded window is a single task at scale")
    val w = Window.partitionBy(shardCols: _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumBefore = coalesce(sum(tokensCol).over(w), lit(0L))
    // Long/Int division in Spark is double math; exact for any corpus whose
    // per-shard token count stays below 2^53 (sharding guarantees this).
    df.withColumn("pack_id", floor(cumBefore / lit(budget)))
  }
}
