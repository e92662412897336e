package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime:
  *
  *  - exact: hash-groupBy on the dedup key — one shuffle on the key, no
  *    driver-side state;
  *  - n-gram Jaccard: exact pairwise similarity (quadratic — use only on a
  *    candidate set, e.g. LSH bucket output or a bounded id range);
  *  - MinHash + LSH: the scale path — per-row signatures are pure column
  *    expressions (map-side, codegen'd), candidate generation is a
  *    band-bucket self-join (shuffle on band hash, never all-pairs), then
  *    exact Jaccard verification on candidates only;
  *  - SimHash: 64-bit signature per row + Hamming-distance candidate pairs.
  *
  * All hashes are xxhash64 seeded per-function, so results are
  * deterministic across runs and cluster layouts.
  */
object Dedup {

  /** Word n-gram (shingle) set of a text column — distinct, order-free. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    // Guard: Spark's sequence(1, 0) counts DOWN ([1, 0]); short docs must
    // yield an empty shingle set, not garbage grams.
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array())
    array_distinct(grams)
  }

  /** Exact duplicate groups: representative (min id) + group size per
    * distinct key. Equivalent semantics to `dropDuplicates(keyCols)` but
    * with a deterministic representative. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)), 6)

  /** Exact pairwise n-gram Jaccard over (id, grams) rows. Quadratic — feed
    * it candidates, not a raw corpus. */
  def jaccardPairs(grams: DataFrame, idCol: String, gramsCol: String, threshold: Double): DataFrame = {
    val a = grams.select(col(idCol).as("id_a"), col(gramsCol).as("g_a"))
    val b = grams.select(col(idCol).as("id_b"), col(gramsCol).as("g_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("g_a"), col("g_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature over PRE-HASHED shingles: element i is the minimum of
    * `xxhash64(h, i)` over the shingle hashes `h`. Each shingle string is
    * hashed exactly once (string traversal is the expensive part); the
    * numHashes permutations are cheap long→long re-hashes. Built as ONE
    * nested `transform` so the expression tree stays small — round 1 inlined
    * 64 separate transforms, which blew codegen up to 20 MiB task binaries. */
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleHashes, h => xxhash64(h, i))))

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and hash each band; docs sharing any band hash become candidates.
    * Compact nested-transform form (see minhashSignature). */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), b))

  /** All ordered pairs (a < b) of a sorted id array, as an array of structs.
    * Used to expand an LSH bucket into candidate pairs without a self-join. */
  private def pairsOf(sortedIds: Column): Column =
    flatten(transform(sortedIds, (x, i) =>
      transform(slice(sortedIds, i + 2, greatest(size(sortedIds) - i - 1, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))

  /** Near-duplicate pairs via MinHash + LSH, verified with exact Jaccard.
    *
    * Plan shape at scale (the 100 TB path):
    *   1. map-side: shingle → hash each shingle once → signature → band
    *      hashes (pure codegen'd expressions, no shuffle);
    *   2. ONE shuffle on (band_idx, band_hash) → buckets; pairs are expanded
    *      inside each bucket with an array expression — never a quadratic
    *      self-join of the exploded table (round 1's mistake: that self-join
    *      recomputed the whole signature pipeline on both sides and took
    *      646 s at sf0.1);
    *   3. `distinct` over candidate pairs, then a join back to the persisted
    *      gram sets for exact-Jaccard verification of candidates only.
    *
    * `bucketCap` bounds the blast radius of a degenerate bucket (all-identical
    * spam): a bucket with more than `bucketCap` docs is dropped from
    * candidate generation — at that size the docs are near-certain exact
    * duplicates, which the exact-dedup pass (cheaper, shuffle-on-key) already
    * handles. This is the standard skew guard for LSH at scale.
    */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      bucketCap: Int = 2000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val rowsPerBand = numHashes / bands

    // (id, grams, sig) computed once and persisted: the band explode and the
    // two verification joins below would otherwise each recompute the full
    // shingle+signature pipeline.
    val sigs = docs
      .select(col(idCol).as("id"), shingles(col(textCol), shingleLen).as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("sig",
        minhashSignature(transform(col("grams"), s => xxhash64(s)), numHashes))
      .persist()

    val banded = sigs
      .select(col("id"), posexplode(bandHashes(col("sig"), bands, rowsPerBand)).as(Seq("band_idx", "band_hash")))

    val candidates = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, bucketCap))
      .select(explode(pairsOf(array_sort(col("ids")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

    candidates
      .join(sigs.select(col("id").as("id_a"), col("grams").as("g_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("grams").as("g_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("g_a"), col("g_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit b is set iff more than half
    * of the token hashes have bit b set. Pure expressions, map-side. */
  def simhash64(tokensCol: Column): Column = {
    val hashed = transform(tokensCol, t => xxhash64(t))
    val n = size(hashed)
    (0 until 64).map { b =>
      val ones = size(filter(hashed, h => shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L)))
      when(ones * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dup candidate pairs with Hamming distance <= maxHamming.
    * Pairwise over the supplied frame — bound the input (or pre-bucket by
    * signature bytes: equal-prefix buckets make this shuffle-local). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      simhash64(split(trim(col(textCol)), "\\s+")).as("sig"))
    sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Deterministic keep/drop verdict from near-dup pairs: keep the smallest
    * id of each connected component's star (single-pass approximation:
    * drop any doc that matches a smaller-id doc). */
  def dropVerdicts(pairs: DataFrame): DataFrame =
    pairs.select(col("id_b").as("drop_id")).distinct()
}
