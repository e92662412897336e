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

  /** Word n-gram (shingle) set of a text column — distinct, first-occurrence
    * order. Codegen'd primitive loop ([[graft.functions.ShinglesOf]]): the
    * declarative `array_distinct(transform(...))` form ran interpreted per
    * element and dominated the decontamination scan (16 s of 16.5 s at
    * sf0.1); `ShinglingSpec` pins the two forms equal. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.Shingling.shingles(text, n)

  /** Exact duplicate groups: representative (min id) + group size per
    * distinct key. Equivalent semantics to `dropDuplicates(keyCols)` but
    * with a deterministic representative. */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Priority dedup: ONE representative per key, the row maximizing
    * (priority desc, tie asc) — "keep the BEST duplicate" (longest, highest
    * quality score, freshest crawl...), not the first one seen, which is what
    * a curation pipeline usually wants. One shuffle on the key; `tie` must be
    * unique within a key group for a deterministic pick. */
  def keepBest(df: DataFrame, key: Column, priority: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(priority.desc, tie)
    df.withColumn("_kb_rn", row_number().over(w))
      .filter(col("_kb_rn") === 1).drop("_kb_rn")
  }

  /** Jaccard similarity of two DISTINCT-element array columns. Computes only
    * the intersection and derives |A ∪ B| = |A| + |B| − |A ∩ B| — half the
    * hash-set work of an explicit array_union, identical value for
    * distinct-element inputs (which shingle sets are by construction). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    round(inter / (size(a) + size(b) - inter), 6)
  }

  /** Lineage truncation for iterative/multi-consumer plans. With no
    * `checkpointDir` this is a lazy LOCAL checkpoint: blocks live on
    * executors and are released by the context cleaner with the result
    * DataFrame — the right default for interactive use, but they die with
    * executor loss. On a real cluster, long jobs should pass a reliable
    * `checkpointDir` (HDFS/object store): blocks then survive executor churn
    * at the cost of a write to distributed storage per truncation. NOTE:
    * reliable checkpoint FILES are only auto-deleted when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
    * false) — otherwise they accumulate under `checkpointDir` until the
    * caller cleans them up. */
  private[graft] def truncateLineage(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // setCheckpointDir mutates global context state; skip the no-op call
        // (and its eager mkdirs) when the dir is already current.
        if (!sc.getCheckpointDir.contains(new org.apache.hadoop.fs.Path(dir).toString))
          sc.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint(false)
    }

  /** Enforced bound for the quadratic verification kernels: the docs said
    * "feed candidates only", but nothing made that contract mechanical — one
    * misuse away from an O(N²) cartesian at cluster scale. The guard count
    * doubles as a materialization point: the input is local-checkpointed, so
    * both sides of the pairwise self-join reuse the computed rows instead of
    * re-deriving the upstream (e.g. shingle) pipeline per side. */
  private[graft] def requireBounded(df: DataFrame, maxInput: Long, op: String): DataFrame = {
    val cp = df.localCheckpoint(false)
    val n = cp.count()
    require(n <= maxInput,
      s"$op is a quadratic pairwise kernel: input has $n rows > maxInput=$maxInput. " +
        "Feed it a candidate set (LSH/banded buckets) or raise maxInput deliberately.")
    cp
  }

  /** Exact pairwise n-gram Jaccard over (id, grams) rows. Quadratic — feed
    * it candidates, not a raw corpus (enforced: inputs larger than
    * `maxInput` throw). Grams are hashed to 64-bit longs ONCE per row before
    * pairing: set intersection over longs is several times cheaper than over
    * strings, and |A ∩ B| is unchanged modulo xxhash64 collisions (~2^-64
    * per pair of distinct shingles — negligible). */
  def jaccardPairs(grams: DataFrame, idCol: String, gramsCol: String, threshold: Double,
      maxInput: Long = 10000): DataFrame = {
    val hashed = requireBounded(grams, maxInput, "jaccardPairs").select(
      col(idCol).as("_id"), transform(col(gramsCol), g => xxhash64(g)).as("_gh"))
    val a = hashed.select(col("_id").as("id_a"), col("_gh").as("g_a"))
    val b = hashed.select(col("_id").as("id_b"), col("_gh").as("g_b"))
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
  private[graft] def pairsOf(sortedIds: Column): Column =
    flatten(transform(sortedIds, (x, i) =>
      transform(slice(sortedIds, i + 2, greatest(size(sortedIds) - i - 1, lit(0))),
        y => struct(x.as("id_a"), y.as("id_b")))))

  /** Splitmix-style 64-bit string hash + per-permutation long mixer — the
    * JVM twin of the expression pipeline, used inside mapPartitions where
    * interpreted higher-order functions would dominate (measured: the
    * numHashes × |shingles| lambda evals of the expression form took 12 s of
    * q52's 15 s at sf0.1; the primitive-loop form takes well under 1 s).
    * Canonical implementation lives in [[graft.functions.Hashing]] (shared
    * with the codegen'd expressions and the DuckDB oracle renderer). */
  private[graft] def hash64(s: String): Long = graft.functions.Hashing.hash64(s)
  private[graft] def mix64(h: Long, i: Int): Long = graft.functions.Hashing.mix64(h, i)

  /** Per-doc MinHash state: distinct shingle hashes, signature, band hashes.
    * Pure function of (text, params) — deterministic everywhere. */
  private[graft] def sketchOf(text: String, shingleLen: Int, numHashes: Int,
      bands: Int): (Array[Long], Array[Long], Array[Long]) = {
    if (text == null) return (Array.empty, Array.empty, Array.empty)
    val toks = text.trim.split("\\s+")
    if (toks.length < shingleLen) return (Array.empty, Array.empty, Array.empty)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= toks.length - shingleLen) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < shingleLen) { sb.append(' ').append(toks(i + k)); k += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val gh = new Array[Long](seen.size)
    val it = seen.iterator()
    var g = 0
    while (it.hasNext) { gh(g) = hash64(it.next()); g += 1 }
    val sig = new Array[Long](numHashes)
    var p = 0
    while (p < numHashes) {
      var minV = Long.MaxValue
      var j = 0
      while (j < gh.length) { val v = mix64(gh(j), p); if (v < minV) minV = v; j += 1 }
      sig(p) = minV
      p += 1
    }
    val rowsPerBand = numHashes / bands
    val bh = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x27D4EB2F165667C5L + b
      var r = 0
      while (r < rowsPerBand) { acc = mix64(acc ^ sig(b * rowsPerBand + r), r); r += 1 }
      bh(b) = acc
      b += 1
    }
    (gh, sig, bh)
  }

  /** Near-duplicate pairs via MinHash + LSH, verified with exact Jaccard.
    *
    * Plan shape at scale (the 100 TB path):
    *   1. map-side: shingle → hash → signature → band hashes, computed in
    *      primitive loops via mapPartitions (Spark's higher-order array
    *      functions are interpreted, not codegen'd — the expression form of
    *      this sketch was the dominant cost of the whole pipeline);
    *   2. ONE shuffle on (band_idx, band_hash) → buckets; pairs are expanded
    *      inside each bucket with an array expression — never a quadratic
    *      self-join of the exploded table (round 1's mistake: that self-join
    *      recomputed the whole signature pipeline on both sides and took
    *      646 s at sf0.1);
    *   3. `distinct` over candidate pairs, then a join back to the persisted
    *      hashed-shingle sets for exact-Jaccard verification of candidates
    *      only (set ops over longs — several times cheaper than strings,
    *      identical counts modulo ~2^-64 collisions).
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
      bucketCap: Int = 2000,
      checkpointDir: Option[String] = None): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val spark = docs.sparkSession
    import spark.implicits._

    // (id, gh, bands) computed in primitive loops, materialized ONCE for the
    // three consumers below via truncateLineage: unlike .persist(), whose
    // CacheManager entry would outlive the caller with no clean unpersist
    // point, checkpoint blocks/files are released by the context cleaner
    // once the result DataFrame is garbage-collected. Pass `checkpointDir`
    // on a real cluster so the materialization survives executor loss.
    // NULL text never matches anything (SQL semantics) — drop before the
    // JVM sketch loop, which (unlike the old expression form) is not
    // null-propagating.
    val sigs = truncateLineage(docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .filter(col("text").isNotNull)
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val (gh, _, bh) = sketchOf(text, shingleLen, numHashes, bands)
        if (gh.isEmpty) None else Some((id, gh, bh))
      })
      .toDF("id", "gh", "bands"), checkpointDir)

    val banded = sigs
      .select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))

    val candidates = banded
      .groupBy(col("band_idx"), col("band_hash"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, bucketCap))
      .select(explode(pairsOf(array_sort(col("ids")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

    candidates
      .join(sigs.select(col("id").as("id_a"), col("gh").as("g_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("gh").as("g_b")), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("g_a"), col("g_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token multiset: bit b is set iff more than half
    * of the token hashes have bit b set. Pure expressions, map-side — kept
    * as the API/reference form; the operators below use the JVM twin
    * [[simhashOf]] (interpreted HOF lambdas here cost 64×|tokens| evals per
    * doc — the same pitfall as the MinHash/SRP sketches). */
  def simhash64(tokensCol: Column): Column = {
    val hashed = transform(tokensCol, t => xxhash64(t))
    val n = size(hashed)
    (0 until 64).map { b =>
      val ones = size(filter(hashed, h => shiftright(h, b).bitwiseAND(lit(1L)) === lit(1L)))
      when(ones * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** JVM SimHash over whitespace tokens (hash64-based — primitive loops).
    * Canonical implementation: [[graft.functions.Hashing.simhashOf]]. */
  private[graft] def simhashOf(text: String): Long = graft.functions.Hashing.simhashOf(text)

  /** Per-doc signatures via the codegen'd [[graft.functions.SimHash64]]
    * expression: the whole token-hash-fold is one static call inside
    * whole-stage codegen — no Dataset encoder round-trip, no interpreted
    * higher-order functions, stays map-side at full scan width. */
  private def simhashSigs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull) // NULL text matches nothing (SQL semantics)
      .select(col(idCol).cast("long").as("id"),
        graft.functions.Hashing.simhash(col(textCol)).as("sig"))

  /** SimHash near-dup candidate pairs with Hamming distance <= maxHamming.
    * Pairwise over the supplied frame — bounded input enforced; use
    * [[simhashNearDupsBanded]] for small radii at scale. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int,
      maxInput: Long = 10000): DataFrame = {
    val sigs = simhashSigs(requireBounded(docs, maxInput, "simhashPairs"), idCol, textCol)
    sigs.as("a").join(sigs.as("b"), col("a.id") < col("b.id"))
      .select(
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** SimHash near-dups at scale via band bucketing: split the 64-bit
    * signature into `bands` equal bit-slices; by pigeonhole, any pair with
    * Hamming distance < bands shares at least one identical slice, so
    * bucketing on (band, slice) finds ALL pairs with `maxHamming <=
    * bands - 1` with one shuffle — no pairwise scan. (The quadratic
    * `simhashPairs` remains for larger radii over bounded inputs, where no
    * sub-quadratic exact method exists.)
    *
    * `bucketCap` defaults to unbounded so the pigeonhole exactness guarantee
    * holds; set a finite cap on heavily skewed corpora to bound a degenerate
    * (band, slice) bucket, accepting that pairs inside dropped buckets are
    * lost (exact duplicates in such buckets are the exact-dedup pass's job).
    */
  def simhashNearDupsBanded(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      bands: Int = 4,
      bucketCap: Int = Int.MaxValue): DataFrame = {
    require(maxHamming < bands,
      s"banded simhash guarantees recall only for maxHamming < bands (got $maxHamming >= $bands)")
    require(64 % bands == 0, "bands must divide 64")
    val bits = 64 / bands

    val sigs = simhashSigs(docs, idCol, textCol)

    val banded = sigs.select(col("id"), col("sig"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sig"), b * bits).bitwiseAND(lit((1L << bits) - 1))): _*))
        .as(Seq("band_idx", "slice")))

    val candidates = banded
      .groupBy(col("band_idx"), col("slice"))
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, bucketCap))
      .select(explode(pairsOf(array_sort(col("ids")))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

    candidates
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Connected components over near-dup pairs by alternating large-star /
    * small-star min-id propagation (the MapReduce-native CC algorithm —
    * Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14). Returns (id, component) for every node that appears in a
    * pair, where component = the minimum id of the node's component.
    *
    * Scale shape: each round is two aggregate+explode passes (shuffle on
    * node id) over the current edge set; the edge set only shrinks toward
    * the final star forest and the round count is O(log n) — the algorithm
    * of choice at the billions-of-edges regime, unlike single-hop label
    * propagation whose round count is the graph DIAMETER (a duplicate
    * *chain* of length k needs k rounds). Lineage is truncated per round
    * with a local checkpoint, the standard Spark pattern for iterative
    * plans (swap for a reliable checkpoint dir on a real cluster).
    *
    * Convergence is detected by an order-insensitive edge-set checksum
    * (count + sum of pair hashes) — one tiny driver-side tuple per round,
    * never the edge data itself. Non-convergence within `maxRounds` THROWS:
    * extracting components from a non-fixpoint edge set would return
    * silently-wrong labels, and O(log n) rounds means the default 25 covers
    * ~2^33 nodes — hitting the cap signals something structurally wrong, not
    * a need for patience.
    */
  def connectedComponents(
      pairs: DataFrame,
      maxRounds: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    // canonical undirected edges u < v
    var edges = truncateLineage(pairs
      .select(least(col("id_a"), col("id_b")).as("u"), greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull)
      .distinct(), checkpointDir)

    // large-star: for every node, link its LARGER neighbors to the minimum
    // of its neighborhood (incl. itself) — shrinks tall chains fast.
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      nbrs.groupBy(col("u")).agg(collect_set(col("v")).as("nv"))
        .select(col("u"), least(col("u"), array_min(col("nv"))).as("m"), col("nv"))
        .select(col("m"), explode(filter(col("nv"), x => x > col("u"))).as("bigger"))
        .select(col("m").as("u"), col("bigger").as("v"))
        .distinct()
    }

    // small-star: for every node, link its SMALLER neighbors (and itself)
    // to the minimum among them — flattens local stars.
    def smallStar(e: DataFrame): DataFrame = {
      e.groupBy(col("v")).agg(collect_set(col("u")).as("nu"))
        .select(col("v"), array_min(col("nu")).as("m"), col("nu"))
        .select(col("m"),
          explode(concat(filter(col("nu"), x => x =!= col("m")), array(col("v")))).as("member"))
        .filter(col("m") =!= col("member"))
        .select(col("m").as("u"), col("member").as("v"))
        .distinct()
    }

    // decimal accumulator: a long sum of 64-bit hashes overflows (ANSI throws)
    def checksum(e: DataFrame): (Long, BigDecimal) = {
      val r = e.agg(count(lit(1)), sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) BigDecimal(0) else BigDecimal(r.getDecimal(1)))
    }

    var prev = checksum(edges)
    var round = 0
    var converged = prev._1 == 0L
    while (!converged && round < maxRounds) {
      edges = truncateLineage(smallStar(largeStar(edges)), checkpointDir)
      val cur = checksum(edges)
      converged = cur == prev
      prev = cur
      round += 1
    }
    require(converged,
      s"connectedComponents did not converge in maxRounds=$maxRounds rounds " +
        "(the star-forest extraction from a non-fixpoint edge set would label components " +
        "wrongly; raise maxRounds — the round count is O(log n))")
    // Fixpoint is a star forest: u = component minimum for every edge.
    edges.select(col("v").as("id"), col("u").as("component"))
      .union(edges.select(col("u").as("id"), col("u").as("component")).distinct())
  }

  /** Deterministic keep/drop verdict from near-dup pairs: keep exactly the
    * smallest id of each CONNECTED COMPONENT of the pair graph (true
    * transitive closure via [[connectedComponents]] — a doc that matches
    * only larger-id docs is still dropped when some chain links it to a
    * smaller one). */
  def dropVerdicts(pairs: DataFrame, checkpointDir: Option[String] = None): DataFrame =
    connectedComponents(pairs, checkpointDir = checkpointDir)
      .filter(col("component") =!= col("id"))
      .select(col("id").as("drop_id"))
      .distinct()
}
