package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subword vocabulary induction by hard-EM Viterbi segmentation under an
  * MDL-style objective — the deterministic, integer-exact cousin of
  * unigram-LM (SentencePiece) training: seed a candidate vocabulary with
  * every corpus substring up to `maxLen` chars, then alternate
  * (E) segment every distinct word by the best segmentation under the
  * current piece counts and (M) re-count pieces from the chosen
  * segmentations, pruning pieces that fall out of use.
  *
  * The Viterbi objective is lexicographic: FEWEST pieces, then the
  * largest exact integer product Π count(pieceᵢ), then the
  * lexicographically smallest piece sequence. Fewest-pieces is the MDL
  * compression term; the count product is the likelihood tie-break. The
  * true unigram-LM objective Σ log(count/total) needs transcendentals
  * whose last ulp differs across engines (the repo's log-free-scores
  * convention exists precisely for this), and its exact rational twin
  * overflows 128-bit integers at cross-multiplication — the lexicographic
  * form keeps every comparison integer-exact at ANY corpus size (BigInt
  * here, HUGEINT in the oracle at the verify scale), which is what lets
  * the DuckDB oracle replay the full EM trajectory bit-for-bit.
  *
  * Single characters are never pruned and score at least 1 (a Laplace
  * floor): segmentation stays total, scores stay strictly positive, and
  * positivity is what makes the DP's composite order suffix-monotone
  * (see [[viterbi]]).
  *
  * Scale shape (the [[BpeTrain]] argument): the corpus contributes ONE
  * word-count shuffle; every EM quantity lives on the DISTINCT-word table
  * (Zipf-bounded), the per-round score table is the candidate vocabulary
  * (seed-pruned to corpus support ≥ `minSeedCount`, collected and
  * broadcast exactly like q163's merge list), and the per-word Viterbi is
  * O(len · maxLen) — never an enumeration.
  */
object SegmentEm {

  /** Piece-path separator: BELOW every real character, so that if joined
    * path A < joined path B then A+sep+x < B+anything — string-prefix
    * comparisons cannot flip under suffix append, making the lex
    * tie-break safe inside the DP (a '|'-style separator above 'z' would
    * NOT be: a proper-prefix path flips order when extended). */
  val Sep = "\u0001"

  private final case class Cand(ntok: Int, prod: BigInt, path: String)

  /** a strictly better than b under (ntok asc, prod desc, path asc). */
  private def better(a: Cand, b: Cand): Boolean =
    a.ntok < b.ntok || (a.ntok == b.ntok &&
      (a.prod > b.prod || (a.prod == b.prod && a.path < b.path)))

  /** Best segmentation of `word`: multi-char pieces must be in `scores`
    * with a positive count; single characters always segment with score
    * max(count, 1). The DP keeps one best prefix per position, which is
    * sound because a common suffix adds the same piece count (ntok order
    * kept), multiplies by the same scores ≥ 1 (strict product order
    * kept), and appends under the low-byte [[Sep]] (string-prefix order
    * kept). */
  def viterbi(word: String, scores: Map[String, Long], maxLen: Int): List[String] = {
    if (word.isEmpty) return Nil
    val n = word.length
    val best = new Array[Cand](n + 1)
    best(0) = Cand(0, BigInt(1), "")
    var i = 1
    while (i <= n) {
      var b: Cand = null
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (best(i - l) != null) {
          val p = word.substring(i - l, i)
          val s: Long =
            if (l == 1) math.max(scores.getOrElse(p, 0L), 1L)
            else scores.getOrElse(p, 0L)
          if (s > 0) {
            val prev = best(i - l)
            val cand = Cand(prev.ntok + 1, prev.prod * s, prev.path + Sep + p)
            if (b == null || better(cand, b)) b = cand
          }
        }
        l += 1
      }
      best(i) = b
      i += 1
    }
    best(n).path.split(Sep).toList.filter(_.nonEmpty)
  }

  /** Weighted substring counts of the distinct-word table `wf`
    * (word, wc): every substring of length 1..maxLen, each occurrence
    * weighted by the word's corpus count. */
  def substringCounts(wf: DataFrame, maxLen: Int): DataFrame = {
    val perLen = (1 to maxLen).map { l =>
      wf.filter(length(col("word")) >= l)
        .select(explode(expr(
          s"transform(sequence(1, length(word) - $l + 1), i -> substring(word, i, $l))"))
          .as("p"), col("wc"))
    }
    perLen.reduce(_ unionByName _)
      .groupBy(col("p")).agg(sum(col("wc")).cast("long").as("c"))
  }

  /** One E+M round over the dict: Viterbi-segment every distinct word
    * under `scores` (broadcast), re-count pieces weighted by word counts.
    * Returns (p, c) — pieces actually used this round. */
  def emRound(wf: DataFrame, scores: Map[String, Long], maxLen: Int): DataFrame =
    roundCounts(wf, wf.sparkSession.sparkContext.broadcast(scores), maxLen)

  private def roundCounts(
      wf: DataFrame,
      bc: org.apache.spark.broadcast.Broadcast[Map[String, Long]],
      maxLen: Int): DataFrame = {
    val segment = udf((w: String) => viterbi(w, bc.value, maxLen))
    wf.select(explode(segment(col("word"))).as("p"), col("wc"))
      .groupBy(col("p")).agg(sum(col("wc")).cast("long").as("c"))
  }

  /** Train `rounds` hard-EM rounds and return the final piece counts as
    * (rank, piece, cnt) — top `topK` by (cnt desc, piece asc). Seed
    * vocabulary: all substrings ≤ maxLen with corpus support ≥
    * `minSeedCount` (multi-char; the alphabet always stays). */
  def train(
      docs: DataFrame, textCol: String,
      maxLen: Int = 4, rounds: Int = 2, minSeedCount: Long = 2, topK: Int = 40): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val wf = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

    // seed scores: candidate-vocab-sized pull (the q163 merges argument) —
    // multi-char pieces pruned to corpus support >= minSeedCount
    val seed = substringCounts(wf, maxLen)
      .filter(length(col("p")) === 1 || col("c") >= minSeedCount)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val spark = docs.sparkSession
    var scores = seed
    var lastRound: Array[(String, Long)] = Array.empty
    for (_ <- 1 to rounds) {
      val bc = spark.sparkContext.broadcast(scores)
      // one vocab-bounded collect per round — next round's scores AND (on
      // the last round) the output rows; re-evaluating the lazy counts
      // frame for the ranked output would re-run the whole E+M round
      lastRound = roundCounts(wf, bc, maxLen).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      bc.destroy() // each round's dict is dead once its counts are in hand
      // next round's scores: used pieces at their new counts; unused
      // multi-char pieces drop out, single chars floor to 1 in viterbi
      scores = lastRound.toMap
    }
    // ranked output straight from the already-collected final round
    // (vocab-bounded driver sort — no second cluster pass). Ties break on
    // UTF-8 BYTES, not Java String order: the cross-engine convention is
    // UTF8String/DuckDB binary collation, and UTF-16 code-unit order
    // diverges from it for supplementary code points vs U+E000–U+FFFF.
    val ranked = lastRound
      .sortWith { case ((p1, c1), (p2, c2)) =>
        c1 > c2 || (c1 == c2 && utf8Less(p1, p2)) }
      .take(topK)
      .zipWithIndex.map { case ((p, c), i) => (i + 1, p, c) }
    import spark.implicits._
    ranked.toSeq.toDF("rank", "piece", "cnt").orderBy(col("rank"))
  }

  /** Unsigned-byte UTF-8 lexicographic order (= code-point order = Spark
    * UTF8String / DuckDB VARCHAR binary collation) — the driver-side twin
    * of the engines' string comparison, for tie-breaks that must rank the
    * same way a cluster-side Window.orderBy would. */
  private[operators] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}
