package graft.operators

import scala.collection.mutable

/** Byte-pair-encoding merge training over a word-frequency dictionary.
  *
  * The classic BPE trainer (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") never touches the corpus
  * after one pass: it operates on the word-frequency DICT — `(word, count)`
  * — which is Zipf-bounded vocabulary, not corpus. That is exactly the
  * split this operator keeps at 100 TB: Spark does the corpus-sized work
  * (one token explode + word groupBy = one shuffle, the same plan as the
  * q46 vocabulary build), the dict is capped to the top `maxWords` by
  * frequency (a bounded driver pull BY CONSTRUCTION, like the IVF
  * centroid and Bloom word pulls), and the merge loop itself is a pure
  * driver-side function over ≤ maxWords rows. Nothing here re-reads data.
  *
  * Semantics pinned for cross-engine verification (the q162 oracle
  * replays every round in DuckDB SQL):
  *   - initial segmentation is per CODEPOINT (`substr(word, i, 1)`
  *     semantics in both engines; UTF-16 surrogate pairs stay whole);
  *   - pair counting weights each ADJACENT POSITION by the word count —
  *     overlaps included, so "aaa"×10 contributes 20 to (a,a) — matching
  *     the reference `get_stats` convention;
  *   - argmax tie-break is total: (count DESC, left ASC, right ASC);
  *   - merge application is greedy LEFT-TO-RIGHT: "aaaa" + (a,a) →
  *     [aa, aa], never [a, aa, a];
  *   - training stops early when no adjacent pair remains.
  */
object BpeTrain {

  /** One learned merge: `left`+`right` fused at `rank`, with the weighted
    * adjacent-pair support it had when chosen. */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Split a word into codepoint pieces (surrogate-pair safe). */
  def toPieces(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out.result()
  }

  /** Greedy left-to-right application of a single merge (a, b). */
  def applyMerge(pieces: Vector[String], a: String, b: String): Vector[String] = {
    if (pieces.length < 2) return pieces
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < pieces.length) {
      if (i + 1 < pieces.length && pieces(i) == a && pieces(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += pieces(i)
        i += 1
      }
    }
    out.result()
  }

  /** Binary UTF-8 byte order — DuckDB's string comparison and Spark's
    * UTF8String order. The JVM's String ordering is UTF-16 code-unit order,
    * which ranks a supplementary-plane string BELOW one in [U+E000, U+FFFF]
    * (surrogates start at 0xD800) while UTF-8 bytes rank it above — so a
    * count-tied argmax broken with JVM order could pick a different merge
    * than the DuckDB oracle replay and diverge every round after. */
  private[graft] object Utf8Order extends Ordering[String] {
    def compare(x: String, y: String): Int = {
      val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
  }

  private[graft] val ArgmaxOrder: Ordering[(Long, String, String)] =
    Ordering.Tuple3(Ordering.Long, Utf8Order, Utf8Order)

  /** Train up to `maxMerges` merges over the (word, count) dict. */
  def train(dict: Seq[(String, Long)], maxMerges: Int): Vector[Merge] = {
    require(maxMerges >= 0, s"maxMerges must be >= 0, got $maxMerges")
    var segs: Vector[(Vector[String], Long)] =
      dict.iterator.map { case (w, c) => (toPieces(w), c) }.toVector
    val out = Vector.newBuilder[Merge]
    var rank = 1
    var done = false
    while (rank <= maxMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      segs.foreach { case (ps, c) =>
        var i = 0
        while (i < ps.length - 1) {
          val k = (ps(i), ps(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.minBy { case ((l, r), c) => (-c, l, r) }(ArgmaxOrder)
        out += Merge(rank, a, b, n)
        segs = segs.map { case (ps, c) => (applyMerge(ps, a, b), c) }
        rank += 1
      }
    }
    out.result()
  }

  /** Encode one word under an ordered merge list: each merge applied
    * greedily in rank order, exactly as during training. */
  def encode(word: String, merges: Seq[(String, String)]): Vector[String] = {
    var ps = toPieces(word)
    merges.foreach { case (a, b) => ps = applyMerge(ps, a, b) }
    ps
  }
}
