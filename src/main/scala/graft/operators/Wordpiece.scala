package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece-style greedy maximal-munch subword tokenization (the INFERENCE
  * algorithm of BERT-family tokenizers: longest vocabulary piece first,
  * left to right) with a frequency-derived multi-character vocabulary —
  * the third tokenizer surface next to [[BpeTrain]] (merge-rule training +
  * encode) and the regex BPE-ish token count: same corpus, different
  * published segmentation algorithm, so the two families can be compared
  * under the fertility audit (q183 vs q186).
  *
  * Vocabulary: every single character is implicitly in-vocab (the fallback
  * that makes greedy segmentation total), plus the top-`k` character
  * n-grams of lengths `minLen..maxLen` ranked by corpus occurrence count
  * (each occurrence weighted by the word's corpus frequency), ties broken
  * lexicographically — a total order, so the top-k cut is deterministic
  * and the DuckDB oracle reproduces it exactly.
  *
  * Scale shape (the [[BpeTrain]] argument): the ONLY corpus-sized pass is
  * the word-count aggregation; gram ranking runs over the vocabulary-sized
  * distinct-word table, the top-k pull is bounded by construction (k
  * rows), and the greedy encode runs once per DISTINCT word (Zipf-bounded)
  * with the k-entry vocab broadcast — never once per corpus token.
  */
object Wordpiece {

  /** Greedy maximal-munch segmentation of `word` under `multiGrams` (the
    * multi-character vocabulary; single characters are always in-vocab).
    * Pure and shared by the lane and its spec. maxLen bounds the munch. */
  def encode(word: String, multiGrams: Set[String], maxLen: Int): List[String] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      var len = math.min(maxLen, word.length - pos)
      while (len > 1 && !multiGrams.contains(word.substring(pos, pos + len))) len -= 1
      out += word.substring(pos, pos + len)
      pos += len
    }
    out.result()
  }

  /** The top-`k` multi-character grams (lengths minLen..maxLen) of the
    * distinct-word table `wf` (columns word, wc), ranked by occurrence
    * count weighted by word frequency, ties lexicographic. */
  def topGrams(wf: DataFrame, minLen: Int, maxLen: Int, k: Int): DataFrame = {
    val perLen = (minLen to maxLen).map { l =>
      wf.filter(length(col("word")) >= l)
        .select(explode(expr(
          s"transform(sequence(1, length(word) - $l + 1), i -> substring(word, i, $l))"))
          .as("g"), col("wc"))
    }
    perLen.reduce(_ unionByName _)
      .groupBy(col("g")).agg(sum(col("wc")).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("g"))
      .limit(k)
  }

  /** (word, n_pieces) for every distinct word in `wf`, under the greedy
    * maximal-munch vocabulary derived by [[topGrams]]. The k-row vocab is
    * a bounded driver pull (k = vocabSize) broadcast to the encode. */
  def pieceCounts(wf: DataFrame, minLen: Int, maxLen: Int, vocabSize: Int): DataFrame = {
    val spark = wf.sparkSession
    val vocab = topGrams(wf, minLen, maxLen, vocabSize)
      .collect().map(_.getString(0)).toSet // bounded: ≤ vocabSize rows
    val bc = spark.sparkContext.broadcast(vocab)
    val nPieces = udf((w: String) => encode(w, bc.value, maxLen).size)
    wf.select(col("word"), nPieces(col("word")).as("ntok"))
  }

  /** Per-`groupCol` fertility audit: word occurrences, subword tokens under
    * greedy maximal-munch, and tokens-per-word (an exact integer-count
    * ratio — bit-identical cross-engine). `docs` needs (groupCol, textCol).
    */
  def fertilityByGroup(
      docs: DataFrame, groupCol: String, textCol: String,
      minLen: Int = 2, maxLen: Int = 4, vocabSize: Int = 24): DataFrame = {
    val words = docs.select(col(groupCol),
      explode(split(trim(col(textCol)), "\\s+")).as("word"))
    val srcWords = words.groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("c"))
    val wf = srcWords.groupBy(col("word")).agg(sum(col("c")).as("wc"))
    val pieces = pieceCounts(wf, minLen, maxLen, vocabSize)
    def dl(c: Column) = sum(c).cast("long")
    srcWords.join(broadcast(pieces), Seq("word")) // pieces is vocab-sized
      .groupBy(col(groupCol))
      .agg(dl(col("c")).as("n_words"),
        dl(col("c") * col("ntok")).as("n_subtokens"))
      .select(col(groupCol), col("n_words"), col("n_subtokens"),
        round(col("n_subtokens").cast("double") / col("n_words").cast("double"), 6)
          .as("fertility"))
  }
}
