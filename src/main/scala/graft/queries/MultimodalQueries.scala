package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import QueryRegistry.table

/** Multimodal-column queries over synthetic binary payloads attached to the
  * `documents` ids. The payload headers carry metadata derived from doc_id
  * by fixed arithmetic, so the DuckDB oracle can recompute every value from
  * doc_id alone — a hash match certifies the whole binary encode → header
  * parse round trip without DuckDB ever seeing the bytes.
  */
object MultimodalQueries {

  private def media(spark: SparkSession, dir: String): DataFrame =
    Multimodal.attachMedia(table(spark, dir, "documents").select(col("doc_id")), "doc_id")

  /** Expression-only header decode + per-format aggregate. */
  def meta(spark: SparkSession, dir: String): DataFrame = {
    val m = media(spark, dir)
    m.filter(Multimodal.magicOk(col("media")))
      .select(
        col("id"),
        Multimodal.fmtName(col("media")).as("fmt"),
        Multimodal.width(col("media")).as("w"),
        Multimodal.height(col("media")).as("h"),
        Multimodal.channels(col("media")).as("c"),
        Multimodal.nframes(col("media")).as("nf"),
        length(col("media")).cast("long").as("total_bytes"))
      .groupBy(col("fmt"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("w").cast("long") * col("h") * col("c") * col("nf")).as("payload_bytes"),
        sum(col("total_bytes")).as("total_bytes"),
        max(col("nf")).as("max_frames"))
      .orderBy(col("fmt"))
  }

  /** DuckDB recomputes the same metadata from doc_id arithmetic (see
    * Multimodal.widthOf etc.): header len 24, width 8+id%17, height 8+id%13,
    * channels 1+id%3, nframes video ? 1+id%5 : 1. */
  val metaOracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS fmt,
      |    (8 + doc_id % 17) AS w, (8 + doc_id % 13) AS h, (1 + doc_id % 3) AS c,
      |    CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 5 ELSE 1 END AS nf
      |  FROM documents
      |)
      |SELECT fmt, count(*) AS n_docs,
      |  cast(sum(w * h * c * nf) AS bigint) AS payload_bytes,
      |  cast(sum(24 + w * h * c * nf) AS bigint) AS total_bytes,
      |  cast(max(nf) AS int) AS max_frames
      |FROM m GROUP BY fmt ORDER BY fmt""".stripMargin

  /** Frame sampling (every 2nd frame) on video payloads — the count side is
    * oracle-checkable from arithmetic; the checksum side is covered by the
    * ScalaTest suite. */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val m = media(spark, dir)
    m.filter(Multimodal.fmtCode(col("media")) === 2)
      .select(
        col("id").as("doc_id"),
        Multimodal.nframes(col("media")).as("n_frames"),
        size(Multimodal.sampledFrameChecksums(col("media"), 2)).as("n_sampled"))
      .orderBy(col("doc_id"))
  }

  val frameSampleOracle: String =
    """SELECT doc_id, cast(1 + doc_id % 5 AS int) AS n_frames,
      |  cast((1 + doc_id % 5 + 1) // 2 AS int) AS n_sampled
      |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin

  /** Batched mapPartitions feature extraction over the stub decoder. The
    * payload bytes are java.util.Random output — a SPECIFIED 48-bit LCG —
    * so the DuckDB oracle regenerates the exact same bytes with a recursive
    * CTE in hugeint arithmetic and recomputes every feature: even the
    * codec-plumbing query is hash-checked cross-engine. The per-group mean
    * goes through the decimal-sum pattern (order-insensitive) on both
    * sides. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    val m = media(spark, dir)
    Multimodal.extractFeatures(m).toDF()
      .groupBy(col("n_frames"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(sum(col("mean_byte").cast("decimal(30,15)")).cast("double") / count(lit(1)), 4)
          .as("avg_mean_byte"),
        max(col("max_byte")).as("max_byte"),
        sum(col("frame_bytes")).as("total_frame_bytes"))
      .orderBy(col("n_frames"))
  }

  /** java.util.Random twin: seed scramble `(seed ^ 0x5DEECE66D) & (2^48-1)`,
    * step `seed' = (seed * 0x5DEECE66D + 0xB) mod 2^48`, int k = bits 16..47,
    * nextBytes takes the int's bytes low-to-high, last int truncated to the
    * frame remainder — all in hugeint (48-bit seeds never overflow it). */
  val featuresOracle: String =
    """WITH RECURSIVE ids AS (
      |  SELECT doc_id,
      |    (8 + doc_id % 17) * (8 + doc_id % 13) * (1 + doc_id % 3) AS fs,
      |    CASE WHEN doc_id % 3 = 2 THEN 1 + doc_id % 5 ELSE 1 END AS nf
      |  FROM documents
      |), frames AS (
      |  SELECT doc_id, fs, unnest(generate_series(0, nf - 1)) AS f FROM ids
      |), rec(doc_id, f, fs, k, seed) AS (
      |  SELECT doc_id, f, fs, 0,
      |    ((xor((doc_id * 1000003 + f)::HUGEINT, 25214903917::HUGEINT) % 281474976710656::HUGEINT)
      |      * 25214903917::HUGEINT + 11) % 281474976710656::HUGEINT
      |  FROM frames
      |  UNION ALL
      |  SELECT doc_id, f, fs, k + 1,
      |    (seed * 25214903917::HUGEINT + 11) % 281474976710656::HUGEINT
      |  FROM rec WHERE (k + 1) * 4 < fs
      |), bytes AS (
      |  SELECT r.doc_id, ((r.seed // 65536) // (1::HUGEINT << (8 * j.j))) % 256 AS b
      |  FROM rec r CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
      |  WHERE r.k * 4 + j.j < r.fs
      |), perdoc AS (
      |  SELECT i.doc_id, i.nf,
      |    i.nf::BIGINT * i.fs AS frame_bytes,
      |    cast(sum(b.b) AS DOUBLE) / (i.nf * i.fs) AS mean_byte,
      |    cast(max(b.b) AS INT) AS max_byte
      |  FROM bytes b JOIN ids i USING (doc_id)
      |  GROUP BY i.doc_id, i.nf, i.fs
      |)
      |SELECT cast(nf AS INT) AS n_frames, count(*) AS n_docs,
      |  round(cast(sum(cast(mean_byte AS DECIMAL(30,15))) AS DOUBLE) / count(*), 4) AS avg_mean_byte,
      |  max(max_byte) AS max_byte,
      |  cast(sum(frame_bytes) AS BIGINT) AS total_frame_bytes
      |FROM perdoc GROUP BY nf ORDER BY n_frames""".stripMargin

  // ---------------------------------------------------------------- q200
  /** Cross-video duplicate-FRAME detection — the multimodal member of the
    * dedup family: every frame of every video payload is checksummed by a
    * pure expression (no codec, no byte ever leaves the scan stage except
    * as an 8-byte hash), identical frames meet in a content-keyed
    * equi-join, and pairs aggregate shared-frame counts. Fan-out per hash
    * bucket is bounded by the duplicate-class size — the LSH-band
    * argument, here with EXACT content keys. The payloads plant the
    * ground truth by construction ([[Multimodal.synthKeyedPayload]]:
    * frame content keyed by doc_id % 40, frame count by doc_id), so the
    * oracle derives every expected pair and its shared count
    * min(nf_a, nf_b) from id arithmetic alone — a hash match certifies
    * real binary frame extraction + hashing end-to-end.
    *
    * Output is ALL duplicate pairs, so it grows quadratically in the
    * duplicate-class size (sf1 rehearsal: 3.46 M pairs in 4.1 s warm —
    * linear time per output row). At corpus scale the production form
    * collapses classes to connected components / canonical
    * representatives instead of enumerating pairs — exactly
    * [[graft.operators.Dedup.connectedComponents]]'s q55 argument. */
  def multimodalNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vids = table(spark, dir, "documents")
      .filter($"doc_id" % 3 === 2).select($"doc_id")
    val m = Multimodal.attachKeyedMedia(vids, "doc_id", classes = 40)
    val fh = m.select($"id",
      explode(Multimodal.sampledFrameChecksums($"media", 1)).as("h"))
    fh.as("x").join(fh.as("y"), $"x.h" === $"y.h" && $"x.id" < $"y.id")
      .groupBy($"x.id".as("doc_a"), $"y.id".as("doc_b"))
      .agg(countDistinct($"x.h").as("n_shared"))
      .orderBy($"doc_a", $"doc_b")
  }

  val multimodalNearDupOracle: String =
    """WITH v AS (
      |  SELECT doc_id, doc_id % 40 AS k, 1 + doc_id % 5 AS nf
      |  FROM documents WHERE doc_id % 3 = 2
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  cast(least(a.nf, b.nf) AS BIGINT) AS n_shared
      |FROM v a JOIN v b ON a.k = b.k AND a.doc_id < b.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q80_multimodal_meta", meta, Some(metaOracle)),
    Q("q81_multimodal_features", features, Some(featuresOracle)),
    Q("q82_frame_sample", frameSample, Some(frameSampleOracle)),
    Q("q200_multimodal_neardup", multimodalNearDup, Some(multimodalNearDupOracle)))
}
