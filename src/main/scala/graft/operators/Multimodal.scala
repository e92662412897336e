package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` payloads with
  * typed metadata, the 100 TB pattern being:
  *
  *   - payloads travel as `BinaryType` columns (never exploded to arrays in
  *     the shuffle path);
  *   - header/metadata extraction is pure codegen'd expressions
  *     (substring + hex + conv), so pruning/filtering on media properties
  *     never touches a codec;
  *   - actual DECODE (pixels/samples) happens per-partition in batches via
  *     `mapPartitions` — the JVM analog of a vectorized UDF: one codec
  *     context per partition, streaming through rows, no per-row setup. The
  *     codec itself is STUBBED here (this container has no image/audio
  *     libraries): `stubDecodeFrame` is a deterministic fake standing in for
  *     e.g. a JPEG decoder, while everything around it (schema, batching,
  *     reuse, partitioning) is the real production shape.
  *
  * Synthetic payload format "GM01" (all integers big-endian int32):
  *   magic "GM01" | fmtCode int32 (0=image,1=audio,2=video) |
  *   width int32 | height int32 | channels int32 | nframes int32 |
  *   nframes frames of width*height*channels pseudo-random bytes
  *   (java.util.Random seeded from (id, frameIdx) — algorithm is specified
  *   by the JDK, so bytes are deterministic everywhere).
  */
object Multimodal {

  val Magic = "GM01"
  val HeaderLen: Int = 4 + 5 * 4 // magic + 5 int32 fields

  /** Ground-truth metadata derived from the row id — the same arithmetic the
    * DuckDB oracle recomputes to certify the binary round trip. */
  def fmtCodeOf(id: Long): Int = (id % 3).toInt
  def widthOf(id: Long): Int = 8 + (id % 17).toInt
  def heightOf(id: Long): Int = 8 + (id % 13).toInt
  def channelsOf(id: Long): Int = 1 + (id % 3).toInt
  def nframesOf(id: Long): Int = if (fmtCodeOf(id) == 2) 1 + (id % 5).toInt else 1

  final case class Media(id: Long, media: Array[Byte])

  /** Deterministically synthesize a payload for an id (driver/executor-safe). */
  def synthPayload(id: Long): Array[Byte] = {
    val (w, h, c, nf) = (widthOf(id), heightOf(id), channelsOf(id), nframesOf(id))
    val frameSize = w * h * c
    val out = java.nio.ByteBuffer.allocate(HeaderLen + nf * frameSize)
    out.put(Magic.getBytes("US-ASCII"))
    out.putInt(fmtCodeOf(id)); out.putInt(w); out.putInt(h); out.putInt(c); out.putInt(nf)
    var f = 0
    while (f < nf) {
      val rng = new java.util.Random(id * 1000003L + f)
      val frame = new Array[Byte](frameSize)
      rng.nextBytes(frame)
      out.put(frame)
      f += 1
    }
    out.array()
  }

  /** Attach a synthetic payload column to an id frame — mapPartitions so
    * generation is one streaming pass per partition, no shuffle. */
  def attachMedia(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map(id => Media(id, synthPayload(id))))
      .toDF("id", "media")
  }

  /** Video payload whose FRAME CONTENT is keyed by `id % classes` instead of
    * the id itself: geometry (w, h, c) and frame seeds derive from the class
    * key, frame COUNT still from the id — so two videos in one class share
    * their overlapping frame indices byte-for-byte while differing in
    * length. This is the planted ground truth for cross-video duplicate
    * detection: which pairs share frames is pure id arithmetic the oracle
    * recomputes without ever seeing a byte. */
  def synthKeyedPayload(id: Long, classes: Int): Array[Byte] = {
    val key = id % classes
    val (w, h, c) = (8 + (key % 17).toInt, 8 + (key % 13).toInt, 1 + (key % 3).toInt)
    val nf = 1 + (id % 5).toInt
    val frameSize = w * h * c
    val out = java.nio.ByteBuffer.allocate(HeaderLen + nf * frameSize)
    out.put(Magic.getBytes("US-ASCII"))
    out.putInt(2); out.putInt(w); out.putInt(h); out.putInt(c); out.putInt(nf)
    var f = 0
    while (f < nf) {
      val rng = new java.util.Random(key * 1000003L + f)
      val frame = new Array[Byte](frameSize)
      rng.nextBytes(frame)
      out.put(frame)
      f += 1
    }
    out.array()
  }

  /** [[attachMedia]] twin over [[synthKeyedPayload]]. */
  def attachKeyedMedia(ids: DataFrame, idCol: String, classes: Int): DataFrame = {
    val spark = ids.sparkSession
    import spark.implicits._
    ids.select(col(idCol).cast("long").as("id")).as[Long]
      .mapPartitions(_.map(id => Media(id, synthKeyedPayload(id, classes))))
      .toDF("id", "media")
  }

  // ---- expression-level header access (no codec, codegen'd) ----

  /** Big-endian int32 at 1-based byte position `pos` of a binary column. */
  def beInt(bin: Column, pos: Int): Column =
    conv(hex(substring(bin, pos, 4)), 16, 10).cast("int")

  def magicOk(media: Column): Column = substring(media, 1, 4).cast("string") === Magic
  def fmtCode(media: Column): Column = beInt(media, 5)
  def width(media: Column): Column = beInt(media, 9)
  def height(media: Column): Column = beInt(media, 13)
  def channels(media: Column): Column = beInt(media, 17)
  def nframes(media: Column): Column = beInt(media, 21)
  def frameSize(media: Column): Column = width(media) * height(media) * channels(media)
  def fmtName(media: Column): Column =
    when(fmtCode(media) === 0, "image")
      .when(fmtCode(media) === 1, "audio")
      .otherwise("video")

  /** The k-th (0-based) frame payload, as a binary slice — pure expression. */
  def frame(media: Column, k: Int): Column =
    substring(media, lit(HeaderLen + 1) + lit(k) * frameSize(media), frameSize(media))

  /** Checksums of every `every`-th frame (frame sampling without decoding):
    * array of xxhash64 over the sampled frame slices. */
  def sampledFrameChecksums(media: Column, every: Int): Column =
    transform(
      sequence(lit(0), floor((nframes(media) - 1) / lit(every)).cast("int")),
      i => xxhash64(substring(
        media, lit(HeaderLen + 1) + i * lit(every) * frameSize(media), frameSize(media))))

  /** Header-only "resize" stub: rewrite (width, height) and truncate/keep the
    * payload — the real implementation would re-encode pixels; the plumbing
    * (binary surgery via expressions, no codec in the plan) is the point. */
  def resizeHeader(media: Column, newW: Int, newH: Int): Column = {
    def be(i: Column): Column = unhex(lpad(hex(i.cast("long")), 8, "0"))
    concat(
      substring(media, 1, 8), // magic + fmtCode
      be(lit(newW)), be(lit(newH)),
      substring(media, lit(17), greatest(length(media) - 16, lit(0))))
  }

  final case class MediaFeatures(
      id: Long, n_frames: Int, frame_bytes: Long, mean_byte: Double, max_byte: Int)

  /** Per-partition batched feature extraction — the production shape for
    * codec work: one context per partition, streaming rows, zero per-row
    * allocation beyond the feature object.
    *
    * STUB: `stubDecodeFrame` stands in for a real decoder (e.g. JPEG →
    * pixel array). It just exposes the raw frame bytes, which is enough to
    * make the feature math (and its tests) fully deterministic.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id").cast("long"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec context" would be initialized HERE (once)
        it.map { case (id, bytes) =>
          val bb = java.nio.ByteBuffer.wrap(bytes)
          bb.position(4)
          val _fmt = bb.getInt(); val w = bb.getInt(); val h = bb.getInt()
          val c = bb.getInt(); val nf = bb.getInt()
          val frameSize = w * h * c
          var sum = 0L; var max = 0; var i = HeaderLen
          while (i < bytes.length) {
            val decoded = stubDecodeFrame(bytes, i, frameSize)
            var j = 0
            while (j < frameSize) {
              val v = decoded(j) & 0xff
              sum += v; if (v > max) max = v
              j += 1
            }
            i += frameSize
          }
          val n = nf.toLong * frameSize
          MediaFeatures(id, nf, n, if (n == 0) 0.0 else sum.toDouble / n, max)
        }
      }
  }

  /** STUB decoder: a real build would call the codec library here (JPEG →
    * pixels, PCM decode, ...) and return frame-sized sample data; the
    * deterministic fake returns the encoded frame bytes unchanged so every
    * downstream number is reproducible in tests. */
  private def stubDecodeFrame(encoded: Array[Byte], offset: Int, frameSize: Int): Array[Byte] =
    java.util.Arrays.copyOfRange(encoded, offset, offset + frameSize)
}
