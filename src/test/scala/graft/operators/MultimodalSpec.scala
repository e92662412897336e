package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class MultimodalSpec extends SparkSpec with Matchers {

  private lazy val media = {
    import spark.implicits._
    Multimodal.attachMedia((0L until 60L).toDF("id"), "id")
  }

  test("expression header decode matches the id-derived ground truth") {
    val rows = media.select(
      col("id"),
      Multimodal.magicOk(col("media")),
      Multimodal.fmtCode(col("media")),
      Multimodal.width(col("media")),
      Multimodal.height(col("media")),
      Multimodal.channels(col("media")),
      Multimodal.nframes(col("media")),
      org.apache.spark.sql.functions.length(col("media"))).collect()
    rows.length shouldBe 60
    rows.foreach { r =>
      val id = r.getLong(0)
      r.getBoolean(1) shouldBe true
      r.getInt(2) shouldBe Multimodal.fmtCodeOf(id)
      r.getInt(3) shouldBe Multimodal.widthOf(id)
      r.getInt(4) shouldBe Multimodal.heightOf(id)
      r.getInt(5) shouldBe Multimodal.channelsOf(id)
      r.getInt(6) shouldBe Multimodal.nframesOf(id)
      r.getInt(7) shouldBe Multimodal.HeaderLen +
        Multimodal.nframesOf(id) * Multimodal.widthOf(id) * Multimodal.heightOf(id) * Multimodal.channelsOf(id)
    }
  }

  test("frame slicing: expression frame k equals the synthesized frame bytes") {
    val r = media.filter(col("id") === 14L) // video, nframes = 1 + 14%5 = 5
      .select(Multimodal.frame(col("media"), 2)).head
    val expectFrameSize = Multimodal.widthOf(14) * Multimodal.heightOf(14) * Multimodal.channelsOf(14)
    val full = Multimodal.synthPayload(14L)
    val want = java.util.Arrays.copyOfRange(full,
      Multimodal.HeaderLen + 2 * expectFrameSize, Multimodal.HeaderLen + 3 * expectFrameSize)
    r.getAs[Array[Byte]](0) shouldBe want
  }

  test("sampled frame checksums: every-2nd sampling has ceil(nf/2) entries, deterministic") {
    val rows = media.filter(Multimodal.fmtCode(col("media")) === 2)
      .select(col("id"), Multimodal.sampledFrameChecksums(col("media"), 2)).collect()
    rows should not be empty
    rows.foreach { r =>
      val nf = Multimodal.nframesOf(r.getLong(0))
      r.getSeq[Long](1).length shouldBe (nf + 1) / 2
    }
    // deterministic across evaluations
    val again = media.filter(Multimodal.fmtCode(col("media")) === 2)
      .select(col("id"), Multimodal.sampledFrameChecksums(col("media"), 2)).collect()
    rows.map(_.getSeq[Long](1)) should contain theSameElementsInOrderAs again.map(_.getSeq[Long](1))
  }

  test("resizeHeader rewrites dims and keeps magic/fmt/payload prefix") {
    val out = media.filter(col("id") === 3L)
      .select(Multimodal.resizeHeader(col("media"), 4, 4).as("m"))
    out.select(
      Multimodal.magicOk(col("m")),
      Multimodal.fmtCode(col("m")),
      Multimodal.width(col("m")),
      Multimodal.height(col("m")),
      Multimodal.channels(col("m"))).head.toSeq shouldBe
      Seq(true, Multimodal.fmtCodeOf(3), 4, 4, Multimodal.channelsOf(3))
  }

  test("mapPartitions feature extraction: exact against a driver-side recompute") {
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.id -> f).toMap
    (0L until 60L).foreach { id =>
      val bytes = Multimodal.synthPayload(id)
      val payload = bytes.drop(Multimodal.HeaderLen).map(_ & 0xff)
      val f = feats(id)
      f.n_frames shouldBe Multimodal.nframesOf(id)
      f.frame_bytes shouldBe payload.length.toLong
      f.max_byte shouldBe payload.max
      f.mean_byte shouldBe (payload.map(_.toLong).sum.toDouble / payload.length) +- 1e-12
    }
  }
}
