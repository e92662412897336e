package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of `array<float>` vectors as a typed Aggregator — the
  * centroid-update step of distributed k-means. Partial aggregation keeps
  * one (sums, count) buffer per cell per task (map-side combine), so the
  * shuffle carries O(cells × dim) doubles instead of O(N) vectors — the
  * property that makes a centroid refinement pass affordable at corpus
  * scale. Accumulation is double-precision; vectors shorter than `dim` are
  * rejected loudly (a silent truncation would skew the centroid).
  */
class VectorMean(dim: Int) extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    // exact equality: >= would silently average only the first dim
    // components of a wider vector — the truncation the doc promises to reject
    require(v.length == dim, s"VectorMean: vector has ${v.length} dims, expected $dim")
    val s = b._1
    var i = 0
    while (i < dim) { s(i) += v(i).toDouble; i += 1 }
    (s, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val s = x._1
    var i = 0
    while (i < dim) { s(i) += y._1(i); i += 1 }
    (s, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Array[Double] = {
    if (b._2 == 0L) return new Array[Double](dim)
    val out = b._1
    var i = 0
    while (i < dim) { out(i) /= b._2; i += 1 }
    out
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(Encoders.javaSerialization[Array[Double]], Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
