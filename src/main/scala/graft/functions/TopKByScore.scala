package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded exact top-k by (score desc, id asc) as a typed Aggregator.
  *
  * The scale property: partial aggregation keeps every map-side buffer at
  * ≤ 2k entries, so a per-group top-k over N rows shuffles O(groups × k)
  * instead of O(N) — the difference between a kNN query that survives a
  * 100× corpus and one that windows the whole cross product. The
  * (score desc, id asc) order is total (ids unique), so the result is
  * deterministic regardless of partial-merge order.
  */
class TopKByScore(k: Int) extends Aggregator[(Double, Long), ArrayBuffer[(Double, Long)], Seq[(Double, Long)]] {
  require(k >= 1, s"TopKByScore: k must be >= 1, got $k (k=0 would silently return empty top-k)")

  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  private def shrink(b: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (b.length > 2 * k) {
      val kept = b.sorted(ord).take(k)
      b.clear()
      b ++= kept
    }
    b
  }

  override def zero: ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Double, Long)], a: (Double, Long)): ArrayBuffer[(Double, Long)] =
    shrink(b += a)

  override def merge(x: ArrayBuffer[(Double, Long)], y: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] =
    shrink(x ++= y)

  override def finish(b: ArrayBuffer[(Double, Long)]): Seq[(Double, Long)] =
    b.sorted(ord).take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Double, Long)]] =
    Encoders.kryo[ArrayBuffer[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
