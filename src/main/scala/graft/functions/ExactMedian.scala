package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Exact median as a typed `Aggregator` — the custom-UDAF surface of
  * SURVEY.md §2.10 (the reference has none; MapReduce users wrote reducers).
  * Even-count groups interpolate the two middle values, matching DuckDB's
  * `median()` bit-for-bit on doubles.
  *
  * Scale note: the buffer holds the group's values, so this is for
  * moderate-cardinality groups (it exists to exercise the typed Aggregator
  * machinery: partial aggregation buffers, encoder-backed shuffle, merge).
  * At 100 TB per-group cardinality, switch to `percentile_approx`
  * (t-digest, bounded state) and accept the approximation.
  */
object ExactMedian extends Aggregator[Double, ArrayBuffer[Double], Double] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = { b += a; b }

  override def merge(x: ArrayBuffer[Double], y: ArrayBuffer[Double]): ArrayBuffer[Double] = { x ++= y; x }

  override def finish(b: ArrayBuffer[Double]): Double = {
    if (b.isEmpty) return Double.NaN
    val arr = b.toArray
    java.util.Arrays.sort(arr)
    val n = arr.length
    if (n % 2 == 1) arr(n / 2)
    else (arr(n / 2 - 1) + arr(n / 2)) / 2.0
  }

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] = Encoders.kryo[ArrayBuffer[Double]]

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
