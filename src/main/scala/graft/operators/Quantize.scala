package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns — the storage-scale path
  * for vector corpora: a 64-dim float vector (256 B) becomes 64 bytes of
  * codes + two doubles, a ~4× cut in the dominant column of a 100 TB
  * embedding table, at a bounded reconstruction error of scale/2 =
  * (max−min)/510 per element.
  *
  * Per-vector (asymmetric) quantization: code_i = round((x_i − min) /
  * scale), scale = (max − min)/255; reconstruction x'_i = min + code_i ·
  * scale. Per-vector ranges beat a global range on heterogeneous corpora
  * and need no training pass (vs product quantization — which would slot in
  * the same way but is not cross-engine replayable in closed form).
  *
  * All math is double-precision and element-order-free (min/max) or
  * per-element pure, so the DuckDB oracle rebuilds codes AND reconstructions
  * exactly; q65 measures the end effect — quantized kNN vs exact kNN — under
  * the hash gate. Codes are stored as array<long> holding 0..255 (Spark has
  * no unsigned byte array type; the STORAGE claim is about the format this
  * feeds, e.g. the fixedwidth sink or parquet byte arrays).
  */
object Quantize {

  /** Replace `vecCol` with its int8 encoding: `q8_min`, `q8_scale`,
    * `q8` (array<long> of 0..255 codes). Map-side only — no shuffle. A
    * constant vector (max == min) gets scale 0 and all-zero codes. */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    df.withColumn("_v", v)
      .withColumn("q8_min", array_min(col("_v")))
      .withColumn("q8_scale", (array_max(col("_v")) - col("q8_min")) / lit(255.0d))
      .withColumn("q8",
        when(col("q8_scale") === 0.0d, transform(col("_v"), _ => lit(0L)))
          .otherwise(transform(col("_v"),
            x => round((x - col("q8_min")) / col("q8_scale")).cast("long"))))
      .drop("_v", vecCol)
  }

  /** Reconstructed array<double> from an int8 encoding. */
  def dequantize(mn: Column, scale: Column, codes: Column): Column =
    transform(codes, c => mn + c.cast("double") * scale)
}
