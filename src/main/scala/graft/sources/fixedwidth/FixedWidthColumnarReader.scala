package graft.sources.fixedwidth

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Vectorized fixedwidth reader: decodes records in batches of `capacity`
  * straight into reused `OnHeapColumnVector`s, emitted as `ColumnarBatch`es
  * that Spark's ColumnarToRow/whole-stage codegen consume with tight loops —
  * the Spark-native analog of parquet's vectorized reader, far beyond the
  * reference's one-row-at-a-time `RecordReader` (SURVEY.md §4: "columnar
  * reader = later optimization").
  *
  * Pushed filters keep the row path's skip-decode property WITHOUT leaving
  * the columnar lane: predicate-referenced fields decode into a scratch row
  * first; only surviving records decode their remaining columns into the
  * vectors. Non-matching records cost exactly the predicate fields' decode,
  * matching records re-decode those few fields into vectors (cheap ASCII
  * parses) — and the scan stays inside whole-stage codegen's columnar loop.
  */
class FixedWidthColumnarReader(
    part: FixedWidthInputPartition,
    opts: FixedWidthOptions,
    requiredSchema: StructType,
    conf: Configuration,
    pushedFilters: Array[org.apache.spark.sql.sources.Filter] = Array.empty)
    extends PartitionReader[ColumnarBatch] {

  private val capacity = 4096
  private val recLen = opts.recordLength
  private val stream = new ChunkedRecordStream(part, opts, conf)
  private val buf = new Array[Byte](recLen)

  // Pushed predicates evaluate straight off the record buffer (independent
  // of the pruned output schema — see FixedWidthFilters.compileOnBuffer).
  private val predicates: Array[() => Boolean] =
    pushedFilters.map(f => FixedWidthFilters.compileTolerant(f, opts, buf, () => recOffset).getOrElse(
      // fail LOUDLY: this filter was accepted as fully pushed, so nothing
      // downstream re-evaluates it — dropping it would silently unfilter
      throw new IllegalStateException(s"fixedwidth: accepted pushed filter failed to compile: $f")))
  private var skipped = 0L
  private var malformed = 0L

  // Malformed-record policy — same probe sets as the row reader (see
  // FixedWidthPartitionReader). DROPMALFORMED probes ALL declared fields
  // BEFORE any vector write: a half-written slot can't be reused because
  // WritableColumnVector.putNull is sticky (overwrites don't clear the null
  // bit), so dropped records must never touch the vectors.
  private val corruptIdx: Int = opts.corruptRecordCol
    .map(c => requiredSchema.fieldNames.indexWhere(_.equalsIgnoreCase(c))).getOrElse(-1)
  private val probes: Array[() => Unit] =
    if (opts.dropMalformed) FixedWidthMalformed.probes(opts.fields, buf)
    else if (corruptIdx >= 0)
      FixedWidthMalformed.probes(
        opts.fields.filterNot(f => requiredSchema.fieldNames.exists(_.equalsIgnoreCase(f.name))), buf)
    else Array.empty

  // `_source_file` metadata column: within one batch every record shares a
  // path (batches FLUSH at file switches — see next()), so the column is a
  // ConstantColumnVector set once per batch instead of a per-record byte
  // copy — for short records the path would otherwise dominate vector fill.
  // It is always the LAST field (pruneColumns and toMicroBatchStream both
  // append it), which lets the writable vectors array simply be one shorter
  // — no dead capacity-sized string vector allocated for the meta slot.
  private val metaIdx: Int = requiredSchema.fieldNames.indexWhere(fn =>
    fn.equalsIgnoreCase(FixedWidthOptions.SourceFileCol) &&
      !opts.fields.exists(_.name.equalsIgnoreCase(fn)))
  require(metaIdx < 0 || metaIdx == requiredSchema.length - 1,
    s"fixedwidth: ${FixedWidthOptions.SourceFileCol} must be the last read column, " +
      s"got index $metaIdx of ${requiredSchema.length}")

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(capacity,
      if (metaIdx < 0) requiredSchema else StructType(requiredSchema.fields.init))

  private val metaVec: org.apache.spark.sql.execution.vectorized.ConstantColumnVector =
    if (metaIdx >= 0)
      new org.apache.spark.sql.execution.vectorized.ConstantColumnVector(capacity, StringType)
    else null

  private val batch = {
    val vs: Array[ColumnVector] = Array.tabulate(requiredSchema.length) { i =>
      if (i == metaIdx) metaVec else vectors(i)
    }
    new ColumnarBatch(vs)
  }

  /** Offset of the record currently being decoded (set before decoders run). */
  private var recOffset = 0L

  // Per-column vectorized decoders: (vector, rowIdx) writes from `buf`.
  private val decoders: Array[Int => Unit] = requiredSchema.fields.zipWithIndex.map { case (sf, ci) =>
    // meta column first: it has no writable vector slot (constant per
    // batch, set once in next()) — vectors(ci) would be out of bounds
    if (ci == metaIdx) { (_: Int) => () }
    else {
    val v = vectors(ci)
    sf.name match {
      case FixedWidthOptions.OffsetCol =>
        (r: Int) => v.putLong(r, recOffset)
      case FixedWidthOptions.KeyCol if !opts.typed =>
        (r: Int) => v.putByteArray(r, buf, opts.keyStartAt, opts.keyLen)
      case FixedWidthOptions.ValueCol if !opts.typed =>
        (r: Int) => v.putByteArray(r, buf, 0, recLen)
      case name if opts.corruptRecordCol.exists(_.equalsIgnoreCase(name)) =>
        // Filled by the PERMISSIVE branch of next() once the record's
        // malformed verdict is known (putNull is sticky — write exactly once).
        (_: Int) => ()
      case name =>
        val f = opts.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
          throw new IllegalArgumentException(s"fixedwidth: unknown column '$name'"))
        fieldDecoder(f, v)
    }
    }
  }

  private def fieldDecoder(f: FieldSpec, v: OnHeapColumnVector): Int => Unit = f.ftype match {
    case "string" =>
      val cs = opts.charset
      val utf8 = cs == java.nio.charset.StandardCharsets.UTF_8
      val trimRight = opts.trim == "right" || opts.trim == "both"
      val trimLeft = opts.trim == "left" || opts.trim == "both"
      (r: Int) => {
        val tr = AsciiParse.trimRange(buf, f.start, f.end, trimLeft, trimRight)
        val s = (tr >>> 32).toInt
        val e = (tr & 0xffffffffL).toInt
        if (utf8) v.putByteArray(r, buf, s, e - s)
        else v.putByteArray(r, new String(buf, s, e - s, cs).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    case "int" | "date" =>
      (r: Int) => {
        if (AsciiParse.isBlank(buf, f.start, f.end)) v.putNull(r)
        else v.putInt(r, AsciiParse.parseInt(buf, f.start, f.end))
      }
    case "long" | "timestamp" =>
      (r: Int) => {
        if (AsciiParse.isBlank(buf, f.start, f.end)) v.putNull(r)
        else v.putLong(r, AsciiParse.parseLong(buf, f.start, f.end))
      }
    case "double" =>
      (r: Int) => {
        val d = AsciiParse.parseDouble(buf, f.start, f.end)
        if (d == null) v.putNull(r) else v.putDouble(r, d.doubleValue())
      }
    case FieldSpec.DecimalRe(p, s) =>
      val (prec, scale) = (p.toInt, s.toInt)
      (r: Int) => {
        if (AsciiParse.isBlank(buf, f.start, f.end)) v.putNull(r)
        else v.putDecimal(r, AsciiParse.parseDecimal(buf, f.start, f.end, prec, scale), prec)
      }
  }

  // When a fetch crosses into a new file mid-batch, the already-fetched
  // record (still in `buf`) carries over to the NEXT batch so the batch
  // being emitted stays single-file (the ConstantColumnVector contract).
  private var pendingAt = -1L
  private var batchPath: Array[Byte] = null

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    var at = 0L
    var flush = false
    while (!flush && n < capacity && {
        if (pendingAt >= 0) { at = pendingAt; pendingAt = -1L; true }
        else { at = stream.fetch(buf); at >= 0 }
      }) {
      if (metaVec != null) {
        val p = stream.currentPathUtf8
        if (n == 0) batchPath = p
        else if (p ne batchPath) {
          // new array reference — usually a new FILE, but two chunks of the
          // SAME file can land in one partition (range packing): compare
          // content before flushing so intra-file chunk switches don't
          // truncate batches
          if (java.util.Arrays.equals(p, batchPath)) batchPath = p
          else {
            // record belongs to the next file: hold it, emit what we have
            pendingAt = at
            flush = true
          }
        }
      }
      if (!flush) {
      recOffset = at
      var pass = true
      var p = 0
      while (pass && p < predicates.length) { pass = predicates(p)(); p += 1 }
      if (pass) {
        if (!opts.tolerant) {
          var c = 0
          while (c < decoders.length) { decoders(c)(n); c += 1 }
          n += 1
        } else if (opts.dropMalformed) {
          var ok = true
          try {
            var j = 0
            while (j < probes.length) { probes(j)(); j += 1 }
          } catch {
            case _: NumberFormatException =>
              ok = false; malformed += 1; skipped += 1
          }
          if (ok) {
            var c = 0
            while (c < decoders.length) { decoders(c)(n); c += 1 }
            n += 1
          }
        } else { // PERMISSIVE: null bad fields; corrupt column written last
          var bad = false
          var c = 0
          while (c < decoders.length) {
            if (c != corruptIdx) {
              try decoders(c)(n)
              catch { case _: NumberFormatException => vectors(c).putNull(n); bad = true }
            }
            c += 1
          }
          if (corruptIdx >= 0) {
            var j = 0
            while (!bad && j < probes.length) {
              try probes(j)() catch { case _: NumberFormatException => bad = true }
              j += 1
            }
            if (bad) {
              val raw = FixedWidthMalformed.rawRecord(buf, recLen, opts.charset)
              vectors(corruptIdx).putByteArray(n, raw.getBytes)
            } else vectors(corruptIdx).putNull(n)
          }
          if (bad) malformed += 1
          n += 1
        }
      } else skipped += 1
      }
    }
    if (metaVec != null && n > 0)
      metaVec.setUtf8String(org.apache.spark.unsafe.types.UTF8String.fromBytes(batchPath))
    batch.setNumRows(n)
    n > 0
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    stream.close()
    batch.close()
  }

  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      FixedWidthMetrics.task("fwRecordsRead", stream.recordsRead),
      FixedWidthMetrics.task("fwBytesRead", stream.recordsRead * recLen),
      FixedWidthMetrics.task("fwRecordsSkipped", skipped),
      FixedWidthMetrics.task("fwRecordsMalformed", malformed))
}
