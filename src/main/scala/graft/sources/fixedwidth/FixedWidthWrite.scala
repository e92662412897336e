package graft.sources.fixedwidth

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Fixed-width sink: the inverse of the scan, the production analog of the
  * reference test harness's file writers (reference
  * TestFixedLengthInputFormat.java:92-134, :142-181 — which hand-write
  * exact-multiple files to drive the reader). Each task writes one
  * exact-multiple-of-recordLength binary file; records are space-padded.
  *
  * Typed mode (`fields` layout): each named field is encoded at its byte
  * range — strings right-padded (truncated if over-width), numerics as ASCII
  * (doubles via `Double.toString`, the shortest form that round-trips
  * exactly; timestamps as epoch-micros; dates as epoch-day). Raw mode: the
  * incoming `value` binary/string column is padded to `recordLength`.
  */
class FixedWidthWriteBuilder(
    opts: FixedWidthOptions,
    tableOptions: CaseInsensitiveStringMap,
    info: LogicalWriteInfo,
    conf: Configuration)
    extends WriteBuilder with SupportsTruncate {

  private var doTruncate = false

  override def truncate(): WriteBuilder = { doTruncate = true; this }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val path = Option(tableOptions.get("path")).getOrElse(
        throw new IllegalArgumentException("fixedwidth: write requires a single 'path'"))
      new FixedWidthBatchWrite(path, opts, info.schema(), doTruncate, new SerializableHadoopConf(conf))
    }
  }
}

/** Job-level commit protocol (the analog of Hadoop's FileOutputCommitter,
  * which the reference's MapReduce pipeline got for free): every task writes
  * into a job-scoped `_temporary-<jobId>` directory; `commit()` renames the
  * committed tasks' files into the final directory and drops a `_SUCCESS`
  * marker; `abort()` (or a task lost without abort) leaves nothing visible
  * because readers skip `_`-prefixed paths and the temp dir is deleted.
  * Speculative/zombie task attempts are harmless: only files named in commit
  * messages are renamed, the rest die with the temp dir.
  */
class FixedWidthBatchWrite(
    path: String,
    opts: FixedWidthOptions,
    querySchema: StructType,
    truncate: Boolean,
    conf: SerializableHadoopConf)
    extends BatchWrite {

  private val jobId = java.util.UUID.randomUUID().toString
  private def tempDir = new Path(path, s"_temporary-$jobId")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    // Driver-side, before any task launches.
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (truncate && fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(tempDir)
    // Validate the incoming schema maps onto the layout once, up front.
    FixedWidthEncoder.plan(opts, querySchema)
    new FixedWidthDataWriterFactory(tempDir.toString, opts, querySchema, conf)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    messages.collect { case m: FixedWidthCommitMessage => m }.foreach { m =>
      val src = new Path(m.file)
      val dst = new Path(dir, src.getName)
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"fixedwidth: commit failed to rename $src -> $dst")
    }
    fs.delete(tempDir, true)
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(conf.value)
    fs.delete(tempDir, true)
  }
}

final case class FixedWidthCommitMessage(file: String, records: Long) extends WriterCommitMessage

class FixedWidthDataWriterFactory(
    tempDir: String,
    opts: FixedWidthOptions,
    querySchema: StructType,
    conf: SerializableHadoopConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new FixedWidthDataWriter(
      f"$tempDir/part-$partitionId%05d-$taskId.fwb", opts, querySchema, conf.value)
}

class FixedWidthDataWriter(
    file: String,
    opts: FixedWidthOptions,
    querySchema: StructType,
    conf: Configuration)
    extends DataWriter[InternalRow] {

  private val p = new Path(file)
  private val out = p.getFileSystem(conf).create(p, true)
  private val encoders = FixedWidthEncoder.plan(opts, querySchema)
  private val buf = new Array[Byte](opts.recordLength)
  private var records = 0L

  override def write(record: InternalRow): Unit = {
    java.util.Arrays.fill(buf, ' '.toByte)
    var i = 0
    while (i < encoders.length) { encoders(i)(record, buf); i += 1 }
    out.write(buf)
    records += 1
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    FixedWidthCommitMessage(file, records)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => }
    p.getFileSystem(conf).delete(p, false)
  }

  override def close(): Unit = ()
}

object FixedWidthEncoder {
  type Enc = (InternalRow, Array[Byte]) => Unit

  /** Bind each layout field to an ordinal of the incoming query schema and
    * compile an encoder per field. Fails fast on missing columns or
    * un-encodable type combinations — write validation is the writer's job
    * because the table advertises ACCEPT_ANY_SCHEMA.
    */
  def plan(opts: FixedWidthOptions, querySchema: StructType): Array[Enc] = {
    if (opts.typed) {
      opts.fields.map { f =>
        val ord = querySchema.fieldNames.indexWhere(_.equalsIgnoreCase(f.name))
        if (ord < 0)
          throw new IllegalArgumentException(
            s"fixedwidth: write schema is missing layout field '${f.name}' " +
              s"(have: ${querySchema.fieldNames.mkString(", ")})")
        fieldEncoder(f, ord, querySchema.fields(ord).dataType, opts.charset)
      }.toArray
    } else {
      val ord = querySchema.fieldNames.indexWhere(_.equalsIgnoreCase(FixedWidthOptions.ValueCol))
      if (ord < 0)
        throw new IllegalArgumentException(
          "fixedwidth: raw-mode write requires a 'value' column (binary or string)")
      val cs = opts.charset
      val utf8 = cs == StandardCharsets.UTF_8
      val enc: Enc = querySchema.fields(ord).dataType match {
        case BinaryType => (row, buf) => place(row.getBinary(ord), buf, 0, buf.length, "value")
        case StringType => (row, buf) => {
          val b = if (utf8) row.getUTF8String(ord).getBytes
                  else row.getUTF8String(ord).toString.getBytes(cs)
          place(b, buf, 0, buf.length, "value")
        }
        case dt => throw new IllegalArgumentException(
          s"fixedwidth: raw-mode 'value' column must be binary or string, got $dt")
      }
      Array(enc)
    }
  }

  private def place(bytes: Array[Byte], buf: Array[Byte], start: Int, width: Int, name: String): Unit = {
    if (bytes.length > width)
      throw new IllegalArgumentException(
        s"fixedwidth: value of '$name' is ${bytes.length} bytes, exceeds field width $width")
    System.arraycopy(bytes, 0, buf, start, bytes.length)
  }

  private def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  private def fieldEncoder(f: FieldSpec, ord: Int, dt: DataType, cs: java.nio.charset.Charset): Enc = {
    def numeric(render: InternalRow => String): Enc = (row, buf) =>
      if (!row.isNullAt(ord)) place(ascii(render(row)), buf, f.start, f.len, f.name)
    val utf8 = cs == StandardCharsets.UTF_8
    (f.ftype, dt) match {
      case ("string", StringType) =>
        (row, buf) =>
          if (!row.isNullAt(ord)) {
            val b = if (utf8) row.getUTF8String(ord).getBytes
                    else row.getUTF8String(ord).toString.getBytes(cs)
            // Strings may be truncated to the declared width (SURVEY.md §2.1
            // S9: pad/truncate); numerics error instead — truncation would
            // silently corrupt them.
            System.arraycopy(b, 0, buf, f.start, math.min(b.length, f.len))
          }
      case ("int", IntegerType)        => numeric(r => r.getInt(ord).toString)
      case ("long", LongType)          => numeric(r => r.getLong(ord).toString)
      case ("long", IntegerType)       => numeric(r => r.getInt(ord).toString)
      case ("double", DoubleType)      => numeric(r => r.getDouble(ord).toString)
      case ("date", DateType)          => numeric(r => r.getInt(ord).toString)      // epoch day
      case ("timestamp", TimestampType) => numeric(r => r.getLong(ord).toString)    // epoch micros
      case ("timestamp", TimestampNTZType) => numeric(r => r.getLong(ord).toString) // epoch micros (no zone)
      case (FieldSpec.DecimalRe(p, s), dt: DecimalType)
          if dt.precision == p.toInt && dt.scale == s.toInt =>
        // toPlainString: no exponent notation, exact inverse of parseDecimal
        numeric(r => r.getDecimal(ord, dt.precision, dt.scale).toJavaBigDecimal.toPlainString)
      case (ft, other) =>
        throw new IllegalArgumentException(
          s"fixedwidth: cannot encode column '${f.name}' of Spark type $other as layout type '$ft'")
    }
  }
}
