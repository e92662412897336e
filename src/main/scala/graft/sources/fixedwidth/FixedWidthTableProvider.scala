package graft.sources.fixedwidth

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("fixedwidth")` / `df.write.format("fixedwidth")`.
  *
  * Spark-native re-expression of the reference's
  * `FixedLengthInputFormat`/`FixedLengthRecordReader` (reference
  * FixedLengthInputFormat.java:79-80, FixedLengthRecordReader.java:59-267):
  * files hold undelimited records of exactly `recordLength` bytes; the scan
  * emits `(offset, [key,] value)` in raw mode or typed columns via the
  * `fields` layout option. See FixedWidthOptions for the option surface.
  */
class FixedWidthTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "fixedwidth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixedWidthOptions(options).schema

  /** External metadata = the writer's `partitionBy(...)` transforms reach
    * `getTable` (that is the only way DSv2 hands them to a path-based
    * provider). The byte layout remains the single source of truth for the
    * READ schema: the table always reports the option-derived schema; a
    * user-passed read schema is ignored rather than trusted. */
  override def supportsExternalMetadata(): Boolean = true

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FixedWidthTable(FixedWidthOptions(opts), opts, partitioning)
  }
}

object FixedWidthTable {
  /** Extensions the reference treats as compressed → unsupported
    * (reference FixedLengthRecordReader.java:147-152 throws; the format marks
    * them merely non-splittable at FixedLengthInputFormat.java:371-380 — the
    * effective behavior is "compressed = rejected", which we keep).
    */
  private val CompressedExts = Seq(".gz", ".gzip", ".bz2", ".deflate", ".snappy", ".zst", ".lz4", ".lzo", ".zip")

  def isCompressed(p: Path): Boolean = {
    val n = p.getName.toLowerCase
    CompressedExts.exists(n.endsWith)
  }

  def isDataFile(s: FileStatus): Boolean = {
    val n = s.getPath.getName
    s.isFile && s.getLen > 0 && !n.startsWith("_") && !n.startsWith(".")
  }

  /** Recursive data-file listing under a directory: partitioned layouts
    * (`col=value/` subdirectories) nest files arbitrarily deep; `_`/`.`
    * prefixed names are skipped at every level. */
  private def listRecursive(fs: org.apache.hadoop.fs.FileSystem, st: FileStatus): Seq[FileStatus] = {
    val n = st.getPath.getName
    if (n.startsWith("_") || n.startsWith(".")) Nil
    else if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(listRecursive(fs, _))
    else Seq(st).filter(isDataFile)
  }

  /** Resolve the `path`/`paths` options to concrete data files. Runs on the
    * driver at plan time (analog of FileInputFormat listing inside
    * `getSplits`, reference FixedLengthInputFormat.java:364).
    */
  def listFiles(opts: CaseInsensitiveStringMap, conf: Configuration): Seq[FileStatus] = {
    val raw = Option(opts.get("paths")) match {
      case Some(js) =>
        // `load(p1, p2, ...)` passes a JSON-encoded string array. Parse it
        // with a real JSON parser (Jackson ships on Spark's classpath) —
        // naive split-on-comma mis-splits any path containing ',' or '"'.
        try {
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          mapper.readValue(js, classOf[Array[String]]).toIndexedSeq.filter(_.nonEmpty)
        } catch {
          case e: Exception =>
            throw new IllegalArgumentException(
              s"fixedwidth: option 'paths' is not a JSON string array: $js", e)
        }
      case None =>
        Option(opts.get("path")).toSeq
    }
    if (raw.isEmpty)
      throw new IllegalArgumentException("fixedwidth: no input path specified")
    raw.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val globbed = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      if (globbed.isEmpty)
        throw new IllegalArgumentException(s"fixedwidth: path does not exist: $p")
      globbed.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(listRecursive(fs, _))
        else Seq(st).filter(isDataFile)
      }
    }
  }
}

class FixedWidthTable(
    val fwOptions: FixedWidthOptions,
    tableOptions: CaseInsensitiveStringMap,
    partitionTransforms: Array[Transform] = Array.empty)
    extends Table with SupportsRead with SupportsWrite {

  /** Column names of the writer's `partitionBy(...)` — identity transforms
    * only (bucket/days/etc. have no meaning for a directory-indexed flat
    * format), each naming a declared typed field. */
  val partitionCols: Seq[String] = partitionTransforms.toSeq.map {
    case id: org.apache.spark.sql.connector.expressions.IdentityTransform =>
      val name = id.ref.fieldNames.mkString(".")
      if (!fwOptions.fields.exists(_.name.equalsIgnoreCase(name)))
        throw new IllegalArgumentException(
          s"fixedwidth: partition column '$name' is not a declared field " +
            "(partitionBy requires a 'fields' layout naming each partition column)")
      name
    case other =>
      throw new IllegalArgumentException(
        s"fixedwidth: unsupported partition transform '$other' (only identity columns)")
  }

  override def partitioning(): Array[Transform] = partitionTransforms

  override def name(): String =
    s"fixedwidth(${Option(tableOptions.get("path")).getOrElse(Option(tableOptions.get("paths")).getOrElse("?"))})"

  override def schema(): StructType = fwOptions.schema

  override def capabilities(): util.Set[TableCapability] =
    Set(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      // Write schema is validated by the writer itself against the `fields`
      // layout (or the single `value` column in raw mode); the table read
      // schema intentionally differs (adds `offset`).
      TableCapability.ACCEPT_ANY_SCHEMA).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new FixedWidthScanBuilder(fwOptions, tableOptions, conf)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    new FixedWidthWriteBuilder(fwOptions, tableOptions, info, conf, partitionCols)
  }
}
