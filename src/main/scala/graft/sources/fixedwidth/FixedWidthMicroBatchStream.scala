package graft.sources.fixedwidth

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Streaming offset = the set of fixed-width files already ingested, with
  * their lengths. Fixed-width data files are immutable once committed (the
  * writer renames whole files into place, never appends), so "new data"
  * means "new files" — the same model as Spark's built-in file stream
  * source, minus its driver-side metadata log.
  *
  * Scale trade-off (deliberate): the offset carries the full seen-file map,
  * so offset JSON grows O(total files) and each trigger re-lists the
  * directory — fine for bounded directories; for the millions-of-files
  * regime the next step is the compacting metadata log Spark's file source
  * uses, with the offset holding only a log sequence number. */
final case class FixedWidthStreamOffset(files: Map[String, Long]) extends Offset {
  override def json(): String = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    files.toSeq.sortBy(_._1).foreach { case (p, l) => node.put(p, l) }
    mapper.writeValueAsString(node)
  }
}

object FixedWidthStreamOffset {
  def fromJson(json: String): FixedWidthStreamOffset = {
    val mapper = new ObjectMapper()
    val node = mapper.readTree(json)
    val files = node.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
    FixedWidthStreamOffset(files)
  }
}

/** Micro-batch streaming read for the fixedwidth format
  * (`spark.readStream.format("fixedwidth")`): each micro-batch scans the
  * files that appeared since the previous offset, with the same
  * record-aligned partitioning and reader as the batch path. The reference
  * is batch-only MapReduce (SURVEY.md §2.9) — this is the [EXT] Structured
  * Streaming surface over the same byte format.
  */
class FixedWidthMicroBatchStream(
    opts: FixedWidthOptions,
    tableOptions: CaseInsensitiveStringMap,
    requiredSchema: StructType,
    conf: Configuration)
    extends MicroBatchStream {

  private def snapshot(): Map[String, Long] =
    FixedWidthTable.listFiles(tableOptions, conf)
      .map(st => st.getPath.toString -> st.getLen).toMap

  override def initialOffset(): Offset = FixedWidthStreamOffset(Map.empty)

  override def latestOffset(): Offset = FixedWidthStreamOffset(snapshot())

  override def deserializeOffset(json: String): Offset = FixedWidthStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[FixedWidthStreamOffset].files.keySet
    val target = end.asInstanceOf[FixedWidthStreamOffset].files
    // Plan from the OFFSET's recorded (path, length) pairs, never from a
    // fresh listing: replaying a checkpointed batch after a file was
    // deleted must fail loudly at read time, not silently plan without it.
    val fresh = (target -- seen).toSeq.sortBy(_._1)
    FixedWidthScan.alignedPartitionsOf(fresh, opts)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new FixedWidthReaderFactory(opts, requiredSchema, new SerializableHadoopConf(conf))

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
