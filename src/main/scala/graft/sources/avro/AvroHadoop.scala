package graft.sources.avro

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink over the classpath's `avro-mapred`
  * (Spark ships the Avro runtime but not the `spark-avro` DataSource
  * module, so the bridge goes through `newAPIHadoopFile` /
  * `saveAsNewAPIHadoopFile` — the same Hadoop-interop surface the
  * reference's FixedLengthInputFormat lives on). Flat schemas of
  * long/int/double/float/string/boolean/binary columns, every field a
  * nullable union, which covers the synthetic tables and the usual
  * metadata sidecars.
  *
  * Scale shape: write is a map-only pass (record construction inside the
  * partition, no shuffle, no driver collection); read is file-split
  * parallel exactly like any Hadoop input format, with the Avro→Row
  * conversion fused into the scan stage so no Avro object ever crosses a
  * shuffle boundary (GenericRecord is not serializable — fusing the
  * conversion is correctness, not just efficiency). */
object AvroHadoop {

  /** Avro record-schema JSON for a flat Spark schema; each field is a
    * ["null", T] union so NULLs round-trip. */
  def avroSchemaJson(schema: StructType, name: String): String = {
    def avroType(dt: DataType): String = dt match {
      case LongType => "long"
      case IntegerType => "int"
      case DoubleType => "double"
      case FloatType => "float"
      case StringType => "string"
      case BooleanType => "boolean"
      case BinaryType => "bytes"
      case other => throw new IllegalArgumentException(
        s"AvroHadoop supports flat primitive columns, got ${other.catalogString}")
    }
    // Field names are interpolated into schema JSON — reject anything
    // outside Avro's name rule up front (a quote/dot/dash would otherwise
    // surface later as an opaque Schema.Parser error), matching the loud
    // unsupported-dtype guard above.
    val avroName = "[A-Za-z_][A-Za-z0-9_]*".r
    val fields = schema.fields.map { f =>
      require(avroName.matches(f.name),
        s"AvroHadoop column name '${f.name}' is not a legal Avro name " +
          "([A-Za-z_][A-Za-z0-9_]*); rename the column before writing")
      s"""{"name":"${f.name}","type":["null","${avroType(f.dataType)}"],"default":null}"""
    }.mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fields]}"""
  }

  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val json = avroSchemaJson(sparkSchema, "graft_row")
    val job = Job.getInstance(
      new Configuration(df.sparkSession.sparkContext.hadoopConfiguration))
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(json))
    df.rdd.mapPartitions { it =>
      val sch = new Schema.Parser().parse(json) // Schema is not serializable
      it.map { row =>
        val rec = new GenericData.Record(sch)
        var i = 0
        while (i < sparkSchema.length) {
          val v = if (row.isNullAt(i)) null else row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case x => x
          }
          rec.put(sparkSchema(i).name, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val json = avroSchemaJson(schema, "graft_row")
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", json)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf)
      .mapPartitions { it =>
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq(schema.fields.toSeq.map { f =>
            rec.get(f.name) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case bb: java.nio.ByteBuffer =>
                val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
              case x => x
            }
          })
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
