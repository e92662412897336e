package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.sources.avro.AvroHadoop

/** Avro container round trip over avro-mapred: every supported primitive,
  * NULLs in every column, binary payloads, and the flat-schema guard. */
class AvroHadoopSpec extends SparkSpec with Matchers {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("n", IntegerType),
    StructField("x", DoubleType),
    StructField("f", FloatType),
    StructField("s", StringType),
    StructField("b", BooleanType),
    StructField("raw", BinaryType)))

  test("round trip preserves all primitive types, NULLs, and binary bytes") {
    val rows = Seq(
      Row(1L, 10, 1.5, 2.5f, "alpha", true, Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null),
      Row(null, -7, -0.0, Float.NaN, "", false, Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-spec").toString + "/t1"
    AvroHadoop.write(df, dir)
    val back = AvroHadoop.read(spark, dir, schema).collect()
      .sortBy(r => if (r.isNullAt(0)) Long.MinValue else r.getLong(0))
    back.length shouldBe 3
    // row with id=null sorts first
    back(0).isNullAt(0) shouldBe true
    back(0).getInt(1) shouldBe -7
    java.lang.Double.doubleToRawLongBits(back(0).getDouble(2)) shouldBe
      java.lang.Double.doubleToRawLongBits(-0.0)
    back(0).getFloat(3).isNaN shouldBe true
    back(0).getString(4) shouldBe ""
    back(0).getAs[Array[Byte]](6) shouldBe Array[Byte]()
    back(1).getLong(0) shouldBe 1L
    back(1).getAs[Array[Byte]](6) shouldBe Array[Byte](1, 2, 3)
    back(2).getLong(0) shouldBe 2L
    (1 to 6).foreach(i => back(2).isNullAt(i) shouldBe true)
  }

  test("nested or non-primitive columns are rejected loudly") {
    val bad = StructType(Seq(StructField("a", ArrayType(LongType))))
    an[IllegalArgumentException] should be thrownBy
      AvroHadoop.avroSchemaJson(bad, "r")
  }
}
