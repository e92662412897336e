package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The `_source_file` DSv2 metadata column: absent from the default schema,
  * materialized (correctly, per record) only when referenced, consistent
  * across multi-file scans and the columnar reader's chunk packing, and
  * composable with column pruning and pushed filters. */
class MetadataColumnSpec extends SparkSpec with Matchers {

  private def writeTyped(dir: String, ids: Seq[Int]): Unit = {
    import spark.implicits._
    ids.toDF("id").repartition(3)
      .select(format_string("%04d", col("id")).cast("binary").as("value"))
      .write.format("fixedwidth").option("recordLength", 4).mode("overwrite").save(dir)
  }

  private val layout = "id:int:0:4"

  test("_source_file is not in the schema but resolves when selected") {
    val dir = Files.createTempDirectory("graft-metacol").toString
    writeTyped(dir, 0 until 50)
    val df = spark.read.format("fixedwidth")
      .option("recordLength", 4).option("fields", layout).load(dir)
    df.schema.fieldNames should not contain "_source_file"
    val rows = df.select(col("id"), col("_source_file"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    rows.length shouldBe 50
    rows.map(_._1).sorted shouldBe (0 until 50)
    all(rows.map(_._2)) should include(dir)
    // 3 writer tasks -> records must attribute to >1 distinct file
    rows.map(_._2).distinct.length should be > 1
  }

  test("per-record attribution matches file contents exactly") {
    val dir = Files.createTempDirectory("graft-metacol2").toString
    writeTyped(dir, 0 until 30)
    val got = spark.read.format("fixedwidth")
      .option("recordLength", 4).option("fields", layout).load(dir)
      .select(col("id"), col("_source_file")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    // ground truth: parse each data file directly
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    files should not be empty
    for (f <- files) {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      bytes.grouped(4).foreach { rec =>
        val id = new String(rec, "US-ASCII").toInt
        got(id) should endWith(f.getName)
      }
    }
  }

  test("_source_file composes with pushed filters and prunes cleanly") {
    val dir = Files.createTempDirectory("graft-metacol3").toString
    writeTyped(dir, 0 until 40)
    val df = spark.read.format("fixedwidth")
      .option("recordLength", 4).option("fields", layout).load(dir)
      .filter(col("id") < 10).select(col("_source_file"))
    df.collect().length shouldBe 10
    // metadata-only projection: no declared field needs decoding
    val plan = df.queryExecution.executedPlan.toString
    plan should include("_source_file")
  }

  test("queries without the column are unaffected") {
    val dir = Files.createTempDirectory("graft-metacol4").toString
    writeTyped(dir, 0 until 20)
    val df = spark.read.format("fixedwidth")
      .option("recordLength", 4).option("fields", layout).load(dir)
    df.agg(sum(col("id"))).head.getLong(0) shouldBe (0 until 20).sum.toLong
  }
}
