package graft.sources

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** SQL-catalog (DDL) surface of the fixedwidth format: a migrating Hadoop
  * user's first non-API touchpoint is `CREATE TABLE ... USING fixedwidth`,
  * `INSERT INTO`, and plain `SELECT` — this spec pins that the DSv2
  * provider actually works through the session catalog, not only through
  * `spark.read/write.format(...)`. The writer advertises ACCEPT_ANY_SCHEMA
  * and binds layout fields BY NAME, so inserts resolve like the DataFrame
  * path does.
  */
class FixedWidthCatalogSpec extends SparkSpec with Matchers {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ddl").toString

  private val fields = "id:int:0:10,name:string:10:12"

  test("CREATE TABLE USING fixedwidth + INSERT INTO + SELECT round-trips") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS fw_ddl")
    spark.sql(
      s"""CREATE TABLE fw_ddl USING fixedwidth
         |OPTIONS (fields '$fields', path '$dir')""".stripMargin)
    try {
      spark.sql("INSERT INTO fw_ddl SELECT 0L AS offset, 7 AS id, 'seven' AS name")
      spark.sql("INSERT INTO fw_ddl SELECT 0L AS offset, 8 AS id, 'eight' AS name")
      val got = spark.sql("SELECT id, name FROM fw_ddl ORDER BY id")
        .collect().map(r => (r.getInt(0), r.getString(1)))
      got shouldBe Array((7, "seven"), (8, "eight"))
      // filters through SQL still push down to the scan
      spark.sql("SELECT count(*) FROM fw_ddl WHERE id = 8").collect()
        .head.getLong(0) shouldBe 1L
    } finally spark.sql("DROP TABLE IF EXISTS fw_ddl")
  }

  test("catalog table reads data written by the DataFrame API (shared layout)") {
    import spark.implicits._
    val dir = tmp()
    Seq((1, "one"), (2, "two")).toDF("id", "name")
      .write.format("fixedwidth").option("fields", fields).mode("overwrite").save(dir)
    spark.sql("DROP TABLE IF EXISTS fw_ddl_ro")
    spark.sql(
      s"""CREATE TABLE fw_ddl_ro USING fixedwidth
         |OPTIONS (fields '$fields', path '$dir')""".stripMargin)
    try {
      spark.sql("SELECT id, name FROM fw_ddl_ro ORDER BY id")
        .collect().map(r => (r.getInt(0), r.getString(1))) shouldBe
        Array((1, "one"), (2, "two"))
    } finally spark.sql("DROP TABLE IF EXISTS fw_ddl_ro")
  }
}
