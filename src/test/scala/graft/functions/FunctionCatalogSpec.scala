package graft.functions

import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The DSv2 FunctionCatalog surface: `spark.sql.catalog.graft` resolves the
  * shared hash family from plain SQL with no session-extension wiring, the
  * magic-invoke results match the JVM kernels, and unknown names /
  * wrong-typed arguments fail at analysis, not at runtime. */
class FunctionCatalogSpec extends SparkSpec with Matchers {

  private def withCatalog[A](body: => A): A = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftFunctionCatalog].getName)
    try body finally spark.conf.unset("spark.sql.catalog.graft")
  }

  test("catalog functions resolve from SQL and match the JVM kernels") {
    withCatalog {
      val r = spark.sql(
        "SELECT graft.mix64(12345L) AS m, graft.hash64('key agg row') AS h, " +
          "graft.zvalue2(3L, 5L) AS z").head
      r.getLong(0) shouldBe Hashing.mix64(12345L, 0)
      r.getLong(1) shouldBe Hashing.hash64("key agg row")
      r.getLong(2) shouldBe ZOrder.interleave16(3L, 5L)
    }
  }

  test("catalog functions evaluate over table data, not just literals") {
    withCatalog {
      import spark.implicits._
      val got = Seq(1L, 2L, 3L).toDF("x").createOrReplaceTempView("fc_xs")
      val rows = spark.sql("SELECT x, graft.mix64(x) AS m FROM fc_xs ORDER BY x")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      rows shouldBe Seq(1L, 2L, 3L).map(x => (x, Hashing.mix64(x, 0)))
    }
  }

  test("unknown function, wrong arity, and non-coercible types fail at analysis") {
    withCatalog {
      an[Exception] should be thrownBy spark.sql("SELECT graft.nope(1L)").head
      an[Exception] should be thrownBy spark.sql("SELECT graft.zvalue2(1L)").head
      an[Exception] should be thrownBy spark.sql("SELECT graft.mix64(1L, 2L)").head
      // a STRING argument must fail loudly, not ride the string->bigint
      // implicit cast into silent NULLs for malformed values
      an[Exception] should be thrownBy spark.sql("SELECT graft.mix64('str')").head
      an[Exception] should be thrownBy spark.sql("SELECT graft.hash64(1L)").head
    }
  }

  test("coercible argument types work: plain INT literals reach the BIGINT functions") {
    withCatalog {
      // bind() must not reject pre-coercion INT — Spark casts toward
      // inputTypes() after bind, and unsuffixed SQL literals are INT
      spark.sql("SELECT graft.mix64(42) AS m").head.getLong(0) shouldBe
        Hashing.mix64(42L, 0)
      spark.sql("SELECT graft.zvalue2(3, 5) AS z").head.getLong(0) shouldBe
        ZOrder.interleave16(3L, 5L)
    }
  }

  test("NULL inputs propagate to NULL results, never a crash or a wrong value") {
    withCatalog {
      spark.sql("SELECT graft.mix64(CAST(NULL AS BIGINT))").head.isNullAt(0) shouldBe true
      spark.sql("SELECT graft.hash64(CAST(NULL AS STRING))").head.isNullAt(0) shouldBe true
      // per-row: a null element yields a null result alongside real values
      val rows = spark.sql(
        "SELECT s, graft.hash64(s) AS h FROM VALUES ('a'), (CAST(NULL AS STRING)) t(s)")
        .collect()
      rows.length shouldBe 2
      rows.find(_.isNullAt(0)).get.isNullAt(1) shouldBe true
      rows.find(!_.isNullAt(0)).get.getLong(1) shouldBe Hashing.hash64("a")
    }
  }

  test("listFunctions exposes the registry") {
    val cat = new GraftFunctionCatalog
    cat.initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.emptyMap()))
    cat.listFunctions(Array.empty).map(_.name).sorted shouldBe
      Array("hash64", "mix64", "zvalue2")
    cat.functionExists(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "MIX64")) shouldBe true
  }
}
