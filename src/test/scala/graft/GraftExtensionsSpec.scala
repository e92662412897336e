package graft

import org.scalatest.matchers.should.Matchers

import graft.functions.Hashing

/** The SparkSessionExtensions registration: the SQL surface resolves the
  * injected functions and produces the same values as the Column API /
  * JVM loops (the test session loads `graft.GraftExtensions`). */
class GraftExtensionsSpec extends SparkSpec with Matchers {

  test("injected SQL functions resolve and match the JVM implementations") {
    val t = "key agg row scan slow fast"
    val r = spark.sql(
      s"SELECT rolling_hash64('$t') AS rh, simhash64('$t') AS sh, mix64(12345L) AS mx, " +
        "float_dot(array(cast(1.5 AS float), cast(2.0 AS float)), array(cast(3.0 AS float), cast(0.5 AS float))) AS fd")
      .head
    r.getLong(0) shouldBe Hashing.rollingHashOf(t)
    r.getLong(1) shouldBe Hashing.simhashOf(t)
    r.getLong(2) shouldBe Hashing.mix64(12345L, 0)
    r.getDouble(3) shouldBe (1.5 * 3.0 + 2.0 * 0.5)
  }

  test("injected functions reject wrong arity/types at analysis") {
    an[Exception] should be thrownBy spark.sql("SELECT rolling_hash64('a', 'b')").head
    an[Exception] should be thrownBy spark.sql("SELECT mix64('not a long')").head
  }
}
