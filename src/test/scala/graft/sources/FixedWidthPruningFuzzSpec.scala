package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Differential fuzz for partition-directory pruning: whatever directories
  * pruning skips, FILTERED QUERY RESULTS must be byte-identical to the
  * ground truth computed from the written rows — across random partition
  * values (nulls, unicode, escape-hostile characters), random predicates,
  * and both partition layouts. Pruning is an IO optimization; this spec is
  * the mechanical proof it is ONLY that. */
class FixedWidthPruningFuzzSpec extends SparkSpec with Matchers {

  private val layout = "id:long:0:8,p:string:8:12,k:long:20:6,v:long:26:6"

  // escape-hostile and unicode-bearing partition values, plus NULL
  private val pool: Seq[String] =
    Seq("a", "b/c", "d=e", "f%g", "sp ace", "café", "日本", "-", "_x", ".y", null)

  test("pruned reads equal ground truth across 25 random layouts and filters") {
    import spark.implicits._
    val rng = new Random(2026)

    for (trial <- 1 to 25) {
      val dir = Files.createTempDirectory(s"graft-fuzz$trial").toString
      val n = 30 + rng.nextInt(120)
      val rows = (1 to n).map { i =>
        val p = pool(rng.nextInt(pool.length))
        val k: Option[Long] = if (rng.nextInt(6) == 0) None else Some(rng.nextInt(4).toLong)
        (i.toLong, p, k, rng.nextInt(100).toLong)
      }
      rows.toDF("id", "p", "k", "v").repartition(1 + rng.nextInt(3))
        .write.format("fixedwidth").option("fields", layout)
        .partitionBy("p", "k").mode("overwrite").save(dir)

      val df = spark.read.format("fixedwidth").option("fields", layout).load(dir)

      // ground truth mirrors this format's decode semantics: NULL string -> ""
      val truth = rows.map { case (id, p, k, v) => (id, if (p == null) "" else p, k, v) }

      def ids(pred: org.apache.spark.sql.Column): Array[Long] =
        df.filter(pred).select("id").collect().map(_.getLong(0)).sorted

      // random equality value: sometimes present, sometimes absent
      val eqVal = {
        val c = pool(rng.nextInt(pool.length)); if (c == null) "zzz-absent" else c
      }
      ids($"p" === eqVal) shouldBe truth.filter(_._2 == eqVal).map(_._1).sorted.toArray

      val kEq = rng.nextInt(5).toLong // may exceed written range
      ids($"k" === kEq) shouldBe truth.filter(_._3.contains(kEq)).map(_._1).sorted.toArray

      ids($"k".isNull) shouldBe truth.filter(_._3.isEmpty).map(_._1).sorted.toArray

      val kGt = rng.nextInt(4).toLong
      ids($"k" > kGt) shouldBe truth.filter(_._3.exists(_ > kGt)).map(_._1).sorted.toArray

      val inVals = Seq.fill(2)(pool(rng.nextInt(pool.length))).filter(_ != null)
      if (inVals.nonEmpty)
        ids($"p".isin(inVals: _*)) shouldBe
          truth.filter(t => inVals.contains(t._2)).map(_._1).sorted.toArray

      // mixed partition + record-level conjunction
      val vCut = rng.nextInt(100).toLong
      ids($"p" === eqVal && $"v" < vCut) shouldBe
        truth.filter(t => t._2 == eqVal && t._4 < vCut).map(_._1).sorted.toArray

      // grouped count over both partition columns matches ground truth
      val gc = df.groupBy($"p", $"k").agg(count(lit(1)).as("n")).collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getLong(1)) -> r.getLong(2)).toMap
      val gcTruth = truth.groupBy(t => (t._2, t._3.map(Long.box).orNull))
        .map { case (key, ts) => key -> ts.size.toLong }
      gc shouldBe gcTruth
    }
  }
}
