package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Micro-benchmark: union+window as-of vs the physical merge exec on
  * IDENTICAL inputs (the q32-vs-q135 lane timings are not comparable — the
  * q135 lane folds a dedup aggregation into its right side). Synthetic
  * (key, ts) data sized well past the events table so the asymptotic shapes
  * separate: the window form sorts |L|+|R| rows at combined width inside
  * WindowExec; the merge form sorts each side at its own width and streams.
  *
  * Usage: sbt "runMain graft.tools.AsOfBench [nLeft] [nRight] [nKeys] [iters]"
  */
object AsOfBench {
  def main(args: Array[String]): Unit = {
    val nLeft = args.lift(0).map(_.toLong).getOrElse(2000000L)
    val nRight = args.lift(1).map(_.toLong).getOrElse(2000000L)
    val nKeys = args.lift(2).map(_.toLong).getOrElse(10000L)
    val iters = args.lift(3).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic sides; extra payload columns make the
    // union-widening cost visible (real tables are never two columns)
    def side(n: Long, salt: Long) = spark.range(n).select(
      (pmod(col("id") * 2654435761L + salt, lit(nKeys))).as("k"),
      (pmod(col("id") * 40503L + salt * 7, lit(1000000L))).as("t"),
      (col("id") % 1000).cast("double").as("v"),
      concat(lit("payload-"), col("id")).as("s1"),
      (col("id") * 3 % 997).as("s2"))
    // tie-free right: one row per (k, t)
    val left = side(nLeft, 11).cache()
    val right = side(nRight, 977).groupBy("k", "t")
      .agg(max("v").as("v"), max("s1").as("s1"), max("s2").as("s2")).cache()
    left.count(); right.count()

    // Force FULL evaluation: a bare count() lets ColumnPruning delete the
    // window/carried-value computation from the declarative form (the
    // physical exec is opaque and gets no such discount) — hash every
    // column into the aggregate so both forms do all their work.
    def consume(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).collect().head.getLong(0) // xor: no ANSI overflow

    def time(tag: String)(f: => Long): Unit = {
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); val n = f; val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      val med = times.map(_._1).sorted.apply(iters / 2)
      println(f"ASOFBENCH $tag: median=${med}%.2fs runs=${times.map(t => f"${t._1}%.2f").mkString(",")} rows=${times.head._2}")
    }

    time("union_window")(consume(AsOfJoin.asOf(left, right, "k", "t", Seq("v", "s1", "s2"))))
    time("physical_merge")(consume(AsOfJoin.asOfMerge(left, right, "k", "t", Seq("v", "s1", "s2"))))
    spark.stop()
  }
}
