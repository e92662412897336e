package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal data: derive an sf1-shaped dataset from sf0.1 by
  * replicating each fact table `factor`× with per-replica KEY OFFSETS so
  * every foreign-key relationship (orders→customer, lineitem→orders/part/
  * supplier) survives and key cardinalities scale with the data. Dimension
  * tables (region, nation) keep their reference cardinality, exactly as
  * TPC-H scaling does.
  *
  * Purpose: BENCH-ONLY empirical superlinearity hunting (VERDICT r8 #5) —
  * the per-lane sf1/sf0.1 ratio exposes any lane whose cost grows faster
  * than the data (candidate-pair quadratics, accidental broadcasts of
  * scaled tables). NOT correctness inputs: the DuckDB oracles keep running
  * on the driver-generated sf dirs only.
  *
  * Derivation choices that keep the ratios honest:
  *  - `documents.text`: replica r>0 gets every TOKEN injectively renamed
  *    (prefix `r<r>·`). Naive replication leaves cross-replica texts ~97%
  *    gram-identical, so every doc gains ~`factor` GENUINE near-dup
  *    partners and all pair counts grow ~factor² — a data artifact that
  *    buries real plan superlinearity (the first rehearsal measured q52/
  *    q54 at 28–68× from exactly this). Token renaming keeps every
  *    within-replica statistic (token counts, Zipf shape, dup clusters,
  *    gram-set sizes) IDENTICAL while making cross-replica gram sets
  *    disjoint — dup density per doc stays constant as the corpus grows,
  *    which is what a real 10× crawl looks like.
  *  - `embeddings.embedding`: replica r>0 gets a deterministic per-replica
  *    SIGN-FLIP pattern (an orthogonal transform) — norms and all
  *    within-replica distances/cosines are preserved exactly; replicating
  *    vectors verbatim would make every vector have `factor` exact
  *    cosine-1 copies (same artifact as above, measured 68× on q64).
  *  - `events.ts` is jittered by the replica index in MICROSECONDS: all
  *    session/window structure at human timescales is preserved and
  *    per-replica orderings stay deterministic.
  *  - Each output table is ONE file named `{table}.parquet` — the same
  *    layout the driver generates, which the streaming lanes' exact-name
  *    glob (`pathGlobFilter=events.parquet`) depends on.
  *
  * Usage: sbt "runMain graft.tools.ScaleUp <srcDir> <outDir> [factor]"
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(out))

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    /** Write as ONE file named {t}.parquet (driver testdata layout). */
    def write(df: DataFrame, t: String): Unit = {
      val staging = s"$out/.staging_$t"
      df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging)
      val part = Files.list(Paths.get(staging)).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $t"))
      Files.deleteIfExists(Paths.get(s"$out/$t.parquet"))
      Files.move(part, Paths.get(s"$out/$t.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(staging))
      println(s"SCALEUP $t -> $out/$t.parquet")
    }
    /** Union of `factor` replicas, each transformed with its replica index. */
    def replicate(t: String)(f: (DataFrame, Int) => DataFrame): DataFrame = {
      val base = read(t)
      (0 until factor).map(r => f(base, r)).reduce(_ unionAll _)
    }
    /** Offset for replica r of a key column whose max in the source is m. */
    def off(m: Long, r: Int): Long = (m + 1) * r

    // max keys (driver scalars over the source tables — bounded pulls)
    val maxDoc = read("documents").agg(max("doc_id")).head.getLong(0)
    val maxVec = read("embeddings").agg(max("vec_id")).head.getLong(0)
    val maxEvent = read("events").agg(max("event_id")).head.getLong(0)
    val maxUser = read("events").agg(max("user_id")).head.getLong(0)
    val maxOrder = read("orders").agg(max("o_orderkey")).head.getLong(0)
    val maxCust = read("customer").agg(max("c_custkey")).head.getLong(0)
    val maxSupp = read("supplier").agg(max("s_suppkey")).head.getLong(0)
    val maxPart = read("part").agg(max("p_partkey")).head.getLong(0)

    // injective per-replica token renaming (see scaladoc)
    val renameTokens = udf { (text: String, r: Int) =>
      if (text == null || r == 0) text
      else text.split("\\s+", -1).map(t => if (t.isEmpty) t else s"r${r}x$t").mkString(" ")
    }
    // deterministic orthogonal sign-flip per (replica, dimension)
    val signFlip = udf { (v: Seq[Float], r: Int) =>
      if (v == null || r == 0) v
      else v.zipWithIndex.map { case (x, i) =>
        val h = graft.functions.Hashing.mix64(0x9E3779B97F4A7C15L * (i + 1), r)
        if ((h & 1L) == 0L) x else -x
      }
    }

    write(replicate("documents") { (df, r) =>
      df.select(
        (col("doc_id") + off(maxDoc, r)).as("doc_id"),
        renameTokens(col("text"), lit(r)).as("text"),
        col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    write(replicate("embeddings") { (df, r) =>
      df.select((col("vec_id") + off(maxVec, r)).as("vec_id"),
        signFlip(col("embedding"), lit(r)).as("embedding"), col("label"))
    }, "embeddings")

    write(replicate("events") { (df, r) =>
      df.select(
        (col("event_id") + off(maxEvent, r)).as("event_id"),
        (col("ts") + expr(s"INTERVAL '$r' MICROSECOND")).as("ts"),
        (col("user_id") + off(maxUser, r)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }, "events")

    write(replicate("lineitem") { (df, r) =>
      df.select(
        (col("l_orderkey") + off(maxOrder, r)).as("l_orderkey"),
        (col("l_partkey") + off(maxPart, r)).as("l_partkey"),
        (col("l_suppkey") + off(maxSupp, r)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
    }, "lineitem")

    write(replicate("orders") { (df, r) =>
      df.select(
        (col("o_orderkey") + off(maxOrder, r)).as("o_orderkey"),
        (col("o_custkey") + off(maxCust, r)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }, "orders")

    write(replicate("customer") { (df, r) =>
      df.select(
        (col("c_custkey") + off(maxCust, r)).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }, "customer")

    write(replicate("supplier") { (df, r) =>
      df.select(
        (col("s_suppkey") + off(maxSupp, r)).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal"))
    }, "supplier")

    write(replicate("part") { (df, r) =>
      df.select(
        (col("p_partkey") + off(maxPart, r)).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice"))
    }, "part")

    // dimensions: reference cardinality, copied as-is
    write(read("region"), "region")
    write(read("nation"), "nation")

    spark.stop()
  }
}
