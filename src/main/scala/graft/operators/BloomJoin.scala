package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Bloom, Hashing}

/** Runtime Bloom-filter join reduction — the semi-join IO cut for the
  * canonical big-probe/small-build join at 100 TB:
  *
  *   1. build, relationally: key → k bit positions (mix64 family, one
  *      narrow shuffle of ≤ mBits set-bit rows) → `bit_or` per 64-bit word;
  *   2. collect the bounded word array to the driver (mBits/8 bytes — 2^20
  *      bits is 128 KiB; same bounded-collect pattern as the IVF centroids,
  *      and as Spark's own InjectRuntimeFilter bloom), and
  *   3. probe: a codegen'd bit-test INSIDE the big side's scan span, before
  *      the join's shuffle — rows that cannot match never leave the scan
  *      stage, so shuffle volume drops by the join's selectivity.
  *
  * No false negatives by construction (every build-key bit is set), so
  * `prefilter → join` is plan-for-plan result-identical to the bare join —
  * which is exactly what the q67 DuckDB oracle asserts. False positives only
  * cost wasted shuffle rows; size mBits ≈ 10–16 bits/key for ~1% fp. */
object BloomJoin {

  /** The NON-EMPTY (w, word) rows of the filter as a DataFrame — the
    * relational build, exposed so the construction itself is
    * oracle-checkable (q98) and reusable for a distributed (join-based)
    * probe should the word array ever outgrow the driver. */
  def wordRows(keys: DataFrame, baseHash: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits >= 64 && (mBits & 63) == 0, s"mBits must be a positive multiple of 64, got $mBits")
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    val positions = array((0 until k).map { j =>
      pmod(Hashing.mix64At(baseHash, lit(j)), lit(mBits.toLong))
    }: _*)
    // NULL keys set no bits (a NULL never equi-joins, so nothing to admit);
    // without the filter the null bucket row would NPE the collect below.
    keys.filter(baseHash.isNotNull).select(explode(positions).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        expr("shiftleft(1L, cast(pos % 64 AS int))").as("bit"))
      .groupBy(col("w")).agg(expr("bit_or(bit)").as("word"))
  }

  /** Word array of an mBits-bit, k-hash Bloom filter over `baseHash`
    * (the raw long key, or hash64 of a string key — the probe side must use
    * the same base). */
  def buildFilter(keys: DataFrame, baseHash: Column, mBits: Int, k: Int): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    wordRows(keys, baseHash, mBits, k)
      .collect()
      .foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** The scan-side prefilter: keep rows whose base hash might be a member.
    * NULL-hash rows are dropped (the probe evaluates to NULL), which is
    * result-identical for the equi-join this guards — a NULL key never
    * matches — but makes the helper inner/semi-join specific: do not use it
    * in front of an outer join that must keep the null-keyed rows. */
  def prefilter(df: DataFrame, baseHash: Column, words: Array[Long], mBits: Int, k: Int): DataFrame =
    df.filter(Bloom.mightContainCol(baseHash, words, mBits, k))
}
