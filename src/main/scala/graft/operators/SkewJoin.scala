package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join: the skew workhorse for keys too hot for a plain
  * hash-shuffle join (one reducer drowns while the rest idle) yet a build
  * side too large to broadcast outright.
  *
  * Shape: every probe-side row gets a deterministic salt in [0, salts) from
  * a secondary column's hash; the build side is replicated once per salt
  * value. The join key becomes (key, salt), so a heavy hitter's rows spread
  * over `salts` reducers. Cost: build side × salts rows through the shuffle
  * — pick `salts` ≈ (hottest key volume) / (target partition volume).
  *
  * The result is row-identical to the plain inner equi-join (salting touches
  * only data placement), which is exactly what the oracle checks. AQE's
  * skew-join split handles moderate skew automatically at runtime; explicit
  * salting remains the tool when a single key exceeds what one task should
  * ever hold, or when AQE is unavailable (streaming state, non-AQE plans).
  *
  * Broadcast interplay: if Catalyst decides the REPLICATED build side still
  * fits the broadcast threshold, it will broadcast it — and then the salt is
  * pure overhead (a broadcast join has no shuffle to skew; every executor
  * sees all build rows anyway). This operator is for the case where the
  * build side does NOT broadcast; callers who want to be certain the salted
  * shuffle shape is exercised should size the build side past
  * `spark.sql.autoBroadcastJoinThreshold` or disable auto-broadcast.
  */
object SkewJoin {

  /** @param saltBy probe-side column whose hash spreads the hot key's rows —
    *   any column with per-row variety (a row id, a timestamp); constant
    *   saltBy values degrade gracefully to the unsalted plan. */
  def saltedInnerJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      saltBy: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    // The helper column's name must not capture an input column: a probe or
    // build side that already has `_salt` would silently corrupt the join
    // condition. Pick a suffixed name that appears in neither schema.
    val salt = Iterator.from(0).map(i => s"_graft_salt$i")
      .find(n => !probe.columns.exists(_.equalsIgnoreCase(n)) &&
        !build.columns.exists(_.equalsIgnoreCase(n))).get
    val saltedProbe = probe.withColumn(salt, pmod(xxhash64(col(saltBy)), lit(salts)))
    val replicatedBuild = build.withColumn(salt, explode(array((0 until salts).map(lit): _*)))
    saltedProbe.join(replicatedBuild, Seq(key, salt)).drop(salt)
  }
}
