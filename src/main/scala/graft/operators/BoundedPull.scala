package graft.operators

import org.apache.spark.sql.DataFrame

/** The bounded-pull idiom, shared: materialize a PROVABLY-SMALL
  * intermediate as a local relation so every downstream consumer reads the
  * computed rows instead of re-running the producing subtree.
  *
  * Why this exists (measured, twice): a lazy intermediate that several
  * derived aggregates branch from is re-evaluated once PER CONSUMER —
  * q206's |langs|²-row confusion table left lazy re-ran the corpus langId
  * scan three times (31 s vs 1.9 s at sf1), and the power-iteration
  * deflation loop's d-row direction re-derived every prior round's subtree
  * per reference (combinatorial plan growth by round 3). The cure is ONE
  * bounded driver pull that cuts the lineage: values unchanged, the local
  * relation broadcasts/joins exactly like the lazy frame did.
  *
  * The bound is enforced, not trusted: the pull collects `maxRows + 1` at
  * most (so a broken caller cannot OOM the driver) and fails loudly if the
  * frame exceeds its asserted bound — an intermediate that outgrew its
  * scale argument must surface as an error, never as a silent driver-side
  * materialization of corpus-sized data. Callers therefore pass the bound
  * their own scale argument guarantees (|langs|², d, k×dim, …).
  */
object BoundedPull {

  /** `df` as a local relation, failing loudly beyond `maxRows`. `what`
    * names the intermediate in the failure message. */
  def apply(df: DataFrame, maxRows: Int, what: String): DataFrame =
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows(df, maxRows, what): _*), df.schema)

  /** The raw bounded pull: the collected rows under the same loud bound,
    * for callers that continue with DRIVER-side arithmetic over the small
    * frame instead of building further local-relation plans (each such
    * plan costs an analysis+codegen cycle that dwarfs its d-row compute —
    * the r19 VectorOps profiling receipt). */
  def rows(df: DataFrame, maxRows: Int, what: String): Array[org.apache.spark.sql.Row] = {
    require(maxRows >= 1, s"boundedPull($what): maxRows must be >= 1, got $maxRows")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"boundedPull($what): more than $maxRows rows — this intermediate was " +
        "asserted bounded, so either the bound or the producing plan is wrong")
    rows
  }
}
