package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join: logical node + planner strategy + physical
  * merge — the level-(c) rung of the custom-operator ladder (compose >
  * expression > custom plan), used where the composed form pays real
  * overhead. [[graft.operators.AsOfJoin.asOf]]'s union+window plan is the
  * portable scale path, but it widens every row to the UNION schema
  * (left columns + right struct, nulled on the other side), sorts the
  * combined (|L|+|R|)-row stream at full combined width inside WindowExec,
  * and buffers window frames. This operator instead asks Catalyst for the
  * textbook physical shape: each side hash-clustered on its OWN key and
  * sorted (key, ts) at its OWN width, then a single streaming merge pass
  * per partition carrying one buffered right row — no union widening, no
  * window frame state, no struct boxing. Same exchange count (one per
  * side), strictly less sort volume and memory.
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]], same
  * convention as DuckDB/QuestDB ASOF JOIN): for every left row, the latest
  * right row with `right.ts <= left.ts` in the same key; NULL keys and
  * NULL timestamps never match; every left row survives (left-outer).
  * Ties on right (key, ts) resolve to the right side's sort order — feed a
  * tie-free right side (one row per (key, ts)) for engine-independent
  * results, as any as-of formulation requires.
  */
case class AsOfMergeJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfMergeJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: one logical node, one physical form. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`) — the public extension hook,
  * mirroring how the optimizer rule and SQL functions are registered. */
object AsOfMergeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfMergeJoinNode(l, r, lk, rk, lts, rts, rv) =>
      AsOfMergeJoinExec(lk, rk, lts, rts, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming merge. Declares the classic sort-merge contract
  * (ClusteredDistribution per child + (key, ts) child ordering) so
  * EnsureRequirements plants the exchanges/sorts — and ELIDES them when a
  * child is already partitioned/sorted right (e.g. a bucketed or
  * storage-partitioned scan), which is exactly the reuse the union+window
  * form can never express. Output keeps the left child's partitioning and
  * (key, ts) ordering, so a downstream per-key operation re-uses both.
  */
case class AsOfMergeJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightValues.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val rk = rightKey; val lts = leftTs; val rts = rightTs
    val rv = rightValues
    val keyType = leftKey.dataType
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), lOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rOut)
      val lTsProj = UnsafeProjection.create(Seq(lts), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rts), rOut)
      val rValProj = UnsafeProjection.create(rv, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullMatch = new GenericInternalRow(rv.length)
      val joined = new JoinedRow
      // downstream operators require UnsafeRow (SparkPlan.getByteArrayRdd
      // casts) — flatten the JoinedRow like SortMergeJoinExec's resultProj.
      // Bind against `output` (carried attrs forced nullable), NOT `rv`: a
      // non-nullable right attribute would codegen a null-check-free read
      // and turn the no-match NULL into 0/0.0.
      val outAttrs = lOut ++ rv.map(_.withNullability(true))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      // one-row lookahead over the right side. rKeyProj/rTsProj reuse ONE
      // output buffer across calls, which is fine here: the loop only ever
      // reads the CURRENT right row's projections, and the one reference
      // that must outlive an advance (matchKey) is copied at the match site
      // — copy-on-match instead of two UnsafeRow copies per right row
      var rRow: InternalRow = null
      var rKeyRow: UnsafeRow = null
      var rTsRow: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKeyRow = rKeyProj(rRow)
          rTsRow = rTsProj(rRow)
        } else { rRow = null; rKeyRow = null; rTsRow = null }
      advanceRight()

      // latest qualifying right row seen so far (its key + carried values)
      var matchKey: UnsafeRow = null
      var matchVals: UnsafeRow = null

      lIter.map { lRow =>
        val lKeyRow = lKeyProj(lRow)
        if (lKeyRow.anyNull) {
          resultProj(joined(lRow, nullMatch)) // NULL keys never match (SQL equality)
        } else {
          val lTsRow = lTsProj(lRow)
          var continue = rRow != null
          while (continue) {
            if (rKeyRow.anyNull) {
              advanceRight(); continue = rRow != null // NULL-keyed right rows match nothing
            } else {
              val kc = keyOrd.compare(rKeyRow, lKeyRow)
              if (kc < 0) {
                advanceRight(); continue = rRow != null // right row's key already passed
              } else if (kc == 0 && rTsRow.isNullAt(0)) {
                // NULL-ts right rows match NOTHING (r.ts <= l.ts is never
                // true for NULL) and sort FIRST in the key group — skip, or
                // they'd stall the scan and mask every later match
                advanceRight(); continue = rRow != null
              } else if (kc == 0 && !lTsRow.isNullAt(0) &&
                  tsOrd.compare(rTsRow, lTsRow) <= 0) {
                matchKey = rKeyRow.copy() // survives the next advance (shared proj buffer)
                matchVals = rValProj(rRow).copy()
                advanceRight(); continue = rRow != null
              } else continue = false // right side is ahead of this left row
            }
          }
          val hasMatch = matchKey != null && keyOrd.compare(matchKey, lKeyRow) == 0
          resultProj(joined(lRow, if (hasMatch) matchVals else nullMatch))
        }
      }
    }
  }
}
