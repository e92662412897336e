package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving candidate generation as a native `TypedImperativeAggregate`
  * — the grouped twin of [[graft.operators.HeavyHitters]]: usable directly
  * under `groupBy(...)`, so "heavy hitters PER GROUP" costs one aggregation
  * with O(capacity) state per (group, partial) instead of a full per-group
  * count table through the shuffle.
  *
  * Guarantee (the q164 argument, per group): each partial buffer's absent
  * item has slice count ≤ n_slice/capacity; `merge` SUMS buffers without
  * trimming, so the merged key set is a superset of every partial's tracked
  * set and an item absent from the FINAL buffer has group count ≤
  * Σ n_slice/capacity = n_group/capacity. With capacity > k, every item
  * with count > n_group/k survives — the exact verification pass the lane
  * runs downstream can then only confirm, never miss. Merged buffers grow
  * to at most capacity · numPartials keys (the same bound the q164
  * candidate union carries).
  *
  * This is the one Catalyst aggregation surface the repo's other custom
  * aggregates don't exercise: `Aggregator` (ExactMedian/TopKByScore) rides
  * Spark's typed-object path, while TypedImperativeAggregate manages its
  * own serialized buffer inside the UnsafeRow agg machinery — partial
  * aggregation, merge, and spill all flow through `serialize`/`deserialize`.
  */
case class SpaceSavingCandidates(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be > 0, got $capacity")

  // analysis-time type gate: without it a non-string child passes analysis
  // and dies mid-job with a ClassCastException deep in the agg executor
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"space_saving_candidates requires a string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      b: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      b.get(w) match {
        case Some(c) => b.update(w, c + 1)
        case None if b.size < capacity => b.update(w, 1L)
        case None =>
          // evict the minimum-count item (deterministic tie to smallest key);
          // linear scan is fine — capacity is small by contract, and this
          // path only runs once the buffer is full
          var minW: String = null
          var minC = Long.MaxValue
          b.foreach { case (k, c) =>
            if (c < minC || (c == minC && (minW == null || k < minW))) { minC = c; minW = k }
          }
          b.remove(minW)
          b.update(w, minC + 1)
      }
    }
    b
  }

  override def merge(
      b: mutable.HashMap[String, Long],
      o: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    o.foreach { case (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    b
  }

  /** Sorted (token, cnt) struct array. The candidate SET is the contract
    * (superset of true heavy hitters; exact verify downstream); the counts
    * make the aggregate self-sufficient — Σ cnt over a group's array is
    * the group's item count (the SpaceSaving invariant survives the
    * sum-merge), so callers derive group totals from the sketch output
    * instead of a second corpus scan (the q164 lesson, grouped). */
  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      b.toArray.sortBy(_._1).map { case (k, c) =>
        InternalRow(UTF8String.fromString(k), c): Any
      })

  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    b.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      b.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    b
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingCandidates =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingCandidates =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingCandidates =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "space_saving_candidates"
}

object SpaceSavingCandidates {
  /** Column-API entry: `groupBy(g).agg(candidates($"token", 128))`. */
  def candidates(c: Column, capacity: Int): Column =
    ColumnBridge.column(
      SpaceSavingCandidates(ColumnBridge.expression(c), capacity).toAggregateExpression())
}
