package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exact heavy hitters at scale: a SpaceSaving candidate sketch followed
  * by an exact verification pass.
  *
  * The classic two-pass design (Metwally et al. 2005 "Efficient
  * computation of frequent and top-k elements in data streams"; Agarwal
  * et al. 2012 on summary mergeability): pass 1 runs a per-partition
  * SpaceSaving(capacity) summary inside `mapPartitions` — O(capacity)
  * state per task, no shuffle — and unions the candidate items. The
  * omission bound makes the union a GUARANTEED superset: an item absent
  * from a partition's summary has partition count ≤ n_p/capacity, so an
  * item absent from every summary has total count ≤ Σ n_p/capacity =
  * N/capacity. With capacity > k, every item with true count > N/k is a
  * candidate — no balance assumption on partitions, no merge heuristics.
  * Pass 2 joins the corpus against the tiny candidate set (broadcast) and
  * counts EXACTLY, so the output is precise: the sketch only prunes.
  *
  * At 100 TB: pass-1 state is capacity entries per task; the candidate
  * table is ≤ capacity·partitions rows (a few hundred thousand at 1000
  * executors — broadcastable by construction); pass 2 is one map-side
  * semi-join plus one skinny aggregation over candidate rows only. The
  * corpus is read twice and shuffled at most once, on candidate keys.
  */
object HeavyHitters {

  /** Per-partition SpaceSaving summary keys (spec-facing wrapper). */
  private[operators] def spaceSavingPartition(
      items: Iterator[String], capacity: Int): Iterator[String] =
    spaceSavingCounts(items, capacity).map(_._1)

  /** Per-partition SpaceSaving summary: the ≤ capacity tracked items WITH
    * their tracked counts. The SpaceSaving invariant Σ tracked counts =
    * items-seen lets one sketch pass carry the corpus total alongside the
    * candidate set. Counts only ever grow, so the min-tracking priority
    * queue can use lazy deletion: stale entries are skipped when popped. */
  private[operators] def spaceSavingCounts(
      items: Iterator[String], capacity: Int): Iterator[(String, Long)] = {
    require(capacity > 0, s"capacity must be > 0, got $capacity")
    val counts = mutable.HashMap.empty[String, Long]
    // (count, item) min-heap with lazy deletion: an entry is live iff its
    // count equals the item's current count.
    val pq = mutable.PriorityQueue.empty[(Long, String)](
      Ordering.by[(Long, String), Long](_._1).reverse)
    def enqueue(c: Long, w: String): Unit = {
      // Stale entries would otherwise accumulate O(stream); rebuilding at
      // 8× capacity keeps the heap O(capacity) at amortized O(1) cost.
      if (pq.size >= 8 * capacity) {
        pq.clear()
        counts.foreach { case (item, n) => pq.enqueue((n, item)) }
      }
      pq.enqueue((c, w))
    }
    items.foreach { w =>
      counts.get(w) match {
        case Some(c) =>
          counts.update(w, c + 1)
          enqueue(c + 1, w)
        case None if counts.size < capacity =>
          counts.update(w, 1L)
          enqueue(1L, w)
        case None =>
          // Evict the true minimum (skip stale heap entries first).
          var top = pq.dequeue()
          while (counts.getOrElse(top._2, -1L) != top._1) top = pq.dequeue()
          val (minCount, evicted) = top
          counts.remove(evicted)
          counts.update(w, minCount + 1)
          enqueue(minCount + 1, w)
      }
    }
    counts.iterator
  }

  /** Pass 1: the unioned candidate set (distinct items). */
  def candidates(words: Dataset[String], capacity: Int): DataFrame = {
    import words.sparkSession.implicits._
    words.mapPartitions(it => spaceSavingPartition(it, capacity))
      .toDF("token").distinct()
  }

  /** Exact heavy hitters: items whose exact count strictly exceeds
    * total/k (integer-exact via `count * k > total`). `capacity` must
    * exceed `k` for the superset guarantee; 4·k leaves slack.
    *
    * One sketch pass serves double duty: the per-candidate tracked counts
    * sum (per partition) to the partition's item count, so the corpus
    * total is Σ over the aggregated sketch rows — no separate
    * `words.count()` scan. The sketch aggregate is collected driver-side;
    * that is the same ≤ capacity·partitions bound the candidate BROADCAST
    * already commits to, so nothing new is assumed about driver memory.
    * Corpus scans: exactly two (sketch, verification), as designed. */
  def exact(words: Dataset[String], k: Int, capacity: Int): DataFrame = {
    require(capacity > k, s"capacity ($capacity) must exceed k ($k) for the omission bound")
    import words.sparkSession.implicits._
    val sketch = words
      .mapPartitions(it => spaceSavingCounts(it, capacity))
      .toDF("token", "cnt")
      .groupBy($"token").agg(sum($"cnt").as("cnt"))
      .collect()
    val total = sketch.map(_.getLong(1)).sum
    val spark = words.sparkSession
    val cand = spark.createDataset(sketch.map(_.getString(0)).toIndexedSeq)(
      org.apache.spark.sql.Encoders.STRING).toDF("token")
    words.toDF("token")
      .join(broadcast(cand), Seq("token"), "left_semi")
      .groupBy($"token")
      .agg(count(lit(1)).as("n_occ"))
      .filter($"n_occ" * k > total)
      .orderBy($"n_occ".desc, $"token")
  }
}
