package graft.operators

/** Process-local train-once memo for small trained artifacts (weight
  * tables, merge lists, centroids).
  *
  * The driver contract requires every lane to be STANDALONE — no lane may
  * assume another ran first — which forces each evaluation lane
  * (q182/q199/q202/q205) to be able to produce the trained classifier
  * itself. A deployed pipeline trains ONCE and feeds every consumer; this
  * memo recovers that shape without breaking lane independence: the first
  * lane to need an artifact computes it, the rest replay the cached value,
  * and any lane still computes it correctly when run alone in a fresh
  * process.
  *
  * Safety constraints (why a plain ConcurrentHashMap is sound here):
  *  - keys include the scale dir, so two SFs in one process never collide;
  *  - every cached artifact is DETERMINISTIC given (key, input dir) — all
  *    trainers in this repo are (fixed seeds via mix64, fixed round
  *    counts, rounded arithmetic) — so a replay is value-identical to a
  *    retrain;
  *  - only BOUNDED artifacts belong here (weight tables ≤ buckets+1 rows,
  *    BPE merges ≤ maxMerges, centroids k×dim) — never anything
  *    corpus-sized; callers collect before caching;
  *  - testdata dirs are immutable during a process's lifetime (the driver
  *    regenerates them only between runs), so no invalidation is needed.
  *
  * `computeIfAbsent` also guarantees one training run even if two lanes
  * race for the same artifact from different threads.
  */
object ArtifactStore {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(String, String), AnyRef]()

  /** The artifact for (kind, dir), computing (and caching) it on first
    * use. `compute` must be deterministic and bounded (see object doc). */
  def cached[T <: AnyRef](kind: String, dir: String)(compute: => T): T =
    memo.computeIfAbsent((kind, dir), _ => compute).asInstanceOf[T]

  /** Test hook: drop every cached artifact (e.g. to measure a cold run). */
  private[graft] def clear(): Unit = memo.clear()
}
