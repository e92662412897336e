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
  * Two lanes racing for the same artifact still get exactly one training
  * run: the map holds a per-key future claimed with `putIfAbsent`, the
  * claiming thread runs `compute` OUTSIDE any map lock (a
  * `computeIfAbsent` compute would hold the bin lock for the whole Spark
  * training job, stalling unrelated keys in the same bin and deadlocking
  * on re-entry), and losers block on the winner's future. A failed compute
  * removes its future before propagating, so a LATER call retries instead
  * of replaying the failure; waiters already blocked on the failed future
  * DO observe that failure (they cannot retry — the winner's attempt was
  * the attempt they joined), rethrown with the winner's original exception
  * (the `CompletionException` wrapper `join` adds is unwrapped so winner
  * and waiters see the same type).
  */
object ArtifactStore {
  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (String, String), java.util.concurrent.CompletableFuture[AnyRef]]()

  /** Keys THIS thread is currently computing — a same-key re-entrant
    * `cached` call would otherwise join its own incomplete future and hang
    * forever; a loud error beats a silent deadlock. (Different-key
    * re-entry is fine: no lock is held during compute.) */
  private val inFlight = ThreadLocal.withInitial(
    () => new java.util.HashSet[(String, String)]())

  /** The artifact for (kind, dir), computing (and caching) it on first
    * use. `compute` must be deterministic and bounded (see object doc). */
  def cached[T <: AnyRef](kind: String, dir: String)(compute: => T): T = {
    val key = (kind, dir)
    val mine = new java.util.concurrent.CompletableFuture[AnyRef]()
    val prior = memo.putIfAbsent(key, mine)
    if (prior ne null) {
      require(!inFlight.get().contains(key),
        s"ArtifactStore: re-entrant compute of $key from inside its own " +
          "trainer — this would deadlock on the key's own future")
      try prior.join().asInstanceOf[T]
      catch {
        // rethrow the winner's ORIGINAL exception: join wraps it in
        // CompletionException, which would make waiters see a different
        // type than the thread whose compute actually failed
        case e: java.util.concurrent.CompletionException if e.getCause ne null =>
          throw e.getCause
      }
    } else {
      inFlight.get().add(key)
      val v =
        try compute
        catch {
          case e: Throwable =>
            memo.remove(key, mine)
            mine.completeExceptionally(e)
            throw e
        }
        finally inFlight.get().remove(key)
      mine.complete(v)
      v
    }
  }

  /** Test hook: drop every cached artifact (e.g. to measure a cold run). */
  private[graft] def clear(): Unit = memo.clear()

  /** Test/bench hook: the artifact kinds currently memoized. Bench uses it
    * to assert its registered trainer list covers every `cached` site a
    * lane sweep exercises — an unregistered artifact would otherwise hide
    * its cold training cost inside the first consumer lane's rep 1 (and
    * the median would then discard it from the record entirely). */
  private[graft] def keys(): Set[(String, String)] = {
    import scala.jdk.CollectionConverters._
    memo.keySet().asScala.toSet
  }
}
