package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

/** Object-store-safe generation pointer: the [[GenerationalIndex]]
  * exactly-once contract (append deltas, compact-while-appends-race, readers
  * always see every row exactly once) rebuilt on the ONLY primitives every
  * store gives — PUT of a new unique key, LIST, GET. No create-exclusive, no
  * rename-without-replace, no conditional-put: safe on S3-style object
  * storage, where a 100 TB serving index actually lives and where
  * [[GenerationalIndex.tryCommit]]'s link/rename publish has no analog.
  *
  * Instead of ONE mutable pointer decided by a claim race, the pointer is a
  * COMMIT LOG: every writer appends an immutable, uniquely-named entry
  * (`log-<seq>-<uuid>.json`, the uuid making PUT collision-free by
  * construction), and every reader folds the sorted log deterministically —
  * all readers resolve the same live set because they run the same fold over
  * the same total order (seq, then uuid):
  *
  *  - `append D`:  live :+ D       (applied iff D was never appended
  *                                  before — appends of distinct deltas
  *                                  commute, client-retry duplicates are
  *                                  inert even when they land after a
  *                                  compaction folded D)
  *  - `compact folded → B`: applied ONLY when `folded ⊆ live`; otherwise the
  *                          entry is inert (a compactor that lost a
  *                          compact-vs-compact race folded dirs that are no
  *                          longer live — its base holds the same rows as
  *                          the winner's, so dropping it loses nothing).
  *  - `checkpoint`: a pure SNAPSHOT of the fold state (live set +
  *                  ever-appended set) under its own name pattern
  *                  (`ckpt-<seq>-<uuid>.json`), never a state transition —
  *                  folds resume from the newest one instead of GETting
  *                  every entry ever written ([[checkpoint]]).
  *
  * Why the fold is exactly-once under every race the CAS design handles:
  *  - compact-vs-append: a compactor only folds dirs it LISTED, and every
  *    listed entry has seq ≤ its snapshot's max, so the compact entry
  *    (seq = snapshot.max + 1) sorts after everything it folds. A delta
  *    landing after the snapshot is not in `folded`, so whichever side of
  *    the compact entry it sorts on, the fold keeps it live. Nothing is
  *    both folded and kept; nothing is dropped.
  *  - compact-vs-compact over the same snapshot: both entries carry the same
  *    `folded`; the first in fold order applies, after which `folded` is no
  *    longer a subset of the live set, so the second is inert.
  *  - torn reads: an entry is visible-with-full-content or skipped —
  *    object-store PUT is all-or-nothing, and on filesystems a reader that
  *    catches a half-written entry reads its bytes fine but fails the JSON
  *    parse and skips it, which is indistinguishable from reading a moment
  *    earlier. A skipped-this-read APPEND is seen by the next read; a
  *    compactor that didn't see it doesn't fold it — safe, per the
  *    compact-vs-append argument. That argument covers PARSE failures only:
  *    an IO failure opening or reading an already-committed entry is NOT a
  *    torn write (earlier reads may have folded it), and skipping it would
  *    return a live set silently missing that delta's rows — and inert any
  *    applied compaction that folded it. IO failures are therefore retried
  *    bounded and then FAIL THE FOLD LOUDLY ([[readEntryBytes]]).
  *
  * The requirements on the store, stated honestly: PUT of a distinct new key
  * never overwrites another writer's object, and LIST-after-PUT is
  * read-after-write consistent (true of S3 since 2020, GCS, Azure, HDFS and
  * POSIX). Entry timestamps and clocks are never consulted for ORDERING —
  * ordering is entirely (seq, uuid), and seq needs no coordination beyond
  * "past my own snapshot". ([[sweepInertBases]] consults entry AGE, never
  * order — see its note.)
  *
  * Arbitrary writer LATENESS (a stalled writer's entry landing after
  * higher-seq entries exist, retro-inserting into the fold order) is safe
  * for ROWS but not for pointer identity: a late compact can apply at its
  * sort position and flip a previously-applied compact to inert (both
  * bases hold the same folded rows, so the row multiset is unchanged —
  * the subset rule is all-or-nothing), and a late duplicate APPEND is kept
  * inert by the ever-appended guard in [[read]]. Consequence: an entry's
  * applied/inert status is NOT final while writers may still be stalled, so
  * both maintenance operations are gated on a STALENESS HORIZON H — the
  * deployment's bound on a writer's snapshot-to-PUT window:
  *  - [[checkpoint]] assumes every entry with seq ≤ its snapshot max has
  *    already landed (folds resume from the snapshot, so a sub-horizon
  *    retro-insert would be invisible to them);
  *  - [[sweepInertBases]] deletes an inert compaction's base only when its
  *    entry is older than H (a flip to applied requires a retro-insert
  *    below it, which only a writer already older than H could produce);
  *  - [[gcEntries]] deletes LOG ENTRIES made fold-redundant by a
  *    checkpoint — anchored on the oldest of K ≥ 2 retained readable
  *    checkpoints, every deleted object older than H, the prefix removed
  *    newest-first so a crash leaves a complete shorter prefix. It is the
  *    ONLY sanctioned deletion of log state; everything above still
  *    treats entries as immutable history.
  */
object ManifestLog {

  /** The folded view of the log: `seq` is the highest entry sequence seen
    * (0 when the log is empty), `dirs` the live generation directories in
    * fold order. */
  final case class State(seq: Long, dirs: Seq[String])

  private val mapper = new ObjectMapper()
  // full 36-char UUID: collision-free BY CONSTRUCTION is the module's load-
  // bearing claim, and a truncated id plus overwrite-create would let two
  // same-seq writers replace each other's entry at birthday-problem odds
  private val EntryRe = """log-(\d{20})-([0-9a-f-]{36})\.json""".r
  private val CkptRe = """ckpt-(\d{20})-([0-9a-f-]{36})\.json""".r

  private val MaxReadAttempts = 4

  private def entryPath(root: Path, prefix: String, seq: Long): Path =
    new Path(root, f"$prefix-$seq%020d-${java.util.UUID.randomUUID()}.json")

  private sealed trait Op
  private final case class Append(dir: String) extends Op
  private final case class Compact(folded: Seq[String], base: String) extends Op
  /** `appendedAt` carries the ever-appended dirs with the store mtime of
    * their newest append entry (absent in pre-r18 checkpoints — resumed
    * folds then date them at the checkpoint's own mtime, which is an upper
    * bound and therefore conservative for retention pruning). */
  private final case class Checkpoint(
      live: Seq[String], appended: Seq[String], appendedAt: Map[String, Long]) extends Op

  /** GET one LISTED entry's bytes. Every listed entry is COMMITTED (PUT is
    * all-or-nothing on the object-store target; on filesystems a half
    * write is readable and fails the JSON parse instead), so an IO failure
    * here is transient store adversity on an entry earlier reads may
    * already have folded — retried bounded, then thrown: a fold missing a
    * committed delta is a silently-short live set, the one failure mode
    * this module exists to rule out. */
  private def readEntryBytes(fs: FileSystem, p: Path): Array[Byte] = {
    var attempt = 1
    while (true) {
      try {
        val in = fs.open(p)
        return try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      } catch {
        case e: java.io.FileNotFoundException =>
          // Not transient adversity: the listed entry is GONE. The one
          // legitimate producer of this state is a concurrent [[gcEntries]]
          // deleting pre-anchor entries between our LIST and this GET —
          // thrown immediately (no retry sleeps; absence is definitive) so
          // the caller can RE-LIST and fold the post-GC log instead.
          throw e
        case e: java.io.IOException =>
          if (attempt >= MaxReadAttempts)
            throw new java.io.IOException(
              s"manifest log: cannot read committed entry $p after $attempt attempts — " +
                "failing the fold loudly instead of returning a live set missing its rows", e)
          Thread.sleep(15L * attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run `body` (a LIST-then-GET walk), re-LISTing from scratch when a
    * listed entry vanishes mid-walk — the signature of a concurrent
    * [[gcEntries]] having deleted a pre-anchor entry. One relist suffices
    * per GC run (post-GC folds resume from the anchor checkpoint and never
    * GET the deleted prefix); bounded anyway, then loud. */
  private def withRelistOnVanish[A](root: Path)(body: => A): A = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case e: java.io.FileNotFoundException =>
          if (attempt >= MaxReadAttempts)
            throw new java.io.IOException(
              s"manifest log: listed entries vanished mid-read $attempt times under " +
                s"$root — more than concurrent entry GC can explain; failing loudly", e)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Decode one entry's bytes; None = torn or foreign content, skipped
    * deterministically (see the torn-reads note — PARSE failures only;
    * IO failures never reach here). */
  private def decode(bytes: Array[Byte]): Option[Op] =
    try {
      val node = mapper.readTree(bytes)
      node.get("op").asText() match {
        case "append" => Some(Append(node.get("dir").asText()))
        case "compact" =>
          val folded = Seq.newBuilder[String]
          node.get("folded").forEach(n => folded += n.asText())
          Some(Compact(folded.result(), node.get("base").asText()))
        case "checkpoint" =>
          val live = Seq.newBuilder[String]
          node.get("live").forEach(n => live += n.asText())
          val appended = Seq.newBuilder[String]
          node.get("appended").forEach(n => appended += n.asText())
          val ages = Map.newBuilder[String, Long]
          val at = node.get("appendedAt")
          if (at != null && at.isObject) {
            val it = at.fields()
            while (it.hasNext) { val f = it.next(); ages += (f.getKey -> f.getValue.asLong()) }
          }
          Some(Checkpoint(live.result(), appended.result(), ages.result()))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private final case class Entry(seq: Long, uuid: String, path: Path, ckpt: Boolean, mtimeMs: Long)

  private def listEntries(fs: FileSystem, root: Path): Seq[Entry] =
    fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case EntryRe(seq, uuid) =>
          Some(Entry(seq.toLong, uuid, st.getPath, ckpt = false, st.getModificationTime))
        case CkptRe(seq, uuid) =>
          Some(Entry(seq.toLong, uuid, st.getPath, ckpt = true, st.getModificationTime))
        case _ => None
      }
    }.sortBy(e => (e.seq, e.uuid))

  /** Fold the log under `root` into the current live set.
    *
    * The append guard is EVER-APPENDED, not currently-live: a client retry
    * of a successful append can land arbitrarily late — including AFTER a
    * compaction folded the delta into a base — and a currently-live guard
    * would re-admit the folded dir then, serving its rows twice (once via
    * the base, once live). Ever-appended makes every duplicate inert
    * regardless of where it sorts. */
  def read(fs: FileSystem, root: Path): State = {
    val (seq, live, _) = foldLog(fs, root)
    State(seq, live)
  }

  /** The fold, resumed from the newest readable checkpoint when one exists.
    *
    * Resume rule: a checkpoint C recorded the full fold of every entry it
    * saw, all with seq ≤ C.seq − 1 (its seq is snapshot.max + 1, exactly
    * like a compact's). Entries AT C.seq — same-snapshot racers — were by
    * construction not folded by C, so the suffix fold replays every
    * non-checkpoint entry with seq ≥ C.seq over C's state, whichever side
    * of C's uuid they sort on: C is a pure snapshot (a no-op transition),
    * so applying a same-seq-smaller-uuid racer after restoring C's state
    * yields the same result as the full fold applying it just before C.
    * Equivalence therefore needs exactly the checkpoint horizon contract:
    * no entry with seq < C.seq lands after C was written. A torn
    * checkpoint is skipped (the fold falls back to the next-newest, then
    * to entry 1) — skipping a snapshot costs GETs, never rows. */
  private def foldLog(fs: FileSystem, root: Path): (Long, Vector[String], Map[String, Long]) =
    withRelistOnVanish(root) { foldOnce(fs, root) }

  private def foldOnce(fs: FileSystem, root: Path): (Long, Vector[String], Map[String, Long]) = {
    if (!fs.exists(root)) return (0L, Vector.empty, Map.empty)
    val entries = listEntries(fs, root)
    val maxSeq = entries.foldLeft(0L)((m, e) => math.max(m, e.seq))
    var live = Vector.empty[String]
    // ever-appended dir → mtime of its newest append entry (the retention
    // clock for checkpoint pruning; Long.MaxValue would never prune)
    val appendedAt = scala.collection.mutable.HashMap.empty[String, Long]
    var fromSeq = Long.MinValue
    val ckpts = entries.filter(_.ckpt).reverseIterator
    var resumed = false
    while (!resumed && ckpts.hasNext) {
      val c = ckpts.next()
      decode(readEntryBytes(fs, c.path)) match {
        case Some(Checkpoint(l, a, ages)) =>
          live = l.toVector
          // pre-r18 checkpoints carry no ages: date those dirs at the
          // checkpoint's own mtime — an upper bound on their newest append,
          // so retention pruning can only be LATER than exact, never early
          a.foreach(d => appendedAt(d) = ages.getOrElse(d, c.mtimeMs))
          fromSeq = c.seq
          resumed = true
        case _ => // torn/foreign checkpoint: fall back to the next-newest
      }
    }
    if (!resumed) {
      // Entry GC deletes the prefix below a READABLE anchor checkpoint.
      // Reaching here with the head of the log missing means every
      // checkpoint has been damaged since (the store contract forbids it):
      // a full replay would fold a truncated prefix into a silently-short
      // live set — the failure mode this module exists to rule out.
      val nonCkpt = entries.filter(!_.ckpt)
      val truncated = (nonCkpt.nonEmpty && nonCkpt.head.seq > 1L) ||
        (nonCkpt.isEmpty && entries.nonEmpty)
      if (truncated) throw new IllegalStateException(
        s"manifest log under $root is entry-GC'd (no seq-1 entry survives) but no " +
          "checkpoint is readable — refusing to fold a truncated prefix; restore the " +
          "anchor checkpoint object")
    }
    entries.foreach { e =>
      if (!e.ckpt && e.seq >= fromSeq) {
        decode(readEntryBytes(fs, e.path)) match {
          case Some(Append(dir)) =>
            if (!appendedAt.contains(dir)) live :+= dir // duplicates (client retries) inert
            appendedAt(dir) = math.max(appendedAt.getOrElse(dir, 0L), e.mtimeMs)
          case Some(Compact(folded, base)) =>
            val f = folded.toSet
            if (f.nonEmpty && f.subsetOf(live.toSet)) live = base +: live.filterNot(f)
          // else: inert — lost a compact-vs-compact race, its base is garbage
          case _ => // torn or foreign entry: skipped, deterministically
        }
      }
    }
    (maxSeq, live, appendedAt.toMap)
  }

  private def writeEntry(fs: FileSystem, root: Path, prefix: String, seq: Long,
      render: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    if (!fs.exists(root)) fs.mkdirs(root)
    val node = mapper.createObjectNode()
    node.put("seq", seq)
    render(node)
    val out = fs.create(entryPath(root, prefix, seq), true) // unique key — never a claim
    out.write(mapper.writeValueAsString(node).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
  }

  /** Publish `deltaDir` (already fully written) as a new live generation.
    * Never retries, never loses: appends of distinct dirs commute under the
    * fold, so there is no CAS to lose. Returns the WRITER'S view (its entry
    * folded over its snapshot) — any return value is a snapshot the moment
    * it exists, and folding locally halves the per-append LIST+GET cost of
    * an O(entries) log walk on the object-store target. */
  def append(fs: FileSystem, root: Path, deltaDir: String): State = {
    val (seq, live, appendedAt) = foldLog(fs, root)
    writeEntry(fs, root, "log", seq + 1, _.put("op", "append").put("dir", deltaDir))
    State(seq + 1, if (appendedAt.contains(deltaDir)) live else live :+ deltaDir)
  }

  /** Snapshot the live set, have the caller rewrite exactly those
    * directories into `newBaseDir`, then log the fold. `beforeCommit` runs
    * between the rewrite and the log entry (test seam — a racing append
    * landing exactly there is the interleaving this design exists to
    * survive). Returns the post-commit state plus whether THIS fold applied:
    * `applied = false` means a concurrent compaction won and `newBaseDir`
    * is unreferenced (it holds the same rows the winner's base does —
    * nothing is lost). Deleting it is safe ONLY behind the staleness
    * horizon in the module note: applied/inert is not final while writers
    * may still be stalled, and a retro-inserting late entry can flip the
    * fold's choice of winner ([[sweepInertBases]] is that rule as code). */
  def compact(
      fs: FileSystem, root: Path, newBaseDir: String,
      rewrite: Seq[String] => Unit,
      beforeCommit: () => Unit = () => ()): (State, Boolean) = {
    val s0 = read(fs, root)
    require(s0.dirs.nonEmpty, s"manifest log: nothing to compact under $root")
    rewrite(s0.dirs)
    beforeCommit()
    writeEntry(fs, root, "log", s0.seq + 1, { node =>
      node.put("op", "compact")
      node.put("base", newBaseDir)
      val arr = node.putArray("folded")
      s0.dirs.foreach(arr.add)
    })
    val s1 = read(fs, root)
    (s1, s1.dirs.contains(newBaseDir))
  }

  /** Write a fold CHECKPOINT so later folds resume from it instead of
    * GETting every entry ever written — without it the log only grows and
    * every read/append is O(entries) LIST+GET forever, a real serving cost
    * at the object-store cadence this module targets (compaction folds
    * DATA dirs, never the log itself).
    *
    * HORIZON GATE (caller's contract, same H as [[sweepInertBases]]): call
    * only when no writer's snapshot-to-PUT window can still be open from
    * before this call's snapshot — i.e. every entry with seq ≤ the current
    * max has already landed. A retro-insert below the checkpoint's seq
    * would be invisible to resumed folds; behind the horizon it cannot
    * occur. The natural call site is the same maintenance cycle that runs
    * compaction and GC, which already owns that assertion.
    *
    * The checkpoint is a pure snapshot under its own name pattern — it
    * never changes any fold's result (ManifestLogSpec pins
    * checkpoint-resumed ≡ full fold differentially), it only bounds the
    * suffix a fold must GET. Entries below it stay on the store; do NOT
    * delete them by hand — [[sweepInertBases]]' classification and
    * [[foldLog]]'s torn-checkpoint fallback both still read the prefix.
    * [[gcEntries]] is the one safe deletion path (checkpoint-aware
    * classification, K ≥ 2 retained readable anchors, per-object age gate).
    *
    * SIZE: the snapshot carries the EVER-APPENDED set (the duplicate-append
    * guard's full history), so without pruning every checkpoint grows
    * O(total appends ever) even as compaction shrinks the live set.
    * `appendedRetentionMs` bounds that: non-live appended dirs whose newest
    * append entry is older than the retention window are dropped from the
    * snapshot. Safe under the SAME horizon reasoning as everything else
    * here — a duplicate client retry of an append older than H cannot
    * still land, so the guard entry it would have needed is dead weight.
    * Pass the deployment's H (or larger); the default keeps history
    * forever. Live dirs are always kept regardless of age (a duplicate
    * append of a LIVE dir must stay inert or its rows would serve twice). */
  def checkpoint(fs: FileSystem, root: Path,
      appendedRetentionMs: Long = Long.MaxValue,
      nowMs: Long = System.currentTimeMillis()): State = {
    val (seq, live, appendedAt) = foldLog(fs, root)
    if (seq == 0L) return State(0L, live) // empty log: nothing to snapshot
    val liveSet = live.toSet
    val kept = appendedAt.filter { case (d, at) =>
      liveSet.contains(d) || nowMs - at <= appendedRetentionMs
    }
    writeEntry(fs, root, "ckpt", seq + 1, { node =>
      node.put("op", "checkpoint")
      val la = node.putArray("live")
      live.foreach(la.add)
      val aa = node.putArray("appended")
      kept.keys.toSeq.sorted.foreach(aa.add)
      val at = node.putObject("appendedAt")
      kept.toSeq.sortBy(_._1).foreach { case (d, ms) => at.put(d, ms) }
    })
    State(seq + 1, live)
  }

  /** Delete the base directories of LOSING compactions — garbage today,
    * but only PROVABLY garbage behind the staleness horizon: an inert
    * compact entry X flips to applied only if some entry retro-inserts
    * below X's sort position, and such an entry can only come from a
    * writer whose fold snapshot predates X's landing. If no writer's
    * snapshot-to-PUT window exceeds `horizonMs` and X has been on the
    * store longer than that, no such writer can still exist — X's inert
    * status is final and its base (which holds only rows the winning
    * fold already serves) is safe to drop.
    *
    * Deletes ONLY dirs that (a) are the `base` of a compact entry that is
    * inert under the current fold, (b) are not live, (c) were never
    * appended as a delta, and (d) are no applied compact's base — then
    * returns what it deleted. Entry AGE comes from store mtimes, used
    * solely as a conservative gate (never for ordering). The fold here is
    * the FULL one — checkpoints summarize live state but not per-entry
    * applied/inert status, and a maintenance-cadence O(entries) walk is
    * the right price for deleting data. */
  def sweepInertBases(
      fs: FileSystem, root: Path, horizonMs: Long,
      nowMs: Long = System.currentTimeMillis()): Seq[String] = {
    if (!fs.exists(root)) return Nil
    val c = withRelistOnVanish(root) { classify(fs, root) }
    deleteInertBases(fs, c, horizonMs, nowMs, _ => true)
  }

  private def deleteInertBases(fs: FileSystem, c: Classification, horizonMs: Long,
      nowMs: Long, entryFilter: Entry => Boolean): Seq[String] = {
    val liveSet = c.live.toSet
    val candidates = scala.collection.mutable.LinkedHashSet.empty[String]
    c.inert.foreach { case (e, base) =>
      if (entryFilter(e) && nowMs - e.mtimeMs > horizonMs) candidates += base
    }
    candidates.toSeq
      .filterNot(b => liveSet.contains(b) || c.appendedAt.contains(b) ||
        c.appliedBases.contains(b))
      .filter { b =>
        val p = new Path(b)
        fs.exists(p) && fs.delete(p, true)
      }
  }

  /** Per-entry applied/inert classification of every surviving compact,
    * sound WHETHER OR NOT [[gcEntries]] has deleted log prefix entries.
    *
    * The pre-r18 form replayed from entry 1, which note (a) of the entry-GC
    * design (SURVEY §7.5) shows is unsound once any entry is missing: a
    * hole in an applied compact's folded-append history flips the replay's
    * classification and can age a LIVE base into a deletion candidate. The
    * sound split is anchored on the OLDEST READABLE checkpoint A:
    *
    *  - entries BELOW A (seq < A.seq) replay from empty state. GC's
    *    invariant is that this region is complete (no GC yet), empty
    *    (post-GC), or a complete shorter prefix (a GC crashed mid-delete —
    *    [[gcEntries]] deletes the prefix newest-first so survivors are
    *    always a prefix). A complete prefix replayed from empty is the
    *    genuine historical fold of those entries.
    *  - entries AT/ABOVE A (seq ≥ A.seq) replay over A's snapshot — exact
    *    by the same argument as [[foldLog]]'s resume rule.
    *
    * With no checkpoint at all, no GC can have run (gcEntries anchors on
    * one), so the full replay from entry 1 stays sound. */
  private final case class Classification(
      entries: Seq[Entry],
      live: Vector[String],
      appendedAt: Map[String, Long],
      appliedBases: Set[String],
      inert: Seq[(Entry, String)])

  private def classify(fs: FileSystem, root: Path): Classification = {
    val entries = listEntries(fs, root)
    // oldest READABLE checkpoint = the anchor; torn ones never anchor
    val anchor: Option[(Entry, Checkpoint)] = entries.filter(_.ckpt).iterator
      .map(e => e -> decode(readEntryBytes(fs, e.path)))
      .collectFirst { case (e, Some(c: Checkpoint)) => (e, c) }
    var live = Vector.empty[String]
    val appendedAt = scala.collection.mutable.HashMap.empty[String, Long]
    val appliedBases = scala.collection.mutable.HashSet.empty[String]
    val inert = Seq.newBuilder[(Entry, String)]
    def replay(e: Entry): Unit =
      decode(readEntryBytes(fs, e.path)) match {
        case Some(Append(dir)) =>
          if (!appendedAt.contains(dir)) live :+= dir
          appendedAt(dir) = math.max(appendedAt.getOrElse(dir, 0L), e.mtimeMs)
        case Some(Compact(folded, base)) =>
          val f = folded.toSet
          if (f.nonEmpty && f.subsetOf(live.toSet)) {
            live = base +: live.filterNot(f)
            appliedBases += base
          } else inert += (e -> base)
        case _ => // torn/foreign: skipped (never a candidate)
      }
    anchor match {
      case Some((a, ckpt)) =>
        entries.foreach(e => if (!e.ckpt && e.seq < a.seq) replay(e))
        live = ckpt.live.toVector
        appendedAt.clear()
        ckpt.appended.foreach(d => appendedAt(d) = ckpt.appendedAt.getOrElse(d, a.mtimeMs))
        entries.foreach(e => if (!e.ckpt && e.seq >= a.seq) replay(e))
      case None =>
        entries.foreach(e => if (!e.ckpt) replay(e))
    }
    Classification(entries, live, appendedAt.toMap, appliedBases.toSet, inert.result())
  }

  /** What [[gcEntries]] did: deleted log entries, deleted (superseded)
    * checkpoints, inert bases swept as part of retiring their entries, and
    * the anchor's sequence (entries below it are the GC'd region). */
  final case class GcReport(
      anchorSeq: Long,
      deletedEntries: Seq[String],
      deletedCheckpoints: Seq[String],
      sweptBases: Seq[String])

  /** Delete log entries made fold-redundant by checkpointing — the only
    * safe entry-deletion path (deleting by hand flips [[sweepInertBases]]'
    * classification and strands [[foldLog]]'s torn-checkpoint fallback;
    * see the checkpoint scaladoc).
    *
    * Anchor rule: among checkpoints that DECODE and are older than
    * `horizonMs`, keep the newest `retainCheckpoints` (K ≥ 2 — if the
    * newest retained object is later damaged, folds still fall back to a
    * readable snapshot instead of a deleted prefix) and anchor on the
    * OLDEST retained one. Then, oldest-first in fold order:
    *
    *  1. sweep inert bases referenced by pre-anchor compact entries (after
    *     the entries are gone nothing references those bases — they would
    *     leak forever; deleted base-before-entry so a crash leaves a
    *     re-classifiable entry, never an orphan base);
    *  2. delete checkpoints wholly below the anchor (folds resume from the
    *     anchor or newer);
    *  3. delete non-checkpoint entries with seq < anchor.seq, NEWEST FIRST,
    *     so a crash mid-delete leaves a complete shorter prefix and
    *     [[classify]]'s part-A replay stays sound. Same-seq racers of the
    *     anchor are kept — resumed folds replay seq ≥ anchor.seq.
    *
    * Every deletion is gated on the object's own mtime being older than
    * `horizonMs`: a YOUNG object below the anchor is a retro-insert that
    * violated the checkpoint horizon contract — left in place (it is
    * invisible to resumed folds either way) rather than silently erased.
    *
    * Horizon contract (same H as [[sweepInertBases]]): call from the
    * maintenance cycle that owns the assertion that no writer's
    * snapshot-to-PUT window from before the anchor's snapshot can still be
    * open. */
  def gcEntries(
      fs: FileSystem, root: Path, horizonMs: Long,
      retainCheckpoints: Int = 2,
      nowMs: Long = System.currentTimeMillis()): GcReport = {
    require(retainCheckpoints >= 2,
      s"manifest log: gcEntries must retain >= 2 checkpoints (got $retainCheckpoints) — " +
        "a single retained snapshot leaves no readable fallback if it is ever damaged")
    if (!fs.exists(root)) return GcReport(0L, Nil, Nil, Nil)
    withRelistOnVanish(root) {
      val c = classify(fs, root)
      val readableOld = c.entries.filter(_.ckpt)
        .filter(e => nowMs - e.mtimeMs > horizonMs)
        .filter(e => decode(
          try readEntryBytes(fs, e.path)
          catch { case _: java.io.FileNotFoundException => Array.emptyByteArray }
        ).exists(_.isInstanceOf[Checkpoint]))
      if (readableOld.size < retainCheckpoints)
        return GcReport(0L, Nil, Nil, Nil) // not enough anchors yet: no-op
      val anchor = readableOld(readableOld.size - retainCheckpoints)

      // 1. bases referenced only by the region being retired
      val swept = deleteInertBases(fs, c, horizonMs, nowMs, _.seq < anchor.seq)

      // 2. superseded checkpoints below the anchor
      val oldCkpts = c.entries.filter(e =>
        e.ckpt && e.seq < anchor.seq && nowMs - e.mtimeMs > horizonMs)
      val deletedCkpts = oldCkpts.filter(e => fs.delete(e.path, false)).map(_.path.getName)

      // 3. the entry prefix, newest-first
      val prefix = c.entries.filter(e =>
        !e.ckpt && e.seq < anchor.seq && nowMs - e.mtimeMs > horizonMs)
      val deleted = prefix.reverse.filter(e => fs.delete(e.path, false)).map(_.path.getName)

      GcReport(anchor.seq, deleted, deletedCkpts, swept)
    }
  }
}
