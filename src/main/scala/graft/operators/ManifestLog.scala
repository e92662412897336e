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
  *    catches a half-written entry fails to parse it and skips it, which is
  *    indistinguishable from reading a moment earlier. A skipped-this-read
  *    APPEND is seen by the next read; a compactor that didn't see it
  *    doesn't fold it — safe, per the compact-vs-append argument.
  *
  * The requirements on the store, stated honestly: PUT of a distinct new key
  * never overwrites another writer's object, and LIST-after-PUT is
  * read-after-write consistent (true of S3 since 2020, GCS, Azure, HDFS and
  * POSIX). Entry timestamps and clocks are never consulted — ordering is
  * entirely (seq, uuid), and seq needs no coordination beyond "past my own
  * snapshot".
  *
  * Arbitrary writer LATENESS (a stalled writer's entry landing after
  * higher-seq entries exist, retro-inserting into the fold order) is safe
  * for ROWS but not for pointer identity: a late compact can apply at its
  * sort position and flip a previously-applied compact to inert (both
  * bases hold the same folded rows, so the row multiset is unchanged —
  * the subset rule is all-or-nothing), and a late duplicate APPEND is kept
  * inert by the ever-appended guard in [[read]]. Consequence for garbage
  * collection: an entry's applied/inert status is NOT final while writers
  * may still be stalled, so deleting an inert compaction's base is only
  * safe behind a staleness horizon (no writer older than H). Left to the
  * deployment; this module never deletes anything.
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

  private def entryPath(root: Path, seq: Long): Path =
    new Path(root, f"log-$seq%020d-${java.util.UUID.randomUUID()}.json")

  private sealed trait Op
  private final case class Append(dir: String) extends Op
  private final case class Compact(folded: Seq[String], base: String) extends Op

  private def parse(fs: FileSystem, p: Path): Option[Op] =
    try {
      val in = fs.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      val node = mapper.readTree(bytes)
      node.get("op").asText() match {
        case "append" => Some(Append(node.get("dir").asText()))
        case "compact" =>
          val folded = Seq.newBuilder[String]
          node.get("folded").forEach(n => folded += n.asText())
          Some(Compact(folded.result(), node.get("base").asText()))
        case _ => None
      }
    } catch { case _: Exception => None }

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

  private def foldLog(fs: FileSystem, root: Path): (Long, Vector[String], Set[String]) = {
    if (!fs.exists(root)) return (0L, Vector.empty, Set.empty)
    val entries = fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case EntryRe(seq, uuid) => Some((seq.toLong, uuid, st.getPath))
        case _ => None
      }
    }.sortBy { case (seq, uuid, _) => (seq, uuid) }
    var live = Vector.empty[String]
    val appended = scala.collection.mutable.HashSet.empty[String]
    var maxSeq = 0L
    entries.foreach { case (seq, _, p) =>
      maxSeq = math.max(maxSeq, seq)
      parse(fs, p) match {
        case Some(Append(dir)) =>
          if (appended.add(dir)) live :+= dir // duplicates (client retries) inert
        case Some(Compact(folded, base)) =>
          val f = folded.toSet
          if (f.nonEmpty && f.subsetOf(live.toSet)) live = base +: live.filterNot(f)
        // else: inert — lost a compact-vs-compact race, its base is garbage
        case None => // torn or foreign entry: skipped, deterministically
      }
    }
    (maxSeq, live, appended.toSet)
  }

  private def writeEntry(fs: FileSystem, root: Path, seq: Long,
      render: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    if (!fs.exists(root)) fs.mkdirs(root)
    val node = mapper.createObjectNode()
    node.put("seq", seq)
    render(node)
    val out = fs.create(entryPath(root, seq), true) // unique key — never a claim
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
    val (seq, live, appended) = foldLog(fs, root)
    writeEntry(fs, root, seq + 1, _.put("op", "append").put("dir", deltaDir))
    State(seq + 1, if (appended.contains(deltaDir)) live else live :+ deltaDir)
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
    * fold's choice of winner. */
  def compact(
      fs: FileSystem, root: Path, newBaseDir: String,
      rewrite: Seq[String] => Unit,
      beforeCommit: () => Unit = () => ()): (State, Boolean) = {
    val s0 = read(fs, root)
    require(s0.dirs.nonEmpty, s"manifest log: nothing to compact under $root")
    rewrite(s0.dirs)
    beforeCommit()
    writeEntry(fs, root, s0.seq + 1, { node =>
      node.put("op", "compact")
      node.put("base", newBaseDir)
      val arr = node.putArray("folded")
      s0.dirs.foreach(arr.add)
    })
    val s1 = read(fs, root)
    (s1, s1.dirs.contains(newBaseDir))
  }
}
