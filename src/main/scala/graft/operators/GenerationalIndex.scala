package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation-pointer index layout: the concurrency contract the dedup/ANN
  * serving indexes (q224-q232) need once a COMPACTOR races an APPENDER.
  *
  * The q227/q229 maintenance loops append delta generations as
  * subdirectories; q231/q232 prove base ∪ deltas ≡ rebuild on a QUIET
  * directory. Deployed, the fold races arrivals: a compactor that simply
  * rewrote the directory would either drop a delta that landed mid-fold
  * (lost rows) or double-count one it folded AND left in place. The classic
  * fix (this file): the set of LIVE directories is itself versioned data —
  * a monotonically numbered manifest; readers resolve the HIGHEST fully
  * committed manifest; writers commit by CREATE-EXCLUSIVE of the next
  * version number, a compare-and-swap that makes one of two racing commits
  * lose and retry against the other's result.
  *
  *   - append(delta):   CAS-loop { m = read; commit(m.version+1, m.dirs :+ delta) }
  *   - compact(write):  m0 = read; write(m0.dirs → newBase);
  *                      CAS-loop { m = read;
  *                        commit(m.version+1, newBase +: (m.dirs − m0.dirs)) }
  *
  * Exactly-once by construction: every directory in m0.dirs is folded into
  * newBase and removed from the pointer in the SAME commit; a delta
  * appended after the m0 snapshot is never folded and never removed. A
  * delta appended between the compactor's re-read and its commit makes the
  * commit's create-exclusive lose (the appender claimed the version), and
  * the retry re-reads the appender's manifest. Readers always see a fully
  * committed set — never a half-folded one.
  *
  * Commit atomicity: the manifest's CONTENT is written fully to a
  * uniquely-named temp file first, then published onto the final
  * `manifest-V.json` name by an atomic claim-with-content primitive —
  * POSIX `link(2)` (`Files.createLink`, fails EEXIST) on `file:` schemes,
  * `FileSystem.rename` (a single namenode op that FAILS when the
  * destination exists) on HDFS-like schemes. Claim and content are one
  * operation, so a reader — including a RACING COMMITTER's re-read — can
  * never observe a claimed-but-unwritten manifest and derive its next
  * version from stale state (the lost-update window a claim-then-write
  * protocol opens: the loser re-reads mid-write, sees V-1, and commits
  * V+1 dirs that silently erase the winner's V). [[read]] still skips
  * unparsable manifests (defense against manual damage) and writers still
  * bump their attempted version past every failed claim, so a corrupt or
  * foreign `manifest-*.json` is walked over, never a deadlock.
  *
  * Object stores without atomic rename-or-link need no port of THIS
  * protocol — [[ManifestLog]] is the same exactly-once contract rebuilt on
  * the only primitive they all give (PUT of a new unique key + list), and
  * is the deployment choice at 100 TB where the index lives on S3-style
  * storage.
  */
object GenerationalIndex {

  final case class Manifest(version: Long, dirs: Seq[String])

  private val mapper = new ObjectMapper()
  private val ManifestRe = """manifest-(\d{20})\.json""".r

  private def manifestPath(root: Path, v: Long) = new Path(root, f"manifest-$v%020d.json")

  /** Highest fully-committed manifest under `root`; version 0 / no dirs when
    * none exists yet. Unparsable manifests are skipped — commits are atomic
    * ([[tryCommit]]), so these only arise from manual damage or a foreign
    * writer, never from an in-flight commit. SKIP covers SHAPE failures
    * only: a transient IO failure reading a LISTED (hence committed)
    * manifest must not make this reader fall back to version V−1 — a
    * writer folding that stale read would commit V+1 derived from it and
    * erase V's update, the exact lost-update tryCommit's atomicity exists
    * to prevent (the ManifestLog fold had the same conflation; fixed the
    * same way). IO failures retry bounded, then throw. */
  def read(fs: FileSystem, root: Path): Manifest = {
    if (!fs.exists(root)) return Manifest(0L, Nil)
    val versions = fs.listStatus(root).map(_.getPath.getName).collect {
      case ManifestRe(v) => v.toLong
    }.sorted.reverse
    versions.foreach { v =>
      parse(fs, manifestPath(root, v)) match {
        case Some(dirs) => return Manifest(v, dirs)
        case None => // damaged/foreign content — fall through to the next
      }
    }
    Manifest(0L, Nil)
  }

  private val MaxReadAttempts = 4

  private def parse(fs: FileSystem, p: Path): Option[Seq[String]] = {
    var bytes: Array[Byte] = null
    var attempt = 1
    while (bytes == null) {
      try {
        val in = fs.open(p)
        bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      } catch {
        case e: java.io.FileNotFoundException =>
          // A LISTED manifest is gone: the documented store contract
          // (manifests are never deleted) makes this a PERMANENT condition
          // — an external cleaner or human intervened. Fail immediately
          // with the diagnosis instead of burning the bounded-retry sleeps
          // reserved for genuinely transient IO.
          throw new java.io.IOException(
            s"generational index: committed manifest $p was listed but no longer " +
              "exists — something outside this module deleted it (the store " +
              "contract forbids that); restore it rather than retrying", e)
        case e: java.io.IOException =>
          if (attempt >= MaxReadAttempts)
            throw new java.io.IOException(
              s"generational index: cannot read committed manifest $p after " +
                s"$attempt attempts — failing loudly instead of falling back " +
                "to a stale version (a writer deriving from it would erase " +
                "the newest commit)", e)
          Thread.sleep(15L * attempt)
          attempt += 1
      }
    }
    try {
      val node = mapper.readTree(bytes)
      val arr = node.get("dirs")
      if (arr == null || !arr.isArray) None
      else {
        val out = Seq.newBuilder[String]
        arr.forEach(n => out += n.asText())
        Some(out.result())
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Commit manifest `version` atomically — false when another writer
    * already claimed it (the CAS failure; re-read and retry).
    *
    * The JSON content lands FULLY in a uniquely-named temp file before any
    * claim is attempted, and the publish step binds claim and content in
    * ONE filesystem operation:
    *  - `file:` — `Files.createLink(final, temp)`: POSIX link(2) fails
    *    EEXIST atomically, and the link target already carries the full
    *    content. (RawLocalFileSystem's own create(overwrite=false) is a
    *    non-atomic exists-then-create, and a claim-then-write protocol —
    *    even with an atomic `createNewFile` claim — leaves a window where
    *    a racing committer re-reads, sees only the previous version, and
    *    commits a successor derived from it, erasing the claim winner's
    *    update.)
    *  - otherwise — `rename(temp, final)`: on HDFS a single atomic
    *    namenode op that fails when the destination exists.
    * A crashed writer leaves only a `.tmp-*` file, which [[read]]'s
    * manifest-name filter never even lists — there is no observable
    * claimed-but-unwritten state.
    *
    * `beforePublish` is a test seam (spec-only) running after the temp
    * write, immediately before the atomic publish — the widest window a
    * racing commit can land in. */
  def tryCommit(fs: FileSystem, root: Path, version: Long, dirs: Seq[String],
      beforePublish: () => Unit = () => ()): Boolean = {
    if (!fs.exists(root)) fs.mkdirs(root)
    val p = manifestPath(root, version)
    val node = mapper.createObjectNode()
    node.put("version", version)
    val arr = node.putArray("dirs")
    dirs.foreach(arr.add)
    val bytes = mapper.writeValueAsString(node).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = new Path(root,
      s".tmp-manifest-$version-${java.util.UUID.randomUUID()}.json")
    if ("file".equalsIgnoreCase(fs.getScheme)) {
      val dst = java.nio.file.Paths.get(fs.makeQualified(p).toUri.getPath)
      val src = java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath)
      java.nio.file.Files.write(src, bytes)
      beforePublish()
      try {
        // ONLY an existing destination is a CAS miss. Any other IOException
        // (no hard-link support on this mount, cross-device, permissions)
        // must propagate loudly: swallowing it as a miss would spin the
        // CAS loop 1000 times and then misreport an environment problem as
        // contention.
        try { java.nio.file.Files.createLink(dst, src); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.nio.file.FileSystemException if dst.toFile.exists() => false
          case e: java.io.IOException => throw new java.io.IOException(
            s"generational index: cannot publish $p via hard link — the " +
              "filesystem may not support link(2); use ManifestLog for " +
              s"stores without atomic claim primitives: $e", e)
        }
      } finally java.nio.file.Files.deleteIfExists(src)
    } else {
      val out = fs.create(tmp, true)
      out.write(bytes)
      out.close()
      beforePublish()
      // Same diagnosis discipline as the link branch: a rename that fails
      // WITH the destination present is the CAS miss (the other writer's
      // manifest claimed the name — manifests are never deleted, so the
      // check is race-free); one that fails with the destination ABSENT is
      // an environment problem (permissions, quota, FS quirk) and must
      // propagate loudly — swallowed as a miss it would spin casLoop 1000
      // times and misreport itself as contention.
      val won =
        try fs.rename(tmp, p)
        catch {
          case e: java.io.IOException =>
            if (fs.exists(p)) false
            else {
              fs.delete(tmp, false)
              throw new java.io.IOException(
                s"generational index: cannot publish $p via rename and the " +
                  "destination does not exist — an environment failure, not a " +
                  s"CAS miss; fix the store before retrying: $e", e)
            }
        }
      if (!won) {
        fs.delete(tmp, false)
        if (!fs.exists(p))
          throw new java.io.IOException(
            s"generational index: rename to $p returned false with no " +
              "destination present — an environment failure, not a CAS miss")
      }
      won
    }
  }

  /** Publish `deltaDir` (already fully written) as a new live generation. */
  def append(fs: FileSystem, root: Path, deltaDir: String): Manifest =
    casLoop(fs, root, "append")(m => m.dirs :+ deltaDir)

  /** CAS retry loop shared by append/compact. The attempted version is
    * monotonically bumped past every FAILED claim (not just past the last
    * READ version): a corrupt or foreign `manifest-V.json` (crashed
    * commits leave only `.tmp-*` files, but manual damage happens) is
    * unparsable forever, and retrying `read().version + 1` would collide
    * with it endlessly — the local bump walks over the corpse. */
  private def casLoop(fs: FileSystem, root: Path, who: String)(
      next: Manifest => Seq[String]): Manifest = {
    var v = 0L
    var attempts = 0
    while (attempts < 1000) {
      val m = read(fs, root)
      v = math.max(v, m.version) + 1
      val dirs = next(m)
      if (tryCommit(fs, root, v, dirs)) return Manifest(v, dirs)
      attempts += 1
    }
    throw new java.io.IOException(
      s"generational index: $who lost the manifest CAS 1000 times under $root")
  }

  /** Fold the current generations into one: snapshot the live set, have the
    * caller rewrite exactly those directories into `newBaseDir` (typically
    * load-union-write through the fixedwidth sink), then swap the pointer —
    * folded dirs out, `newBaseDir` in, any CONCURRENTLY APPENDED delta
    * preserved. `beforeCommit` runs between the rewrite and the pointer
    * swap (test seam: an append landing exactly there is the race this
    * design exists to survive). Returns the committed manifest. */
  def compact(
      fs: FileSystem, root: Path, newBaseDir: String,
      rewrite: Seq[String] => Unit,
      beforeCommit: () => Unit = () => ()): Manifest = {
    val m0 = read(fs, root)
    require(m0.dirs.nonEmpty, s"generational index: nothing to compact under $root")
    rewrite(m0.dirs)
    beforeCommit()
    val folded = m0.dirs.toSet
    casLoop(fs, root, "compaction")(m => newBaseDir +: m.dirs.filterNot(folded))
  }
}
