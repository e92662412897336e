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
  * Commit atomicity leans only on an atomic create-exclusive claim —
  * `FileSystem.create(overwrite=false)` on HDFS (a single namenode op) and
  * POSIX `O_CREAT|O_EXCL` via `File.createNewFile` on `file:` schemes,
  * because RawLocalFileSystem's own create is a non-atomic
  * exists-then-create (see [[tryCommit]]); content lands
  * after the claim, so a reader can observe a CLAIMED-but-unwritten
  * manifest — [[read]] treats unparsable manifests as uncommitted and
  * falls back to the highest parsable version; writers bump their
  * attempted version past every failed claim, so an abandoned claim
  * (writer crashed post-claim) is walked over, never a deadlock.
  */
object GenerationalIndex {

  final case class Manifest(version: Long, dirs: Seq[String])

  private val mapper = new ObjectMapper()
  private val ManifestRe = """manifest-(\d{20})\.json""".r

  private def manifestPath(root: Path, v: Long) = new Path(root, f"manifest-$v%020d.json")

  /** Highest fully-committed manifest under `root`; version 0 / no dirs when
    * none exists yet. Claimed-but-unwritten (or torn) manifests are skipped. */
  def read(fs: FileSystem, root: Path): Manifest = {
    if (!fs.exists(root)) return Manifest(0L, Nil)
    val versions = fs.listStatus(root).map(_.getPath.getName).collect {
      case ManifestRe(v) => v.toLong
    }.sorted.reverse
    versions.foreach { v =>
      parse(fs, manifestPath(root, v)) match {
        case Some(dirs) => return Manifest(v, dirs)
        case None => // claimed, not yet written (or torn) — fall through
      }
    }
    Manifest(0L, Nil)
  }

  private def parse(fs: FileSystem, p: Path): Option[Seq[String]] =
    try {
      val in = fs.open(p)
      val bytes = try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close()
      val node = mapper.readTree(bytes)
      val arr = node.get("dirs")
      if (arr == null || !arr.isArray) None
      else {
        val out = Seq.newBuilder[String]
        arr.forEach(n => out += n.asText())
        Some(out.result())
      }
    } catch { case _: Exception => None }

  /** Claim + write manifest `version` — false when another writer already
    * claimed it (the CAS failure; re-read and retry).
    *
    * Claim atomicity per scheme: HDFS `create(overwrite=false)` is an
    * atomic namenode op, but RawLocalFileSystem's is exists-then-create — a
    * TOCTOU window where two racing committers both "win" and one commit is
    * silently lost. On `file:` schemes the claim therefore goes through
    * `java.io.File.createNewFile` (POSIX O_CREAT|O_EXCL — genuinely atomic)
    * and only the claim winner opens the path for content. Object stores
    * without atomic create-exclusive need an external lock; out of scope. */
  def tryCommit(fs: FileSystem, root: Path, version: Long, dirs: Seq[String]): Boolean = {
    if (!fs.exists(root)) fs.mkdirs(root)
    val p = manifestPath(root, version)
    val out =
      if ("file".equalsIgnoreCase(fs.getScheme)) {
        val local = new java.io.File(fs.makeQualified(p).toUri.getPath)
        val claimed = try local.createNewFile() catch { case _: java.io.IOException => false }
        if (!claimed) return false
        // we own the (empty) file; overwrite it with content through the
        // same FileSystem so checksums/permissions match other writers
        fs.create(p, true)
      } else {
        try fs.create(p, false) // atomic claim on HDFS-like schemes
        catch { case _: java.io.IOException => return false }
      }
    val node = mapper.createObjectNode()
    node.put("version", version)
    val arr = node.putArray("dirs")
    dirs.foreach(arr.add)
    out.write(mapper.writeValueAsString(node).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    true
  }

  /** Publish `deltaDir` (already fully written) as a new live generation. */
  def append(fs: FileSystem, root: Path, deltaDir: String): Manifest =
    casLoop(fs, root, "append")(m => m.dirs :+ deltaDir)

  /** CAS retry loop shared by append/compact. The attempted version is
    * monotonically bumped past every FAILED claim (not just past the last
    * READ version): a writer that crashed after claiming version V leaves
    * an unparsable manifest-V forever, and retrying `read().version + 1`
    * would collide with it endlessly — the local bump walks over the
    * corpse. */
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
