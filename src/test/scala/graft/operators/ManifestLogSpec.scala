package graft.operators

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The object-store-safe commit log (ManifestLog): exactly-once visibility
  * with NO atomic create-exclusive or rename anywhere — the primitive set an
  * S3-style store actually offers. The adversarial interleavings pinned
  * here are exactly the ones that break an exists-then-create pointer file:
  * two racers writing "the same" version, an append landing inside a
  * compaction's commit window, two compactions folding the same snapshot,
  * and a torn entry caught mid-write. */
class ManifestLogSpec extends SparkSpec with Matchers {

  private val conf = new Configuration()

  private def writeDelta(root: String, name: String, ids: Range): String = {
    import spark.implicits._
    val dir = s"$root/$name"
    ids.map(_.toLong).toDF("id").coalesce(1)
      .write.format("fixedwidth").option("fields", "id:long:0:10")
      .mode("overwrite").save(dir)
    dir
  }

  private def readAll(dirs: Seq[String]): Seq[Long] =
    if (dirs.isEmpty) Nil
    else dirs.map(d => spark.read.format("fixedwidth").option("fields", "id:long:0:10").load(d))
      .reduce(_ unionByName _).select(col("id")).collect().map(_.getLong(0)).sorted.toSeq

  test("append lands mid-compaction: reader sees every row exactly once") {
    val tmp = Files.createTempDirectory("graft-mlog").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "base", 0 until 1000))
    ManifestLog.append(fs, root, writeDelta(tmp, "d1", 1000 until 1500))
    ManifestLog.append(fs, root, writeDelta(tmp, "d2", 1500 until 1800))
    ManifestLog.read(fs, root).dirs should have size 3

    val compacted = s"$tmp/base-2"
    val (s, applied) = ManifestLog.compact(
      fs, root, compacted,
      rewrite = dirs => {
        import spark.implicits._
        readAll(dirs).toDF("id").coalesce(1)
          .write.format("fixedwidth").option("fields", "id:long:0:10")
          .mode("overwrite").save(compacted)
      },
      beforeCommit = () =>
        ManifestLog.append(fs, root, writeDelta(tmp, "d3", 1800 until 2100)))
    applied shouldBe true
    s.dirs should contain(compacted)
    s.dirs.exists(_.endsWith("/d3")) shouldBe true
    s.dirs should have size 2
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 2100L)
  }

  test("two racers on the same sequence number: both appends survive (no claim to lose)") {
    val tmp = Files.createTempDirectory("graft-mlog-race").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "base", 0 until 10))
    val s0 = ManifestLog.read(fs, root)
    // the exists-then-create failure shape: both writers snapshot seq=s0.seq
    // and both publish seq+1 "simultaneously" — under a pointer-file CAS one
    // silently overwrites the other on a non-atomic store; under the log
    // both entries are distinct keys and the fold keeps both
    val dW = writeDelta(tmp, "winner", 10 until 20)
    val dL = writeDelta(tmp, "loser", 20 until 30)
    // simulate by writing both entries against the SAME snapshot: racer 1
    ManifestLog.append(fs, root, dW)
    // racer 2 acted on the stale snapshot s0 — its entry still lands under a
    // fresh unique key; from the fold's view this is the same as a true
    // concurrent PUT (ordering is (seq, uuid), never wall-clock)
    ManifestLog.append(fs, root, dL)
    val s1 = ManifestLog.read(fs, root)
    s1.seq should be > s0.seq
    s1.dirs should have size 3
    readAll(s1.dirs) shouldBe (0L until 30L)
  }

  test("compact-vs-compact over the same snapshot: exactly one applies, rows exactly once") {
    val tmp = Files.createTempDirectory("graft-mlog-cc").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "base", 0 until 100))
    ManifestLog.append(fs, root, writeDelta(tmp, "d1", 100 until 150))

    def fold(dirs: Seq[String], out: String): Unit = {
      import spark.implicits._
      readAll(dirs).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(out)
    }
    // compactor B runs ENTIRELY inside compactor A's commit window — the
    // worst interleaving: both snapshots are identical, both folds complete,
    // both log entries land at the SAME seq, and the uuid tiebreak decides
    // the winner at READ time (not commit-wall-clock: B reads applied=true
    // before A's entry exists, and can flip inert once it lands — the
    // stall-flip in miniature; pointer churn only, both bases hold the
    // same rows)
    val baseA = s"$tmp/base-A"
    val baseB = s"$tmp/base-B"
    var bApplied = false
    val (_, aApplied) = ManifestLog.compact(
      fs, root, baseA, rewrite = dirs => fold(dirs, baseA),
      beforeCommit = () => {
        val (_, ok) = ManifestLog.compact(fs, root, baseB, rewrite = dirs => fold(dirs, baseB))
        bApplied = ok
      })
    bApplied shouldBe true // B's read preceded A's entry: its fold had applied
    // final fold: EXACTLY one base live, consistent with A's own reading,
    // rows exactly once whichever uuid won
    val s = ManifestLog.read(fs, root)
    s.dirs should have size 1
    Set(baseA, baseB) should contain(s.dirs.head)
    aApplied shouldBe (s.dirs.head == baseA)
    readAll(s.dirs) shouldBe (0L until 150L)
  }

  test("torn entry mid-write: skipped this read, no crash, appends remain visible next read") {
    val tmp = Files.createTempDirectory("graft-mlog-torn").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "base", 0 until 5))
    val s0 = ManifestLog.read(fs, root)
    // a half-written entry caught by a racing reader: valid name, torn JSON
    val torn = new Path(root,
      f"log-${s0.seq + 1}%020d-deadbeef-dead-beef-dead-beefdeadbeef.json")
    val out = fs.create(torn, true)
    out.write("""{"seq":2,"op":"app""".getBytes("UTF-8"))
    out.close()
    val s1 = ManifestLog.read(fs, root)
    s1.dirs shouldBe s0.dirs // torn entry deterministically skipped
    // the log stays writable past it and later reads keep folding it as inert
    val s2 = ManifestLog.append(fs, root, writeDelta(tmp, "d1", 5 until 9))
    readAll(s2.dirs) shouldBe (0L until 9L)
  }

  test("retried append of the same delta dir is idempotent under the fold") {
    val tmp = Files.createTempDirectory("graft-mlog-retry").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d = writeDelta(tmp, "base", 0 until 7)
    ManifestLog.append(fs, root, d)
    // a client that timed out and retried: the first PUT actually landed
    ManifestLog.append(fs, root, d)
    val s = ManifestLog.read(fs, root)
    s.dirs should have size 1
    readAll(s.dirs) shouldBe (0L until 7L)
  }

  test("a duplicate append landing AFTER a compaction folded the delta stays inert") {
    // the re-animation hazard: with a currently-live dedup guard, a client
    // retry that lands after compact(D) would re-admit D and serve its rows
    // twice (once via the base, once live); the ever-appended guard makes
    // it inert wherever it sorts
    val tmp = Files.createTempDirectory("graft-mlog-latedup").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 40)
    val d2 = writeDelta(tmp, "d2", 40 until 90)
    ManifestLog.append(fs, root, d1)
    ManifestLog.append(fs, root, d2)
    val compacted = s"$tmp/base-2"
    val (_, applied) = ManifestLog.compact(
      fs, root, compacted,
      rewrite = dirs => {
        import spark.implicits._
        readAll(dirs).toDF("id").coalesce(1)
          .write.format("fixedwidth").option("fields", "id:long:0:10")
          .mode("overwrite").save(compacted)
      })
    applied shouldBe true
    // the stale client's retry of d1 lands now
    val s = ManifestLog.append(fs, root, d1)
    s.dirs shouldBe Seq(compacted)
    readAll(s.dirs) shouldBe (0L until 90L) // every row exactly once
  }

  /** FS wrapper injecting open() failures on entries whose path contains
    * `failSubstring` — the transient-GET adversity an object store actually
    * serves. failRemaining < 0 = fail forever. */
  private class FlakyFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    setConf(underlying.getConf)
    @volatile var failSubstring: String = null
    @volatile var failRemaining = 0
    @volatile var opens = 0
    override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
      opens += 1
      if (failSubstring != null && f.toString.contains(failSubstring) && failRemaining != 0) {
        if (failRemaining > 0) failRemaining -= 1
        throw new java.io.IOException(s"injected IO failure opening $f")
      }
      super.open(f, bufferSize)
    }
  }

  test("transient GET failure on a COMMITTED entry: retried, rows never silently missing") {
    // the r16-review defect: parse() caught ALL exceptions and returned
    // None, so a transient IO failure on a committed append made its delta
    // invisible for that read — and inerted any applied compaction that
    // folded it. A torn WRITE fails the JSON parse (skip is sound); an IO
    // failure on open/read of a committed entry must retry, then fail loudly.
    val tmp = Files.createTempDirectory("graft-mlog-flaky").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "base", 0 until 20))
    ManifestLog.append(fs, root, writeDelta(tmp, "d1", 20 until 35))
    val entryName = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("log-")).sorted.last // d1's committed entry
    val flaky = new FlakyFs(fs)
    flaky.failSubstring = entryName
    flaky.failRemaining = 2 // fails twice, then the store recovers
    val s = ManifestLog.read(flaky, root)
    s.dirs should have size 2
    readAll(s.dirs) shouldBe (0L until 35L) // every committed row visible
  }

  test("persistent GET failure on a committed entry: the fold fails LOUDLY, " +
      "never returns a short live set") {
    val tmp = Files.createTempDirectory("graft-mlog-dead").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "base", 0 until 10))
    ManifestLog.append(fs, root, writeDelta(tmp, "d1", 10 until 15))
    val entryName = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("log-")).sorted.last
    val flaky = new FlakyFs(fs)
    flaky.failSubstring = entryName
    flaky.failRemaining = -1 // the store never recovers
    val e = intercept[java.io.IOException] { ManifestLog.read(flaky, root) }
    e.getMessage should include("committed entry")
    // self-healing: once the store recovers, the same log reads complete
    flaky.failSubstring = null
    ManifestLog.read(flaky, root).dirs should have size 2
  }

  test("checkpoint: resumed fold ≡ full fold under racing writers, and reads GET only the suffix") {
    val tmp = Files.createTempDirectory("graft-mlog-ckpt").toString
    val rootA = new Path(s"$tmp/idxA") // checkpointed
    val rootB = new Path(s"$tmp/idxB") // same entries, no checkpoint (control)
    val fs = rootA.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 40)
    val d2 = writeDelta(tmp, "d2", 40 until 70)
    ManifestLog.append(fs, rootA, d1)
    ManifestLog.append(fs, rootA, d2)
    val compacted = s"$tmp/base-2"
    ManifestLog.compact(fs, rootA, compacted, rewrite = dirs => {
      import spark.implicits._
      readAll(dirs).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(compacted)
    })._2 shouldBe true
    val d3 = writeDelta(tmp, "d3", 70 until 90)
    ManifestLog.append(fs, rootA, d3)
    val sC = ManifestLog.checkpoint(fs, rootA)
    sC.dirs shouldBe Seq(compacted, d3)
    // a SAME-SEQ racer (snapshotted just before the checkpoint wrote) whose
    // uuid sorts BEFORE the checkpoint's — by construction not folded by
    // it, so the resumed fold must still apply it
    val d4 = writeDelta(tmp, "d4", 90 until 100)
    val racer = new Path(rootA,
      f"log-${sC.seq}%020d-00000000-0000-0000-0000-000000000000.json")
    val out = fs.create(racer, true)
    out.write(s"""{"seq":${sC.seq},"op":"append","dir":"$d4"}""".getBytes("UTF-8"))
    out.close()
    // and a normal post-checkpoint append
    val d5 = writeDelta(tmp, "d5", 100 until 120)
    ManifestLog.append(fs, rootA, d5)
    // control: every non-checkpoint entry bit-copied to rootB
    fs.mkdirs(rootB)
    fs.listStatus(rootA).map(_.getPath).filter(_.getName.startsWith("log-")).foreach { p =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.Paths.get(new Path(rootB, p.getName).toUri.getPath))
    }
    val counting = new FlakyFs(fs)
    val sA = ManifestLog.read(counting, rootA)
    val entryGets = counting.opens
    val sB = ManifestLog.read(fs, rootB)
    sA.dirs shouldBe sB.dirs // live VECTOR identical, not just the row set
    readAll(sA.dirs) shouldBe (0L until 120L)
    // the resumed fold GETs the checkpoint + the suffix (racer, d5), never
    // the five pre-checkpoint entries
    val totalEntries = fs.listStatus(rootA).count(_.getPath.getName.startsWith("log-"))
    entryGets should be < totalEntries
    entryGets shouldBe 3 // ckpt + racer + d5
  }

  test("sweepInertBases: a losing base is deleted only PAST the horizon, rows intact") {
    // the stalled-compactor scenario again: W applied, E retro-inserts and
    // flips W inert. W's base is garbage — but only provably so once no
    // writer stalled from before W's entry can still exist.
    val tmp = Files.createTempDirectory("graft-mlog-sweep").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 30)
    ManifestLog.append(fs, root, d1)
    def fold(out: String): Unit = {
      import spark.implicits._
      readAll(Seq(d1)).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(out)
    }
    val bw = s"$tmp/base-W"
    val (sW, _) = ManifestLog.compact(fs, root, bw, rewrite = _ => fold(bw))
    val be = s"$tmp/base-E"
    fold(be)
    val entry = f"""{"seq":${sW.seq},"op":"compact","base":"$be","folded":["$d1"]}"""
    val out = fs.create(new Path(root,
      f"log-${sW.seq}%020d-00000000-0000-0000-0000-000000000000.json"), true)
    out.write(entry.getBytes("UTF-8")); out.close()
    ManifestLog.read(fs, root).dirs shouldBe Seq(be) // E applied, W inert
    val now = System.currentTimeMillis()
    // entries younger than the horizon: NOTHING is deleted — W's inert
    // status is not final while a writer may still be stalled
    ManifestLog.sweepInertBases(fs, root, horizonMs = 60000L, nowMs = now) shouldBe empty
    fs.exists(new Path(bw)) shouldBe true
    // past the horizon: exactly the losing base goes; the live base and the
    // ever-appended delta stay, and the reader still sees every row once
    val swept = ManifestLog.sweepInertBases(fs, root, horizonMs = 60000L,
      nowMs = now + 120000L)
    swept shouldBe Seq(bw)
    fs.exists(new Path(bw)) shouldBe false
    fs.exists(new Path(be)) shouldBe true
    fs.exists(new Path(d1)) shouldBe true // folded but ever-appended: never swept
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 30L)
  }

  test("gcEntries: prefix deleted behind the anchor, fold identical, K=2 survives a " +
      "damaged newest checkpoint, and a wholly-damaged checkpoint set fails LOUDLY") {
    val tmp = Files.createTempDirectory("graft-mlog-gc").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 30)
    val d2 = writeDelta(tmp, "d2", 30 until 60)
    ManifestLog.append(fs, root, d1) // seq 1
    ManifestLog.append(fs, root, d2) // seq 2
    val b1 = s"$tmp/base-1"
    ManifestLog.compact(fs, root, b1, rewrite = dirs => { // seq 3
      import spark.implicits._
      readAll(dirs).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(b1)
    })._2 shouldBe true
    val d3 = writeDelta(tmp, "d3", 60 until 80)
    ManifestLog.append(fs, root, d3) // seq 4
    val ck1 = ManifestLog.checkpoint(fs, root) // seq 5 — the future anchor
    val d4 = writeDelta(tmp, "d4", 80 until 95)
    ManifestLog.append(fs, root, d4) // seq 6
    ManifestLog.checkpoint(fs, root) // seq 7
    val d5 = writeDelta(tmp, "d5", 95 until 110)
    ManifestLog.append(fs, root, d5) // seq 8
    val control = ManifestLog.read(fs, root)
    readAll(control.dirs) shouldBe (0L until 110L)
    val now = System.currentTimeMillis()

    // guards: K >= 2 is enforced; inside the horizon nothing moves
    an[IllegalArgumentException] should be thrownBy
      ManifestLog.gcEntries(fs, root, 60000L, retainCheckpoints = 1, nowMs = now)
    val noop = ManifestLog.gcEntries(fs, root, 60000L, nowMs = now)
    noop.deletedEntries shouldBe empty
    noop.deletedCheckpoints shouldBe empty

    // past the horizon: anchor = the OLDEST of the newest 2 readable
    // checkpoints (seq 5); the four pre-anchor entries go, same-or-newer
    // entries and both checkpoints stay, and the fold is unchanged
    val rep = ManifestLog.gcEntries(fs, root, 60000L, nowMs = now + 120000L)
    rep.anchorSeq shouldBe ck1.seq
    rep.deletedEntries should have size 4 // d1, d2, compact, d3
    rep.deletedCheckpoints shouldBe empty
    rep.sweptBases shouldBe empty // the one compact applied: its base is live
    fs.listStatus(root).count(_.getPath.getName.startsWith("log-")) shouldBe 2 // d4, d5
    val after = ManifestLog.read(fs, root)
    after.dirs shouldBe control.dirs
    readAll(after.dirs) shouldBe (0L until 110L)

    // the log keeps working: append + compact post-GC
    val d6 = writeDelta(tmp, "d6", 110 until 120)
    ManifestLog.append(fs, root, d6)
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 120L)

    // K=2 rationale: damage the NEWEST checkpoint — folds fall back to the
    // anchor and still see everything (the GC'd prefix is inside it)
    val ckpts = fs.listStatus(root).map(_.getPath).filter(_.getName.startsWith("ckpt-")).sorted
    ckpts should have size 2
    val o1 = fs.create(ckpts.last, true); o1.write("damaged".getBytes); o1.close()
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 120L)

    // damage the anchor too: a truncated prefix with no readable snapshot
    // must fail loudly, never fold into a silently-short live set
    val o2 = fs.create(ckpts.head, true); o2.write("damaged".getBytes); o2.close()
    val e = intercept[IllegalStateException] { ManifestLog.read(fs, root) }
    e.getMessage should include("entry-GC'd")
  }

  test("post-GC sweep: classification resumes from the anchor — a live base is never " +
      "misjudged inert by replaying a truncated prefix (SURVEY note (a) trap)") {
    val tmp = Files.createTempDirectory("graft-mlog-gcsweep").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 40)
    ManifestLog.append(fs, root, d1) // seq 1
    def fold(dirs: Seq[String], out: String): Unit = {
      import spark.implicits._
      readAll(dirs).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(out)
    }
    val bx = s"$tmp/base-X"
    ManifestLog.compact(fs, root, bx, rewrite = fold(_, bx))._2 shouldBe true // seq 2
    ManifestLog.checkpoint(fs, root) // seq 3 — the anchor
    ManifestLog.checkpoint(fs, root) // seq 4
    val now = System.currentTimeMillis()
    val rep = ManifestLog.gcEntries(fs, root, 60000L, nowMs = now + 120000L)
    rep.deletedEntries should have size 2 // d1's append + X's compact

    // post-GC history: a fresh append and a compact folding {BX, d4}
    val d4 = writeDelta(tmp, "d4", 40 until 70)
    ManifestLog.append(fs, root, d4)
    val by = s"$tmp/base-Y"
    ManifestLog.compact(fs, root, by, rewrite = fold(_, by))._2 shouldBe true
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 70L)

    // the trap: replaying the SURVIVING entries from empty state would see
    // live={d4} when Y's compact folds {BX, d4} — Y misjudged inert, BY
    // (the CURRENT live base) aged into a deletion candidate. The
    // checkpoint-aware classification must sweep NOTHING here.
    val swept = ManifestLog.sweepInertBases(fs, root, 60000L, nowMs = now + 240000L)
    swept shouldBe empty
    fs.exists(new Path(by)) shouldBe true
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 70L)
  }

  test("checkpoint pruning: non-live appends older than the retention window leave the " +
      "snapshot; LIVE dirs stay guarded at any age") {
    val tmp = Files.createTempDirectory("graft-mlog-prune").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "del1", 0 until 20)
    val d2 = writeDelta(tmp, "del2", 20 until 45)
    ManifestLog.append(fs, root, d1)
    ManifestLog.append(fs, root, d2)
    val b = s"$tmp/base-1"
    ManifestLog.compact(fs, root, b, rewrite = dirs => {
      import spark.implicits._
      readAll(dirs).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(b)
    })._2 shouldBe true
    val d3 = writeDelta(tmp, "del3", 45 until 60)
    ManifestLog.append(fs, root, d3) // live alongside the base
    val now = System.currentTimeMillis()
    // retention 0 at a far-future clock: d1/d2 (folded, non-live) prune out
    // of the snapshot; d3 survives because it is LIVE, whatever its age
    ManifestLog.checkpoint(fs, root, appendedRetentionMs = 0L, nowMs = now + 3600000L)
    val ckpt = fs.listStatus(root).map(_.getPath).filter(_.getName.startsWith("ckpt-")).head
    val json = new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(fs.open(ckpt)), "UTF-8")
    json should include("del3")
    json should not include "del1"
    json should not include "del2"
    json should include("appendedAt")
    // the pruned snapshot folds identically
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 60L)
    // duplicate retry of the LIVE dir after pruning: still inert
    ManifestLog.append(fs, root, d3)
    val s = ManifestLog.read(fs, root)
    s.dirs.count(_ == d3) shouldBe 1
    readAll(s.dirs) shouldBe (0L until 60L)
  }

  test("a CRASHED gcEntries (newest-first deletion interrupted) leaves a complete " +
      "shorter prefix: fold and sweep classification both stay exact") {
    val tmp = Files.createTempDirectory("graft-mlog-gccrash").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 25)
    val d2 = writeDelta(tmp, "d2", 25 until 55)
    ManifestLog.append(fs, root, d1) // seq 1
    ManifestLog.append(fs, root, d2) // seq 2
    val b1 = s"$tmp/base-1"
    ManifestLog.compact(fs, root, b1, rewrite = dirs => { // seq 3, applied
      import spark.implicits._
      readAll(dirs).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(b1)
    })._2 shouldBe true
    val d3 = writeDelta(tmp, "d3", 55 until 70)
    ManifestLog.append(fs, root, d3) // seq 4
    ManifestLog.checkpoint(fs, root) // seq 5 — the anchor
    ManifestLog.checkpoint(fs, root) // seq 6
    val control = ManifestLog.read(fs, root)
    readAll(control.dirs) shouldBe (0L until 70L)

    // simulate the crash: gcEntries deletes the prefix NEWEST-FIRST, so an
    // interrupted run has removed only the TAIL of the prefix — here the
    // seq-4 append and the seq-3 compact, leaving the seq-1/2 appends
    val names = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("log-")).sorted
    names should have size 4
    names.reverse.take(2).foreach(n => fs.delete(new Path(root, n), false) shouldBe true)

    // fold: resumes from a readable checkpoint, unchanged
    val after = ManifestLog.read(fs, root)
    after.dirs shouldBe control.dirs
    readAll(after.dirs) shouldBe (0L until 70L)
    // sweep classification: part-A replay over the complete shorter prefix
    // (the two surviving appends) is exact — the applied compact's LIVE
    // base must never age into a candidate
    ManifestLog.sweepInertBases(fs, root, 60000L,
      nowMs = System.currentTimeMillis() + 240000L) shouldBe empty
    fs.exists(new Path(b1)) shouldBe true
    // and a RESUMED gcEntries finishes the job
    val rep = ManifestLog.gcEntries(fs, root, 60000L,
      nowMs = System.currentTimeMillis() + 240000L)
    rep.deletedEntries should have size 2 // the surviving seq-1/2 appends
    readAll(ManifestLog.read(fs, root).dirs) shouldBe (0L until 70L)
  }

  test("an entry vanishing between LIST and GET (concurrent gcEntries): the fold " +
      "re-LISTs and succeeds; a store that keeps vanishing entries fails loudly") {
    val tmp = Files.createTempDirectory("graft-mlog-vanish").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    ManifestLog.append(fs, root, writeDelta(tmp, "d1", 0 until 10))
    ManifestLog.append(fs, root, writeDelta(tmp, "d2", 10 until 25))
    val entryName = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("log-")).sorted.last
    val vanish = new VanishFs(fs)
    vanish.fnfSubstring = entryName
    vanish.fnfRemaining = 1 // one FNF (the concurrent-GC signature), then fine
    val s = ManifestLog.read(vanish, root)
    readAll(s.dirs) shouldBe (0L until 25L)
    // permanent vanishing (more than a concurrent GC explains): loud
    vanish.fnfRemaining = -1
    val e = intercept[java.io.IOException] { ManifestLog.read(vanish, root) }
    e.getMessage should include("vanished")
  }

  /** FS wrapper serving FileNotFoundException on open() — the
    * listed-then-deleted race a concurrent [[ManifestLog.gcEntries]]
    * produces. fnfRemaining < 0 = vanished forever. */
  private class VanishFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    setConf(underlying.getConf)
    @volatile var fnfSubstring: String = null
    @volatile var fnfRemaining = 0
    override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
      if (fnfSubstring != null && f.toString.contains(fnfSubstring) && fnfRemaining != 0) {
        if (fnfRemaining > 0) fnfRemaining -= 1
        throw new java.io.FileNotFoundException(s"injected vanish: $f")
      }
      super.open(f, bufferSize)
    }
  }

  test("a STALLED compactor's entry retro-inserting before an applied one: pointer may flip, " +
      "rows never do") {
    // worst-case lateness: compactor E snapshotted {d1}, stalled, and its
    // entry lands AFTER compactor W already folded {d1}->BW — but at a
    // sort position BEFORE W's (same seq, smaller uuid). The deterministic
    // re-fold applies E and flips W to inert. That is pointer churn only:
    // both bases hold exactly d1's rows, and the all-or-nothing subset rule
    // guarantees the flip can never drop or double a row.
    val tmp = Files.createTempDirectory("graft-mlog-stall").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    val d1 = writeDelta(tmp, "d1", 0 until 30)
    ManifestLog.append(fs, root, d1)
    def fold(out: String): Unit = {
      import spark.implicits._
      readAll(Seq(d1)).toDF("id").coalesce(1)
        .write.format("fixedwidth").option("fields", "id:long:0:10")
        .mode("overwrite").save(out)
    }
    val bw = s"$tmp/base-W"
    val (sW, appliedW) = ManifestLog.compact(fs, root, bw, rewrite = _ => fold(bw))
    appliedW shouldBe true
    sW.dirs shouldBe Seq(bw)
    // E's stalled entry: same seq as W's compact, uuid 00000000 sorts first
    val be = s"$tmp/base-E"
    fold(be)
    val entry = f"""{"seq":${sW.seq},"op":"compact","base":"$be","folded":["$d1"]}"""
    val out = fs.create(new Path(root,
      f"log-${sW.seq}%020d-00000000-0000-0000-0000-000000000000.json"), true)
    out.write(entry.getBytes("UTF-8")); out.close()
    val s = ManifestLog.read(fs, root)
    s.dirs shouldBe Seq(be) // E applied, W flipped inert — deterministically
    readAll(s.dirs) shouldBe (0L until 30L) // rows exactly once, regardless
  }
}
