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
