package graft.operators

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The generation-pointer manifest under concurrency (GenerationalIndex):
  * exactly-once visibility when a compaction races a delta append — the
  * deployment gap q231/q232 left open (they prove fold ≡ rebuild only on a
  * quiet directory). Pinned here: (1) the interleaved append lands in the
  * post-compaction manifest, never folded AND preserved (no loss, no
  * double-count); (2) a racing CAS loses and retries against the winner's
  * manifest; (3) an abandoned claim (crashed writer) never deadlocks
  * committers and stays invisible to readers. */
class GenerationalIndexSpec extends SparkSpec with Matchers {

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
    val tmp = Files.createTempDirectory("graft-genidx").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)

    // live set before compaction: base + two deltas
    GenerationalIndex.append(fs, root, writeDelta(tmp, "base", 0 until 1000))
    GenerationalIndex.append(fs, root, writeDelta(tmp, "d1", 1000 until 1500))
    GenerationalIndex.append(fs, root, writeDelta(tmp, "d2", 1500 until 1800))
    GenerationalIndex.read(fs, root).dirs should have size 3

    // compact, with d3 appended between the rewrite and the pointer swap
    val compacted = s"$tmp/base-2"
    val m = GenerationalIndex.compact(
      fs, root, compacted,
      rewrite = dirs => {
        import spark.implicits._
        readAll(dirs).toDF("id").coalesce(1)
          .write.format("fixedwidth").option("fields", "id:long:0:10")
          .mode("overwrite").save(compacted)
      },
      beforeCommit = () =>
        GenerationalIndex.append(fs, root, writeDelta(tmp, "d3", 1800 until 2100)))

    // the committed pointer: the new base plus ONLY the racing delta
    m.dirs should contain(compacted)
    m.dirs.exists(_.endsWith("/d3")) shouldBe true
    m.dirs should have size 2
    // exactly-once: every id 0..2100 exactly once — folded deltas are out of
    // the pointer, the racing one in, nothing lost, nothing doubled
    readAll(GenerationalIndex.read(fs, root).dirs) shouldBe (0L until 2100L)
  }

  test("racing commits: the CAS loser retries and both survive") {
    val tmp = Files.createTempDirectory("graft-genidx-race").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    GenerationalIndex.append(fs, root, writeDelta(tmp, "base", 0 until 10))
    // claim the version an appender will try first — simulates the racing
    // writer winning the slot; the appender must lose, re-read, retry
    val v = GenerationalIndex.read(fs, root).version
    GenerationalIndex.tryCommit(fs, root, v + 1,
      GenerationalIndex.read(fs, root).dirs :+ writeDelta(tmp, "winner", 10 until 20)) shouldBe true
    val m = GenerationalIndex.append(fs, root, writeDelta(tmp, "loser", 20 until 30))
    m.version shouldBe v + 2
    m.dirs should have size 3
    readAll(m.dirs) shouldBe (0L until 30L)
  }

  test("lost-update race: a full commit landing between a racer's content write and its " +
      "publish is never erased") {
    // The r15 hazard: with claim-then-write, committer A claims version N,
    // B re-reads while A is mid-write, sees N-1 (unparsable N), and commits
    // N+1 derived from N-1 — silently erasing A's successfully committed
    // dirs. Commits are now atomic (content lands in a temp file, publish
    // is link/rename-with-content), so the widest race B can win is landing
    // its ENTIRE commit inside A's pre-publish window — and then A must
    // LOSE the publish and retry against B's state, not overwrite it.
    val tmp = Files.createTempDirectory("graft-genidx-lostupd").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    GenerationalIndex.append(fs, root, writeDelta(tmp, "base", 0 until 10))
    val v = GenerationalIndex.read(fs, root).version
    val dA = writeDelta(tmp, "dA", 10 until 20)
    val dB = writeDelta(tmp, "dB", 20 until 30)
    // A attempts version v+1; B's complete append lands pre-publish
    val won = GenerationalIndex.tryCommit(fs, root, v + 1,
      GenerationalIndex.read(fs, root).dirs :+ dA,
      beforePublish = () => { GenerationalIndex.append(fs, root, dB); () })
    won shouldBe false // B claimed v+1 with full content; A's publish must lose
    // B's commit is intact and readable — never erased, never torn
    val afterB = GenerationalIndex.read(fs, root)
    afterB.version shouldBe v + 1
    afterB.dirs.exists(_.endsWith("/dB")) shouldBe true
    // A's production-path retry folds in on top of B's state
    val m = GenerationalIndex.append(fs, root, dA)
    m.version shouldBe v + 2
    readAll(m.dirs) shouldBe (0L until 30L)
    // no stray temp files survive the lost publish
    fs.listStatus(root).map(_.getPath.getName).count(_.startsWith(".tmp-")) shouldBe 0
  }

  /** FS wrapper with a non-file scheme (forcing tryCommit's rename branch)
    * and injectable rename behavior — the HDFS-like publish path under an
    * environment failure vs a genuine CAS miss. */
  private class RenameFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    setConf(underlying.getConf)
    @volatile var mode: String = "ok" // "ok" | "throw" | "false"
    override def getScheme: String = "mockhdfs"
    override def rename(src: Path, dst: Path): Boolean = mode match {
      case "throw" => throw new java.io.IOException("injected rename failure")
      case "false" => false
      case _ => super.rename(src, dst)
    }
  }

  test("rename-branch publish failure: environment problems propagate loudly, " +
      "only an existing destination is a CAS miss") {
    // the r16-advice finding: any rename failure was treated as a CAS miss,
    // so a persistent environment problem (permissions, quota) spun casLoop
    // 1000 times and misreported itself as contention
    val tmp = Files.createTempDirectory("graft-genidx-rename").toString
    val root = new Path(s"$tmp/idx")
    val fs = new RenameFs(root.getFileSystem(conf))
    val d = writeDelta(tmp, "base", 0 until 10)
    // a rename that throws with NO destination present: an environment
    // failure — must throw the diagnostic, not return false
    fs.mode = "throw"
    val e1 = intercept[java.io.IOException] {
      GenerationalIndex.tryCommit(fs, root, 1L, Seq(d))
    }
    e1.getMessage should include("environment failure")
    // same for a rename that RETURNS false with no destination
    fs.mode = "false"
    val e2 = intercept[java.io.IOException] {
      GenerationalIndex.tryCommit(fs, root, 1L, Seq(d))
    }
    e2.getMessage should include("environment failure")
    // no stray temp files from the failed publishes
    fs.listStatus(root).map(_.getPath.getName).count(_.startsWith(".tmp-")) shouldBe 0
    // commit v1 for real, then a failing rename WITH the destination present
    // is the genuine CAS miss: false, not a throw
    fs.mode = "ok"
    GenerationalIndex.tryCommit(fs, root, 1L, Seq(d)) shouldBe true
    fs.mode = "throw"
    GenerationalIndex.tryCommit(fs, root, 1L, Seq(d)) shouldBe false
    fs.mode = "false"
    GenerationalIndex.tryCommit(fs, root, 1L, Seq(d)) shouldBe false
    fs.mode = "ok"
    GenerationalIndex.read(fs, root).version shouldBe 1L
  }

  /** FS wrapper injecting open() failures on paths containing
    * `failSubstring`; failRemaining < 0 = fail forever. */
  private class FlakyFs(underlying: org.apache.hadoop.fs.FileSystem)
      extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
    setConf(underlying.getConf)
    @volatile var failSubstring: String = null
    @volatile var failRemaining = 0
    override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
      if (failSubstring != null && f.toString.contains(failSubstring) && failRemaining != 0) {
        if (failRemaining > 0) failRemaining -= 1
        throw new java.io.IOException(s"injected IO failure opening $f")
      }
      super.open(f, bufferSize)
    }
  }

  test("transient GET failure on the NEWEST manifest: retried, never a stale-version read") {
    // the ManifestLog conflation's sibling: if an IO failure on the newest
    // committed manifest were skipped like damaged content, read() would
    // fall back to V-1 and a writer folding that stale view would commit
    // V+1 derived from it — erasing V's update, the exact lost-update the
    // atomic claim+content publish exists to prevent
    val tmp = Files.createTempDirectory("graft-genidx-flaky").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    GenerationalIndex.append(fs, root, writeDelta(tmp, "base", 0 until 20))
    val m1 = GenerationalIndex.append(fs, root, writeDelta(tmp, "d1", 20 until 35))
    val newest = f"manifest-${m1.version}%020d.json"
    val flaky = new FlakyFs(fs)
    flaky.failSubstring = newest
    flaky.failRemaining = 2 // fails twice, then the store recovers
    val m = GenerationalIndex.read(flaky, root)
    m.version shouldBe m1.version // NEVER the stale V-1 view
    readAll(m.dirs) shouldBe (0L until 35L)
    // persistent failure: loud, not a silent stale read — and a writer on
    // the flaky store propagates instead of committing a stale successor
    flaky.failRemaining = -1
    val e = intercept[java.io.IOException] { GenerationalIndex.read(flaky, root) }
    e.getMessage should include("committed manifest")
    intercept[java.io.IOException] {
      GenerationalIndex.append(flaky, root, writeDelta(tmp, "d2", 35 until 40))
    }
    // the real store is intact throughout: V's update never erased
    flaky.failSubstring = null
    readAll(GenerationalIndex.read(fs, root).dirs) shouldBe (0L until 35L)
  }

  test("abandoned claim: unreadable manifest is skipped by readers, walked over by writers") {
    val tmp = Files.createTempDirectory("graft-genidx-crash").toString
    val root = new Path(s"$tmp/idx")
    val fs = root.getFileSystem(conf)
    GenerationalIndex.append(fs, root, writeDelta(tmp, "base", 0 until 5))
    val v = GenerationalIndex.read(fs, root).version
    // a writer that claimed v+1 and crashed before writing content
    fs.create(new Path(root, f"manifest-${v + 1}%020d.json"), false).close()
    // readers fall back to the last committed manifest
    GenerationalIndex.read(fs, root).version shouldBe v
    // a committer walks over the corpse instead of deadlocking on v+1
    val m = GenerationalIndex.append(fs, root, writeDelta(tmp, "d1", 5 until 9))
    m.version shouldBe v + 2
    readAll(GenerationalIndex.read(fs, root).dirs) shouldBe (0L until 9L)
  }
}
