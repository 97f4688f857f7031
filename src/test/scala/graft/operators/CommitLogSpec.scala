package graft.operators

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.flow.SparkTestSession
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The optimistic-concurrency commit log's own matrix: CAS publication,
  * snapshot-isolated readers, disjoint-writer concurrency, overlapping-
  * writer conflicts anchored at the READ version, crash leftovers, and
  * vacuum. Operator-level coverage (Merge/Scd2/IncrementalAgg/Compact on
  * log stores, including real concurrent threads) lives in
  * LogStoreSpec. */
class CommitLogSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Stage rows for partition p=`p` and return the staging path. */
  private def stage(store: Path, p: String, rows: Seq[(Long, String)]): Path = {
    val staging = Swap.Suffix.staging(store, Swap.newTag())
    rows.toDF("k", "v").withColumn("p", org.apache.spark.sql.functions.lit(p))
      .write.partitionBy("p").parquet(staging.toString)
    staging
  }

  private def readAll(store: Path): Set[(Long, String, String)] =
    CommitLog.read(spark, store).map(
      _.select("k", "v", "p").as[(Long, String, String)].collect().toSet)
      .getOrElse(Set.empty)

  test("sequential commits: versions number densely, snapshots replay " +
    "adds and removes, reads prune partitions from the manifest file list") {
    val store = new Path(tmp("graft_cl_seq") + "/s")
    val v1 = CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "a1"))), 0L, Nil, wholeStore = true)
    assert(v1 == 1)
    val v2 = CommitLog.commitStaged(spark, store,
      stage(store, "b", Seq((2L, "b1"))), 1L, Seq("p=b"), wholeStore = false)
    assert(v2 == 2)
    assert(readAll(store) == Set((1L, "a1", "a"), (2L, "b1", "b")))
    // replace partition b
    CommitLog.commitStaged(spark, store,
      stage(store, "b", Seq((3L, "b2"))), 2L, Seq("p=b"), wholeStore = false)
    assert(readAll(store) == Set((1L, "a1", "a"), (3L, "b2", "b")))
    // partition filter prunes to the one dir's files
    val plan = CommitLog.read(spark, store).get
      .filter(org.apache.spark.sql.functions.col("p") === "a")
      .queryExecution.executedPlan
    val scanned = plan.collectLeaves().map(_.toString).mkString
    assert(scanned.contains("p=a") || !scanned.contains("p=b"), scanned)
  }

  test("snapshot isolation: a reader pinned to v1 sees v1's content " +
    "unchanged while later commits logically remove its files") {
    val store = new Path(tmp("graft_cl_pin") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "old"))), 0L, Nil, wholeStore = true)
    val pinned = CommitLog.read(spark, store, Some(1L)).get
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "new"))), 1L, Seq("p=a"), wholeStore = false)
    // tip moved and v1's file is logically removed — the pinned frame
    // still reads the old bytes (vacuum hasn't run)
    assert(pinned.select("v").as[String].collect().toSeq == Seq("old"))
    assert(readAll(store) == Set((1L, "new", "a")))
  }

  test("OCC is anchored at the READ version: a writer that read v1 and " +
    "publishes after an overlapping v2 conflicts even with no CAS race") {
    val store = new Path(tmp("graft_cl_slow") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "base"))), 0L, Nil, wholeStore = true)
    // slow writer stages against v1...
    val slowStaging = stage(store, "a", Seq((1L, "slow")))
    // ...but a fast writer lands v2 on the same partition first
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "fast"))), 1L, Seq("p=a"), wholeStore = false)
    val e = intercept[CommitLog.ConflictException] {
      CommitLog.commitStaged(spark, store, slowStaging, 1L,
        Seq("p=a"), wholeStore = false)
    }
    assert(e.getMessage.contains("re-run"))
    // the loser's files were dropped — not left as orphans-that-look-live
    assert(readAll(store) == Set((1L, "fast", "a")))
    // disjoint slow writer against the SAME stale base succeeds
    CommitLog.commitStaged(spark, store,
      stage(store, "b", Seq((9L, "disjoint"))), 1L, Seq("p=b"), wholeStore = false)
    assert(readAll(store) == Set((1L, "fast", "a"), (9L, "disjoint", "b")))
  }

  test("whole-store commits conflict with everything, including other " +
    "whole-store commits") {
    val store = new Path(tmp("graft_cl_whole") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "x"))), 0L, Nil, wholeStore = true)
    val staged = stage(store, "b", Seq((2L, "y")))
    CommitLog.commitStaged(spark, store,
      stage(store, "c", Seq((3L, "z"))), 1L, Seq("p=c"), wholeStore = false)
    intercept[CommitLog.ConflictException] {
      CommitLog.commitStaged(spark, store, staged, 1L, Nil, wholeStore = true)
    }
  }

  test("concurrent disjoint writers both commit (threads racing the " +
    "same base version)") {
    val store = new Path(tmp("graft_cl_race") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "seed", Seq((0L, "s"))), 0L, Nil, wholeStore = true)
    val parts = Seq("a", "b", "c", "d")
    val stagings = parts.map(p => p -> stage(store, p, Seq((p.head.toLong, p + "!"))))
    val pool = Executors.newFixedThreadPool(parts.size)
    val start = new CountDownLatch(1)
    val results = stagings.map { case (p, staging) =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = {
          start.await()
          CommitLog.commitStaged(spark, store, staging, 1L,
            Seq(s"p=$p"), wholeStore = false)
        }
      })
    }
    start.countDown()
    val versions = results.map(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    // all four committed, at distinct versions 2..5, in some order
    assert(versions.toSet == Set(2L, 3L, 4L, 5L))
    assert(readAll(store).map(_._3) == Set("seed", "a", "b", "c", "d"))
  }

  test("crash leftovers are invisible and vacuum sweeps them: a tmp " +
    "manifest and moved-in-but-uncommitted data files change nothing") {
    val store = new Path(tmp("graft_cl_crash") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "a1"))), 0L, Nil, wholeStore = true)
    // simulate a writer that crashed between staging move-in and CAS:
    // a data file in the store with no manifest, plus a torn tmp manifest
    val orphan = new Path(store, "p=a/part-orphan-deadbeef.parquet")
    val out = fs.create(orphan, true)
    out.write(Array[Byte](1, 2, 3)); out.close()
    val tmpManifest = new Path(CommitLog.logDir(store), ".tmp-crashed")
    val out2 = fs.create(tmpManifest, true)
    out2.write("version\t2\n".getBytes("UTF-8")); out2.close()
    // reads are unaffected (the orphan is not in any manifest)
    assert(readAll(store) == Set((1L, "a1", "a")))
    // the next writer commits normally at v2
    CommitLog.commitStaged(spark, store,
      stage(store, "b", Seq((2L, "b1"))), 1L, Seq("p=b"), wholeStore = false)
    assert(readAll(store) == Set((1L, "a1", "a"), (2L, "b1", "b")))
    // vacuum (grace 0 → orphans old enough) removes orphan + tmp manifest
    CommitLog.vacuum(spark, store, retainVersions = 10, orphanGraceMs = 0L)
    assert(!fs.exists(orphan))
    assert(!fs.exists(tmpManifest))
    assert(readAll(store) == Set((1L, "a1", "a"), (2L, "b1", "b")))
  }

  test("vacuum honors retention: files of versions inside the window " +
    "survive, older removed files are reclaimed, current reads intact") {
    val store = new Path(tmp("graft_cl_vac") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "v1"))), 0L, Nil, wholeStore = true)
    val v1Files = CommitLog.snapshotFiles(fs, store, 1L)
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "v2"))), 1L, Seq("p=a"), wholeStore = false)
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "v3"))), 2L, Seq("p=a"), wholeStore = false)
    // retain 2 → v2, v3 readable; v1's file reclaimed
    CommitLog.vacuum(spark, store, retainVersions = 2, orphanGraceMs = 0L)
    assert(!fs.exists(new Path(store, v1Files.head)))
    assert(CommitLog.read(spark, store, Some(2L)).get
      .select("v").as[String].collect().toSeq == Seq("v2"))
    assert(readAll(store) == Set((1L, "v3", "a")))
  }

  test("checkpoints bound replay: >CheckpointEvery commits still " +
    "snapshot correctly, and vacuum drops pre-checkpoint manifests") {
    val store = new Path(tmp("graft_cl_ckpt") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "p0", Seq((0L, "x0"))), 0L, Nil, wholeStore = true)
    (1 to 12).foreach { i =>
      CommitLog.commitStaged(spark, store,
        stage(store, s"p$i", Seq((i.toLong, s"x$i"))), i.toLong,
        Seq(s"p=p$i"), wholeStore = false)
    }
    assert(CommitLog.currentVersion(fs, store) == 13)
    assert(fs.exists(new Path(CommitLog.logDir(store), f"${10L}%020d.checkpoint")))
    assert(readAll(store).size == 13)
    CommitLog.vacuum(spark, store, retainVersions = 2, orphanGraceMs = 0L)
    // manifests ≤ the checkpoint below the floor are gone; reads intact
    assert(!fs.exists(new Path(CommitLog.logDir(store), f"${1L}%020d.txt")))
    assert(readAll(store).size == 13)
  }

  test("batch meta rides the manifest: tipMeta returns the last commit's " +
    "map and earlier metas are superseded") {
    val store = new Path(tmp("graft_cl_meta") + "/s")
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "x"))), 0L, Nil, wholeStore = true,
      meta = Map("batchId" -> "7"))
    assert(CommitLog.tipMeta(fs, store) == Map("batchId" -> "7"))
    CommitLog.commitStaged(spark, store,
      stage(store, "a", Seq((1L, "y"))), 1L, Seq("p=a"), wholeStore = false,
      meta = Map("batchId" -> "8"))
    assert(CommitLog.tipMeta(fs, store) == Map("batchId" -> "8"))
  }

  test("file stats: recorded from footers at commit, replayed through a " +
    "CHECKPOINT, dropped with their files, and absent-column files " +
    "carry none") {
    val store = new Path(tmp("graft_cl_stats") + "/s")
    // 11 commits so a v10 checkpoint forms; each partition holds a known
    // disjoint key range
    (0 until 11).foreach { i =>
      CommitLog.commitStaged(spark, store,
        stage(store, s"p$i", Seq((i * 100L, s"lo$i"), (i * 100L + 9, s"hi$i"))),
        i.toLong, Nil, wholeStore = false, statsCol = Some("k"))
    }
    assert(fs.exists(new Path(CommitLog.logDir(store), f"${10L}%020d.checkpoint")))
    val tip = CommitLog.currentVersion(fs, store)
    val stats = CommitLog.snapshotFilesWithStats(fs, store, tip)
    assert(stats.nonEmpty && stats.forall(_._2.isDefined), stats.toString)
    // replay crossed the checkpoint: files committed BEFORE v10 kept
    // stats (per FILE — the partition's two rows may span several files,
    // so the union of ranges covers the written keys)
    val early = stats.filter(_._1.startsWith("p=p0/"))
    assert(early.nonEmpty && early.forall(_._2.exists(_.tpe == "long")),
      early.toString)
    assert(early.map(_._2.get.min.toLong).min == 0L &&
      early.map(_._2.get.max.toLong).max == 9L, early.toString)
    // a rewrite retires the old file's stats with the file
    CommitLog.commitStaged(spark, store,
      stage(store, "p0", Seq((5000L, "new"))), tip, Seq("p=p0"),
      wholeStore = false, statsCol = Some("k"))
    val after = CommitLog.snapshotFilesWithStats(
      fs, store, CommitLog.currentVersion(fs, store))
      .filter(_._1.startsWith("p=p0/"))
    assert(after.forall(_._2.exists(s => s.min == "5000" && s.max == "5000")),
      after.toString)
    // overlap arithmetic: long ranges compare numerically, not textually
    val s0 = CommitLog.FileStat("long", "0", "9")
    assert(s0.overlaps(5L, 100L) && !s0.overlaps(10L, 100L))
    assert(CommitLog.FileStat("string", "aa", "cc").overlaps("b", "b"))
    // a commit WITHOUT the stats column records no stats and never prunes
    CommitLog.commitStaged(spark, store,
      stage(store, "px", Seq((1L, "x"))),
      CommitLog.currentVersion(fs, store), Nil, wholeStore = false,
      statsCol = Some("no_such_column"))
    val px = CommitLog.snapshotFilesWithStats(
      fs, store, CommitLog.currentVersion(fs, store))
      .filter(_._1.startsWith("p=px/"))
    assert(px.nonEmpty && px.forall(_._2.isEmpty), px.toString)
  }

  test("fastMinMax: exact table extremes from metadata alone; partial " +
    "stats coverage refuses instead of under-claiming") {
    val store = new Path(tmp("graft_cl_mm") + "/s")
    (0 until 3).foreach { i =>
      CommitLog.commitStaged(spark, store,
        stage(store, s"p$i", Seq((i * 100L, s"lo$i"), (i * 100L + 9, s"hi$i"))),
        i.toLong, Nil, wholeStore = false, statsCol = Some("k"))
    }
    val tip = CommitLog.currentVersion(fs, store)
    assert(CommitLog.fastMinMax(fs, store, tip)
      .contains(("long", "0", "209")))
    // exactness: matches the scanned extremes
    val scanned = CommitLog.read(spark, store).get
      .agg(org.apache.spark.sql.functions.min("k"),
        org.apache.spark.sql.functions.max("k")).head()
    assert(scanned.getLong(0) == 0L && scanned.getLong(1) == 209L)
    // one stat-less file poisons the envelope: None, never a wrong bound
    CommitLog.commitStaged(spark, store,
      stage(store, "px", Seq((999999L, "x"))), tip, Nil,
      wholeStore = false, statsCol = Some("no_such_column"))
    assert(CommitLog.fastMinMax(fs, store,
      CommitLog.currentVersion(fs, store)).isEmpty)
    // an empty store has no extremes
    val empty = new Path(tmp("graft_cl_mm_e") + "/s")
    assert(CommitLog.fastMinMax(fs, empty, 0L).isEmpty)
  }
}
