package graft.operators

import java.nio.file.Files

import graft.flow.SparkTestSession
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Row-level copy-on-write DELETE on commit-log stores: file-grain
  * pruning (untouched files survive BY NAME), SQL NULL-predicate
  * semantics, no-op on no matches, and whole-file deletions. */
class DeleteSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fs = new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def snapshotFileSet(store: String): Set[String] = {
    val p = new Path(store)
    CommitLog.snapshotFiles(fs, p, CommitLog.currentVersion(fs, p)).toSet
  }

  test("delete rewrites ONLY the files holding matches — other " +
    "partitions' files survive by name") {
    val store = tmp("graft_del_prune") + "/s"
    val init = (1L to 40L).map(k => (k, "v" + k, "p" + (k % 4))).toDF("k", "v", "p")
    Merge.into(spark, store, init, Seq("k"), prunePartitions = Some("p"),
      log = Some(true))
    val before = snapshotFileSet(store)

    // all matches live in partition p=1 (k % 4 == 1)
    val out = Delete.where(spark, store, $"k" % 4 === 1 && $"k" <= 20)
    assert(out.count() == 35)
    assert(out.filter($"k" % 4 === 1 && $"k" <= 20).count() == 0)

    val after = snapshotFileSet(store)
    val untouchedBefore = before.filterNot(_.startsWith("p=p1/"))
    val untouchedAfter = after.filterNot(_.startsWith("p=p1/"))
    // file-grain COW: every non-matching partition's file is the SAME file
    assert(untouchedBefore == untouchedAfter)
    // and the matched partition's files were replaced
    assert(before.filter(_.startsWith("p=p1/")) !=
      after.filter(_.startsWith("p=p1/")))
  }

  test("no matches → no commit, version unchanged") {
    val store = tmp("graft_del_noop") + "/s"
    Merge.into(spark, store, Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      Seq("k"), log = Some(true))
    val v = CommitLog.currentVersion(fs, new Path(store))
    val out = Delete.where(spark, store, $"k" > 100)
    assert(out.count() == 2)
    assert(CommitLog.currentVersion(fs, new Path(store)) == v)
  }

  test("NULL predicate keeps the row (SQL DELETE semantics)") {
    val store = tmp("graft_del_null") + "/s"
    val init = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("k", "v")
    Merge.into(spark, store, init, Seq("k"), log = Some(true))
    // v = 'x' is NULL for k=2: that row must stay
    val out = Delete.where(spark, store, $"v" === "x")
    assert(out.select("k").as[Long].collect().toSet == Set(2L, 3L))
  }

  test("a file whose rows ALL match is retired with no replacement") {
    val store = tmp("graft_del_all") + "/s"
    val init = (1L to 10L).map(k => (k, "p" + (k % 2))).toDF("k", "p")
    Merge.into(spark, store, init, Seq("k"), prunePartitions = Some("p"),
      log = Some(true))
    val out = Delete.where(spark, store, $"p" === "p1")
    assert(out.select("k").as[Long].collect().toSet ==
      (1L to 10L).filter(_ % 2 == 0).toSet)
    assert(snapshotFileSet(store).forall(!_.startsWith("p=p1/")))
  }

  test("deleted rows reappear nowhere after a subsequent merge (the " +
    "rewrite is the table, not a mask)") {
    val store = tmp("graft_del_merge") + "/s"
    Merge.into(spark, store,
      (1L to 10L).map(k => (k, "v" + k)).toDF("k", "v"), Seq("k"),
      log = Some(true))
    Delete.where(spark, store, $"k" % 2 === 0)
    Merge.into(spark, store, Seq((100L, "new")).toDF("k", "v"), Seq("k"))
    val keys = CommitLog.read(spark, new Path(store)).get
      .select("k").as[Long].collect().toSet
    assert(keys == (1L to 10L).filter(_ % 2 == 1).toSet + 100L)
  }
}
