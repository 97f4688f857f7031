package graft.operators

import java.nio.file.Files

import graft.flow.SparkTestSession
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Write-audit-publish: passing audits publish atomically, failing
  * audits leave the store bit-identical and surface the report, and the
  * whole-table scope catches cross-batch violations a staged-only audit
  * cannot see. */
class WapSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import Expectations._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString
  private def fs =
    new Path("/").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val checks = Seq(
    Unique("k"), Complete("v", 1.0), MeanBetween("n", 0, 100))

  test("a clean batch publishes; a violating batch refuses with an " +
    "untouched store and a report naming the failed check") {
    val dir = tmp("graft_wap") + "/s"
    val ok = Wap.appendAudited(spark, dir,
      (1L to 10L).map(k => (k, "v" + k, k)).toDF("k", "v", "n"), checks)
    assert(ok.published && ok.version == 1L)
    assert(CommitLog.read(spark, new Path(dir)).get.count() == 10)

    // nulls in v + a mean blowout
    val bad = Seq((11L, null.asInstanceOf[String], 5000L))
      .toDF("k", "v", "n")
    val res = Wap.appendAudited(spark, dir, bad, checks)
    assert(!res.published && res.version == 1L)
    assert(CommitLog.currentVersion(fs, new Path(dir)) == 1L)
    assert(CommitLog.read(spark, new Path(dir)).get.count() == 10,
      "refused batch must not be readable")
    val failed = res.report.filter(!_.getBoolean(3)).map(_.getString(0)).toSet
    assert(failed == Set("complete(v)", "mean_between(n)"))
  }

  test("whole-table audit catches a key that is unique within the batch " +
    "but duplicates an EXISTING row; staged-only scope misses it") {
    val dir = tmp("graft_wap_dup") + "/s"
    assert(Wap.appendAudited(spark, dir,
      (1L to 5L).map(k => (k, "v" + k, k)).toDF("k", "v", "n"), checks).published)
    val dup = Seq((3L, "again", 1L)).toDF("k", "v", "n")

    val tableScope = Wap.appendAudited(spark, dir, dup, Seq(Unique("k")))
    assert(!tableScope.published)
    assert(CommitLog.read(spark, new Path(dir)).get.count() == 5)

    val stagedScope = Wap.appendAudited(spark, dir, dup, Seq(Unique("k")),
      auditWholeTable = false)
    assert(stagedScope.published, "batch-local scope: the single row is unique")
    assert(CommitLog.read(spark, new Path(dir)).get.count() == 6)
  }

  test("whole-table audited append declares its snapshot read: any " +
    "intervening commit conflicts instead of blind-publishing") {
    val dir = tmp("graft_wap_occ") + "/s"
    val store = new Path(dir)
    assert(Wap.appendAudited(spark, dir,
      Seq((1L, "a", 1L)).toDF("k", "v", "n"), checks).published)
    val stale = CommitLog.currentVersion(fs, store) // audit pre-image: v1
    // another writer lands between our audit and our publish
    assert(Wap.appendAudited(spark, dir,
      Seq((2L, "b", 1L)).toDF("k", "v", "n"), checks).published)
    // replay the loser's commit exactly as appendAudited issues it
    val staging = Swap.Suffix.staging(store, Swap.newTag())
    Seq((3L, "c", 1L)).toDF("k", "v", "n").write.parquet(staging.toString)
    intercept[CommitLog.ConflictException] {
      CommitLog.commitStaged(spark, store, staging, stale,
        retireNames = Nil, wholeStore = false,
        extraTouched = Seq(CommitLog.WholeStore), blindAppend = false)
    }
    assert(CommitLog.currentVersion(fs, store) == 2L,
      "aborted publish must leave the tip untouched")
  }

  test("two concurrent whole-table audited appends of the same new key: " +
    "exactly one publishes, uniqueness holds at the tip") {
    val dir = tmp("graft_wap_race") + "/s"
    assert(Wap.appendAudited(spark, dir,
      (1L to 5L).map(k => (k, "v" + k, k)).toDF("k", "v", "n"), checks).published)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        val batch = Seq((100L, "dup" + i, 1L)).toDF("k", "v", "n")
        barrier.await() // both audit against the same pre-image
        results.add(Wap.appendAudited(spark, dir, batch, Seq(Unique("k"))).published)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.count(identity) == 1,
      s"exactly one of the racing audited appends may publish: $results")
    val dups = CommitLog.read(spark, new Path(dir)).get
      .filter(org.apache.spark.sql.functions.col("k") === 100L).count()
    assert(dups == 1L, "Unique(k) must hold at the tip under concurrency")
  }
}
