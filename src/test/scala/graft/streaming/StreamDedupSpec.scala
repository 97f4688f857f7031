package graft.streaming

import graft.flow.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

case class Doc(doc_id: Long, text: String)

/** Incremental near-dup dedup against a persistent signature store
  * (StreamOps.nearDupStream): cross-batch dups are dropped, within-batch
  * dups keep the min-id survivor, and a replayed batch is idempotent
  * (same admissions, store unchanged) — the continuous-ingestion form of
  * corpus dedup. */
class StreamDedupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  // long enough that a one-word edit stays above jaccard 0.9 (an edit
  // moves ~3 of ~n shingles; at ~60 tokens J ≈ 55/61 ≈ 0.9)
  private val base = "the quick brown fox jumps over the lazy dog and " +
    "runs far away home tonight under a bright cold moon with friends " +
    "while the river keeps rolling softly past the old stone bridge and " +
    "the wind carries dry leaves across the empty market square where " +
    "lanterns swing slowly casting long amber shadows on the cobblestones " +
    "until the first light of morning returns the town to its usual noise"
  private def edit(w: String) = base.replace("tonight", w)
  private val other = "completely different content about spark engines " +
    "distributed joins shuffles and the adaptive query execution planner"

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_sdedup").toString

  test("cross-batch near-dups are dropped; within-batch keeps min id; " +
    "new content admits") {
    import spark.implicits._
    val store = tmp() + "/sigs"

    // batch 0: doc 1 and its near-dup 2 (one-word edit), unrelated 3
    val b0 = Seq(Doc(1, base), Doc(2, edit("today")), Doc(3, other)).toDF()
    val a0 = StreamOps.applyNearDupBatch(b0, store, 0L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a0 == Seq(1L, 3L), s"admitted $a0")

    // batch 1: doc 4 near-dups ADMITTED history (doc 1), doc 5 is new
    val b1 = Seq(Doc(4, edit("tomorrow")), Doc(5, other + " but reworded " +
      "entirely with novel phrasing and extra unmatched vocabulary")).toDF()
    val a1 = StreamOps.applyNearDupBatch(b1, store, 1L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a1 == Seq(5L), s"admitted $a1")

    // the store holds exactly the admitted signatures
    val stored = spark.read.parquet(store)
      .select("graft_id").as[Long].collect().sorted.toSeq
    assert(stored == Seq(1L, 3L, 5L), s"store $stored")
  }

  test("a replayed batch is idempotent: same admissions, no duplicate " +
    "store rows, and its own prior partition never flags it") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    val b0 = Seq(Doc(1, base), Doc(2, other)).toDF()
    val first = StreamOps.applyNearDupBatch(b0, store, 0L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // replay the same batchId (foreachBatch is at-least-once)
    val replay = StreamOps.applyNearDupBatch(b0, store, 0L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(replay == first, s"replay $replay vs first $first")
    val stored = spark.read.parquet(store)
      .select("graft_id").as[Long].collect().sorted.toSeq
    assert(stored == Seq(1L, 2L), s"store $stored")
  }

  test("degenerate batches: an empty batch admits nothing and leaves " +
    "history intact; an all-dup batch admits nothing") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    val b0 = Seq(Doc(1, base)).toDF()
    assert(StreamOps.applyNearDupBatch(b0, store, 0L).count() == 1)
    // empty batch
    val empty = StreamOps.applyNearDupBatch(b0.limit(0), store, 1L)
    assert(empty.count() == 0)
    // every row a near-dup of history
    val b2 = Seq(Doc(7, edit("whenever")), Doc(8, base)).toDF()
    assert(StreamOps.applyNearDupBatch(b2, store, 2L).count() == 0)
    assert(spark.read.parquet(store).select("graft_id").as[Long]
      .collect().toSeq == Seq(1L))
  }

  test("a store built with a different numHashes is rejected loudly, " +
    "never silently skewing similarity estimates") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    val b0 = Seq(Doc(1, base)).toDF()
    StreamOps.applyNearDupBatch(b0, store, 0L, numHashes = 64)
    val e = intercept[IllegalArgumentException] {
      StreamOps.applyNearDupBatch(b0, store, 1L, numHashes = 128)
    }
    assert(e.getMessage.contains("numHashes=64"), e.getMessage)
  }

  test("maintenance folds old batch partitions into batch=-1 in the " +
    "store and both sidecars; dedup and latest-batch replay survive") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    val other2 = "a third unrelated corpus segment describing parquet " +
      "footers columnar encodings dictionary pages and row group statistics"
    StreamOps.applyNearDupBatch(Seq(Doc(1, base), Doc(2, other)).toDF(), store, 0L)
    StreamOps.applyNearDupBatch(Seq(Doc(3, other2)).toDF(), store, 1L)
    val b2 = Seq(Doc(4, edit("forever")), Doc(5, other2 + " but reworded " +
      "with enough additional novel unmatched vocabulary to stay distinct " +
      "from anything previously admitted into the signature store")).toDF()
    val a2 = StreamOps.applyNearDupBatch(b2, store, 2L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a2 == Seq(5L), s"admitted $a2") // 4 near-dups batch-0's doc 1

    StreamOps.maintainNearDupStore(spark, store)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partNames(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    // batches 0 and 1 folded; the latest (2) keeps its own partition so
    // an at-least-once replay can still exclude and overwrite itself
    assert(partNames(store) == Seq("batch=-1", "batch=2"), partNames(store))
    assert(partNames(store + ".bands") == Seq("batch=-1", "batch=2"))
    assert(partNames(store + ".buckets") == Seq("batch=-1", "batch=2"))
    val stored = spark.read.parquet(store)
      .select("graft_id").as[Long].collect().sorted.toSeq
    assert(stored == Seq(1L, 2L, 3L, 5L), s"store $stored")

    // replay of the latest batch after the fold: identical admissions
    val replay = StreamOps.applyNearDupBatch(b2, store, 2L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(replay == a2, s"replay $replay vs $a2")

    // new batches keep deduping against FOLDED history
    val a3 = StreamOps.applyNearDupBatch(
      Seq(Doc(6, edit("anytime"))).toDF(), store, 3L).count()
    assert(a3 == 0, "near-dup of folded history must still be dropped")

    // a second maintenance pass with nothing new to fold is a no-op
    StreamOps.maintainNearDupStore(spark, store)
    assert(spark.read.parquet(store).count() == 4)

    // out-of-protocol replay of an already-folded batch id fails LOUDLY
    // before touching the store — its prior admissions sit in batch=-1
    // and would silently flag the whole replay as duplicates of itself
    val e = intercept[IllegalArgumentException] {
      StreamOps.applyNearDupBatch(
        Seq(Doc(1, base), Doc(2, other)).toDF(), store, 0L)
    }
    assert(e.getMessage.contains("out-of-protocol replay"), e.getMessage)
    assert(spark.read.parquet(store).count() == 4, "store untouched")
  }

  test("idCoverFilter: gap-split ranges cover exactly the candidate " +
    "clusters and keep the column's literal type") {
    import spark.implicits._
    // two tight clusters far apart — the cover must be two ranges, not
    // one [1, 1000009] span that would defeat row-group pruning
    val ids: Array[Any] = Array[Any](1L, 2L, 3L, 1000007L, 1000009L)
    val df = (Seq(1L, 2L, 3L, 500000L, 1000007L, 1000009L)).toDF("graft_id")
    val cover = StreamOps.idCoverFilter(
      org.apache.spark.sql.functions.col("graft_id"), ids)
    assert(cover.isDefined)
    val covered = df.where(cover.get).as[Long].collect().sorted.toSeq
    // superset of the ids, but NOT the mid-gap value
    assert(covered == Seq(1L, 2L, 3L, 1000007L, 1000009L), covered)
    // string ids: single min/max range; unsupported types: None
    val sCover = StreamOps.idCoverFilter(
      org.apache.spark.sql.functions.col("s"), Array[Any]("b", "d"))
    val sdf = Seq("a", "b", "c", "d", "e").toDF("s")
    assert(sdf.where(sCover.get).as[String].collect().sorted.toSeq ==
      Seq("b", "c", "d"))
    assert(StreamOps.idCoverFilter(
      org.apache.spark.sql.functions.col("x"),
      Array[Any](java.math.BigDecimal.ONE)).isEmpty)
  }

  test("a crash between per-root maintenance folds (store folded, " +
    "sidecars not) leaves the store semantically consistent: dedup and " +
    "a completing fold both still work") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    val other2 = "a separate corpus fragment on shuffle hash joins sort " +
      "merge exchanges and broadcast thresholds inside the planner"
    StreamOps.applyNearDupBatch(Seq(Doc(1, base)).toDF(), store, 0L)
    StreamOps.applyNearDupBatch(Seq(Doc(2, other)).toDF(), store, 1L)
    StreamOps.applyNearDupBatch(Seq(Doc(3, other2)).toDF(), store, 2L)
    // simulate the crash: ONLY the signature store folds; .bands and
    // .buckets keep their per-batch layout
    StreamOps.foldBatchPartitions(spark, store, 128L << 20, reagg = None)
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def partNames(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(partNames(store) == Seq("batch=-1", "batch=2"))
    assert(partNames(store + ".bands") == Seq("batch=0", "batch=1", "batch=2"))

    // the mixed layout still dedups correctly against all of history
    val a3 = StreamOps.applyNearDupBatch(
      Seq(Doc(4, edit("today")), Doc(5, other2 + " with sufficient extra " +
        "novel vocabulary appended to remain fully distinct from history")
      ).toDF(), store, 3L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a3 == Seq(5L), s"admitted $a3") // 4 near-dups folded doc 1

    // the next full maintenance pass completes the interrupted fold
    StreamOps.maintainNearDupStore(spark, store)
    assert(partNames(store) == Seq("batch=-1", "batch=3"))
    assert(partNames(store + ".bands") == Seq("batch=-1", "batch=3"))
    assert(partNames(store + ".buckets") == Seq("batch=-1", "batch=3"))
    assert(spark.read.parquet(store).select("graft_id").as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("a legacy store without sidecars bootstraps them once and keeps " +
    "detecting history dups") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    StreamOps.applyNearDupBatch(Seq(Doc(1, base), Doc(2, other)).toDF(), store, 0L)
    // simulate a store written before the sidecars existed
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(".bands", ".buckets", ".meta").foreach { s =>
      fs.delete(new org.apache.hadoop.fs.Path(store + s), true)
    }
    val a1 = StreamOps.applyNearDupBatch(
      Seq(Doc(3, edit("sometime")), Doc(4, other + " extended with many " +
        "fresh tokens so the jaccard overlap stays far below threshold " +
        "levels across every band of the minhash signature")).toDF(),
      store, 1L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(a1 == Seq(4L), s"admitted $a1") // 3 near-dups legacy doc 1
    assert(fs.exists(new org.apache.hadoop.fs.Path(store + ".bands")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(store + ".buckets")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(store + ".meta")))

    // a crash BETWEEN the two sidecar builds resumes with just the
    // missing one (buckets rebuild from the committed band store)
    fs.delete(new org.apache.hadoop.fs.Path(store + ".buckets"), true)
    val a2 = StreamOps.applyNearDupBatch(
      Seq(Doc(5, edit("whenever"))).toDF(), store, 2L).count()
    assert(a2 == 0, "near-dup must still be dropped after partial bootstrap")
    assert(fs.exists(new org.apache.hadoop.fs.Path(store + ".buckets")))
  }

  test("a store built with different LSH banding is rejected loudly via " +
    "the config sidecar") {
    import spark.implicits._
    val store = tmp() + "/sigs"
    val b0 = Seq(Doc(1, base)).toDF()
    StreamOps.applyNearDupBatch(b0, store, 0L, bands = 16)
    val e = intercept[IllegalArgumentException] {
      StreamOps.applyNearDupBatch(b0, store, 1L, bands = 8)
    }
    assert(e.getMessage.contains("bands=16"), e.getMessage)
  }

  test("the id-pushdown verify fetch and the full-scan fallback admit " +
    "identically") {
    import spark.implicits._
    val mk = (suffix: String) => {
      val store = tmp() + "/sigs" + suffix
      StreamOps.applyNearDupBatch(
        Seq(Doc(1, base), Doc(2, other)).toDF(), store, 0L)
      store
    }
    val b1 = Seq(Doc(3, edit("eventually")), Doc(4, other + " padded with " +
      "plenty of additional distinct vocabulary to stay clear of every " +
      "admitted signature in the persistent history store")).toDF()
    // pushdown path (default cap) vs forced full-scan path (cap = 0)
    val viaPushdown = StreamOps.applyNearDupBatch(b1, mk("a"), 1L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaScan = StreamOps.applyNearDupBatch(b1, mk("b"), 1L,
      maxVerifyFetch = 0)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaPushdown == Seq(4L), s"pushdown admitted $viaPushdown")
    assert(viaScan == viaPushdown, s"scan path admitted $viaScan")
  }

  test("end to end through foreachBatch on a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val store = dir + "/sigs"
    val admitted = scala.collection.mutable.ArrayBuffer[Long]()
    val mem = MemoryStream[Doc]
    val q = StreamOps.nearDupStream(mem.toDF(), store, dir + "/ckpt") {
      (df, _) =>
        admitted.synchronized {
          admitted ++= df.select("doc_id").as[Long].collect()
        }
        ()
    }
    try {
      mem.addData(Doc(10, base), Doc(11, other))
      q.processAllAvailable()
      mem.addData(Doc(12, edit("someday")))  // near-dup of stored 10
      q.processAllAvailable()
      assert(admitted.sorted.toSeq == Seq(10L, 11L), admitted)
    } finally q.stop()
  }
}
