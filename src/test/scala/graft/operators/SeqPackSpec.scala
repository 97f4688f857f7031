package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-document best-fit packing: the property matrix the layout must
  * hold at any scale — no doc ever splits, sequences never span shards,
  * capacity is respected, utilization at-or-above the naive in-order
  * first-fit a pipeline would otherwise ship, and the layout is a pure
  * function of the doc set (partitioning-independent). The concat-then-
  * chunk variant is oracle-gated separately (q_seq_pack). */
class SeqPackSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ctx = 100

  private def docs(n: Int) = (1 to n).map { i =>
    // deterministic, lumpy sizes: 5..95 tokens, a few oversized later
    val words = 5 + (i * 37) % 91
    (i.toLong, Seq.fill(words)("w").mkString(" "))
  }.toDF("doc_id", "text")

  test("no doc splits, capacity holds, sequences stay inside their shard") {
    val d = docs(400)
    val packed = SeqPack.packBestFit(d, "doc_id", "text", ctx, shards = 4)
      .persist()
    assert(packed.count() == 400) // every doc placed exactly once
    assert(packed.select(countDistinct("doc_id")).head().getLong(0) == 400)
    // per-sequence fill ≤ ctx (oversized singletons cap at ctx by design)
    val overfull = packed.groupBy("seq_id")
      .agg(sum(least($"n_tokens", lit(ctx.toLong))).as("fill"))
      .filter($"fill" > ctx).count()
    assert(overfull == 0)
    // a doc's offset + its (capped) tokens never crosses the boundary
    val crossing = packed
      .filter($"seq_off" + least($"n_tokens", lit(ctx.toLong)) > ctx).count()
    assert(crossing == 0)
    // seq_id encodes its shard — sequences cannot span shards
    val foreign = packed.filter(expr("seq_id div 1000000000000 != shard")).count()
    assert(foreign == 0)
    packed.unpersist()
  }

  test("utilization beats or matches naive in-order first-fit on the " +
    "fixture, and padding is measured") {
    val d = docs(400)
    val packed = SeqPack.packBestFit(d, "doc_id", "text", ctx, shards = 4)
    val u = SeqPack.utilization(packed, ctx)
    // naive baseline: same shards, docs in id order, one open bin —
    // append or start a new sequence when the doc doesn't fit
    val naive = packed.select($"shard", $"doc_id", $"n_tokens")
      .as[(Int, Long, Long)].collect()
      .groupBy(_._1).map { case (_, ds) =>
        var bins = 0L; var rem = 0L
        ds.sortBy(_._2).foreach { case (_, _, n0) =>
          val n = math.min(n0, ctx.toLong)
          if (n > rem) { bins += 1; rem = ctx.toLong }
          rem -= n
        }
        (ds.map(t => math.min(t._3, ctx.toLong)).sum, bins)
      }
    val naiveU = naive.map(_._1).sum.toDouble / (naive.map(_._2).sum * ctx)
    assert(u >= naiveU, s"best-fit $u < naive $naiveU")
    assert(u > 0.8, s"utilization $u suspiciously low for lumpy small docs")
  }

  test("layout is deterministic across input partitionings; oversized " +
    "docs get flagged singleton sequences") {
    val base = docs(200).unionByName(
      Seq((9001L, Seq.fill(250)("w").mkString(" "))).toDF("doc_id", "text"))
    def layout(df: org.apache.spark.sql.DataFrame) =
      SeqPack.packBestFit(df, "doc_id", "text", ctx, shards = 3)
        .select($"doc_id", $"seq_id", $"seq_off", $"truncated")
        .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val a = layout(base.repartition(17))
    val b = layout(base.repartition(2).sortWithinPartitions(desc("doc_id")))
    assert(a == b)
    val big = a.find(_._1 == 9001L).get
    assert(big._4, "oversized doc must be flagged truncated")
    assert(big._3 == 0L)
    // nothing else shares the oversized doc's sequence
    assert(a.count(_._2 == big._2) == 1)
  }
}
