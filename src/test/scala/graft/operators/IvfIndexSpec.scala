package graft.operators

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class IvfIndexSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("IVF index: full-probe equals brute force; partial probe has good recall") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val probe = e.filter($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", probe, 10)
      .as[(Long, Double)].collect().map(_._1)

    val idx = IvfIndex.build(e, "vec_id", "embedding", nlist = 8)
    // probing ALL lists must reproduce brute force exactly
    val full = idx.topK(probe, 10, nprobe = 8).as[(Long, Double)].collect().map(_._1)
    assert(full.toSeq == exact.toSeq)
    // probing half the lists keeps decent recall on the fixture
    val half = idx.topK(probe, 10, nprobe = 4).as[(Long, Double)].collect().map(_._1).toSet
    val recall = (exact.toSet intersect half).size.toDouble / exact.length
    assert(recall >= 0.5, s"recall=$recall")
    idx.assigned.unpersist()
  }

  test("a saved index loads with identical topK and its probes prune " +
    "to the selected list partitions") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val probe = e.filter($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val built = IvfIndex.build(e, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/idx"
    built.save(dir)
    val loaded = IvfIndex.load(spark, dir)

    val a = built.topK(probe, 10, nprobe = 3).as[(Long, Double)].collect().toSeq
    val b = loaded.topK(probe, 10, nprobe = 3).as[(Long, Double)].collect().toSeq
    assert(a == b, s"built=$a loaded=$b")

    // the on-disk layout is hive-partitioned on list_id, and the probe's
    // list filter reaches the scan as a PARTITION filter (file pruning —
    // the read-side point of IVF at 100 TB)
    assert(new java.io.File(s"$dir/data/list_id=0").exists())
    val q = loaded.topK(probe, 10, nprobe = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("list_id"), plan.linesIterator
        .filter(_.contains("PartitionFilters")).mkString("\n"))
    built.assigned.unpersist()
  }

  test("IVF assignment is complete and deterministic under a seed") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val a1 = IvfIndex.build(e, "vec_id", "embedding", nlist = 4)
    val a2 = IvfIndex.build(e, "vec_id", "embedding", nlist = 4)
    assert(a1.assigned.count() == e.count())
    val m1 = a1.assigned.select("vec_id", "list_id").as[(Long, Int)].collect().toMap
    val m2 = a2.assigned.select("vec_id", "list_id").as[(Long, Int)].collect().toMap
    assert(m1 == m2)
    a1.assigned.unpersist(); a2.assigned.unpersist()
  }
}
