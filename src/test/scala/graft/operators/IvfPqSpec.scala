package graft.operators

import graft.flow.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfPqSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Deterministic synthetic corpus: n 64-dim vectors clustered around
    * `k` directions (so IVF lists are meaningful), seeded — no
    * Math.random, reruns identical. */
  private def corpus(n: Int, seed: Int = 7): DataFrame = {
    (0 until n).map { i =>
      val rnd = new scala.util.Random(seed * 100003 + i)
      val dir = i % 4
      val v = Array.tabulate(64) { j =>
        val base = if (j % 4 == dir) 1.0f else 0.1f
        base + (rnd.nextFloat() - 0.5f) * 0.4f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("recall@10 >= 0.9 vs exact scan at a pinned seed, and the ADC " +
    "pool + exact re-rank returns exact similarities") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val probe = e.filter($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", probe, 10)
      .as[(Long, Double)].collect()

    // uniform-random embeddings are PQ's hard case (similarities pack
    // into a narrow band, so coarse-score ordering is noisy): recall
    // comes from the pool dial, exactly as documented — poolK covers the
    // band, the exact re-rank does the rest
    val dir = tmpDir("graft_pq") + "/idx"
    val idx = IvfPqIndex.buildAndSave(e, dir, "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 32, seed = 42L)
    val got = idx.topK(e, probe, 10, nprobe = 8, poolK = 150)
      .as[(Long, Double)].collect()
    val recall = (exact.map(_._1).toSet intersect got.map(_._1).toSet).size / 10.0
    assert(recall >= 0.9, s"recall=$recall got=${got.toSeq} exact=${exact.toSeq}")
    // similarities of shared ids are EXACT (re-rank reads full precision)
    val exactSim = exact.toMap
    got.filter(g => exactSim.contains(g._1)).foreach { case (id, sim) =>
      assert(math.abs(sim - exactSim(id)) < 1e-9, s"id=$id $sim vs ${exactSim(id)}")
    }
  }

  test("codebooks and codes are deterministic across input partitionings") {
    val data = corpus(600)
    val d1 = tmpDir("graft_pq_det1") + "/idx"
    val d2 = tmpDir("graft_pq_det2") + "/idx"
    val a = IvfPqIndex.buildAndSave(data.repartition(13), d1,
      "vec_id", "embedding", nlist = 4, m = 8, ksub = 16, seed = 5L)
    val b = IvfPqIndex.buildAndSave(data.repartition(2).sortWithinPartitions(desc("vec_id")),
      d2, "vec_id", "embedding", nlist = 4, m = 8, ksub = 16, seed = 5L)
    assert(a.codebooks.length == b.codebooks.length)
    a.codebooks.zip(b.codebooks).foreach { case (ba, bb) =>
      assert(ba.length == bb.length)
      ba.zip(bb).foreach { case (ca, cb) => assert(ca.toSeq == cb.toSeq) }
    }
    assert(a.coarse.map { case (i, c) => (i, c.toSeq) }.toSeq ==
      b.coarse.map { case (i, c) => (i, c.toSeq) }.toSeq)
    val codesA = a.codes.select($"vec_id", $"pq_code").as[(Long, Seq[Int])]
      .collect().sortBy(_._1).toSeq
    val codesB = b.codes.select($"vec_id", $"pq_code").as[(Long, Seq[Int])]
      .collect().sortBy(_._1).toSeq
    assert(codesA == codesB)
  }

  test("compression: the PQ data dir is <= 1/16 the bytes of the float32 " +
    "vectors it indexes") {
    val data = corpus(4000)
    val base = tmpDir("graft_pq_bytes")
    data.coalesce(4).write.parquet(s"$base/floats")
    IvfPqIndex.buildAndSave(data, s"$base/idx", "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 16, seed = 11L)
    def bytesUnder(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().flatMap {
        case f if f.isDirectory => f.listFiles()
        case f => Array(f)
      }.filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.length).sum
    }
    val floatBytes = bytesUnder(s"$base/floats")
    val codeBytes = bytesUnder(s"$base/idx/data")
    assert(codeBytes * 16 <= floatBytes,
      s"codes=$codeBytes floats=$floatBytes ratio=${codeBytes.toDouble / floatBytes}")
  }

  test("probes prune to the selected list partitions on the loaded index") {
    val e = graft.sources.Tables.embeddings(spark, sfDir)
    val probe = e.filter($"vec_id" === 0).select("embedding")
      .as[Array[Float]].head()
    val dir = tmpDir("graft_pq_prune") + "/idx"
    val idx = IvfPqIndex.buildAndSave(e, dir, "vec_id", "embedding",
      nlist = 8, m = 8, ksub = 16)
    assert(new java.io.File(s"$dir/data/list_id=0").exists())
    val q = idx.topK(e, probe, 5, nprobe = 2, poolK = 20)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("list_id"),
      plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("append: new vectors encode with the frozen codebooks, only " +
    "touched partitions rewrite, they become findable, and the drift " +
    "gate fails loudly leaving the store untouched") {
    val data = corpus(600)
    val dir = tmpDir("graft_pq_app") + "/idx"
    IvfPqIndex.buildAndSave(data, dir, "vec_id", "embedding",
      nlist = 4, m = 8, ksub = 16, seed = 3L)
    val beforeCount = IvfPqIndex.load(spark, dir).codes.count() // eager:
    // the lazy frame would scan files the append is about to replace
    val dirMtimes = (0 until 4).map(l =>
      l -> new java.io.File(s"$dir/data/list_id=$l").lastModified()).toMap

    // append points near the cluster-0 direction: in-distribution
    val newRows = corpus(40, seed = 99)
      .withColumn("vec_id", $"vec_id" + 10000L)
    val stats = IvfPqIndex.append(spark, dir, newRows,
      maxDriftRatio = 100.0, minRowsForDrift = 1L)
    assert(stats.nonEmpty)
    val after = IvfPqIndex.load(spark, dir)
    assert(after.codes.count() == beforeCount + 40)
    // untouched partitions kept their directory identity
    val untouched = (0 until 4).toSet -- stats.keySet
    untouched.foreach { l =>
      assert(new java.io.File(s"$dir/data/list_id=$l").lastModified() ==
        dirMtimes(l), s"untouched list $l was rewritten")
    }
    // an appended vector is findable via its own embedding
    val probe = newRows.filter($"vec_id" === 10000L)
      .select("embedding").as[Array[Float]].head()
    val all = data.unionByName(newRows)
    val hits = after.topK(all, probe, 5, nprobe = 4, poolK = 50)
      .as[(Long, Double)].collect().map(_._1)
    assert(hits.contains(10000L), hits.toSeq.toString)

    // drift gate: far-out-of-distribution vectors fail loudly pre-write
    val weird = (0 until 30).map { i =>
      (20000L + i, Array.tabulate(64)(j => if (j == i % 64) -40f else 39f))
    }.toDF("vec_id", "embedding")
    val cnt = after.codes.count()
    intercept[IllegalStateException] {
      IvfPqIndex.append(spark, dir, weird,
        maxDriftRatio = 1.05, minRowsForDrift = 5L)
    }
    assert(IvfPqIndex.load(spark, dir).codes.count() == cnt)
  }
}
