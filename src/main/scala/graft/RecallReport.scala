package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible ANN recall artifact (VERDICT r13 item 4): the ≥0.9
  * recall gates for q_ann_topk / q_ann_topk_q8 / q_ann_topk_pq /
  * q_ann_topk_pca have lived only inside ScalaTest specs; this main
  * measures recall@10 for every ANN index variant against the exact
  * brute-force cosine ranking (the q_sim_topk ground truth) over a
  * deterministic probe panel, and writes one JSON artifact to the repo
  * root so the cut (no in-memory HNSW; disk-resident IVF/PQ/LSH/PCA
  * substitutes) is auditable from outside the test suite.
  *
  * Usage: runMain graft.RecallReport [sfDir] [outFile] [nProbes]
  * Defaults: /root/testdata/sf0.1  RECALL_r17.json  20
  *
  * Since r17 the ivf_flat / ivf_pq / pca16 variants run at their AUTO
  * parameters (measured cluster-R² → nprobe/poolK, explained-variance
  * ratio → poolK — matching the registered queries), and the params
  * JSON carries the measured stats plus the chosen values, so the
  * artifact documents WHAT the rules decided and why.
  *
  * Contract notes: each variant runs with the SAME parameters its
  * registered query uses; every variant (and the exact ranking) answers
  * top-(k+1) over the full corpus and drops the probe row itself, so
  * self-matches can't inflate recall. Index size is measured on disk
  * where the index persists (IVF, IVF-PQ), or as the logical payload the
  * scan reads where it is computed inline (int8, PCA); hyperplane LSH
  * materializes nothing (buckets are computed per query).
  *
  * TWO panels, because recall on the fixture alone would mislead in both
  * directions. The fixture embeddings are near-isotropic (max pairwise
  * cosine ≈ 0.5; an exact "neighbor" at cosine 0.30 and a miss at 0.29
  * are practically interchangeable) — the documented WORST case for
  * every coarse-score family, where id-recall at a fixed pool fraction
  * degrades with corpus size by construction. So each variant reports
  * (a) id-recall@10 AND the similarity ratio Σsim(returned)/Σsim(exact)
  * — the standard quality measure that captures "the misses were
  * epsilon-worse" — on the fixture, and (b) the same on a deterministic
  * CLUSTERED panel of identical n and dim (the geometry real embedding
  * corpora have, planted 32-way cluster structure), where id-recall is
  * the meaningful number.
  */
object RecallReport {

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  private def dirBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }

  /** Deterministic clustered panel with the geometry real embedding
    * corpora have: `nClusters` unit centers from a splitmix-style integer
    * mix, each vector = its cluster center + bounded deterministic noise
    * (norms vary by the noise term; every measured metric is cosine-based
    * and therefore scale-invariant). Same n/dim as the fixture so the two
    * panels differ only in geometry. */
  private def clusteredPanel(
      spark: SparkSession, n: Int, dim: Int, nClusters: Int): DataFrame = {
    import spark.implicits._
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def unit(seed: Long): Array[Double] = {
      val v = Array.tabulate(dim)(j => mix(seed * 8191L + j).toDouble / Long.MaxValue)
      val nn = math.sqrt(v.map(x => x * x).sum).max(1e-12)
      v.map(_ / nn)
    }
    val centers = Array.tabulate(nClusters)(c => unit(0xc0ffee00L + c))
    (0 until n).map { i =>
      val c = centers(i % nClusters)
      val noise = unit(0xabcdef00L + i)
      val v = c.indices.map(j => (c(j) + 0.25 * noise(j)).toFloat).toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private case class Variant(
      name: String, query: String, params: String,
      indexBytes: DataFrame => Long,
      run: (DataFrame, Long, Array[Float], Int) => DataFrame)

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outFile = args.lift(1).getOrElse("RECALL_r17.json")
    val nProbes = args.lift(2).map(_.toInt).getOrElse(20)
    val k = 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.operators.{IvfIndex, IvfPqIndex, Pca, Similarity}

    val fixture = graft.sources.Tables.embeddings(spark, sfDir).persist()
    val n = fixture.count()
    val dim = fixture.select(size(col("embedding"))).head().getInt(0)
    val clustered = clusteredPanel(spark, n.toInt, dim, nClusters = 32).persist()

    /** Run every variant over one corpus panel; returns the per-variant
      * JSON rows. Builds each persistent index once per panel. */
    def runPanel(corpus: DataFrame, label: String): Seq[String] = {
      val pqBase = GraftQuery.tempDir("graft_recall_pq")
      val pqDir = pqBase + "/idx"
      val pq = IvfPqIndex.buildAndSave(
        corpus, pqDir, "vec_id", "embedding", nlist = 8, m = 8, ksub = 32)
      val ivfBase = GraftQuery.tempDir("graft_recall_ivf")
      val ivfDir = ivfBase + "/idx"
      val ivf = IvfIndex.build(corpus, "vec_id", "embedding", nlist = 8)
      ivf.save(ivfDir)
      val pca = Pca.fit(corpus, "embedding", k = 16)
      try {

      val autoPlanes = Similarity.autoPlanes(n)
      val autoProbes = Similarity.autoProbes(n, autoPlanes)
      val variants = Seq(
        Variant("lsh_multiprobe", "q_ann_topk",
          s""""planes":$autoPlanes,"planes_rule":"autoPlanes(n)",""" +
            s""""probes":$autoProbes,"probes_rule":"autoProbes(n, planes)"""",
          _ => 0L,
          (c, _, p, kk) =>
            Similarity.lshTopK(c, "vec_id", "embedding", p, kk,
              planes = autoPlanes, numProbes = autoProbes)),
        Variant("int8_scan", "q_ann_topk_q8", "\"poolK\":50",
          c => n * (dim + 8L), // int8 codes + per-row scale the coarse scan reads
          (c, _, p, kk) => Similarity.quantizedTopK(c, "vec_id", "embedding", p, kk)),
        Variant("ivf_pq", "q_ann_topk_pq",
          s""""nlist":8,"m":8,"ksub":32,"cluster_r2":${fmt(pq.clusterR2)},""" +
            s""""nprobe":${pq.autoNprobe},"nprobe_rule":"autoNprobe(R2)",""" +
            s""""poolK":${pq.autoPoolK(k)},"poolK_rule":"autoPoolK(k)"""",
          _ => dirBytes(pqDir),
          (c, _, p, kk) => pq.topK(c, p, kk)), // auto nprobe/poolK
        Variant("pca16", "q_ann_topk_pca",
          s""""k":16,"evr":${fmt(pca.explainedVarianceRatio)},""" +
            s""""poolK":${Similarity.pcaAutoPoolK(pca, k)},""" +
            "\"poolK_rule\":\"pcaAutoPoolK(evr)\"",
          _ => (16L * dim + dim + 16L) * 8L + n * (16L * 8L + 8L),
          (c, _, p, kk) => Similarity.pcaTopK(c, "vec_id", "embedding", p, kk, pca)),
        Variant("ivf_flat", "(library: IvfIndex)",
          s""""nlist":8,"cluster_r2":${fmt(ivf.clusterR2)},""" +
            s""""nprobe":${ivf.autoNprobe},"nprobe_rule":"autoNprobe(R2)"""",
          _ => dirBytes(ivfDir),
          (c, _, p, kk) => ivf.topK(p, kk))) // auto nprobe

      // deterministic probe panel: the nProbes smallest vec_ids
      val probes: Seq[(Long, Array[Float])] = corpus
        .orderBy("vec_id").limit(nProbes)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

      // (id, sim) pairs minus the probe row itself
      def top(df: DataFrame, self: Long): Seq[(Long, Double)] =
        df.select(col(df.columns.head).cast("long"), col(df.columns(1)).cast("double"))
          .collect().map(r => (r.getLong(0), r.getDouble(1)))
          .filter(_._1 != self).take(k).toSeq

      val exact: Map[Long, Seq[(Long, Double)]] = probes.map { case (id, p) =>
        id -> top(Similarity.bruteForceTopK(corpus, "vec_id", "embedding", p, k + 1), id)
      }.toMap

      val out = variants.map { v =>
        val perProbe = probes.map { case (id, p) =>
          val got = top(v.run(corpus, id, p, k + 1), id)
          val exIds = exact(id).map(_._1).toSet
          val recall = (exIds intersect got.map(_._1).toSet).size.toDouble / exIds.size
          val exSum = exact(id).map(_._2).sum
          val simRatio = if (exSum <= 0) 1.0 else (got.map(_._2).sum / exSum).min(1.0)
          (recall, simRatio)
        }
        val recall = perProbe.map(_._1).sum / perProbe.size
        val minRecall = perProbe.map(_._1).min
        val simRatio = perProbe.map(_._2).sum / perProbe.size
        val bytes = v.indexBytes(corpus)
        println(s"[recall] $label/${v.name}: recall=${fmt(recall)} " +
          s"min=${fmt(minRecall)} simRatio=${fmt(simRatio)} bytes=$bytes")
        s"""      "${v.name}": {"query":"${v.query}","recall_at_10":${fmt(recall)},""" +
          s""""min_recall":${fmt(minRecall)},"sim_ratio":${fmt(simRatio)},""" +
          s""""params":{${v.params}},"index_bytes":$bytes}"""
      }
      out
      // per-panel cleanup (r14 ADVICE): two panels per run each built
      // fresh on-disk indexes and caches — release them here or they
      // live for the JVM/filesystem lifetime of the tool
      } finally {
        ivf.assigned.unpersist()
        pq.codes.unpersist()
        GraftQuery.deleteRecursively(new java.io.File(pqBase))
        GraftQuery.deleteRecursively(new java.io.File(ivfBase))
      }
    }

    val fixtureRows = runPanel(fixture, "fixture")
    val clusteredRows = runPanel(clustered, "clustered")

    val json =
      s"""{
         |  "sf_dir": "$sfDir",
         |  "corpus_rows": $n,
         |  "dim": $dim,
         |  "k": $k,
         |  "n_probes": $nProbes,
         |  "exact_baseline": "Similarity.bruteForceTopK (the q_sim_topk ranking), top-(k+1) minus self",
         |  "note": "fixture embeddings are near-isotropic (ANN worst case: exact neighbors sit at cosine ~0.3 in a corpus-wide noise band, so id-recall at a fixed pool fraction is structurally low while sim_ratio stays ~1); the clustered panel has the planted-structure geometry real embedding corpora show, where id-recall is the meaningful gate",
         |  "panels": {
         |    "fixture_isotropic": {
         |${fixtureRows.mkString(",\n")}
         |    },
         |    "clustered_32way": {
         |${clusteredRows.mkString(",\n")}
         |    }
         |  }
         |}
         |""".stripMargin
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[recall] wrote $outFile")
    fixture.unpersist()
    clustered.unpersist()
    spark.stop()
  }
}
