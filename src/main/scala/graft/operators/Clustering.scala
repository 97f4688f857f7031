package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space clustering: nearest-centroid assignment as a narrow
  * codegen'd scan, k-means fitting under the driver-bounded-sample
  * contract, and SemDeDup-style semantic deduplication on top of both.
  *
  * Scale shape: centroids are bounded metadata (k × dim doubles — the
  * same contract as the IVF centroid tables), so the assignment pass is
  * a pure per-row map over literal centroids: no join, no shuffle, full
  * whole-stage codegen. The only shuffles anywhere here are the one
  * label×dim aggregate in [[labelCentroids]] and the per-cluster
  * repartition in [[semanticDedup]]'s bounded pairwise stage.
  */
object Clustering {

  /** d²(vec, literal centroid) as a left-to-right fold — the SAME op
    * order as the oracle's list_sum(list_transform(...)) replay, so a
    * rounded distance crosses rounding boundaries identically in both
    * engines. */
  def dist2ToCentroid(vec: Column, c: Array[Double]): Column =
    aggregate(
      zip_with(vec, typedLit(c.toSeq),
        (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, v) => acc + v)

  /** struct(d2, id) of the nearest centroid via a when-fold over the
    * literal centroids, distances rounded to `roundTo` decimals first.
    * Strict `<` with centroids processed in ascending-id order keeps the
    * LOWER id on ties — the LocalKMeans.assign contract, and the reason
    * the rounding exists: FP fold noise between engines lands on the
    * same rounded value, and a genuine tie resolves by id in both. */
  def nearestStruct(
      vec: Column,
      centroids: Seq[(Int, Array[Double])],
      roundTo: Int = 6): Column = {
    require(centroids.nonEmpty, "no centroids")
    require(centroids.map(_._1) == centroids.map(_._1).sorted,
      "centroids must be in ascending id order (tie-break contract)")
    require(centroids.size <= 256,
      s"${centroids.size} centroids would inline a ${centroids.size}-deep " +
        "when-fold; use IvfIndex for large-k routing")
    val ds = centroids.map { case (id, c) =>
      (round(dist2ToCentroid(vec, c), roundTo), id)
    }
    val init = struct(ds.head._1.as("d"), lit(ds.head._2).as("j"))
    ds.tail.foldLeft(init) { case (acc, (d, id)) =>
      when(d < acc.getField("d"), struct(d.as("d"), lit(id).as("j")))
        .otherwise(acc)
    }
  }

  /** Nearest-centroid id (see [[nearestStruct]]). */
  def nearestCentroid(
      vec: Column,
      centroids: Seq[(Int, Array[Double])],
      roundTo: Int = 6): Column =
    nearestStruct(vec, centroids, roundTo).getField("j")

  /** Per-label elementwise-mean centroids, computed distributed: ONE
    * posexplode aggregate — (label, pos) partials combine map-side, so
    * at 100 TB only labels × dim rows cross the wire — collected as
    * bounded metadata (the IVF centroid-fetch contract). Components
    * round to 6 decimals so Spark and the DuckDB oracle quantize the
    * centroids identically before any distance math. */
  def labelCentroids(
      df: DataFrame,
      labelCol: String,
      vecCol: String): Seq[(Int, Array[Double])] = {
    val rows = df
      .select(col(labelCol).cast("int").as("l"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("p", "x")))
      .groupBy("l", "p").agg(avg("x").as("m"))
      .collect()
    rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (l, rs) =>
      val arr = rs.sortBy(_.getInt(1))
        .map(r => BigDecimal(r.getDouble(2))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        .toArray
      (l, arr)
    }
  }

  /** Fit k centroids with the deterministic driver-local k-means
    * (LocalKMeans): collect a fraction-bounded sample, sort it by id so
    * the fit is independent of upstream partitioning, run seeded
    * k-means++/Lloyd's with restarts. At 100 TB `sampleFraction` bounds
    * the driver copy by contract — same shape as the IVF-PQ codebook
    * fits. Returned centroids are in ascending-index order, components
    * rounded to 6 (the [[nearestStruct]] quantization contract). */
  def kmeansFit(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      seed: Long = 42L,
      sampleFraction: Double = 1.0): Seq[(Int, Array[Double])] = {
    val sampled =
      if (sampleFraction >= 1.0) df else df.sample(sampleFraction, seed)
    val pts = sampled
      .select(col(idCol).cast("long").as("i"),
        col(vecCol).cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
      .map(_._2)
    LocalKMeans.fit(pts, k, seed).zipWithIndex.map { case (c, j) =>
      (j, c.map(x =>
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toSeq
  }

  /** Assign every row to its nearest centroid: narrow, no shuffle.
    * Output adds `cluster` (int) and `d2` (rounded squared distance). */
  def assign(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val ns = nearestStruct(col(vecCol), centroids)
    df.withColumn("graft_ns", ns)
      .withColumn("cluster", col("graft_ns.j"))
      .withColumn("d2", col("graft_ns.d"))
      .drop("graft_ns")
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * near-duplicate pruning — cluster the embeddings, compare pairs ONLY
    * within a cluster, and drop every vector that has a more-senior
    * (lower-id) neighbor at cosine ≥ `threshold`. Clustering bounds the
    * quadratic term to Σ(cluster size)² instead of n²; missing the rare
    * cross-cluster duplicate is the paper's accepted approximation
    * (DedupSpec pins k=1 ≡ exact brute force). Chains resolve
    * seniority-first: in {a~b, b~c, a≁c} both b and c drop — every
    * dropped row names a lower-id within-cluster witness, and no two
    * SAME-CLUSTER survivors are within threshold of each other.
    *
    * Plan: fit (driver-bounded sample) → narrow assign → self-join on
    * cluster id (hash shuffle at cluster grain — k-means keeps cluster
    * sizes near n/k, and the threshold filter runs inside the join) →
    * distinct dropped ids → left_anti back onto the input. */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      threshold: Double,
      seed: Long = 42L,
      sampleFraction: Double = 1.0): DataFrame = {
    val cents = kmeansFit(df, idCol, vecCol, k, seed, sampleFraction)
    val assigned = assign(df, vecCol, cents)
      .select(col("cluster"), col(idCol), col(vecCol))
    val l = assigned.select(col("cluster"), col(idCol).as("graft_id_a"),
      col(vecCol).as("graft_va"))
    val r = assigned.select(col("cluster"), col(idCol).as("graft_id_b"),
      col(vecCol).as("graft_vb"))
    val dropped = l.join(r, Seq("cluster"))
      .filter(col("graft_id_a") < col("graft_id_b"))
      .filter(Similarity.cosine(col("graft_va"), col("graft_vb")) >= threshold)
      .select(col("graft_id_b").as(idCol))
      .distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }
}
