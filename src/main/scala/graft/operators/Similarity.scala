package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths (BASELINE.json north_star):
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Embarrassingly parallel scan + TakeOrderedAndProject (per-partition
  *    heaps, k rows to the driver per partition — no full sort).
  *  - `lshTopK`: random-hyperplane LSH buckets + rerank — the scale path.
  *    At 100 TB the scan-everything baseline reads everything per probe;
  *    bucketing reads ~1/2^planes of it (tunable recall/cost via
  *    multi-probe bit flips).
  *
  * All math runs in Double via codegen'd higher-order functions; float
  * elements are upcast exactly.
  */
object Similarity {

  /** dot(a, b) in Double (left-to-right fold, reproducible). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via composed higher-order functions — the reference
    * formulation the native expression is checked against. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine via the native codegen'd expression (the hot-path default —
    * single fused loop, no per-element lambdas; bit-identical to
    * cosineHof). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.cosineF(a, b)

  /** Deterministic pseudo-random hyperplanes: plane p's component j is a
    * zero-mean value derived from xxhash64(seed, p, j). Sign of the dot
    * product gives bit p of the bucket id. Everything is a pure column
    * expression — the "planes" are never materialized driver-side. */
  private def planeComponent(p: Int, j: Column, seed: Long): Column =
    (pmod(xxhash64(lit(seed), lit(p), j), lit(2000001L)) - 1000000L).cast("double")

  private def planeDot(vec: Column, p: Int, seed: Long): Column =
    aggregate(
      zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, j) => x.cast("double") * planeComponent(p, j, seed)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Bucket id = `planes`-bit signature of hyperplane sides, via the
    * composed higher-order-function formulation — the reference form the
    * native expression is parity-checked against. Falls out of
    * whole-stage codegen (planes × d lambda frames per row); use
    * [[hyperplaneBucket]] in pipelines. */
  def hyperplaneBucketHof(vec: Column, planes: Int, seed: Long = 42L): Column =
    (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
      shiftleft(acc, 1).bitwiseOR(when(planeDot(vec, p, seed) >= 0, 1L).otherwise(0L))
    }

  /** Bucket id = `planes`-bit signature of hyperplane sides. Collision
    * probability rises with cosine similarity (Charikar 2002 — SimHash for
    * angular distance). Native codegen'd expression (one fused
    * planes × d loop, bit-compatible with [[hyperplaneBucketHof]]) — this
    * runs over the FULL corpus in embeddingNearDup/lshTopK, so it must
    * stay inside whole-stage codegen. */
  def hyperplaneBucket(vec: Column, planes: Int, seed: Long = 42L): Column =
    org.apache.spark.sql.graft.HashExpressions.hyperplaneSig(vec, planes, seed)

  /** Plane component for the ORACLE-REPLAYABLE hyperplane signature
    * ([[replayableHyperplaneBucket]]): a zero-mean integer in
    * [−10⁶, 10⁶] derived from the md5 of `"gp:p:j"` — the one hash both
    * this JVM and DuckDB SQL compute identically
    * (`('0x' || substring(md5('gp:p:j'), 1, 8))::BIGINT % 2000001 −
    * 1000000`), which is what lets an oracle replay the bucket
    * assignment exactly. */
  def md5PlaneComponent(p: Int, j: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"gp:$p:$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 2000001L - 1000000L
  }

  /** DETERMINISM-BY-CONSTRUCTION hyperplane bucket, SQL-replayable in
    * DuckDB (the q_embedding_near_dup / q_semantic_dedup oracle path —
    * the xxhash64 planes of [[hyperplaneBucket]] have no DuckDB
    * equivalent):
    *
    *  - elements quantize to integers q_j = round(x_j · 10⁶) — both
    *    engines do one IEEE double multiply then half-away-from-zero
    *    rounding, so q_j is bit-identical cross-engine;
    *  - plane components are md5-derived integers
    *    ([[md5PlaneComponent]]) precomputed driver-side into literal
    *    arrays (planes × dim longs — bounded metadata, codegen-friendly);
    *  - the plane dot is an EXACT int64 sum (|q| ≤ 10⁷ · max|x|,
    *    |c| ≤ 10⁶, so dim ≤ 1024 stays far under 2⁶³ for any
    *    normalized-ish embedding) — no float accumulation order anywhere,
    *    so the SIGN (= the bucket bit) is a pure function of the data on
    *    both engines. Bit p sits at position planes−1−p, matching
    *    [[hyperplaneBucketHof]]'s fold order. */
  def replayableHyperplaneBucket(vec: Column, planes: Int, dim: Int): Column =
    org.apache.spark.sql.graft.Md5Expressions.md5PlaneSig(vec, planes, dim)

  /** The composed higher-order-function spelling of
    * [[replayableHyperplaneBucket]] — the literal algebra the DuckDB
    * oracle replays (quantize → zip_with literal plane components →
    * exact int64 aggregate → sign-bit fold). Kept as the parity witness:
    * Md5KernelParitySpec pins the native kernel bit-equal to this form,
    * which is what lets the fused expression carry the oracle contract.
    * Interpreted (CodegenFallback) per element — never the scan path. */
  def replayableHyperplaneBucketHof(vec: Column, planes: Int, dim: Int): Column = {
    require(planes >= 1 && planes <= 30, s"planes=$planes out of range")
    val qv = transform(vec, x => round(x.cast("double") * lit(1000000.0)).cast("long"))
    (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
      val comps = (0 until dim).map(j => md5PlaneComponent(p, j))
      val dt = aggregate(
        zip_with(qv, typedLit(comps), (a, b) => a * b), lit(0L), _ + _)
      shiftleft(acc, 1).bitwiseOR(when(dt >= 0, 1L).otherwise(0L))
    }
  }

  /** Vector width for [[replayableHyperplaneBucket]]'s literal component
    * table — one scalar aggregate, the same bounded-metadata class as
    * q_ann_topk's probe fetch. */
  def vecDim(df: DataFrame, vecCol: String): Int =
    df.agg(max(size(col(vecCol)))).head.getInt(0)

  /** COUNT(*) and vector width in ONE scalar-aggregate job — the two
    * driver-side scalars the adaptive replayable paths need
    * ([[autoPlanes]]'s n, [[replayableHyperplaneBucket]]'s dim). Fused
    * because each was its own Spark action: at bench scale the second
    * job's fixed cost (~150 ms) was a measurable slice of
    * q_embedding_near_dup / q_semantic_dedup. */
  def countAndDim(df: DataFrame, vecCol: String): (Long, Int) = {
    val r = df.agg(count(lit(1)), max(size(col(vecCol)))).head
    (r.getLong(0), r.getInt(1))
  }

  /** Scale-adaptive hyperplane count: the smallest k (clamped to
    * [minPlanes, 16]) with targetBucket·2ᵏ ≥ n, i.e. planes ∝ log n —
    * the published hyperplane-LSH operating point that keeps the
    * EXPECTED per-bucket population (and therefore the within-bucket
    * quadratic pair mass) flat as the corpus grows. The r13 sf1 sweep
    * measured exactly this: fixed planes=2 scaled 15.7× for a 10×
    * corpus (4 buckets saturate), while planes=8 — what this formula
    * picks at n=20 000 — costs 1.27× (PlanesProbe). Pure integer
    * arithmetic (no float log2) so a SQL oracle computes the identical
    * count from COUNT(*): `MIN(k) FROM range(0,17) WHERE (128 << k) >= n`.
    * The n it consumes is one `df.count()` — a scalar driver action,
    * same class as [[exactPairs]]'s guard. */
  def autoPlanes(n: Long, targetBucket: Long = 128L, minPlanes: Int = 2): Int = {
    val k = (0 to 16).find(k => (targetBucket << k) >= n).getOrElse(16)
    math.max(minPlanes, k)
  }

  /** Scale-adaptive PROBE count for [[lshTopK]]'s multi-probe schedule:
    * the number of buckets T (hamming-nearest first) such that the
    * EXPECTED candidate pool T·(n/2ᵏ) reaches `targetCandidates`,
    * clamped to [planes+1, 2ᵏ]. The floor keeps the legacy 0-bit+1-bit
    * schedule as the minimum; the ceiling is a full scan. Under
    * [[autoPlanes]]'s operating point (n/2ᵏ ≈ targetBucket) T is a
    * near-CONSTANT ~targetCandidates/targetBucket buckets — so the
    * probed fraction of the corpus shrinks as n grows (the multi-probe
    * LSH scale story, Lv et al. VLDB 2007) while the absolute candidate
    * pool — what recall actually depends on — stays flat. r14's recall
    * artifact measured the fixed 1-bit schedule starving exactly this
    * pool: clustered recall@10 0.96 where every other ANN variant hit
    * 1.00. */
  def autoProbes(n: Long, planes: Int, targetCandidates: Long = 2048L): Int = {
    require(planes >= 1 && planes <= 30, s"planes=$planes out of range")
    val buckets = 1L << planes
    val perBucket = math.max(1L, n / buckets)
    val t = (targetCandidates + perBucket - 1) / perBucket
    math.min(buckets, math.max(planes + 1L, t)).toInt
  }

  /** The first `t` XOR masks in hamming order (popcount ascending, value
    * ascending within a popcount level) — the deterministic multi-probe
    * schedule: mask 0 is the probe's own bucket, then all 1-bit flips,
    * then 2-bit flips, … Enumerated by bit-position combinations, never
    * by scanning 2^planes. */
  def probeMasks(planes: Int, t: Int): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var d = 0
    while (out.size < t && d <= planes) {
      (0 until planes).combinations(d)
        .map(_.foldLeft(0L)((m, b) => m | (1L << b))).toSeq.sorted
        .foreach(m => if (out.size < t) out += m)
      d += 1
    }
    out.toSeq
  }

  /** Exact all-pairs cosine above a threshold — the ground truth the LSH
    * near-dup path approximates. Inherently O(n²): guarded by `maxRows`
    * so the declared engine surface never carries an unbounded quadratic
    * join. At corpus scale use [[graft.operators.Dedup.embeddingNearDup]]
    * (LSH-bucketed, linear in practice); raise `maxRows` only for a
    * deliberate offline ground-truth run. The count that enforces the
    * guard scans one column and is negligible next to the join itself. */
  def exactPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    val n = df.count()
    require(n <= maxRows,
      s"exactPairs is O(n²) and got n=$n > maxRows=$maxRows rows — use " +
        "Dedup.embeddingNearDup (LSH-bucketed) at this scale, or raise " +
        "maxRows explicitly for an offline ground-truth run")
    val l = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val r = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    l.join(broadcast(r), col("id_a") < col("id_b"))
      .select(
        col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 4).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Exact cosine top-k against a literal probe vector. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Float],
      k: Int): DataFrame = {
    val probeCol = array(probe.map(lit(_)): _*) // float literals → array<float>
    df.select(
        col(idCol),
        round(cosine(col(vecCol), probeCol), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Hard-negative mining for contrastive training: for each anchor
    * (id, vector, label), the `k` corpus vectors MOST similar to the
    * anchor among those with a DIFFERENT label — the near-miss negatives
    * that actually move an embedding model, versus random negatives a
    * model separates for free.
    *
    * Scale shape: the q_knn_join batch-eval plan — anchors inline as a
    * literal struct array (anchors are a batch, corpus is the table),
    * explode replicates each corpus row per anchor inside one codegen
    * pass, the label-mismatch filter runs before any scoring leaves the
    * scan, and the per-anchor cut rides the bounded-heap TopK aggregate
    * (map-side reduction to k rows per anchor; the shuffle carries
    * pools, never the scored corpus). One corpus scan for ALL anchors.
    *
    * Output: (anchor_id, vec_id, label, sim), k rows per anchor, sims
    * rounded at 4 (the cross-engine cosine parity precision). */
  def hardNegatives(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      anchors: Seq[(Long, Array[Float], Int)],
      k: Int): DataFrame =
    minePairs(corpus, idCol, vecCol, labelCol, anchors, k, sameLabel = false)

  /** Positive-pair mining — the other half of a contrastive batch: per
    * anchor, the `k` most-similar SAME-label vectors (excluding the
    * anchor itself). Same single-scan plan as [[hardNegatives]]. */
  def positivePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      anchors: Seq[(Long, Array[Float], Int)],
      k: Int): DataFrame =
    minePairs(corpus, idCol, vecCol, labelCol, anchors, k, sameLabel = true)

  private def minePairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      anchors: Seq[(Long, Array[Float], Int)],
      k: Int,
      sameLabel: Boolean): DataFrame = {
    require(anchors.nonEmpty && k > 0)
    require(anchors.size <= 1024,
      s"${anchors.size} anchors would inline a ${anchors.size}-wide " +
        "literal array; mine in batches")
    val anchorsLit = array(anchors.map { case (aid, v, lbl) =>
      struct(lit(aid).as("aid"), array(v.map(lit(_)): _*).as("av"),
        lit(lbl).as("albl"))
    }: _*)
    val labelPred =
      if (sameLabel) col("graft_lbl") === col("graft_a.albl")
      else col("graft_lbl") =!= col("graft_a.albl")
    val scored = corpus
      .select(col(idCol), col(vecCol), col(labelCol).cast("int").as("graft_lbl"),
        explode(anchorsLit).as("graft_a"))
      .filter(labelPred && col(idCol) =!= col("graft_a.aid"))
      .select(col("graft_a.aid").as("anchor_id"), col(idCol),
        col("graft_lbl").as("label"),
        round(cosine(col(vecCol), col("graft_a.av")), 4).as("sim"))
    TopK.perKey(
        scored.withColumn("graft_nid", -col(idCol)),
        keys = Seq("anchor_id"),
        ordering = Seq("sim", "graft_nid", "label"), k = k)
      .select(col("anchor_id"), (-col("graft_nid")).as(idCol),
        col("label"), col("sim"))
  }

  /** LSH-bucketed approximate top-k: candidates = vectors in the probe's
    * bucket or the `numProbes − 1` hamming-nearest neighbor buckets
    * (multi-probe: all 1-bit flips, then 2-bit flips, …), reranked by
    * exact cosine. `numProbes <= 0` (default) picks [[autoProbes]]'s
    * scale-adaptive schedule from the corpus count; the legacy fixed
    * schedule is `numProbes = planes + 1`. Recall/cost knob: fewer
    * planes or more probes → more candidates. */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Float],
      k: Int,
      planes: Int = 8,
      seed: Long = 42L,
      numProbes: Int = 0): DataFrame = {

    val bucketed = df.withColumn("graft_bucket",
      hyperplaneBucket(col(vecCol), planes, seed))

    // Probe bucket + hamming-nearest flips, computed once on a 1-row
    // frame then broadcast into a semi-join (no driver collect of data
    // rows). The auto path spends ONE count() — the same scalar action
    // autoPlanes callers already pay (countAndDim fuses the two when
    // the caller has both).
    val t =
      if (numProbes > 0) numProbes
      else autoProbes(df.count(), planes)
    val masks = probeMasks(planes, t)
    val spark = df.sparkSession
    import spark.implicits._
    val probeDf = Seq(probe).toDF("graft_probe")
      .withColumn("b0", hyperplaneBucket(col("graft_probe"), planes, seed))
      .withColumn("graft_bucket", explode(array(
        masks.map(m => col("b0").bitwiseXOR(lit(m))): _*)))
      .select("graft_bucket")

    bucketed
      .join(broadcast(probeDf), Seq("graft_bucket"), "left_semi")
      .select(
        col(idCol),
        round(cosine(col(vecCol), array(probe.map(lit(_)): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Quantized-scan approximate top-k — the int8 memory path: score the
    * corpus with an integer dot product over per-vector max-abs int8
    * quantized vectors (the stored index reads a QUARTER of the float32
    * bytes at 100 TB), pool the top `poolK` coarse candidates via
    * TakeOrderedAndProject, then fetch full precision for exactly those
    * ids (broadcast semi-join — at scale, the re-rank fetch) and rerank
    * by exact cosine. Recall loss happens only when a true neighbor's
    * quantized score falls outside the pool — bounded by quantization
    * error; `poolK` is the recall/cost dial.
    *
    * Coarse score: qdot · (scaleₓ·scaleₚ/127²) / (normₓ·normₚ) ≈ cosine.
    * Scale and exact norm are computed once at quantization time and
    * stored beside the int8 vector (index build cost, not query cost). */
  def quantizedTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Float],
      k: Int,
      poolK: Int = 50): DataFrame = {
    require(poolK >= k, s"poolK=$poolK must be >= k=$k")
    val mp = probe.map(x => math.abs(x.toDouble)).max
    require(mp > 0, "probe vector is all zeros")
    val qp = probe.map(x => math.round(x.toDouble / mp * 127).toInt).toSeq
    val pnorm = math.sqrt(probe.map(x => x.toDouble * x.toDouble).sum)

    // the quantized index projection: (id, qvec, scale, norm) — at scale
    // this is materialized once and scanned instead of the float store
    val mx = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val qIndex = df.select(
      col(idCol),
      mx.as("graft_qscale"),
      norm(col(vecCol)).as("graft_qnorm"),
      when(mx === 0d, transform(col(vecCol), _ => lit(0)))
        .otherwise(transform(col(vecCol),
          x => round(x.cast("double") / mx * 127).cast("int")))
        .as("graft_qvec"))

    val qdot = aggregate(
      zip_with(col("graft_qvec"), typedLit(qp), (a, b) => a.cast("long") * b.cast("long")),
      lit(0L), (acc, v) => acc + v)
    val coarse = when(col("graft_qnorm") === 0d, lit(0.0)).otherwise(
      qdot.cast("double") * (col("graft_qscale") * mp / (127.0 * 127.0)) /
        (col("graft_qnorm") * pnorm))
    val pool = qIndex
      .select(col(idCol), coarse.as("graft_coarse"))
      .orderBy(col("graft_coarse").desc, col(idCol).asc)
      .limit(poolK)
      .select(idCol)

    df.join(broadcast(pool), Seq(idCol), "left_semi")
      .select(
        col(idCol),
        round(cosine(col(vecCol), array(probe.map(lit(_)): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** PCA-compressed approximate top-k — the dimensionality-reduction
    * memory path beside int8 ([[quantizedTopK]], 4×) and PQ codes
    * (IvfPqIndex, 32×): coarse-score in the model's k′-dim PCA space (a
    * stored reduced index reads k′/d of the float bytes — k′=16 of 64 is
    * another 4×, composable with int8), pool the top `poolK` via
    * TakeOrderedAndProject, fetch full precision for exactly those ids
    * (broadcast semi-join) and rerank by exact cosine.
    *
    * Why the coarse score works: PCA projection preserves dot products of
    * CENTERED vectors up to the truncated tail — the coarse ranking is
    * cosine of centered vectors in the principal subspace, and recall
    * loss is bounded by the discarded eigenvalue mass; `poolK` and the
    * model's k′ are the dials. Both the corpus projection and the probe
    * projection center on the model mean (one narrow expression; at 100
    * TB the projection is materialized once at index-build time and the
    * query scans the k′-dim table instead of the float store). */
  /** Measured-structure pool rule for [[pcaTopK]] (r17, calibrated on
    * the RecallReport panels): poolK = ⌈k / evr⁴⌉ floored at `basePoolK`
    * and capped at 2²⁰ ids (the broadcast-semi-join bound). On real
    * embedding geometry (clustered panel evr≈0.77) the rule keeps the
    * small base pool (recall 1.0); on a structureless corpus (isotropic
    * panel evr≈0.31 at k′=16/d=64) it honestly grows the pool ~100× —
    * fixed poolK=100 measured recall 0.57 there, the rule's ~1100
    * measured ≥0.98. The growth is the correct degradation: when the
    * truncated tail carries most of the variance, a small coarse pool
    * CANNOT rank reliably and pretending otherwise silently loses
    * neighbors. */
  def pcaAutoPoolK(model: Pca.PcaModel, k: Int, basePoolK: Int = 100): Int = {
    val evr = model.explainedVarianceRatio.max(1e-6)
    val want = k / math.pow(evr, 4)
    math.max(basePoolK, math.min((1 << 20).toDouble, math.ceil(want)).toInt)
  }

  def pcaTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      probe: Array[Float],
      k: Int,
      model: Pca.PcaModel,
      poolK: Int = -1): DataFrame = {
    // poolK <= 0 (the default) picks pcaAutoPoolK's measured-evr rule
    val pk = if (poolK <= 0) pcaAutoPoolK(model, k) else poolK
    require(pk >= k, s"poolK=$pk must be >= k=$k")
    // probe into PCA space, driver-side (k′ dot products over d doubles)
    val centered = probe.map(_.toDouble).zip(model.mean).map { case (x, m) => x - m }
    val pp = model.components.map(c =>
      c.zip(centered).map { case (w, x) => w * x }.sum).toSeq
    val pnorm = math.sqrt(pp.map(x => x * x).sum).max(1e-12)

    // project once into a named column, THEN score — keeps the k′
    // aggregate folds from being re-expanded per reference
    val coarse = aggregate(
      zip_with(col("graft_p"), typedLit(pp), (a, b) => a * b), lit(0.0), _ + _) /
      (sqrt(aggregate(transform(col("graft_p"), x => x * x), lit(0.0), _ + _)) * pnorm)
    val pool = df
      .select(col(idCol), Pca.projectExpr(col(vecCol), model).as("graft_p"))
      .select(col(idCol), coarse.as("graft_coarse"))
      .orderBy(col("graft_coarse").desc, col(idCol).asc)
      .limit(pk)
      .select(idCol)

    df.join(broadcast(pool), Seq(idCol), "left_semi")
      .select(
        col(idCol),
        round(cosine(col(vecCol), array(probe.map(lit(_)): _*)), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }
}
