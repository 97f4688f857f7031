package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence data generator: expands an existing fixture directory
  * (default sf0.1) by an integer `factor` (default 10 → "sf1") into a
  * scratch directory, preserving every distributional property the
  * engine's scale arguments depend on while keeping the REPLICAS
  * disjoint where cross-replica interaction would distort the
  * measurement:
  *
  *  - All entity keys are offset by `replica × 1e9`, so joins stay
  *    consistent within a replica and key cardinality grows linearly
  *    (the shuffle/aggregate keyspace a 10× corpus actually has).
  *  - `documents.text` gets a per-replica VOCABULARY renaming (every
  *    word suffixed with a replica tag; bijective per replica). A
  *    bijective token renaming maps shingle sets bijectively, so
  *    within-replica Jaccard — including the fixture's planted
  *    near-dups — is preserved EXACTLY, while cross-replica shingle
  *    overlap is zero. Without this, exact text replication would turn
  *    every planted dup-cluster into a 10×-bigger cluster and the pair
  *    count would grow ×100 — a property of the replication, not of the
  *    engine, and exactly the distortion a scaling-slope measurement
  *    must not contain.
  *  - `embeddings.embedding` is rotated by `7 × replica` positions per
  *    replica. Rotation preserves norms and within-replica cosines
  *    exactly (the planted similarity structure scales linearly);
  *    cross-replica cosine between a vector and a rotation of itself is
  *    ~random for the near-orthogonal fixture, so the pair space does
  *    not explode quadratically.
  *  - `nation`/`region` stay dimension-sized (a 10× fact table does not
  *    grow its country list).
  *
  * Usage: runMain graft.ScaleGen [srcDir dstDir factor]
  * Writes dstDir/<table>.parquet mirrors of the source layout so
  * Verify/Bench run against it via SPARK_GRAFT_SF_DIR unchanged.
  */
object ScaleGen {

  private val KeyOffset = 1000000000L

  /** Words that keep their surface form across replicas (language-ID
    * marker stopwords) so the language distribution — and therefore the
    * selectivity of lang-gated pipeline stages — is scale-invariant. */
  private val keepWords: Set[String] = Set(
    "der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich",
    "the", "a", "of", "and", "to", "in", "is", "that", "it", "for",
    "el", "la", "los", "las", "y", "es", "un", "una", "que", "por",
    "le", "les", "et", "est", "une", "pour", "dans")

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/scale/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try generate(spark, src, dst, factor)
    finally spark.stop()
  }

  /** ALWAYS scale from the BASE fixture in one step. Composing two
    * generate() calls (e.g. sf0.1→sf10 then sf10→sf30) breaks the
    * bijective-vocabulary guarantee: the second pass appends the SAME
    * per-replica suffixes to an already-suffixed vocabulary, so
    * first-pass replica i's word "w"+tag(j) collides with second-pass
    * replica j's renaming of replica i−j's "w" — cross-replica shared
    * shingles whose candidate blowup masquerades as engine
    * superlinearity (measured r17: a composed sf30 read 9–10× for 3×
    * data on the containment family; the single-step sf30 reads ~3×).
    * Embedding rotations also repeat past `dim` replicas — acceptable
    * for the text-family sweeps, a caveat for embedding-family ones. */
  def generate(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    require(factor >= 1 && factor <= 1000, s"factor=$factor out of range")
    val rep = spark.range(0, factor).select(col("id").cast("int").as("graft_rep"))

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // Scaled tables are written as `factor` files: the source fixture is
    // one file per table, and a 10× corpus arriving as ONE 10×-bigger
    // file would serialize every narrow per-row stage (shingling,
    // hashing) onto a single scan task — a layout artifact that
    // masquerades as engine super-linearity in the slope measurement
    // (observed: 33× on q_jaccard_prefix, of which ~3× was this file
    // shape). Real corpora grow in file COUNT.
    def write(df: DataFrame, t: String): Unit = {
      df.repartition(factor).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scalegen] wrote $t")
    }
    def off(c: String) = (col(c) + col("graft_rep").cast("long") * KeyOffset).as(c)

    // dimension tables: one copy, one file
    def writeDim(t: String): Unit = {
      read(t).coalesce(1).write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"[scalegen] wrote $t")
    }
    writeDim("region")
    writeDim("nation")

    write(read("customer").crossJoin(rep).select(
      off("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_acctbal"), col("c_mktsegment")), "customer")

    // supplier names get a per-replica 2-char suffix (rep digit doubled):
    // names replicated VERBATIM made q_edit_join's deletion-neighborhood
    // buckets grow x10 (45k cross-replica dist-0 pairs at factor 10 — a
    // replication artifact, measured 11.8x in the r13 sweep). A 2-char
    // distinct suffix keeps cross-replica names at edit distance 2 > the
    // query's maxDist 1, while within-replica distances are unchanged —
    // the same bijective-renaming principle the documents table uses.
    write(read("supplier").crossJoin(rep).select(
      off("s_suppkey"),
      concat(col("s_name"), lit("-"), col("graft_rep").cast("string"),
        col("graft_rep").cast("string")).as("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    write(read("part").crossJoin(rep).select(
      off("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice")), "part")

    write(read("orders").crossJoin(rep).select(
      off("o_orderkey"), off("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate"), col("o_orderpriority")),
      "orders")

    write(read("lineitem").crossJoin(rep).select(
      off("l_orderkey"), off("l_partkey"), off("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    write(read("events").crossJoin(rep).select(
      off("event_id"), col("ts"), off("user_id"), col("event_type"),
      col("value"), col("props")), "events")

    // documents: per-replica bijective vocabulary renaming (see scaladoc)
    val keep = keepWords
    val renameText = udf { (text: String, r: Int) =>
      if (r == 0 || text == null) text
      else {
        val tag = "q" + ('a' + (r - 1)).toChar
        text.split(" ", -1).map { w =>
          if (w.isEmpty || keep.contains(w.toLowerCase)) w else w + tag
        }.mkString(" ")
      }
    }
    write(read("documents").crossJoin(rep).select(
      off("doc_id"),
      renameText(col("text"), col("graft_rep")).as("text"),
      col("lang"), col("source"), col("n_chars")), "documents")

    // embeddings: per-replica rotation (norm- and within-replica-cosine
    // preserving; see scaladoc)
    val emb = read("embeddings")
    val rotated = transform(
      sequence(lit(0), size(col("embedding")) - 1),
      j => element_at(
        col("embedding"),
        pmod(j + col("graft_rep") * 7, size(col("embedding"))) + 1))
    write(emb.crossJoin(rep).select(
      off("vec_id"),
      rotated.cast("array<float>").as("embedding"),
      col("label")), "embeddings")
  }
}
