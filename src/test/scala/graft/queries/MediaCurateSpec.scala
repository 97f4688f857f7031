package graft.queries

import graft.SparkEntry
import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_media_curate (VERDICT r13 item 6): the four-modality
  * curation manifest is exactly the planted group structure —
  *   - manifest membership per modality = the REAL corpus membership
  *     (codec corpora re-rendered here, catching drift between the
  *     id-only manifest helpers and the corpus definitions);
  *   - every complete planted group collapses to one cluster whose
  *     canonical survivor is the min id; incomplete groups and unpaired
  *     items are their own singletons;
  *   - the text rows equal the oracle-gated q_media_curate_text rows
  *     verbatim (same pairs, same clusters, same canonicals).
  */
class MediaCurateSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val manifest =
    SparkEntry.queries("q_media_curate")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))

  private def rows(modality: String): Seq[(Long, Long, Int)] =
    manifest.collect { case (`modality`, id, cl, canon) => (id, cl, canon) }.toSeq

  /** Expected manifest for a media modality where every COMPLETE group
    * {10g, 10g+5} is one planted near-dup pair: the pair shares cluster
    * 10g with 10g canonical; everything else is its own cluster. */
  private def expectedMedia(ids: Seq[Long]): Set[(Long, Long, Int)] = {
    val byGroup = ids.groupBy(_ / 10)
    ids.map { id =>
      val g = byGroup(id / 10)
      if (g.length == 2) (id, g.min, if (id == g.min) 1 else 0)
      else (id, id, 1)
    }.toSet
  }

  test("image/audio/video manifests cover exactly the real corpora and " +
    "collapse exactly the planted groups") {
    val mm = graft.multimodal.Multimodal
    val imageIds = mm.syntheticImageCorpus(spark, sf).collect().map(_.media_id).toSeq
    val audioIds = mm.syntheticAudioCorpus(spark, sf).collect().map(_.media_id).toSeq
    val videoIds = mm.syntheticVideoCorpus(spark, sf).collect().map(_.media_id).toSeq
    assert(imageIds.nonEmpty && videoIds.nonEmpty)

    for ((modality, ids) <- Seq(
        ("image", imageIds), ("audio", audioIds), ("video", videoIds))) {
      val got = rows(modality)
      assert(got.map(_._1).sorted == ids.sorted,
        s"$modality manifest membership drifted from the corpus")
      val exp = expectedMedia(ids)
      assert(got.toSet == exp,
        s"$modality manifest: missing=${(exp -- got.toSet).take(3)} " +
          s"extra=${(got.toSet -- exp).take(3)}")
    }
  }

  test("text stage rows equal the oracle-gated q_media_curate_text verbatim") {
    val text = rows("text").sortBy(_._1)
    val gated = SparkEntry.queries("q_media_curate_text")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq.sortBy(_._1)
    assert(text == gated)
    // survivors are real: at least one cluster with >1 member at sf0.001
    assert(text.exists(t => t._3 == 0), "fixture should contain text near-dups")
  }
}
