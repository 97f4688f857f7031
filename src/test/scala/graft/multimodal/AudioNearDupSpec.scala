package graft.multimodal

import graft.flow.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Gate for q_audio_near_dup: the energy-envelope fingerprint behaves as
  * a perceptual audio hash (a re-mastered copy — different sample rate,
  * gain, and noise phase — lands within a few bits; distinct envelopes
  * far apart) and the end-to-end pipeline over the planted corpus
  * surfaces EXACTLY the planted pairs. */
class AudioNearDupSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import Multimodal._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Pull one member's WAV bytes out of the corpus generator by running
    * it over the real fixture and filtering — exercises the same path
    * the query uses. */
  private def fingerprintOf(bytes: Array[Byte]): Long =
    JdkCodec.audioFingerprint(bytes).get

  test("audio fingerprint: deterministic; re-mastered twin (rate + gain " +
    "+ noise phase changed) within a few bits; distinct envelopes far apart") {
    val corpus = Multimodal.syntheticAudioCorpus(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.media_id -> r.bytes).toMap
    val ids = corpus.keys.toSeq.sorted
    assert(ids.nonEmpty && ids.forall(_ % 5 == 0))
    // a complete group: both 10g and 10g+5 present
    val (a, b) = ids.groupBy(_ / 10).collectFirst {
      case (_, arr) if arr.length == 2 => (arr.min, arr.max)
    }.get
    val (fa, fb) = (fingerprintOf(corpus(a)), fingerprintOf(corpus(b)))
    assert(fingerprintOf(corpus(a)) == fa, "fingerprint must be deterministic")
    assert(ham(fa, fb) <= 6, s"re-mastered twin hamming ${ham(fa, fb)}")
    // a member of a DIFFERENT group must be far away
    val c = ids.find(i => i / 10 != a / 10).get
    val fc = fingerprintOf(corpus(c))
    assert(ham(fa, fc) > 12, s"distinct envelopes hamming ${ham(fa, fc)}")
    // exactly-32-loud-segments design: every fingerprint has 32 set bits
    assert(java.lang.Long.bitCount(fa) == 32 && java.lang.Long.bitCount(fc) == 32)
  }

  test("q_audio_near_dup pipeline finds exactly the planted re-master " +
    "pairs at sf0.001 — no cross-envelope false pairs") {
    val corpus = Multimodal.syntheticAudioCorpus(spark, "/root/testdata/sf0.001")
    val ids = corpus.collect().map(_.media_id).sorted
    val expected = ids.groupBy(_ / 10).collect {
      case (_, arr) if arr.length == 2 => (arr.min, arr.max)
    }.toSet
    assert(expected.nonEmpty, "fixture must contain complete groups")
    val hashes = Multimodal.audioFingerprints(corpus).toDF()
    val pairs = Multimodal.hammingNearDupPairs(
        hashes, "media_id", "afp", maxHamming = 6, chunks = 4)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == expected,
      s"planted=${expected.size} found=${pairs.size} " +
        s"missing=${(expected -- pairs).take(3)} extra=${(pairs -- expected).take(3)}")
  }
}
