package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Audio energy-envelope near-dup (q88): the fingerprint's invariants
  * (determinism, gain invariance, envelope sensitivity) and the banded
  * pair machinery's agreement with brute-force Hamming. */
class AudioDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def envelope(steps: Int => Double): Array[Byte] =
    Multimodal.synthEnvelopeWav(Array.tabulate(65)(steps))

  test("audioHash64: deterministic, gain-invariant, envelope-sensitive") {
    val pattern = (w: Int) => 0.2 + 0.6 * ((w * 3) % 7) / 7.0
    val a = Multimodal.audioHash64(envelope(pattern)).get
    val b = Multimodal.audioHash64(envelope(pattern)).get
    assert(a == b, "same payload must fingerprint identically")
    // gain invariance: scaling every window's amplitude preserves all
    // energy-delta comparisons, so the fingerprint is unchanged
    val half = Multimodal.audioHash64(envelope(w => pattern(w) * 0.5)).get
    assert(half == a, "fingerprint must be invariant to overall gain")
    // a different envelope shape lands far away
    val other = Multimodal.audioHash64(envelope(w => 0.2 + 0.6 * ((w * 5) % 7) / 7.0)).get
    assert(java.lang.Long.bitCount(a ^ other) > 6,
      "distinct envelope patterns must not collide within the near-dup band")
  }

  test("same-class perturbed clips stay within a few bits; classes separate") {
    val base = Multimodal.audioHash64(Multimodal.synthClassWav(1L)).get
    val sameClass = Multimodal.audioHash64(Multimodal.synthClassWav(9L)).get
    val otherClass = Multimodal.audioHash64(Multimodal.synthClassWav(2L)).get
    assert(java.lang.Long.bitCount(base ^ sameClass) <= 6)
    assert(java.lang.Long.bitCount(base ^ otherClass) > 6)
  }

  test("q88 pair counts equal brute-force Hamming over the same fingerprints") {
    val got = Multimodal.qAudioNearDup(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // brute force over the same synthesized payloads
    // same deterministic key predicate as the operator (an unordered
    // limit could sample different rows here than there)
    val ids = Tables.documents(spark, sf).select("doc_id")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 160)
      .collect().map(_.getLong(0))
    val hashes = ids.map(id => id -> Multimodal.audioHash64(Multimodal.synthClassWav(id)).get)
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield d).groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    assert(got == brute, s"banded pairs $got != brute force $brute")
    assert(brute.values.sum > 0, "the synthetic classes must produce near-dup pairs")
  }
}
