package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Video temporal-luma near-dup (q111): the fingerprint's invariants
  * (determinism, exposure invariance, temporal-shape sensitivity) and
  * the banded pair machinery's agreement with brute-force Hamming. */
class VideoDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def clip(steps: Int => Double): Array[Byte] =
    Multimodal.synthAvi(
      (0 until 65).map(w => Multimodal.encodeSolidJpeg(8, 8, steps(w))))

  test("videoHash64: deterministic, exposure-invariant, shape-sensitive") {
    val pattern = (w: Int) => 0.2 + 0.6 * ((w * 3) % 7) / 7.0
    val a = Multimodal.videoHash64(clip(pattern)).get
    val b = Multimodal.videoHash64(clip(pattern)).get
    assert(a == b, "same payload must fingerprint identically")
    // exposure invariance: scaling every frame's brightness preserves
    // all luma-delta comparisons, so the fingerprint is unchanged
    val dim = Multimodal.videoHash64(clip(w => pattern(w) * 0.5)).get
    assert(dim == a, "fingerprint must be invariant to overall exposure")
    // a different temporal shape lands far away
    val other = Multimodal.videoHash64(clip(w => 0.2 + 0.6 * ((w * 5) % 7) / 7.0)).get
    assert(java.lang.Long.bitCount(a ^ other) > 6,
      "distinct temporal patterns must not collide within the near-dup band")
  }

  test("frame-count resampling: a 130-frame clip of the same shape matches") {
    val pattern = (w: Int) => 0.2 + 0.6 * ((w * 3) % 7) / 7.0
    val base = Multimodal.videoHash64(clip(pattern)).get
    // double the frame rate: two frames per temporal window, same shape
    val long = Multimodal.synthAvi(
      (0 until 130).map(f => Multimodal.encodeSolidJpeg(8, 8, pattern(f / 2))))
    val resampled = Multimodal.videoHash64(long).get
    assert(java.lang.Long.bitCount(base ^ resampled) <= 2,
      "temporal resampling must keep the same shape within the dup band")
  }

  test("same-class perturbed clips stay within a few bits; classes separate") {
    val base = Multimodal.videoHash64(Multimodal.synthClassAvi(1L)).get
    val sameClass = Multimodal.videoHash64(Multimodal.synthClassAvi(9L)).get
    val otherClass = Multimodal.videoHash64(Multimodal.synthClassAvi(2L)).get
    assert(java.lang.Long.bitCount(base ^ sameClass) <= 6)
    assert(java.lang.Long.bitCount(base ^ otherClass) > 6)
  }

  test("q111 pair counts equal brute-force Hamming over the same fingerprints") {
    val got = Multimodal.qVideoNearDup(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // brute force over the same synthesized payloads, same key predicate
    val ids = Tables.documents(spark, sf).select("doc_id")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 120)
      .collect().map(_.getLong(0))
    val hashes = ids.map(id => id -> Multimodal.videoHash64(Multimodal.synthClassAvi(id)).get)
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield d).groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    assert(got == brute, s"banded pairs $got != brute force $brute")
    assert(brute.values.sum > 0, "the synthetic classes must produce near-dup pairs")
  }
}
