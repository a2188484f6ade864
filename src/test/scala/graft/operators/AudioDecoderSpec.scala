package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real WAV/PCM audio decode through the pluggable [[Multimodal.MediaDecoder]]
  * (JDK-native `javax.sound.sampled` — the audio counterpart of
  * ImageDecoderSpec): features measured on a generated sine wave match
  * signal theory, non-audio payloads fall back cleanly, and the decode
  * runs distributed through [[Multimodal.extractFeatures]]. */
class AudioDecoderSpec extends AnyFunSuite {

  private def sineWav(freq: Double, seconds: Double, sampleRate: Float = 8000f,
      amp: Double = 0.5): Array[Byte] =
    Multimodal.synthWav(freq, seconds, sampleRate, amp)

  test("WAV decode: features match signal theory on a generated sine") {
    val wav = sineWav(freq = 440, seconds = 1.0)
    val f = Multimodal.WavAudioDecoder.decode(wav, 8).get
    assert(f(0) == 8000.0) // sample rate
    assert(f(1) == 1.0) // channels
    assert(f(2) == 8000.0) // frames
    assert(math.abs(f(3) - 1.0) < 1e-6) // duration seconds
    // sine of amplitude a: mean |x| = 2a/pi, rms = a/sqrt(2), peak = a
    assert(math.abs(f(4) - 2 * 0.5 / math.Pi) < 0.01, s"mean ${f(4)}")
    assert(math.abs(f(5) - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f(5)}")
    assert(math.abs(f(6) - 0.5) < 0.01, s"peak ${f(6)}")
    // a 440 Hz sine crosses zero 2*440 times/sec = 880 over 8000 samples
    assert(math.abs(f(7) - 880.0 / 7999) < 0.005, s"zcr ${f(7)}")
  }

  test("silence and non-audio payloads") {
    val silent = sineWav(freq = 440, seconds = 0.5, amp = 0.0)
    val f = Multimodal.WavAudioDecoder.decode(silent, 8).get
    assert(f(4) == 0.0 && f(5) == 0.0 && f(6) == 0.0 && f(7) == 0.0)
    // not a WAV: decoder declines, registry falls back to the stub
    assert(Multimodal.WavAudioDecoder.decode("not audio".getBytes, 8).isEmpty)
    val viaRegistry = Multimodal.defaultDecoder("audio").decode("not audio".getBytes, 8)
    assert(viaRegistry.get.sameElements(Multimodal.stubDecode("not audio".getBytes)))
  }

  test("q52: per-pitch-class aggregates match signal theory") {
    val spark = TestSpark.spark
    val rows = Multimodal.qAudioFeatures(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(rows.keySet == (0 to 7).toSet)
    rows.foreach { case (cls, (rms, zcr)) =>
      // all classes share amplitude 0.5 → rms ≈ 0.5/√2; zcr ≈ 2f/rate
      assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"class $cls rms $rms")
      val f = 110.0 * (cls + 1)
      assert(math.abs(zcr - 2 * f / 8000.0) < 0.01, s"class $cls zcr $zcr")
    }
  }

  test("audio decode runs distributed through extractFeatures") {
    val spark = TestSpark.spark
    import spark.implicits._
    val wav = sineWav(freq = 220, seconds = 0.25)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "audio", wav, 0, 0, 250),
      Multimodal.MediaRecord(2L, "audio", "junk".getBytes, 0, 0, 0)))
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats(0).features(0) == 8000.0) // real decode on the executor
    assert(feats(1).features.sameElements(Multimodal.stubDecode("junk".getBytes)))
  }
}
