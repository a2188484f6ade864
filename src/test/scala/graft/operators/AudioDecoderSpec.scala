package graft.operators

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real WAV/PCM audio decode through the pluggable [[Multimodal.MediaDecoder]]
  * (JDK-native `javax.sound.sampled` — the audio counterpart of
  * ImageDecoderSpec): features measured on a generated sine wave match
  * signal theory, non-audio payloads fall back cleanly, and the decode
  * runs distributed through [[Multimodal.extractFeatures]]. */
class AudioDecoderSpec extends AnyFunSuite {

  /** A 16-bit mono PCM WAV of a sine at `freq` Hz, amplitude `amp`. */
  private def sineWav(freq: Double, seconds: Double, sampleRate: Float = 8000f,
      amp: Double = 0.5): Array[Byte] = {
    val n = (seconds * sampleRate).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (amp * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

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
