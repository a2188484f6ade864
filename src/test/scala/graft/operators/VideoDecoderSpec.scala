package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Real MJPEG-in-AVI video decode through the pluggable
  * [[Multimodal.MediaDecoder]]: RIFF/AVI container parse + per-frame
  * `javax.imageio` decode — the video counterpart of ImageDecoderSpec /
  * AudioDecoderSpec, closing the last media-type codec gap with
  * JDK-only code. */
class VideoDecoderSpec extends AnyFunSuite {

  private def grayAvi(levels: Seq[Double], fps: Int = 10,
      w: Int = 16, h: Int = 12): Array[Byte] =
    Multimodal.synthAvi(levels.map(Multimodal.encodeSolidJpeg(w, h, _)), fps)

  test("AVI parse + frame decode: geometry, frame count, fps, luma ramp") {
    val f = Multimodal.MjpegAviDecoder.decode(grayAvi(Seq(0.2, 0.4, 0.8), fps = 25), 8).get
    assert(f(0) == 16.0 && f(1) == 12.0) // width, height
    assert(f(2) == 3.0) // frames
    assert(math.abs(f(3) - 25.0) < 1e-9) // fps from avih
    // JPEG of a solid gray round-trips near-exactly
    assert(math.abs(f(4) - 0.2) < 0.02, s"first luma ${f(4)}")
    assert(math.abs(f(5) - 0.8) < 0.02, s"last luma ${f(5)}")
    assert(math.abs(f(6) - 0.6) < 0.04, s"luma delta ${f(6)}")
    assert(f(7) > 0) // mean encoded frame bytes
  }

  test("non-AVI and frameless payloads decline; registry falls back to the stub") {
    assert(Multimodal.MjpegAviDecoder.decode("not a video".getBytes, 8).isEmpty)
    // a RIFF that is not AVI (e.g. a WAV) is not claimed by the video codec
    val wav = Multimodal.synthWav(440, 0.05)
    assert(Multimodal.MjpegAviDecoder.decode(wav, 8).isEmpty)
    val viaRegistry = Multimodal.defaultDecoder("video").decode("junk".getBytes, 8)
    assert(viaRegistry.get.sameElements(Multimodal.stubDecode("junk".getBytes)))
  }

  test("q53: per-shade-class aggregates match the synthesized ramp") {
    val spark = TestSpark.spark
    val rows = Multimodal.qVideoFeatures(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getInt(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet == (0 to 5).toSet)
    rows.foreach { case (cls, (frames, firstLuma, delta)) =>
      assert(frames == 4.0, s"class $cls frames $frames")
      assert(math.abs(firstLuma - (0.2 + cls * 0.1)) < 0.03, s"class $cls luma $firstLuma")
      assert(math.abs(delta - 0.15) < 0.04, s"class $cls delta $delta") // 3 steps of 0.05
    }
  }
}
