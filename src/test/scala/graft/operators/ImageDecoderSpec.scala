package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal._

/** The image path of the pluggable decoder is REAL: PNG bytes produced
  * by javax.imageio decode back into geometry + channel statistics, and
  * resize re-encodes an actual scaled image. Non-image payloads fall
  * back to the deterministic stub. */
class ImageDecoderSpec extends AnyFunSuite {

  private def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIODecoder extracts real geometry and channel means from PNG bytes") {
    val red = png(10, 20, 0xFF0000)
    val feats = ImageIODecoder.decode(red, 8).get
    assert(feats(0) == 10.0 && feats(1) == 20.0) // width, height
    assert(math.abs(feats(2) - 0.5) < 1e-9) // aspect
    assert(feats(3) == 1.0 && feats(4) == 0.0 && feats(5) == 0.0) // pure red
    assert(math.abs(feats(6) - 0.299) < 1e-9) // luma of red
    assert(feats(7) < 1e-6) // solid color: (numerically) zero stddev
  }

  test("resize produces a real scaled image that decodes to the new geometry") {
    val blue = png(16, 16, 0x0000FF)
    val small = ImageIODecoder.resize(blue, 4, 8).get
    val feats = ImageIODecoder.decode(small, 8).get
    assert(feats(0) == 4.0 && feats(1) == 8.0)
    assert(feats(5) == 1.0) // still pure blue after scaling
  }

  test("non-image bytes are not decodable as images; text falls back to the stub") {
    assert(ImageIODecoder.decode("just text".getBytes("UTF-8"), 8).isEmpty)
    assert(ImageIODecoder.resize("just text".getBytes("UTF-8"), 2, 2).isEmpty)
  }

  test("extractFeatures routes by modality: real decode for images, stub elsewhere") {
    val spark = TestSpark.spark
    import spark.implicits._
    val greenPng = png(5, 5, 0x00FF00)
    val textBytes = "audio payload".getBytes("UTF-8")
    val media = Seq(
      MediaRecord(1, "image", greenPng, 5, 5, 0),
      MediaRecord(2, "audio", textBytes, 0, 0, 1000),
      MediaRecord(3, "image", textBytes, 0, 0, 0) // undecodable image → stub fallback
    ).toDS()
    val out = extractFeatures(media).collect().map(f => f.media_id -> f).toMap
    // image row: true geometry + pure green channel
    assert(out(1).features(0) == 5.0 && out(1).features(4) == 1.0)
    // audio row: byte-statistics stub
    assert(out(2).features.toSeq == stubDecode(textBytes).toSeq)
    // undecodable image payload: deterministic stub fallback
    assert(out(3).features.toSeq == stubDecode(textBytes).toSeq)
  }
}
