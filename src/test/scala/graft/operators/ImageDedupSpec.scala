package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Image perceptual-hash dedup (q65): aHash behavior on real decoded
  * images and complete banded recall vs brute-force Hamming. */
class ImageDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def png(draw: java.awt.Graphics2D => Unit): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = im.createGraphics()
    draw(g); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("aHash: identical images hash equal; perturbed images stay close; different patterns far") {
    def twoTone(split: Int, noiseAt: Option[(Int, Int)]): Array[Byte] = png { g =>
      g.setColor(new java.awt.Color(40, 40, 40)); g.fillRect(0, 0, 32, 24)
      g.setColor(new java.awt.Color(220, 220, 220)); g.fillRect(0, 0, split, 24)
      noiseAt.foreach { case (x, y) =>
        g.setColor(java.awt.Color.WHITE); g.fillRect(x, y, 1, 1)
      }
    }
    val base = Multimodal.aHash64(twoTone(10, None)).get
    assert(Multimodal.aHash64(twoTone(10, None)).get == base)
    val near = Multimodal.aHash64(twoTone(10, Some((20, 5)))).get
    assert(java.lang.Long.bitCount(base ^ near) <= 6,
      s"1-pixel perturbation moved ${java.lang.Long.bitCount(base ^ near)} bits")
    val far = Multimodal.aHash64(twoTone(26, None)).get
    assert(java.lang.Long.bitCount(base ^ far) > 6,
      "different pattern class should exceed the dedup distance")
    assert(Multimodal.aHash64(Array[Byte](1, 2, 3)).isEmpty, "garbage is not an image")
  }

  test("q65 pair counts equal brute-force Hamming over the same hashes") {
    import spark.implicits._
    val maxHamming = 6
    // reproduce the query's deterministic hash set on the driver
    val ids = Tables.documents(spark, sf)
      .select(col("doc_id").cast("long")).limit(160)
      .collect().map(_.getLong(0))
    val hashes = ids.map { id =>
      val cls = (id % 8).toInt
      val im = new java.awt.image.BufferedImage(32, 24,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = im.createGraphics()
      val split = 4 + cls * 3
      g.setColor(new java.awt.Color(40, 40, 40)); g.fillRect(0, 0, 32, 24)
      g.setColor(new java.awt.Color(220, 220, 220)); g.fillRect(0, 0, split, 24)
      g.setColor(java.awt.Color.WHITE)
      g.fillRect(((id / 8) % 32).toInt, ((id / 8) % 24).toInt, 1, 1)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", bos)
      id -> Multimodal.aHash64(bos.toByteArray).get
    }
    val want = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= maxHamming
    } yield d).groupBy(identity).map { case (d, xs) => d.toLong -> xs.length.toLong }
    val got = Multimodal.qImageNearDup(spark, sf, maxHamming).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    assert(want.nonEmpty, "synthesized set should contain near-dup pairs")
    assert(got == want, s"got $got want $want")
  }
}
