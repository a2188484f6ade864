package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q366 pHash — the DCT hash's construction guarantees (brightness in
  * DC only, contrast cancels under the median threshold) verified
  * through REAL PNG bytes, plus discrimination, aHash contrast, and
  * brute-force recall of the near-dup query. */
class PHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, math.max(0, pix(x, y)))
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // a mid-tone pattern with structure at several frequencies; every
  // value is a MULTIPLE OF 20 in [40, 240] so the contrast gains below
  // scale pixels EXACTLY (no per-pixel rounding noise polluting the
  // linearity claim) and ±shift stays clip-free
  private def base(x: Int, y: Int): Int =
    140 + (if ((x / 4 + y / 8) % 2 == 0) 40 else -40) +
      ((x % 3) - 1) * 20 - ((y % 5) % 2) * 20

  test("brightness shift and contrast scale leave the hash unchanged") {
    val h0 = Multimodal.pHash64(png(32, 32)(base)).get
    for (b <- Seq(-25, -10, 10, 25)) {
      // EXACT invariance: a +b shift lands entirely in the excluded DC
      // (the quantized-integer grid absorbs the fp-linearity ulps)
      val hb = Multimodal.pHash64(png(32, 32)((x, y) => base(x, y) + b)).get
      assert(hamming(h0, hb) == 0, s"brightness $b")
    }
    for (g <- Seq(0.85, 0.95, 1.05, 1.15)) {
      // these gains scale multiple-of-20 pixels to exact integers, so
      // the scaled image is EXACTLY g·image: coefficient order is
      // preserved and only integer-grid ties at the median cut can
      // move — at most a bit or two
      val hg = Multimodal.pHash64(
        png(32, 32)((x, y) => math.round(base(x, y) * g).toInt)).get
      assert(hamming(h0, hg) <= 2, s"contrast $g -> ${hamming(h0, hg)}")
    }
  }

  test("gamma tone curves keep each pattern nearest its own original") {
    // a nonlinear monotone tone curve (gamma) is the photometric
    // nuisance NO mean/median threshold is exactly invariant to
    // 2-D checker classes (period varies by class) — energy spreads
    // across BOTH DCT axes, the regime a 2-D hash discriminates in
    val classes = (0 until 8).map { cls => (x: Int, y: Int) =>
      if ((x / (2 + cls) + y / (3 + cls)) % 2 == 0) 200 else 60
    }
    val originals = classes.map(f => Multimodal.pHash64(png(32, 24)(f)).get)
    // gamma is genuinely nonlinear (0.8 lifts pixel 40 to 91 — a
    // violent tone remap), and on a dense periodic spectrum the
    // median cut has no stable absolute bound — the property
    // retrieval actually relies on is RELATIVE: each gamma'd pattern
    // must stay nearer its own original than any other class, at
    // every strength
    for (g <- Seq(0.8, 0.9, 1.1, 1.25)) {
      classes.indices.foreach { i =>
        val gi = Multimodal.pHash64(png(32, 24)((x, y) =>
          math.round(255.0 * math.pow(classes(i)(x, y) / 255.0, g)).toInt)).get
        val dSelf = hamming(gi, originals(i))
        val dOthers = classes.indices.filter(_ != i)
          .map(j => hamming(gi, originals(j))).min
        assert(dSelf < dOthers, s"class $i gamma $g: $dSelf !< $dOthers")
      }
    }
  }

  test("distinct 2-D patterns land far apart") {
    val hs = (0 until 8).map { cls =>
      Multimodal.pHash64(png(32, 24)((x, y) =>
        if ((x / (2 + cls) + y / (3 + cls)) % 2 == 0) 200 else 60)).get
    }
    for (i <- 0 until 8; j <- (i + 1) until 8)
      assert(hamming(hs(i), hs(j)) > 6, s"classes $i/$j too close")
  }

  test("q366 near-dup counts match brute force over the same hashes") {
    val ids = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id").cast("long"))
      .limit(160).collect().map(_.getLong(0))
    val hashes = ids.map(id => Multimodal.pHash64(Multimodal.synthTonedPng(id)).get)
    val want = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      d = hamming(hashes(i), hashes(j)) if d <= 6
    } yield d).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Multimodal.qImagePhashNearDup(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want.map { case (k, v) => (k, v) })
  }
}
