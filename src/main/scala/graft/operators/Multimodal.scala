package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque BINARY columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * functions over `Dataset[MediaRecord]`. The Spark-side plumbing —
  * schema, partitioning, batch iteration, output shape — is real and
  * tested. Decoding is PLUGGABLE ([[MediaDecoder]]): images decode for
  * real through `javax.imageio` (JDK-native — PNG/JPEG/BMP/GIF);
  * audio/video and undecodable payloads fall back to
  * [[Multimodal.stubDecode]], a deterministic fake keyed on the payload
  * bytes (those codecs aren't in this container). Swapping in another
  * codec is one [[MediaDecoder]] instance — the plan shape never
  * changes.
  */
object Multimodal {

  import Tables._

  /** An opaque media payload + typed metadata (the multimodal row model). */
  case class MediaRecord(media_id: Long, media_type: String, payload: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  /** Fixed-size fake feature vector. */
  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
      features: Array[Double])

  /** STUB — deterministic fake decoder standing in for a real audio/video
    * codec. Produces an 8-dim "feature vector" from byte statistics so
    * tests are reproducible. Replace with a real decode when codec
    * libraries are available. */
  def stubDecode(payload: Array[Byte], dims: Int = 8): Array[Double] = {
    val out = new Array[Double](dims)
    var i = 0
    while (i < payload.length) {
      out(i % dims) += (payload(i) & 0xFF).toDouble / 255.0
      i += 1
    }
    out
  }

  /** A pluggable per-modality codec. Implementations must be
    * serializable (one instance ships with the task closure; heavier
    * codecs should lazily init a per-partition handle). `decode`
    * returns None when the payload is not decodable by this codec. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], dims: Int): Option[Array[Double]]
  }

  /** The deterministic fallback codec ([[stubDecode]]). */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] =
      Some(stubDecode(payload, dims))
  }

  /** REAL image decode via JDK-native `javax.imageio` (PNG, JPEG, BMP,
    * GIF): an 8-dim feature vector of geometry + channel statistics —
    * [width, height, aspect, mean R, mean G, mean B, mean luma,
    * stddev luma], channel means in [0,1]. Deterministic: pixel order
    * is fixed and accumulation is sequential. */
  object ImageIODecoder extends MediaDecoder {
    def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] = {
      val img = try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      } catch { case _: java.io.IOException => None }
      img.map { im =>
        val w = im.getWidth
        val h = im.getHeight
        var sr, sg, sb, sl, sl2 = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val r = ((rgb >> 16) & 0xFF) / 255.0
            val g = ((rgb >> 8) & 0xFF) / 255.0
            val b = (rgb & 0xFF) / 255.0
            val l = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sl += l; sl2 += l * l
            x += 1
          }
          y += 1
        }
        val n = (w * h).toDouble
        val meanL = sl / n
        val feats = Array[Double](w, h, w.toDouble / h, sr / n, sg / n, sb / n,
          meanL, math.sqrt(math.max(0, sl2 / n - meanL * meanL)))
        java.util.Arrays.copyOf(feats, dims)
      }
    }

    /** REAL resize: decode → bilinear scale → re-encode as PNG. None
      * when the payload is not a decodable image. */
    def resize(payload: Array[Byte], width: Int, height: Int): Option[Array[Byte]] = {
      val img = try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      } catch { case _: java.io.IOException => None }
      img.map { im =>
        val out = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(im, 0, 0, width, height, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** REAL audio decode via JDK-native `javax.sound.sampled` (WAV/AIFF
    * PCM — no external codec needed): the payload is parsed and its
    * samples decoded to normalized [-1, 1] doubles (any sample size /
    * endianness the JDK converts to 16-bit signed PCM), producing an
    * 8-dim feature vector [sampleRate, channels, nFrames, durationSec,
    * meanAmplitude, rms, peak, zeroCrossingRate]. Deterministic:
    * samples are accumulated in stream order. Compressed formats
    * (MP3/OGG) have no JDK codec and return None. */
  object WavAudioDecoder extends MediaDecoder {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] = {
      val parsed = try {
        val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        // normalize whatever PCM shape arrived to signed 16-bit LE
        val f = in.getFormat
        val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        Some((AudioSystem.getAudioInputStream(target, in), target))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
        case _: IllegalArgumentException => None // no conversion path
      }
      parsed.map { case (pcm, fmt) =>
        val bytes = pcm.readAllBytes()
        val n = bytes.length / 2
        var sumAbs, sumSq, peak = 0.0
        var zeroCrossings = 0L
        var prevSign = 0
        var i = 0
        while (i < n) {
          val lo = bytes(2 * i) & 0xFF
          val hi = bytes(2 * i + 1).toInt // sign-extends
          val s = ((hi << 8) | lo) / 32768.0
          val a = math.abs(s)
          sumAbs += a; sumSq += s * s
          if (a > peak) peak = a
          val sign = java.lang.Double.compare(s, 0.0)
          if (sign != 0) {
            if (prevSign != 0 && sign != prevSign) zeroCrossings += 1
            prevSign = sign
          }
          i += 1
        }
        val frames = n.toDouble / fmt.getChannels
        val feats = Array[Double](
          fmt.getSampleRate.toDouble, fmt.getChannels.toDouble, frames,
          frames / fmt.getSampleRate,
          if (n > 0) sumAbs / n else 0.0,
          if (n > 0) math.sqrt(sumSq / n) else 0.0,
          peak,
          if (n > 1) zeroCrossings.toDouble / (n - 1) else 0.0)
        java.util.Arrays.copyOf(feats, dims)
      }
    }
  }

  /** REAL video decode for MJPEG-in-AVI — the one video shape decodable
    * with nothing but the JDK: the RIFF/AVI container (a public,
    * trivially parseable chunk format) carries one JPEG per frame, and
    * each frame decodes through `javax.imageio` like any still image.
    * Features (8): [width, height, nFrames, fps, mean luma of first
    * frame, mean luma of last frame, mean |luma delta| first→last
    * (motion proxy), mean encoded bytes per frame]. Returns None for
    * anything that is not a RIFF-AVI with decodable frames (real-world
    * H.264 etc. has no JDK codec — those payloads fall back to the
    * stub via the registry). */
  object MjpegAviDecoder extends MediaDecoder {

    def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] = {
      parse(payload).flatMap { case (usPerFrame, frames) =>
        if (frames.isEmpty) None
        else {
          val first = readLuma(frames.head)
          val last = readLuma(frames.last)
          for (f <- first; l <- last) yield {
            val (w, h, fLuma) = f
            val (_, _, lLuma) = l
            val fps = if (usPerFrame > 0) 1e6 / usPerFrame else 0.0
            val feats = Array[Double](w, h, frames.size,
              fps, fLuma, lLuma, math.abs(lLuma - fLuma),
              frames.iterator.map(_.length.toDouble).sum / frames.size)
            java.util.Arrays.copyOf(feats, dims)
          }
        }
      }
    }

    /** Per-frame mean luma sequence of an AVI payload — the temporal
      * signal [[Multimodal.videoHash64]] fingerprints. None when the
      * container doesn't parse or any frame fails to decode. */
    def frameLumas(payload: Array[Byte]): Option[Array[Double]] =
      parse(payload).flatMap { case (_, frames) =>
        val lumas = frames.iterator.map(readLuma(_).map(_._3)).toArray
        if (lumas.forall(_.isDefined)) Some(lumas.map(_.get)) else None
      }

    /** (width, height, mean luma) of one encoded frame, via imageio. */
    private def readLuma(bytes: Array[Byte]): Option[(Int, Int, Double)] = {
      val img = try {
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      } catch { case _: java.io.IOException => None }
      img.map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        var sl = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sl += (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)) / 255.0
            x += 1
          }
          y += 1
        }
        (w, h, sl / (w * h))
      }
    }

    /** Walk the RIFF chunk tree: `avih` yields µs/frame; `##dc`/`##db`
      * chunks are encoded frames. Chunks are fourcc + LE u32 size +
      * data (+ pad byte when odd). */
    private def parse(b: Array[Byte]): Option[(Long, Vector[Array[Byte]])] = {
      if (b.length < 12 || fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
      var usPerFrame = 0L
      val frames = Vector.newBuilder[Array[Byte]]
      def walk(from: Int, until: Int): Unit = {
        var p = from
        while (p + 8 <= until) {
          val id = fourcc(b, p)
          val size = u32(b, p + 4)
          val dataStart = p + 8
          val dataEnd = math.min(dataStart + size, until.toLong).toInt
          if (id == "LIST" && dataEnd - dataStart >= 4) walk(dataStart + 4, dataEnd)
          else if (id == "avih" && dataEnd - dataStart >= 4) usPerFrame = u32(b, dataStart)
          else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
              (id.endsWith("dc") || id.endsWith("db")))
            frames += java.util.Arrays.copyOfRange(b, dataStart, dataEnd)
          p = dataEnd + (size % 2).toInt // odd chunks are padded
        }
      }
      walk(12, b.length)
      Some((usPerFrame, frames.result())).filter(_._2.nonEmpty)
    }

    private def fourcc(b: Array[Byte], p: Int): String =
      if (p + 4 > b.length) "" else new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) | ((b(p + 2) & 0xFFL) << 16) |
        ((b(p + 3) & 0xFFL) << 24)
  }

  /** Synthesize a minimal MJPEG AVI (RIFF + avih + movi with one
    * `00dc` chunk per encoded frame) — deterministic video payloads
    * exercising the real container parse + per-frame imageio decode. */
  def synthAvi(frames: Seq[Array[Byte]], fps: Int = 10): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def u32(v: Long): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
      id.getBytes("US-ASCII") ++ u32(data.length.toLong) ++ data ++ pad
    }
    val avih = chunk("avih", u32(1000000L / fps) ++ Array.fill(52)(0.toByte))
    val hdrl = chunk("LIST", "hdrl".getBytes("US-ASCII") ++ avih)
    val movi = chunk("LIST", "movi".getBytes("US-ASCII") ++
      frames.flatMap(f => chunk("00dc", f)).toArray)
    val form = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(u32(form.length.toLong))
    bos.write(form)
    bos.toByteArray
  }

  /** Synthesize a 16-bit mono PCM WAV of a sine wave — deterministic
    * audio test payloads (the container ships no audio corpus; real
    * WAV bytes exercise the real decode path end to end). */
  def synthWav(freq: Double, seconds: Double, sampleRate: Float = 8000f,
      amp: Double = 0.5): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
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

  /** Encode one solid-gray JPEG frame (deterministic MJPEG test frame). */
  def encodeSolidJpeg(width: Int, height: Int, gray: Double): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val v = math.max(0, math.min(255, (gray * 255).round.toInt))
    val rgb = (v << 16) | (v << 8) | v
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { im.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  /** q53: end-to-end video feature pipeline — synthesize a
    * deterministic per-doc MJPEG AVI (4 solid frames whose luma ramps
    * from a doc-derived base), decode it through the REAL RIFF parse +
    * per-frame imageio path on the executors, aggregate per shade
    * class. Rows-only in the gate (container synthesis + JPEG aren't
    * SQL-expressible); VideoDecoderSpec pins decoded values. */
  def qVideoFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = documents(s, d).select(col("doc_id").cast("long")).orderBy("doc_id").limit(120).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val cls = (id % 6).toInt
        val base = 0.2 + cls * 0.1
        val frames = (0 until 4).map(k => encodeSolidJpeg(16, 12, base + k * 0.05))
        val f = MjpegAviDecoder.decode(synthAvi(frames, fps = 10), 8).get
        (cls, f(2), f(4), f(6)) // (class, nFrames, first-frame luma, |luma delta|)
      }
    }.toDF("shade_class", "n_frames", "first_luma", "luma_delta")
      .groupBy("shade_class")
      .agg(count("*").as("n"),
        round(avg("n_frames"), 1).as("avg_frames"),
        round(avg("first_luma"), 2).as("avg_first_luma"),
        round(avg("luma_delta"), 2).as("avg_luma_delta"))
  }

  /** 64-bit perceptual average-hash of an image: decode (real
    * `javax.imageio`), bilinear-resize to an 8×8 luma grid, bit i =
    * cell luma > grid mean. Near-identical images (crops, re-encodes,
    * brightness-preserving edits) land within a few bits of Hamming
    * distance — the image analogue of text SimHash. None when the
    * payload isn't a decodable image. */
  def aHash64(payload: Array[Byte]): Option[Long] = {
    val img = try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: java.io.IOException => None }
    img.map { im =>
      val small = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(im, 0, 0, 8, 8, null)
      g.dispose()
      val luma = new Array[Double](64)
      var i = 0
      while (i < 64) {
        val rgb = small.getRGB(i % 8, i / 8)
        luma(i) = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        i += 1
      }
      val mean = luma.sum / 64.0
      var h = 0L
      i = 0
      while (i < 64) {
        if (luma(i) > mean) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  /** q65: image near-dup detection — the multimodal member of the dedup
    * family: synthesize a deterministic two-tone image per doc (pattern
    * class = doc_id % 8, plus a 1-pixel per-doc perturbation so
    * same-class images are NEAR-identical, not equal), aHash on the
    * executors through the REAL decode path, then the same
    * banded-Hamming pair machinery as text SimHash
    * ([[Dedup.hammingPairs]]: complete recall at the declared distance,
    * bucket-join shuffles hashes only). Rows-only in the gate (JPEG
    * encode isn't SQL-expressible); ImageDedupSpec verifies recall
    * against brute-force Hamming over the same hashes. */
  def qImageNearDup(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    import s.implicits._
    val ids = documents(s, d).select(col("doc_id").cast("long")).orderBy("doc_id").limit(160).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map { id =>
        val cls = (id % 8).toInt
        val im = new java.awt.image.BufferedImage(32, 24,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = im.createGraphics()
        // two-tone pattern per class: split position varies by class
        val split = 4 + cls * 3
        g2.setColor(new java.awt.Color(40, 40, 40))
        g2.fillRect(0, 0, 32, 24)
        g2.setColor(new java.awt.Color(220, 220, 220))
        g2.fillRect(0, 0, split, 24)
        // per-doc perturbation: one bright pixel whose position varies
        g2.setColor(java.awt.Color.WHITE)
        g2.fillRect(((id / 8) % 32).toInt, ((id / 8) % 24).toInt, 1, 1)
        g2.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(im, "png", bos)
        (id, aHash64(bos.toByteArray).get)
      }
    }.toDF("id", "sh")
    Dedup.hammingPairs(hashed, maxHamming)
      .groupBy("hamming").agg(count("*").as("n_pairs"))
  }

  /** q366's kernel: perceptual DCT hash (pHash) — the frequency-domain
    * upgrade of [[aHash64]]: 32×32 grayscale, 2-D DCT-II, threshold
    * the 63 non-DC coefficients of the low-frequency 8×8 block at
    * their median. Where aHash breaks under global brightness or
    * contrast changes (every pixel moves relative to the MEAN), pHash
    * is invariant by construction: a brightness shift lands entirely
    * in the DC coefficient (excluded) and a contrast scale multiplies
    * every coefficient AND their median by the same positive factor
    * (comparisons unchanged) — PHashSpec pins both invariances through
    * real PNG bytes, plus discrimination across patterns.
    *
    * Determinism: the cosine tables use StrictMath (identical bits on
    * every JVM), the DCT is a fixed-order matrix walk (no parallel
    * reduction), and the resize goes through the same bilinear
    * AWT path as aHash — one hash per payload, bit-stable. */
  def pHash64(payload: Array[Byte]): Option[Long] = {
    val img = try {
      Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    } catch { case _: java.io.IOException => None }
    img.map { im =>
      val n = 32
      val small = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(im, 0, 0, n, n, null)
      g.dispose()
      val luma = Array.ofDim[Double](n, n)
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n) {
          val rgb = small.getRGB(x, y)
          luma(y)(x) = 0.299 * ((rgb >> 16) & 0xFF) +
            0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
          x += 1
        }
        y += 1
      }
      val dct = PHash.dct2d32(luma)
      // low-frequency 8×8 block, DC excluded; QUANTIZED to integers
      // before the median compare: fp addition is not exactly linear,
      // so a brightness shift perturbs every coefficient by ~1e-9 of
      // its magnitude — under a strict `>` against an exactly-tied
      // median that ulp noise flips bits; rint to the integer grid
      // (coefficients are O(10⁵), the noise is O(10⁻⁴)) absorbs it
      // and makes the construction invariances EXACT
      val coeffs = new Array[Long](63)
      var i = 0
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) { coeffs(i) = math.rint(dct(u)(v)).toLong; i += 1 }
          v += 1
        }
        u += 1
      }
      val sorted = coeffs.clone(); java.util.Arrays.sort(sorted)
      val median = sorted(31) // element 32 of 63 — the exact middle
      var h = 0L
      i = 0
      while (i < 63) {
        if (coeffs(i) > median) h |= (1L << i)
        i += 1
      }
      h
    }
  }

  /** q366: perceptual-hash image near-dup — q65's pipeline with the
    * DCT hash, on images that ALSO carry a per-doc brightness/contrast
    * ramp (the photometric nuisance pHash ignores BY CONSTRUCTION —
    * brightness lives in the excluded DC, contrast cancels under the
    * median): same banded-Hamming machinery, rows-only gate,
    * PHashSpec pins the invariances, gamma robustness, and recall
    * against brute force over the same hashes. */
  def qImagePhashNearDup(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    import s.implicits._
    val ids = documents(s, d).select(col("doc_id").cast("long")).orderBy("doc_id").limit(160).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map { id => (id, pHash64(synthTonedPng(id)).get) }
    }.toDF("id", "sh")
    Dedup.hammingPairs(hashed, maxHamming)
      .groupBy("hamming").agg(count("*").as("n_pairs"))
  }

  /** q366's fixture image: a 2-D checker per class (period varies by
    * class = doc_id % 8 — energy across BOTH DCT axes, the regime the
    * 2-D hash discriminates in; a 1-D split pattern concentrates in
    * one DCT row and wastes 7/8 of the bits) with a per-doc global
    * brightness/contrast ramp on top — the photometric nuisance pHash
    * must ignore. Mid-range tones keep the affine transform
    * clip-free. */
  private[operators] def synthTonedPng(id: Long): Array[Byte] = {
    val cls = (id % 8).toInt
    val gain = 0.8 + 0.05 * ((id / 8) % 8)   // contrast ∈ [0.8, 1.15]
    val bias = 5.0 * ((id / 64) % 5)          // brightness ∈ [0, 20]
    def tone(v: Int): Int = math.min(255, math.max(0, (v * gain + bias).round.toInt))
    val im = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 24; x <- 0 until 32) {
      val v = tone(if ((x / (2 + cls) + y / (3 + cls)) % 2 == 0) 200 else 60)
      im.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  /** q52: end-to-end audio feature pipeline — synthesize a
    * deterministic per-doc WAV (pitch = doc_id's pitch class), decode
    * it through the REAL `javax.sound.sampled` path on the executors,
    * aggregate decoded features per pitch class. Rows-only in the gate
    * (WAV synthesis isn't SQL-expressible); AudioDecoderSpec pins the
    * decoded values against signal theory (rms = amp/√2, zcr = 2f/rate). */
  def qAudioFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ids = documents(s, d).select(col("doc_id").cast("long")).orderBy("doc_id").limit(200).as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val cls = (id % 8).toInt
        val wav = synthWav(freq = 110.0 * (cls + 1), seconds = 0.1)
        val f = WavAudioDecoder.decode(wav, 8).get
        (cls, f(5), f(7)) // (pitch class, rms, zero-crossing rate)
      }
    }.toDF("pitch_class", "rms", "zcr")
      .groupBy("pitch_class")
      .agg(count("*").as("n"),
        round(avg("rms"), 4).as("avg_rms"),
        round(avg("zcr"), 4).as("avg_zcr"))
  }

  /** Synthesize a 16-bit mono PCM WAV whose sine carrier is amplitude-
    * modulated by a per-window envelope — the audio test payload whose
    * energy SHAPE (not pitch or gain) carries the identity, matching
    * what [[audioHash64]] fingerprints. */
  def synthEnvelopeWav(amps: Array[Double], freq: Double = 220.0,
      sampleRate: Float = 8000f, samplesPerWindow: Int = 80): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val n = amps.length * samplesPerWindow
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val a = amps(i / samplesPerWindow)
      val s = (a * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
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

  /** 64-bit energy-envelope fingerprint of an audio payload: decode
    * (real `javax.sound.sampled`, any PCM shape the JDK converts),
    * mix down to mono, split into 65 equal windows, bit i =
    * rms(window i+1) > rms(window i) — the sign of the energy
    * derivative. Gain-invariant by construction (scaling every sample
    * scales every window RMS equally, preserving all comparisons) —
    * the audio analogue of [[aHash64]]'s luma-vs-mean bits. None when
    * the payload isn't decodable PCM audio. */
  def audioHash64(payload: Array[Byte]): Option[Long] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val parsed = try {
      val in = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
      val f = in.getFormat
      val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
        f.getSampleRate, false)
      Some((AudioSystem.getAudioInputStream(target, in), f.getChannels))
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
      case _: IllegalArgumentException => None // no conversion path
    }
    parsed.flatMap { case (pcm, channels) =>
      val bytes = pcm.readAllBytes()
      val frames = bytes.length / (2 * channels)
      if (frames < 65) None
      else {
        // mono mixdown, then 65 equal windows of summed squares
        val windows = new Array[Double](65)
        val perWindow = frames / 65
        var w = 0
        while (w < 65) {
          var sumSq = 0.0
          var fr = w * perWindow
          val end = fr + perWindow
          while (fr < end) {
            var c = 0
            var mono = 0.0
            while (c < channels) {
              val base = 2 * (fr * channels + c)
              val lo = bytes(base) & 0xFF
              val hi = bytes(base + 1).toInt
              mono += ((hi << 8) | lo) / 32768.0
              c += 1
            }
            mono /= channels
            sumSq += mono * mono
            fr += 1
          }
          windows(w) = sumSq // same denominator per window: rms order = sumSq order
          w += 1
        }
        var h = 0L
        var i = 0
        while (i < 64) {
          if (windows(i + 1) > windows(i)) h |= (1L << i)
          i += 1
        }
        Some(h)
      }
    }
  }

  /** q88: audio near-dup detection — the audio member of the dedup
    * family, completing the media trio (text SimHash q28, image aHash
    * q65): synthesize a deterministic envelope-modulated WAV per doc
    * (envelope pattern class = doc_id % 8, plus a one-window per-doc
    * gain perturbation so same-class clips are NEAR-identical, not
    * equal), fingerprint through the REAL decode path on the
    * executors, then the same banded-Hamming pair machinery
    * ([[Dedup.hammingPairs]]: complete recall at the declared
    * distance, bucket-join shuffles hashes only). Rows-only in the
    * gate (WAV synthesis isn't SQL-expressible); AudioDedupSpec
    * verifies pair counts against brute-force Hamming and pins the
    * fingerprint's gain invariance. */
  def qAudioNearDup(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    import s.implicits._
    // deterministic sample: an unordered limit(n) lets the planner pick
    // WHICH n rows, so a partitioning change could silently diverge the
    // operator from AudioDedupSpec's brute-force rerun — filter on the
    // key instead (same predicate in the spec)
    val ids = documents(s, d).select(col("doc_id").cast("long"))
      .filter(col("doc_id") < 160).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map { id => (id, audioHash64(synthClassWav(id)).get) }
    }.toDF("id", "sh")
    Dedup.hammingPairs(hashed, maxHamming)
      .groupBy("hamming").agg(count("*").as("n_pairs"))
  }

  /** 64-bit temporal fingerprint of a video payload: decode (real
    * RIFF/AVI parse + per-frame imageio), take the per-frame mean-luma
    * sequence, resample it onto 65 equal-time windows, bit i =
    * luma(window i+1) > luma(window i) — the sign of the brightness
    * derivative over time. Brightness-scale invariant by construction
    * (scaling every pixel scales every window mean equally, preserving
    * all comparisons) — the video analogue of [[audioHash64]]'s energy
    * deltas: identity lives in the temporal SHAPE (cuts, fades,
    * motion), not absolute exposure. None when the payload isn't a
    * decodable MJPEG-AVI with ≥ 2 frames. */
  def videoHash64(payload: Array[Byte]): Option[Long] =
    MjpegAviDecoder.frameLumas(payload).flatMap { lumas =>
      if (lumas.length < 2) None
      else {
        // resample n frames onto 65 windows: window w = mean of frames
        // in [w*n/65, (w+1)*n/65) (at least one frame per window via
        // index rounding — short clips repeat frames, long clips pool)
        val n = lumas.length
        val windows = Array.tabulate(65) { w =>
          val from = w * n / 65
          val until = math.max(from + 1, (w + 1) * n / 65)
          var s = 0.0
          var i = from
          while (i < until) { s += lumas(i); i += 1 }
          s / (until - from)
        }
        var h = 0L
        var i = 0
        while (i < 64) {
          if (windows(i + 1) > windows(i)) h |= (1L << i)
          i += 1
        }
        Some(h)
      }
    }

  /** q111: video near-dup detection — the final member of the media
    * dedup trio (text SimHash q28, image aHash q65, audio envelope
    * q88): synthesize a deterministic 65-frame MJPEG AVI per doc (luma
    * step pattern class = doc_id % 8, plus a one-frame per-doc
    * brightness perturbation so same-class clips are NEAR-identical,
    * not equal), fingerprint through the REAL container-parse +
    * per-frame decode path on the executors, then the same
    * banded-Hamming pair machinery ([[Dedup.hammingPairs]]: complete
    * recall at the declared distance, bucket-join shuffles hashes
    * only). Rows-only in the gate (AVI/JPEG synthesis isn't
    * SQL-expressible); VideoDedupSpec verifies pair counts against
    * brute-force Hamming and pins the fingerprint's exposure
    * invariance. */
  def qVideoNearDup(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    import s.implicits._
    // key-filtered sample, not limit(n): the planner must not pick
    // WHICH rows (same predicate in VideoDedupSpec's brute-force rerun)
    val ids = documents(s, d).select(col("doc_id").cast("long"))
      .filter(col("doc_id") < 120).as[Long]
    val hashed = ids.mapPartitions { it =>
      it.map { id => (id, videoHash64(synthClassAvi(id)).get) }
    }.toDF("id", "sh")
    Dedup.hammingPairs(hashed, maxHamming)
      .groupBy("hamming").agg(count("*").as("n_pairs"))
  }

  /** The q111 payload: 65 solid frames whose luma step pattern is the
    * doc's class (doc_id % 8) — the same step family as
    * [[synthClassWav]] — with one class-independent frame brightness
    * perturbation per doc, so same-class clips differ in ≤ 2 temporal
    * deltas. Frames are 8×8 solid grays: JPEG round-trips those
    * near-exactly (DC-only blocks), keeping the decoded ordering of
    * adjacent pattern levels intact. */
  def synthClassAvi(id: Long): Array[Byte] = {
    val cls = (id % 8).toInt
    val lumas = Array.tabulate(65)(w => 0.2 + 0.6 * ((w * (cls + 2)) % 7) / 7.0)
    val bump = ((id / 8) % 65).toInt
    lumas(bump) = math.min(1.0, lumas(bump) * 1.15)
    synthAvi(lumas.toSeq.map(encodeSolidJpeg(8, 8, _)), fps = 10)
  }

  /** The q88 payload: 65-window envelope whose step pattern is the
    * doc's class (doc_id % 8), with one class-independent window gain
    * perturbation per doc — same-class clips differ in ≤ 2 envelope
    * deltas. */
  def synthClassWav(id: Long): Array[Byte] = {
    val cls = (id % 8).toInt
    val amps = Array.tabulate(65)(w => 0.2 + 0.6 * ((w * (cls + 2)) % 7) / 7.0)
    val bump = ((id / 8) % 65).toInt
    amps(bump) *= 1.15
    synthEnvelopeWav(amps)
  }

  /** Default modality → codec registry: all three media types decode
    * for real with JDK-only codecs — images via `javax.imageio`, audio
    * via `javax.sound.sampled` (WAV/AIFF PCM), video via the RIFF/AVI
    * container with per-frame imageio decode (MJPEG) — each falling
    * back to the deterministic stub for payloads outside its format
    * coverage (e.g. H.264, MP3: no JDK codec exists). */
  def defaultDecoder(mediaType: String): MediaDecoder = mediaType match {
    case "image" => new MediaDecoder {
      def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] =
        ImageIODecoder.decode(payload, dims).orElse(StubDecoder.decode(payload, dims))
    }
    case "audio" => new MediaDecoder {
      def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] =
        WavAudioDecoder.decode(payload, dims).orElse(StubDecoder.decode(payload, dims))
    }
    case "video" => new MediaDecoder {
      def decode(payload: Array[Byte], dims: Int): Option[Array[Double]] =
        MjpegAviDecoder.decode(payload, dims).orElse(StubDecoder.decode(payload, dims))
    }
    case _ => StubDecoder
  }

  /** Synthesize a media table from `documents` (text bytes as the opaque
    * payload) — the container has no real media files; the *plumbing*
    * (binary column + metadata schema) is the deliverable. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      (col("n_chars") * 10).as("duration_ms"))

  /** Metadata extraction over binary payloads — byte length + digest.
    * Pure column ops (oracle-checkable in DuckDB). */
  def qMediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).groupBy("media_type")
      .agg(count("*").as("n"),
        sum(length(col("payload"))).as("sum_bytes"),
        count_distinct(md5(col("payload"))).as("n_unique"))

  /** Feature extraction: partition-local batched decode over the binary
    * column (mapPartitions = one decoder init per partition, the same
    * batch shape `mapInPandas` gives PySpark). Output is a fixed-dim
    * feature vector per media row, ready for the Similarity operators. */
  def extractFeatures(media: Dataset[MediaRecord],
      decoderFor: String => MediaDecoder = defaultDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition decoder cache: one codec instance per modality
      val cache = scala.collection.mutable.Map.empty[String, MediaDecoder]
      it.map { r =>
        val dec = cache.getOrElseUpdate(r.media_type, decoderFor(r.media_type))
        val feats = dec.decode(r.payload, 8)
          .getOrElse(stubDecode(r.payload))
        MediaFeatures(r.media_id, r.media_type, r.payload.length, feats)
      }
    }
  }

  /** Frame sampling: for video rows, emit one row per sampled frame
    * (every `stepMs` of the duration) — a Generator-shaped explode over
    * metadata, no payload duplication (the frame offset indexes into the
    * shared payload at decode time). */
  def qFrameSample(s: SparkSession, d: String, stepMs: Long = 1000): DataFrame =
    mediaTable(s, d)
      .filter(col("media_type") === "video" && col("duration_ms") >= stepMs)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(stepMs))).as("frame_ms"))
      .groupBy("media_id").agg(count("*").as("n_frames"))

  /** End-to-end feature pipeline as a queries() entry: decode (stubbed)
    * → fixed-dim features → per-type aggregate. Rows-only check (the
    * stub decode is not SQL-expressible; FeatureSpec covers values). */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = mediaTable(s, d).as[MediaRecord]
    extractFeatures(media).toDF()
      .groupBy("media_type")
      .agg(count("*").as("n"),
        round(sum(aggregate(col("features"), lit(0.0), (a, v) => a + v)), 4)
          .as("sum_features"))
  }
}

/** q366's DCT kernel. Unnormalized DCT-II: under the median threshold
  * any positive global normalization cancels, so none is applied.
  * Cosine tables via StrictMath (bit-identical on every JVM); all
  * loops fixed-order — no parallel reduction, no bits left to chance.
  * Brightness invariance falls out of Σ_x cos(π(2x+1)k/2N) = 0 for
  * k ≥ 1: a +b shift moves ONLY the (0,0) coefficient, which the
  * hash excludes. */
private[operators] object PHash {
  private val N = 32
  private val ct: Array[Array[Double]] = Array.tabulate(N, N)((k, x) =>
    StrictMath.cos(math.Pi * (2 * x + 1) * k / (2.0 * N)))

  def dct2d32(m: Array[Array[Double]]): Array[Array[Double]] = {
    val tmp = Array.ofDim[Double](N, N) // tmp(y)(k): DCT along rows
    var y = 0
    while (y < N) {
      var k = 0
      while (k < N) {
        var x = 0; var acc = 0.0
        while (x < N) { acc += m(y)(x) * ct(k)(x); x += 1 }
        tmp(y)(k) = acc; k += 1
      }
      y += 1
    }
    val out = Array.ofDim[Double](N, N) // out(u)(k): DCT along columns
    var u = 0
    while (u < N) {
      var k = 0
      while (k < N) {
        var yy = 0; var acc = 0.0
        while (yy < N) { acc += tmp(yy)(k) * ct(u)(yy); yy += 1 }
        out(u)(k) = acc; k += 1
      }
      u += 1
    }
    out
  }
}
