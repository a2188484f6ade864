package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The safetensors model artifact path: exact format round-trip, and
  * scoring a PERSISTED model through the per-partition handle
  * ([[Inference.SafetensorsScorer]]) matches closure-shipped weights
  * ([[Inference.LinearScorer]]) bit for bit. */
class SafetensorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(): String = {
    val f = java.nio.file.Files.createTempFile("graft-st-", ".safetensors")
    f.toFile.deleteOnExit()
    f.toString
  }

  test("F64 round trip is bit-exact; F32 widens exactly") {
    val path = tmp()
    val w = Array(0.1, -2.5, 3.75, 1e-12, 1e300)
    Safetensors.write(path, Seq(("weight", "F64", w), ("bias", "F64", Array(-0.25))))
    assert(Safetensors.readVector(path, "weight").toSeq == w.toSeq)
    assert(Safetensors.readVector(path, "bias").toSeq == Seq(-0.25))
    val p32 = tmp()
    Safetensors.write(p32, Seq(("weight", "F32", Array(1.5, -0.125, 2.0))))
    // these values are exactly representable in float32
    assert(Safetensors.readVector(p32, "weight").toSeq == Seq(1.5, -0.125, 2.0))
  }

  test("header layout matches the published format (u64 LE length + JSON)") {
    val path = tmp()
    Safetensors.write(path, Seq(("weight", "F32", Array(1.0, 2.0))))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getLong(0)
    val header = new String(bytes, 8, headerLen.toInt, "UTF-8")
    assert(header.startsWith("{") && header.endsWith("}"))
    assert(header.contains("\"dtype\":\"F32\""))
    assert(header.contains("\"shape\":[2]"))
    assert(header.contains("\"data_offsets\":[0,8]"))
    assert(bytes.length == 8 + headerLen + 8) // two float32 values
  }

  test("multi-tensor files: each tensor reads from its own offsets; unknown names error") {
    val path = tmp()
    Safetensors.write(path, Seq(
      ("a", "F32", Array(1.0)),
      ("weight", "F64", Array(7.0, 8.0)),
      ("z", "F32", Array(3.0))))
    assert(Safetensors.readVector(path, "weight").toSeq == Seq(7.0, 8.0))
    assert(Safetensors.readVector(path, "a").toSeq == Seq(1.0))
    assert(Safetensors.readVector(path, "z").toSeq == Seq(3.0))
    intercept[IllegalArgumentException] { Safetensors.readVector(path, "missing") }
  }

  test("a persisted model scores through scoreBatches identically to closure weights") {
    val s = spark
    import s.implicits._
    val weights = Array(0.5, -1.25, 2.0, 0.0)
    val bias = 0.75
    val path = tmp()
    Safetensors.write(path, Seq(
      ("weight", "F64", weights), ("bias", "F64", Array(bias))))
    val df = (1L to 50L).map(i =>
      (i, Array.tabulate(4)(j => (i * 31 + j * 17 % 7).toDouble / 10.0)))
      .toDF("vec_id", "embedding")
    val fromFile = Inference.scoreBatches(df, Inference.SafetensorsScorer(path))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fromClosure = Inference.scoreBatches(df, Inference.LinearScorer(weights, bias))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fromFile == fromClosure)
    assert(fromFile.size == 50)
  }

  test("corrupt data_offsets fail cleanly, not as a raw buffer error") {
    // a well-formed JSON header whose offsets lie about the payload
    def craft(begin: Long, end: Long): String = {
      val path = tmp()
      val header =
        s"""{"w":{"dtype":"F32","shape":[2],"data_offsets":[$begin,$end]}}"""
      val hb = header.getBytes("UTF-8")
      val payload = new Array[Byte](8) // room for exactly two F32s
      val buf = java.nio.ByteBuffer
        .allocate(8 + hb.length + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putLong(hb.length.toLong); buf.put(hb); buf.put(payload)
      java.nio.file.Files.write(java.nio.file.Paths.get(path), buf.array())
      path
    }
    // offsets past the payload, inverted (end < begin — previously a
    // silent empty tensor), negative, and width-misaligned: each must
    // name the bad offsets instead of surfacing an index error
    for ((b, e) <- Seq((0L, 64L), (8L, 0L), (-4L, 4L), (0L, 6L))) {
      val ex = intercept[IllegalArgumentException] {
        Safetensors.readVector(craft(b, e), "w")
      }
      assert(ex.getMessage.contains("data_offsets"), s"offsets [$b,$e]: ${ex.getMessage}")
    }
    // the boundary case end == payload length is legal
    assert(Safetensors.readVector(craft(0L, 8L), "w").length == 2)
  }
}
