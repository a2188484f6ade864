package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Minimal safetensors reader/writer — the HuggingFace tensor
  * serialization format (publicly specified at
  * github.com/huggingface/safetensors): an 8-byte little-endian u64
  * header length, a UTF-8 JSON header mapping tensor name →
  * `{"dtype", "shape", "data_offsets"}` (offsets relative to the end
  * of the header), then the raw little-endian tensor buffer. This
  * implements the slice a linear scorer needs — 1-D F32/F64 tensors —
  * with exact parsing of the full header (unknown tensors and the
  * optional `__metadata__` entry are skipped, not errors).
  *
  * Why this format: it is what the LLM ecosystem actually persists
  * weights in, it is self-describing and seekable (a reader can pull
  * ONE tensor out of a multi-GB checkpoint by offset — the property
  * that matters when `open()` runs once per partition), and it parses
  * with zero dependencies beyond the JDK and the Jackson shipped in
  * Spark's own classpath. */
object Safetensors {

  /** Write `tensors` (name → (dtype, values)) — dtype "F32" or "F64".
    * Tensor order in the buffer follows the given sequence order. */
  def write(path: String, tensors: Seq[(String, String, Array[Double])]): Unit = {
    require(tensors.nonEmpty, "safetensors file must hold at least one tensor")
    val widths = Map("F32" -> 4, "F64" -> 8)
    var off = 0L
    val entries = tensors.map { case (name, dtype, values) =>
      // names are interpolated into the JSON header raw — restrict to a
      // charset that needs no escaping (quotes/backslashes/control
      // chars would corrupt the header for every reader)
      require(name.nonEmpty && name.forall(c =>
          c.isLetterOrDigit && c < 128 || c == '_' || c == '.' || c == '-'),
        s"tensor name '$name' outside [A-Za-z0-9._-]")
      val w = widths.getOrElse(dtype,
        throw new IllegalArgumentException(s"unsupported dtype $dtype"))
      val begin = off
      off += values.length.toLong * w
      s""""$name":{"dtype":"$dtype","shape":[${values.length}],"data_offsets":[$begin,$off]}"""
    }
    val header = entries.mkString("{", ",", "}").getBytes("UTF-8")
    // this writer buffers the whole file; refuse sizes Int can't index
    // rather than silently wrapping (a multi-GB checkpoint needs a
    // streaming writer, not this one)
    require(8L + header.length + off <= Int.MaxValue,
      s"tensor payload ${off} B exceeds this writer's 2 GB buffer limit")
    val buf = ByteBuffer.allocate(8 + header.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putLong(header.length.toLong)
    buf.put(header)
    tensors.foreach { case (_, dtype, values) =>
      if (dtype == "F32") values.foreach(v => buf.putFloat(v.toFloat))
      else values.foreach(buf.putDouble)
    }
    Files.write(Paths.get(path), buf.array())
  }

  /** Read one named 1-D tensor as doubles (F32 widens exactly). */
  def readVector(path: String, name: String): Array[Double] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getLong(0)
    require(headerLen > 0 && headerLen <= bytes.length - 8,
      s"corrupt safetensors header length $headerLen in $path")
    val header = new String(bytes, 8, headerLen.toInt, "UTF-8")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(header)
    val node = root.get(name)
    require(node != null && name != "__metadata__",
      s"tensor '$name' not present in $path (header holds: " +
        s"${scala.jdk.CollectionConverters.IteratorHasAsScala(root.fieldNames()).asScala.mkString(", ")})")
    val dtype = node.get("dtype").asText()
    val offs = node.get("data_offsets")
    val (begin, end) = (offs.get(0).asLong(), offs.get(1).asLong())
    val dataStart = 8 + headerLen
    val width = dtype match {
      case "F32" => 4
      case "F64" => 8
      case other => throw new IllegalArgumentException(
        s"tensor '$name' has unsupported dtype $other (F32/F64 supported)")
    }
    // a corrupt (or adversarial) header must fail HERE with a clear
    // error, not as a raw IndexOutOfBounds mid-read — and never as a
    // silently-wrong negative index after the Int narrowing below
    require(begin >= 0 && end >= begin && dataStart + end <= bytes.length &&
        (end - begin) % width == 0,
      s"corrupt data_offsets [$begin,$end] for tensor '$name' in $path " +
        s"(payload is ${bytes.length - dataStart} B, dtype width $width)")
    val n = ((end - begin) / width).toInt
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val pos = (dataStart + begin).toInt + i * width
      out(i) = if (width == 4) bb.getFloat(pos).toDouble else bb.getDouble(pos)
      i += 1
    }
    out
  }
}
