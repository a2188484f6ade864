package graft.core

import org.apache.spark.sql.types._

/** Core value model (SURVEY.md §1).
  *
  * The reference's only first-class record type is the stream record
  * `(id: (ms, seq), fields: [(k, v)…])` —
  * `/root/reference/redisgears_plugin_api/src/redisgears_plugin_api/stream_ctx.rs:17-20`
  * — and its function I/O travels as RESP3 trees
  * (`redisgears_v8_plugin/src/v8_native_functions.rs:62-195`). Here both
  * become typed Scala values with Spark schemas; Tungsten replaces the
  * reference's cluster serialization wholesale (SURVEY §1.4).
  */

/** A stream record: the unit the stream-trigger engine delivers.
  * `stream` is the prefix-matchable stream key; `(idMs, idSeq)` is the
  * monotonic per-stream id (event-time millis + tiebreaker).
  *
  * Binary safety (C2): like the reference's dual decoded/raw record
  * shape (`record` = UTF-8 strings where decodable, `record_raw` =
  * always the exact bytes — `v8_stream_ctx.rs:76-101`, binary test
  * `pytests/test_stream_reader.py:31-54`), `fields` is the decoded
  * view (only pairs where key and value are valid UTF-8) and
  * `fieldsRaw` carries every pair byte-exactly. Text-only producers
  * leave `fieldsRaw` empty and use `fields` directly. */
case class StreamRecord(stream: String, idMs: Long, idSeq: Long,
    fields: Map[String, String],
    fieldsRaw: Seq[(Array[Byte], Array[Byte])] = Seq.empty) {
  def id: (Long, Long) = (idMs, idSeq)
  def idString: String = s"$idMs-$idSeq"
}

object StreamRecord {
  val schema: StructType = StructType(Seq(
    StructField("stream", StringType, nullable = false),
    StructField("idMs", LongType, nullable = false),
    StructField("idSeq", LongType, nullable = false),
    StructField("fields", MapType(StringType, StringType), nullable = false),
    StructField("fieldsRaw", ArrayType(StructType(Seq(
      StructField("_1", BinaryType, nullable = true),
      StructField("_2", BinaryType, nullable = true))), containsNull = true),
      nullable = true)))

  /** Strict UTF-8 decode: None when the bytes are not valid UTF-8 (the
    * reference yields JS `null` for such fields). */
  def decodeUtf8(bytes: Array[Byte]): Option[String] = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }

  /** Build a record from raw byte pairs: `fieldsRaw` keeps the exact
    * bytes; `fields` holds the pairs where both sides decode as UTF-8. */
  def binary(stream: String, idMs: Long, idSeq: Long,
      raw: Seq[(Array[Byte], Array[Byte])]): StreamRecord = {
    val decoded = raw.flatMap { case (k, v) =>
      for (ks <- decodeUtf8(k); vs <- decodeUtf8(v)) yield ks -> vs
    }.toMap
    StreamRecord(stream, idMs, idSeq, decoded, raw)
  }

  implicit val ordering: Ordering[StreamRecord] =
    Ordering.by(r => (r.stream, r.idMs, r.idSeq))
}

/** A keyspace change event: the unit the keyspace-trigger (CDC) engine
  * delivers — the reference's notification payload `{event, key}` plus
  * an optional snapshot captured at fire time (`onTriggerFired`,
  * `redisgears_core/src/keys_notifications.rs:150-209`). */
case class KeyEvent(event: String, key: String, ts: Long,
    snapshot: Option[Map[String, String]])

object KeyEvent {
  val schema: StructType = StructType(Seq(
    StructField("event", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("snapshot", MapType(StringType, StringType), nullable = true)))
}

/** RESP-ish dynamic value algebra (SURVEY §1.3): the scalar/container
  * types a function can accept and return. Mirrors the bidirectional
  * RESP3↔JS conversion tables
  * (`v8_native_functions.rs:62-195`, `v8_function_ctx.rs:58-141`):
  * int64, double, bool, null, UTF-8 string, binary, big number,
  * verbatim string; array, map, set; nesting capped at 100. */
sealed trait RespValue
object RespValue {
  case object RespNull extends RespValue
  case class RespBool(v: Boolean) extends RespValue
  case class RespLong(v: Long) extends RespValue
  case class RespDouble(v: Double) extends RespValue
  case class RespString(v: String) extends RespValue
  case class RespBinary(v: Array[Byte]) extends RespValue {
    override def equals(o: Any): Boolean = o match {
      case RespBinary(other) => java.util.Arrays.equals(v, other)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(v)
  }
  /** RESP big number — decimal string beyond int64 range. */
  case class RespBigNumber(v: BigInt) extends RespValue
  /** RESP verbatim string — tagged with a 3-char format ("txt", "mkd"). */
  case class RespVerbatim(format: String, text: String) extends RespValue
  case class RespArray(v: Seq[RespValue]) extends RespValue
  case class RespMap(v: Map[String, RespValue]) extends RespValue
  /** Set semantics (distinct elements) — RESP3 Set. */
  case class RespSet(v: Set[RespValue]) extends RespValue
  /** A pending background computation (C5 `executeAsync`): the analogue
    * of a JS function returning a Promise — the reference blocks the
    * client and replies when the promise resolves
    * (`v8_native_functions.rs:694-763`, `run_ctx.rs:202-222`). The
    * engine resolves it before replying; it never serializes. */
  case class RespPromise(v: scala.concurrent.Future[RespValue]) extends RespValue

  /** Max nesting depth, matching the reference's cap
    * (`v8_function_ctx.rs:64-66`). */
  val MaxDepth = 100

  def depth(v: RespValue): Int = v match {
    case RespArray(xs) => 1 + (if (xs.isEmpty) 0 else xs.map(depth).max)
    case RespMap(m) => 1 + (if (m.isEmpty) 0 else m.values.map(depth).max)
    case RespSet(s) => 1 + (if (s.isEmpty) 0 else s.map(depth).max)
    case _ => 1
  }

  def validate(v: RespValue): Either[String, RespValue] =
    if (depth(v) > MaxDepth) Left(s"nesting depth exceeds $MaxDepth") else Right(v)

  /** JSON encoding for interchange (the reference JSON.stringify-s
    * everything non-binary at cluster boundaries, SURVEY §1.4). Binary
    * is base64-tagged; verbatim/bignum keep their tags so decode
    * round-trips. */
  def toJson(v: RespValue): String = v match {
    case RespNull => "null"
    case RespBool(b) => b.toString
    case RespLong(l) => l.toString
    case RespDouble(d) =>
      if (d.isNaN || d.isInfinite) s"""{"__t":"dbl","v":"$d"}""" else d.toString
    case RespString(s) => quote(s)
    case RespBinary(b) =>
      s"""{"__t":"bin","v":${quote(java.util.Base64.getEncoder.encodeToString(b))}}"""
    case RespBigNumber(n) => s"""{"__t":"big","v":"$n"}"""
    case RespVerbatim(f, t) => s"""{"__t":"vrb","f":${quote(f)},"v":${quote(t)}}"""
    case RespArray(xs) => xs.map(toJson).mkString("[", ",", "]")
    case RespMap(m) =>
      m.toSeq.sortBy(_._1).map { case (k, x) => s"${quote(k)}:${toJson(x)}" }
        .mkString("{", ",", "}")
    case RespSet(s) =>
      s"""{"__t":"set","v":${s.toSeq.map(toJson).sorted.mkString("[", ",", "]")}}"""
    case RespPromise(_) =>
      throw new IllegalStateException("a pending promise cannot be serialized — resolve it first")
  }

  private def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
