package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core.StreamRecord

/** GraftLog: a durable, append-only log of [[StreamRecord]]s — the
  * engine's analogue of a Redis stream key space. `append` is the XADD
  * ingest path; the DSv2 source ([[GraftLogDataSource]]) reads it as a
  * Structured Streaming micro-batch source with segment-count offsets;
  * `compact` is the XTRIM retention path driven by the trigger
  * engine's slowest-consumer watermarks.
  *
  * Layout: numbered JSON-lines segments (`seg-%010d.jsonl`) on any
  * Hadoop-visible filesystem, written tmp + rename so a reader never
  * observes a partial segment — the same durability shape as
  * [[graft.streaming.CheckpointStore]]. A segment is immutable once
  * renamed; offsets are therefore simply "number of segments", and a
  * micro-batch is a contiguous segment range (each segment reads as
  * one input partition, so ingest parallelism = append granularity).
  * Records carry the dual decoded/raw field views byte-exactly
  * (`fieldsRaw` base64-encoded in the JSON).
  */
final class GraftLog(val dir: String, hadoopConf: Configuration) extends Serializable {

  @transient private lazy val fs: FileSystem = new Path(dir).getFileSystem(hadoopConf)
  private val root = new Path(dir)

  private def segPath(i: Long): Path = new Path(root, f"seg-$i%010d.jsonl")

  /** Number of committed segments (= the latest stream offset). */
  def segmentCount: Long = {
    if (!fs.exists(root)) return 0L
    val Name = GraftLog.SegmentName
    fs.listStatus(root).iterator.map(_.getPath.getName)
      .collect { case Name(n) => n.toLong + 1 }
      .foldLeft(0L)(math.max)
  }

  /** Append one batch of records as a new immutable segment. Returns
    * the new segment count. Thread-safe per log instance. */
  def append(records: Seq[StreamRecord]): Long = synchronized {
    fs.mkdirs(root)
    val next = segmentCount
    val tmp = new Path(root, f".tmp-seg-$next%010d")
    val out = fs.create(tmp, true)
    try records.foreach { r =>
      out.write(GraftLog.toJsonLine(r).getBytes(UTF_8))
      out.write('\n')
    } finally out.close()
    if (!fs.rename(tmp, segPath(next)))
      throw new java.io.IOException(s"concurrent append to $dir at segment $next")
    next + 1
  }

  /** Read segments [from, until) — used by the DSv2 partition readers
    * (one call per segment, executor-side) and by tests. */
  def readSegment(i: Long): Iterator[StreamRecord] = {
    val p = segPath(i)
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, UTF_8).linesIterator.filter(_.nonEmpty).map(GraftLog.fromJsonLine)
  }

  /** E6 retention: rewrite the whole log, dropping every record at or
    * below its stream's watermark. Segment numbering is preserved
    * (readers' offsets stay valid); emptied records simply vanish from
    * the rewritten segments. Returns the number of records removed. */
  def compact(watermarks: Map[String, (Long, Long)]): Long = synchronized {
    if (watermarks.isEmpty) return 0L
    var removed = 0L
    (0L until segmentCount).foreach { i =>
      val all = readSegment(i).toSeq
      val kept = all.filter { r =>
        watermarks.get(r.stream) match {
          case Some((ms, seq)) =>
            r.idMs > ms || (r.idMs == ms && r.idSeq > seq)
          case None => true
        }
      }
      if (kept.size != all.size) {
        removed += all.size - kept.size
        val tmp = new Path(root, f".tmp-compact-$i%010d")
        val out = fs.create(tmp, true)
        try kept.foreach { r =>
          out.write(GraftLog.toJsonLine(r).getBytes(UTF_8))
          out.write('\n')
        } finally out.close()
        fs.delete(segPath(i), false)
        fs.rename(tmp, segPath(i))
      }
    }
    removed
  }
}

object GraftLog {
  private[sources] val SegmentName = """seg-(\d{10})\.jsonl""".r
  private val mapper = new ObjectMapper()

  private[sources] def toJsonLine(r: StreamRecord): String = {
    val node = mapper.createObjectNode()
    node.put("stream", r.stream)
    node.put("idMs", r.idMs)
    node.put("idSeq", r.idSeq)
    val f = node.putObject("fields")
    r.fields.toSeq.sortBy(_._1).foreach { case (k, v) => f.put(k, v) }
    if (r.fieldsRaw.nonEmpty) {
      val raw = node.putArray("fieldsRaw")
      r.fieldsRaw.foreach { case (k, v) =>
        val pair = raw.addArray()
        pair.add(java.util.Base64.getEncoder.encodeToString(k))
        pair.add(java.util.Base64.getEncoder.encodeToString(v))
      }
    }
    mapper.writeValueAsString(node)
  }

  private[sources] def fromJsonLine(line: String): StreamRecord = {
    val n = mapper.readTree(line)
    val fields = {
      val fnode = n.get("fields")
      val it = fnode.fieldNames()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val k = it.next(); b += k -> fnode.get(k).asText() }
      b.result()
    }
    val raw = Option(n.get("fieldsRaw")).map { arr =>
      (0 until arr.size()).map { i =>
        val pair = arr.get(i)
        (java.util.Base64.getDecoder.decode(pair.get(0).asText()),
          java.util.Base64.getDecoder.decode(pair.get(1).asText()))
      }
    }.getOrElse(Seq.empty)
    StreamRecord(n.get("stream").asText(), n.get("idMs").asLong(),
      n.get("idSeq").asLong(), fields, raw)
  }
}
