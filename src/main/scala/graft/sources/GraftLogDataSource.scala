package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.core.StreamRecord

/** DataSourceV2 streaming/batch source over a [[GraftLog]] — the
  * "custom MicroBatchStream with prefix subscription" SURVEY §7.4
  * plans as the genuinely-custom piece of the engine: the analogue of
  * the reference's stream reader discovering and incrementally reading
  * streams by key prefix (E1/E2, `stream_reader.rs:278-297,571-582`).
  *
  * Usage:
  * {{{
  * spark.readStream.format("graft-log")
  *   .option("path", dir).option("prefix", "s:")
  *   .load().as[StreamRecord]
  * }}}
  *
  * - Offsets are the log's segment count: a micro-batch is a
  *   contiguous immutable segment range, one input partition per
  *   segment (executor-parallel reads, no driver materialization).
  * - `prefix` is pushed INTO the source: non-matching streams are
  *   dropped at the partition reader, before any shuffle.
  * - Restart resumes from the committed segment offset in the query
  *   checkpoint — together with the engine's durable ack store this is
  *   the E5/E7 resume path on a source the engine also retains/trims
  *   ([[GraftLog.compact]]).
  */
final class GraftLogDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StreamRecord.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = properties.asScala
    new GraftLogTable(
      opts.getOrElse("path", throw new IllegalArgumentException("graft-log requires option 'path'")),
      opts.getOrElse("prefix", ""))
  }
}

final class GraftLogTable(path: String, prefix: String) extends Table with SupportsRead {
  override def name(): String = s"graft-log(`$path`, prefix='$prefix')"
  override def schema(): StructType = StreamRecord.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLogScan(path, prefix, options)
}

final class GraftLogScan(path: String, prefix: String,
    options: CaseInsensitiveStringMap) extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = StreamRecord.schema
  override def description(): String = s"graft-log $path prefix='$prefix'"

  private def hadoopConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftLogMicroBatchStream(path, prefix, hadoopConf)

  override def toBatch: Batch = new Batch {
    private val conf = hadoopConf
    override def planInputPartitions(): Array[InputPartition] = {
      val n = new GraftLog(path, conf.value).segmentCount
      (0L until n).map(i => GraftLogPartition(path, i, prefix): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftLogReaderFactory(conf)
  }
}

/** Offset = number of committed segments. */
case class GraftLogOffset(segments: Long) extends Offset {
  override def json(): String = segments.toString
}

final class GraftLogMicroBatchStream(path: String, prefix: String,
    conf: SerializableConfiguration) extends MicroBatchStream {
  private val log = new GraftLog(path, conf.value)

  override def initialOffset(): Offset = GraftLogOffset(0)
  override def latestOffset(): Offset = GraftLogOffset(log.segmentCount)
  override def deserializeOffset(json: String): Offset = GraftLogOffset(json.toLong)
  override def commit(end: Offset): Unit = () // retention is trim-driven (E6)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLogOffset].segments
    val e = end.asInstanceOf[GraftLogOffset].segments
    (s until e).map(i => GraftLogPartition(path, i, prefix): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftLogReaderFactory(conf)
}

/** One immutable segment = one input partition. */
case class GraftLogPartition(path: String, segment: Long, prefix: String)
  extends InputPartition

final class GraftLogReaderFactory(conf: SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftLogPartition]
    new PartitionReader[InternalRow] {
      private val serializer =
        ExpressionEncoder(org.apache.spark.sql.Encoders.product[StreamRecord]
          .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[StreamRecord]])
          .createSerializer()
      private val it = new GraftLog(p.path, conf.value)
        .readSegment(p.segment)
        .filter(_.stream.startsWith(p.prefix)) // prefix pushdown (E1)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = serializer(it.next()).copy(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
