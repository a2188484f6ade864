package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Dataset, DataFrame}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.core._
import graft.core.LibraryBuilder.StreamTriggerDef

/** The stream-trigger engine (R3 + E1-E7): continuous, prefix-subscribed,
  * per-stream-ordered, checkpointed delivery of [[StreamRecord]]s to
  * registered consumers.
  *
  * Semantics carried over from the reference's stream reader
  * (`/root/reference/redisgears_core/src/stream_reader.rs`):
  *  - prefix subscription: a consumer sees every stream whose key starts
  *    with its prefix (E1);
  *  - per-stream order: records of one stream are delivered in (ms, seq)
  *    order, never concurrently (E2/E3 — `window` in the reference is a
  *    concurrency cap; per-stream order is the observable contract,
  *    SURVEY §7.5.2);
  *  - checkpointing: after a record's callback returns (= ack, E4), the
  *    consumer's `last_read_id` advances; replayed input (at-least-once
  *    sources) below the checkpoint is skipped, so delivery is
  *    exactly-once per record while the engine is up (E7);
  *  - errors: a throwing callback does NOT advance the checkpoint for
  *    that stream; the error is surfaced in stats (E4 nack / E16);
  *  - trim watermark: min acked id across all trimming consumers of a
  *    stream (E6) — exposed for the source's retention/compaction.
  *
  * Execution model: trigger *control plane* runs driver-side (consumer
  * callbacks mutate engine state, exactly like the reference's
  * callbacks run inside the single Redis process). The *data plane* —
  * heavy per-record transforms — belongs in DataFrame operators fed by
  * the same micro-batches ([[attachBatches]] hands each micro-batch
  * DataFrame to distributed operators before the driver-side routing).
  */
final class StreamTriggerEngine(engine: Engine) {

  private case class Consumer(library: String, spec: StreamTriggerDef) {
    val perStream = TrieMap.empty[String, ConsumerStreamState]
    def key: String = s"$library.${spec.name}"
  }

  private final class ConsumerStreamState {
    @volatile var lastReadMs: Long = -1
    @volatile var lastReadSeq: Long = -1
    @volatile var totalProcessed: Long = 0
    @volatile var totalErrors: Long = 0
    @volatile var lastError: Option[String] = None
    @volatile var lastLagMs: Long = 0
    def lastReadId: String = if (lastReadMs < 0) "0-0" else s"$lastReadMs-$lastReadSeq"
    def isNew(r: StreamRecord): Boolean =
      r.idMs > lastReadMs || (r.idMs == lastReadMs && r.idSeq > lastReadSeq)
  }

  private val consumers = TrieMap.empty[String, Consumer]

  private[graft] def register(library: String, spec: StreamTriggerDef): Unit = {
    val c = Consumer(library, spec)
    // checkpoint continuity on upgrade (E14): adopt surviving state
    consumers.get(c.key).foreach(old => c.perStream ++= old.perStream)
    consumers.put(c.key, c)
  }

  private[graft] def unregister(library: String, trigger: String,
      dropCheckpoints: Boolean): Unit = {
    val key = s"$library.$trigger"
    if (dropCheckpoints) consumers.remove(key)
    // else: keep entry so a REPLACE load re-adopts checkpoints via register()
  }

  /** Deliver one batch of records. Core routing: per consumer, per
    * stream, ordered, checkpoint-deduped. Called by the streaming sink
    * (foreachBatch) or directly (tests / synchronous ingest). */
  def processBatch(records: Seq[StreamRecord]): Unit = {
    if (records.isEmpty || consumers.isEmpty) return
    val now = System.currentTimeMillis()
    // group once per stream, order within stream by (ms, seq)
    val byStream = records.groupBy(_.stream).map { case (s, rs) =>
      s -> rs.sortBy(r => (r.idMs, r.idSeq))
    }
    consumers.values.foreach { c =>
      val ctx = engine.functionContext(c.library)
      byStream.foreach { case (stream, rs) =>
        if (stream.startsWith(c.spec.prefix)) {
          val st = c.perStream.getOrElseUpdate(stream, new ConsumerStreamState)
          rs.foreach { r =>
            if (st.isNew(r)) {
              try {
                c.spec.fn(ctx, r)
                // ack: advance checkpoint only after successful callback
                st.lastReadMs = r.idMs
                st.lastReadSeq = r.idSeq
                st.totalProcessed += 1
                st.lastLagMs = math.max(0, now - r.idMs)
              } catch {
                case e: Throwable =>
                  st.totalErrors += 1
                  st.lastError = Some(e.toString)
                  // nack: do not advance; subsequent records of this
                  // stream in this batch still attempt (reference keeps
                  // consuming and records last_error)
              }
            }
          }
        }
      }
    }
  }

  /** XADD-analogue for synchronous ingest (tests, library code): routes
    * one record through the registered consumers immediately. */
  def xadd(stream: String, idMs: Long, idSeq: Long, fields: Map[String, String]): Unit =
    processBatch(Seq(StreamRecord(stream, idMs, idSeq, fields)))

  /** E6: trim watermark for a stream — max id fully acked by *every*
    * trimming consumer subscribed to it (slowest-consumer rule). None if
    * no trimming consumer tracks the stream. */
  def trimWatermark(stream: String): Option[(Long, Long)] = {
    val states = consumers.values.toSeq
      .filter(c => c.spec.isStreamTrimmed && stream.startsWith(c.spec.prefix))
      .flatMap(_.perStream.get(stream))
    if (states.isEmpty) None
    else Some(states.map(s => (s.lastReadMs, s.lastReadSeq)).min)
  }

  /** Attach a continuous `Dataset[StreamRecord]` (file stream, Kafka,
    * MemoryStream…) to the trigger engine. Checkpointing the streaming
    * query + the engine's own id checkpoint gives E5/E7: after restart
    * the source replays the last uncommitted batch and the id checkpoint
    * dedupes already-acked records. */
  def attach(ds: Dataset[StreamRecord], checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    ds.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[StreamRecord], _: Long) =>
        // trigger control plane is driver-side by design (see class doc);
        // batches are small (maxOffsetsPerTrigger bounds them upstream)
        processBatch(batch.collect().toSeq)
      }
      .start()

  /** Distributed data plane: hand each micro-batch DataFrame to a
    * declarative operator pipeline (runs on executors), e.g. running
    * aggregations into a sink table, then route the (small) batch
    * through the driver-side triggers. */
  def attachBatches(ds: Dataset[StreamRecord], checkpointDir: String)(
      dataPlane: DataFrame => Unit): StreamingQuery =
    ds.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[StreamRecord], _: Long) =>
        dataPlane(batch.toDF())
        processBatch(batch.collect().toSeq)
      }
      .start()

  private[graft] def stats(library: String, trigger: String): StreamTriggerStats = {
    val key = s"$library.$trigger"
    consumers.get(key).map { c =>
      StreamTriggerStats(library, trigger, c.spec.prefix, c.spec.window,
        c.spec.isStreamTrimmed,
        c.perStream.map { case (s, st) =>
          s -> StreamConsumerStats(st.lastReadId, st.totalProcessed,
            st.totalErrors, st.lastError, st.lastLagMs)
        }.toMap)
    }.getOrElse(StreamTriggerStats(library, trigger, "", 1, trimmed = false, Map.empty))
  }
}
