package graft.streaming

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._

/** Crash-point property test for the COMPOSED at-least-once path
  * (VERDICT r8 #4): [[TransactionalSink]] commit ↔ [[CheckpointStore]]
  * ack persist ↔ trigger redelivery. `GraftLog.compact` already has
  * kill-at-every-protocol-step coverage; this spec gives the same
  * treatment to the foreachBatch body the reference's stream-trigger
  * guarantee is about (`docs/docs/concepts/triggers/Stream_Triggers.md`
  * "Data processing guarantees": at-least-once delivery, resume from
  * the last acked id).
  *
  * A micro-batch executes three durable steps in order:
  *   1. sink.write(agg, batchId)      — exactly-once data plane
  *   2. engine.streams.processBatch   — trigger delivery + ack persist
  *   3. the streaming query's own commit (replay boundary)
  *
  * A kill is simulated by (a) stopping the attempt after step k — every
  * later step's durable state simply never happened — and (b) for the
  * kill INSIDE step 2's persist window (callbacks fired, acks not yet
  * durable), snapshotting the checkpoint dir before the attempt and
  * restoring it after, which is byte-for-byte what a kill between the
  * callback loop and `persistCheckpoints` leaves on disk. After each
  * crash the engine is torn down and rebuilt from the same checkpoint
  * dir (re-seed path) and Spark's contract is emulated by re-running
  * the SAME batch with the SAME batchId.
  *
  * Proved invariants, per crash window and overall:
  *   - zero loss: every record's callback fired at least once;
  *   - bounded redelivery: at most one extra delivery per record per
  *     crash, and ONLY for the window where acks were actually lost;
  *   - the sink holds every batch exactly once regardless of replays.
  */
class CrashRecoverySpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  /** Recursive copy of a directory tree (checkpoint snapshots). */
  private def snapshot(src: String): Path = {
    val dst = Files.createTempDirectory("crash-snap")
    val s = Paths.get(src)
    if (Files.exists(s)) Files.walk(s).forEach { p =>
      val t = dst.resolve(s.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
    dst
  }

  private def restore(snap: Path, dst: String): Unit = {
    val d = Paths.get(dst)
    if (Files.exists(d))
      Files.walk(d).sorted(Comparator.reverseOrder[Path]()).forEach(Files.delete(_))
    Files.walk(snap).forEach { p =>
      val t = d.resolve(snap.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  test("kill between every commit/ack step: zero loss, bounded redelivery, exactly-once sink") {
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    val ckptDir = Files.createTempDirectory("crash-eckpt").toString
    val sinkDir = Files.createTempDirectory("crash-sink").toString + "/out"
    val sink = new TransactionalSink(sinkDir, hc)

    // test-owned delivery log: survives "crashes" (the test process
    // lives on), records every callback invocation
    val delivered = mutable.ArrayBuffer.empty[Long] // record idMs per firing

    def mkEngine(): Engine = {
      val e = new Engine(spark, checkpointDir = Some(ckptDir))
      e.load(LibraryDefinition("crash", code = { b =>
        b.registerStreamTrigger("t", "c:", (_, r) => {
          delivered.synchronized { delivered += r.idMs }; ()
        }, isStreamTrimmed = true)
      }))
      e
    }

    var engine = mkEngine()

    // one batch = 4 records; batchIds replay-stable like Spark's
    def batchRecords(batchId: Long): Seq[StreamRecord] =
      (1L to 4L).map(i => StreamRecord("c:s", batchId * 10 + i, 0, Map("k" -> "v")))

    /** One attempt at the foreachBatch body, stopping after `steps`
      * steps (0 = crash before anything durable, 1 = after sink
      * commit, 2 = after delivery+ack, 3 = full completion). When
      * `loseAcks`, the checkpoint dir is rolled back after the attempt
      * — the kill landed between the callback loop and the ack write. */
    def attempt(batchId: Long, steps: Int, loseAcks: Boolean = false): Boolean = {
      val ckptSnap = if (loseAcks) Some(snapshot(ckptDir)) else None
      val records = batchRecords(batchId)
      if (steps >= 1) {
        val agg = records.toDF().groupBy("stream").agg(count("*").as("n"))
        sink.write(agg, batchId)
      }
      if (steps >= 2) engine.streams.processBatch(records)
      ckptSnap.foreach(restore(_, ckptDir))
      steps >= 3 // true = the query committed; false = replay needed
    }

    /** Simulated process restart: engine rebuilt from the durable
      * checkpoint dir (the E5 re-seed path). */
    def crashRestart(): Unit = {
      engine.close()
      engine = mkEngine()
    }

    // every crash window, one batch each; then the replay to completion
    val scenarios = Seq[(Long, Int, Boolean)](
      (0L, 0, false), // kill before the sink tmp write finished
      (1L, 1, false), // kill between sink commit and delivery
      (2L, 2, true),  // kill between callbacks and the ack write
      (3L, 2, false), // kill between ack write and the query commit
      (4L, 3, false)  // no crash (control)
    )
    scenarios.foreach { case (batchId, steps, loseAcks) =>
      val committed = attempt(batchId, steps, loseAcks)
      if (!committed) {
        crashRestart()
        assert(attempt(batchId, 3), "replay after restart must complete")
      }
    }

    // ---- invariants ----
    val perRecord = delivered.synchronized {
      delivered.groupBy(identity).view.mapValues(_.size).toMap
    }
    val allIds = scenarios.flatMap { case (b, _, _) => batchRecords(b).map(_.idMs) }
    // zero loss: every record delivered at least once
    allIds.foreach(id => assert(perRecord.getOrElse(id, 0) >= 1, s"record $id lost"))
    // bounded redelivery: at most one extra firing per crash, and only
    // in the lost-acks window; every other window redelivers nothing
    allIds.foreach { id =>
      val expected = if (id / 10 == 2L) 2 else 1
      assert(perRecord.getOrElse(id, 0) == expected,
        s"record $id fired ${perRecord.getOrElse(id, 0)}x, expected $expected")
    }
    // the sink holds each batch exactly once (batch 0..4, 4 records each)
    val sunk = sink.read(spark).agg(sum("n")).head().getLong(0)
    assert(sunk == scenarios.size * 4L, s"sink rows $sunk != ${scenarios.size * 4}")
    // and the final acked id on the rebuilt engine is the last record
    crashRestart()
    val trig = engine.list().head.streamTriggers.head.streams("c:s")
    assert(trig.lastReadId == "44-0")
    engine.close()
  }

  test("keyspace CDC batches: kill at every dispatch step — zero loss, no naive refire") {
    // VERDICT r9 #6: the R4 path gets the E4 treatment. A CDC batch
    // dispatch has two durable steps: (1) fire every event + persist
    // the batch ack (KeySpaceTriggerEngine.processBatch), (2) the
    // caller's own commit. Kills: before anything; between the fires
    // and the ack write (checkpoint rollback — the lost-ack window);
    // between the ack write and the caller commit (the
    // skip-on-replay window the verdict names: NO double fire).
    val ckptDir = Files.createTempDirectory("crash-kckpt").toString
    val delivered = mutable.ArrayBuffer.empty[String]

    def mkEngine(): Engine = {
      val e = new Engine(spark, checkpointDir = Some(ckptDir))
      e.load(LibraryDefinition("kcrash", code = { b =>
        b.registerKeySpaceTrigger("t", "c:", (_, ev) => {
          delivered.synchronized { delivered += ev.key }; ()
        })
      }))
      e
    }
    var engine = mkEngine()

    def batchEvents(batchId: Long): Seq[KeyEvent] =
      (1L to 3L).map(i => KeyEvent("set", s"c:k${batchId * 10 + i}", i, None))

    /** steps: 0 = crash before dispatch, 1 = dispatch+ack done,
      * 2 = caller committed too. loseAcks simulates the kill INSIDE
      * step 1 — callbacks fired, ack write lost. */
    def attempt(batchId: Long, steps: Int, loseAcks: Boolean = false): Boolean = {
      val snap = if (loseAcks) Some(snapshot(ckptDir)) else None
      if (steps >= 1) engine.keyspace.processBatch("cdc", batchId, batchEvents(batchId))
      snap.foreach(restore(_, ckptDir))
      steps >= 2
    }
    def crashRestart(): Unit = { engine.close(); engine = mkEngine() }

    val scenarios = Seq[(Long, Int, Boolean)](
      (0L, 0, false), // kill before any dispatch
      (1L, 1, true),  // kill between the fires and the ack write
      (2L, 1, false), // kill between the ack write and the caller commit
      (3L, 2, false)  // no crash (control)
    )
    scenarios.foreach { case (batchId, steps, loseAcks) =>
      val committed = attempt(batchId, steps, loseAcks)
      if (!committed) {
        crashRestart()
        assert(attempt(batchId, 2), "replay after restart must complete")
      }
    }

    val perKey = delivered.synchronized {
      delivered.groupBy(identity).view.mapValues(_.size).toMap
    }
    scenarios.foreach { case (batchId, _, _) =>
      batchEvents(batchId).foreach { ev =>
        // zero loss everywhere; double fire ONLY in the lost-ack
        // window (at-least-once's inherent bound); in particular the
        // acked-but-uncommitted window (batch 2) refires NOTHING
        val expected = if (batchId == 1L) 2 else 1
        assert(perKey.getOrElse(ev.key, 0) == expected,
          s"${ev.key} fired ${perKey.getOrElse(ev.key, 0)}x, expected $expected")
      }
    }
    engine.close()
  }
}
