package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._

/** Sink the executor-side callbacks write to. Static so the closure
  * shipped to tasks captures no engine state (in a real cluster this
  * would be an external sink; local[32] shares the JVM). */
object DeliverySink {
  val seen = new ConcurrentLinkedQueue[String]()
  @volatile var failOn: Long = -1L
  def reset(): Unit = { seen.clear(); failOn = -1L }
}

class DistributedDeliverySpec extends AnyFunSuite {
  private def rec(stream: String, ms: Long, seq: Long = 0) =
    StreamRecord(stream, ms, seq, Map("k" -> "v"))

  private val spark = TestSpark.spark
  implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  import spark.implicits._

  test("executor-side delivery: per-stream order, prefix filter, ack merge (E2/E4)") {
    DeliverySink.reset()
    val e = new Engine(spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, _) => fail("driver callback must not run"))
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dist").toString
    val q = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t") { r =>
      DeliverySink.seen.add(s"${r.stream}/${r.idString}")
    }
    mem.addData(rec("s:a", 2), rec("s:a", 1, 1), rec("s:a", 1), rec("other:x", 9), rec("s:b", 5))
    q.processAllAvailable()
    q.stop()
    val seen = DeliverySink.seen.asScala.toSeq
    // per-stream order holds; non-matching stream filtered on executors
    assert(seen.filter(_.startsWith("s:a")) == Seq("s:a/1-0", "s:a/1-1", "s:a/2-0"))
    assert(seen.filter(_.startsWith("s:b")) == Seq("s:b/5-0"))
    assert(!seen.exists(_.startsWith("other:")))
    // acks merged into the driver-side stats/checkpoints
    val st = e.list().head.streamTriggers.head
    assert(st.streams("s:a").lastReadId == "2-0")
    assert(st.streams("s:a").totalProcessed == 3)
    assert(st.streams("s:b").lastReadId == "5-0")
    e.close()
  }

  test("executor-side delivery dedupes replay below the acked id (E7)") {
    DeliverySink.reset()
    val e = new Engine(spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, _) => ())
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dist").toString
    val q = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t") { r =>
      DeliverySink.seen.add(r.idString)
    }
    mem.addData(rec("s:1", 1), rec("s:1", 2))
    q.processAllAvailable()
    // replayed + one new record in the next batch
    mem.addData(rec("s:1", 1), rec("s:1", 2), rec("s:1", 3))
    q.processAllAvailable()
    q.stop()
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0", "2-0", "3-0"))
    e.close()
  }

  test("executor-side failure halts the stream and fails the batch (Retry)") {
    DeliverySink.reset()
    DeliverySink.failOn = 2L
    val e = new Engine(spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, _) => ())
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dist").toString
    val q = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t") { r =>
      if (r.idMs == DeliverySink.failOn) throw new RuntimeException("boom")
      DeliverySink.seen.add(r.idString)
    }
    mem.addData(rec("s:1", 1), rec("s:1", 2), rec("s:1", 3))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0")) // halted before 3
    val st = e.list().head.streamTriggers.head.streams("s:1")
    assert(st.lastReadId == "1-0" && st.totalErrors == 1)

    // recovery: new query from the same checkpoint replays; only the
    // unacked tail is redelivered
    DeliverySink.failOn = -1L
    val q2 = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t") { r =>
      if (r.idMs == DeliverySink.failOn) throw new RuntimeException("boom")
      DeliverySink.seen.add(r.idString)
    }
    q2.processAllAvailable()
    q2.stop()
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0", "2-0", "3-0"))
    e.close()
  }

  test("window=3 on the distributed path: delivery continues past a poison record, replay redelivers only it (E3)") {
    DeliverySink.reset()
    DeliverySink.failOn = 2L
    val e = new Engine(spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, _) => (), window = 3)
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dist-w").toString
    def fn(r: StreamRecord): Unit = {
      if (r.idMs == DeliverySink.failOn) throw new RuntimeException("boom")
      DeliverySink.seen.add(r.idString)
    }
    val q = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t")(fn)
    mem.addData(rec("s:1", 1), rec("s:1", 2), rec("s:1", 3), rec("s:1", 4), rec("s:1", 5))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    // window>1: records ABOVE the nacked one were still delivered
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0", "3-0", "4-0", "5-0"))
    val st = e.list().head.streamTriggers.head.streams("s:1")
    assert(st.lastReadId == "1-0") // checkpoint = contiguous acked prefix
    assert(st.pendingIds == Seq("2-0"))

    // poison cleared: the replay delivers ONLY the failed record (the
    // delivered-ahead set rode back to the driver and ships with the
    // next batch), then the checkpoint jumps over everything delivered
    DeliverySink.failOn = -1L
    val q2 = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t")(fn)
    q2.processAllAvailable()
    q2.stop()
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0", "3-0", "4-0", "5-0", "2-0"))
    val st2 = e.list().head.streamTriggers.head.streams("s:1")
    assert(st2.lastReadId == "5-0" && st2.pendingIds.isEmpty)
    e.close()
  }

  test("distributed delivery checks the library user's ACL per stream (denied prefix nacks)") {
    DeliverySink.reset()
    val e = new Engine(spark)
    e.aclSetUser("bob", Seq(AclRule("s:ok")))
    e.load(LibraryDefinition("lib", user = "bob", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, _) => (), onError = ErrorPolicy.Ack)
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dist-acl").toString
    val q = e.streams.attachDistributed(mem.toDS(), ckpt, "lib", "t") { r =>
      DeliverySink.seen.add(s"${r.stream}/${r.idString}")
    }
    mem.addData(rec("s:ok:1", 1), rec("s:no:1", 2), rec("s:ok:1", 3))
    q.processAllAvailable()
    q.stop()
    val seen = DeliverySink.seen.asScala.toSeq
    assert(seen == Seq("s:ok:1/1-0", "s:ok:1/3-0"))
    val st = e.list().head.streamTriggers.head
    assert(st.streams("s:no:1").totalErrors == 1)
    assert(st.streams("s:no:1").lastError.exists(_.contains("bob")))
    e.close()
  }

  test("distributed path survives a full ENGINE restart: durable acks dedupe the replay (E5/E7)") {
    DeliverySink.reset()
    val engineCkpt = java.nio.file.Files.createTempDirectory("graft-dist-eckpt").toString
    val queryCkpt = java.nio.file.Files.createTempDirectory("graft-dist-qckpt").toString
    def mkEngine(): Engine = {
      val e = new Engine(spark, checkpointDir = Some(engineCkpt))
      e.load(LibraryDefinition("lib", code = { b =>
        b.registerStreamTrigger("t", "s:", (_, _) => ())
      }))
      e
    }
    val mem = MemoryStream[StreamRecord]
    val e1 = mkEngine()
    val q1 = e1.streams.attachDistributed(mem.toDS(), queryCkpt, "lib", "t") { r =>
      DeliverySink.seen.add(r.idString)
    }
    mem.addData(rec("s:1", 1), rec("s:1", 2))
    q1.processAllAvailable()
    q1.stop()
    e1.close()
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0", "2-0"))

    // new engine from the same durable ack store; a NEW streaming query
    // (fresh checkpoint) replays the memory stream from scratch — the
    // re-seeded acked ids must dedupe executor-side
    val e2 = mkEngine()
    val q2ckpt = java.nio.file.Files.createTempDirectory("graft-dist-qckpt2").toString
    val q2 = e2.streams.attachDistributed(mem.toDS(), q2ckpt, "lib", "t") { r =>
      DeliverySink.seen.add(r.idString)
    }
    mem.addData(rec("s:1", 3))
    q2.processAllAvailable()
    q2.stop()
    assert(DeliverySink.seen.asScala.toSeq == Seq("1-0", "2-0", "3-0"),
      "acked records redelivered after engine restart")
    val st = e2.list().head.streamTriggers.head.streams("s:1")
    assert(st.lastReadId == "3-0")
    e2.close()
  }

  test("driver path survives a batch larger than one chunk (bounded-memory contract)") {
    val e = new Engine(spark)
    var count = 0L
    var lastPerStream = Map.empty[String, Long]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, r) => {
        // order check: ids of one stream must arrive ascending
        assert(lastPerStream.getOrElse(r.stream, -1L) < r.idMs)
        lastPerStream += (r.stream -> r.idMs)
        count += 1
      })
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    val q = e.streams.attach(mem.toDS(), ckpt)
    // 25k records over 5 streams → multiple 10k chunks, shuffled input
    val rs = scala.util.Random.shuffle(
      (1 to 25000).map(i => rec(s"s:${i % 5}", i.toLong)))
    mem.addData(rs: _*)
    q.processAllAvailable()
    q.stop()
    assert(count == 25000)
    e.close()
  }
}
