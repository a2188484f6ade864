package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._
import graft.core.RespValue._

class StreamTriggerSpec extends AnyFunSuite {

  private def rec(stream: String, ms: Long, seq: Long = 0,
      kv: Map[String, String] = Map("k" -> "v")) =
    StreamRecord(stream, ms, seq, kv)

  test("prefix subscription and per-stream (ms,seq) ordering (R3/E1/E2)") {
    val e = new Engine(TestSpark.spark)
    val seen = ArrayBuffer.empty[String]
    e.load(LibraryDefinition("lib", code = { lib =>
      lib.registerStreamTrigger("t", "stream:", (_, r) => {
        seen += s"${r.stream}/${r.idString}"
      })
    }))
    // out-of-order input within the batch; one non-matching stream
    e.streams.processBatch(Seq(
      rec("stream:a", 2, 0), rec("stream:a", 1, 1), rec("stream:a", 1, 0),
      rec("other:x", 1, 0), rec("stream:b", 5, 0)))
    assert(seen.toSeq == Seq("stream:a/1-0", "stream:a/1-1", "stream:a/2-0", "stream:b/5-0"))
    e.close()
  }

  test("checkpoint dedup: replayed records are not redelivered (E4/E7)") {
    val e = new Engine(TestSpark.spark)
    var count = 0
    e.load(LibraryDefinition("lib", code = { lib =>
      lib.registerStreamTrigger("t", "s:", (_, _) => count += 1)
    }))
    e.streams.processBatch(Seq(rec("s:1", 1), rec("s:1", 2)))
    // at-least-once replay: same records again plus one new
    e.streams.processBatch(Seq(rec("s:1", 1), rec("s:1", 2), rec("s:1", 3)))
    assert(count == 3)
    val stats = e.list().head.streamTriggers.head
    assert(stats.streams("s:1").lastReadId == "3-0")
    assert(stats.streams("s:1").totalProcessed == 3)
    e.close()
  }

  test("failing callback nacks: checkpoint does not advance (E4)") {
    val e = new Engine(TestSpark.spark)
    var fail = true
    var processed = ArrayBuffer.empty[Long]
    e.load(LibraryDefinition("lib", code = { lib =>
      lib.registerStreamTrigger("t", "s:", (_, r) => {
        if (fail && r.idMs == 2) throw new RuntimeException("transient")
        processed += r.idMs
      })
    }))
    e.streams.processBatch(Seq(rec("s:1", 1), rec("s:1", 2)))
    var st = e.list().head.streamTriggers.head.streams("s:1")
    assert(st.lastReadId == "1-0" && st.totalErrors == 1 && st.lastError.isDefined)
    // retry delivery (source replays unacked tail)
    fail = false
    e.streams.processBatch(Seq(rec("s:1", 2)))
    st = e.list().head.streamTriggers.head.streams("s:1")
    assert(st.lastReadId == "2-0")
    assert(processed.toSeq == Seq(1, 2))
    e.close()
  }

  test("trim watermark = slowest trimming consumer (E6)") {
    val e = new Engine(TestSpark.spark)
    e.load(LibraryDefinition("fast", code = { lib =>
      lib.registerStreamTrigger("t", "s:", (_, _) => (), isStreamTrimmed = true)
    }))
    var failAfter = 1L
    e.load(LibraryDefinition("slow", code = { lib =>
      lib.registerStreamTrigger("t", "s:", (_, r) => {
        if (r.idMs > failAfter) throw new RuntimeException("slow consumer down")
      }, isStreamTrimmed = true)
    }))
    e.streams.processBatch(Seq(rec("s:1", 1), rec("s:1", 2), rec("s:1", 3)))
    // fast acked 3, slow acked only 1 → watermark 1
    assert(e.streams.trimWatermark("s:1").contains((1L, 0L)))
    assert(e.streams.trimWatermark("unknown").isEmpty)
    e.close()
  }

  test("upgrade preserves consumer checkpoints (E14)") {
    val e = new Engine(TestSpark.spark)
    var v2count = 0
    def lib(v: Int) = LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, _) => if (v == 2) v2count += 1)
    })
    e.load(lib(1))
    e.streams.processBatch(Seq(rec("s:1", 1), rec("s:1", 2)))
    e.load(lib(2), replace = true)
    // replay from source start: only id 3 is new for the upgraded consumer
    e.streams.processBatch(Seq(rec("s:1", 1), rec("s:1", 2), rec("s:1", 3)))
    assert(v2count == 1)
    e.close()
  }

  test("structured streaming attach: MemoryStream end-to-end (E5)") {
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val e = new Engine(spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerStreamTrigger("t", "s:", (ctx, r) => {
        ctx.incrBy(s"count:${r.stream}", 1)
        ()
      })
    }))
    val mem = MemoryStream[StreamRecord]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = e.streams.attach(mem.toDS(), ckpt)
    mem.addData(rec("s:1", 1), rec("s:1", 2), rec("s:2", 1))
    q.processAllAvailable()
    mem.addData(rec("s:1", 3))
    q.processAllAvailable()
    q.stop()
    assert(e.state.get("count:s:1").contains("3"))
    assert(e.state.get("count:s:2").contains("1"))
    e.close()
  }

  test("xadd synchronous ingest + engine function over trigger state") {
    val e = new Engine(TestSpark.spark)
    e.load(LibraryDefinition("counter", code = { b =>
      b.registerStreamTrigger("t", "ev:", (ctx, r) => {
        ctx.incrBy("num_events", 1)
        ()
      })
      b.registerFunction("num_events", (ctx, _) =>
        RespLong(ctx.get("num_events").map(_.toLong).getOrElse(0L)),
        flags = Set(FunctionFlags.NoWrites))
    }))
    e.streams.xadd("ev:1", 1, 0, Map("k" -> "v"))
    e.streams.xadd("ev:1", 2, 0, Map("k" -> "v"))
    e.streams.xadd("ev:2", 1, 0, Map("k" -> "v"))
    assert(e.call("counter", "num_events") == RespLong(3))
    e.close()
  }
}
