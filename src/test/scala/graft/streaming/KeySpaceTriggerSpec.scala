package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core._
import graft.core.RespValue._

class KeySpaceTriggerSpec extends AnyFunSuite {

  test("write events fire prefix-matched consumers (R4)") {
    val e = new Engine(TestSpark.spark)
    val seen = ArrayBuffer.empty[(String, String)]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("t", "user:", (_, ev) => seen += ((ev.event, ev.key)))
    }))
    e.state.set("user:1", "alice")
    e.state.hset("user:2", "name" -> "bob")
    e.state.set("order:1", "ignored")
    e.state.del("user:1")
    assert(seen.toSeq == Seq(("set", "user:1"), ("hset", "user:2"), ("del", "user:1")))
    e.close()
  }

  test("onTriggerFired snapshots at notification time") {
    val e = new Engine(TestSpark.spark)
    val snaps = ArrayBuffer.empty[Map[String, String]]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("t", "h:",
        (_, ev) => snaps += ev.snapshot.getOrElse(Map.empty),
        onTriggerFired = Some((ctx, ev) => ctx.hgetall(ev.key)))
    }))
    e.state.hset("h:1", "a" -> "1")
    e.state.hset("h:1", "b" -> "2")
    assert(snaps.toSeq == Seq(Map("a" -> "1"), Map("a" -> "1", "b" -> "2")))
    e.close()
  }

  test("recursion guard: writes from a callback do not re-fire (lib.rs:629-645)") {
    val e = new Engine(TestSpark.spark)
    var fired = 0
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("t", "k:", (ctx, ev) => {
        fired += 1
        ctx.set("k:derived", "x") // would recurse without the guard
      })
    }))
    e.state.set("k:1", "v")
    assert(fired == 1)
    assert(e.state.get("k:derived").contains("x"))
    e.close()
  }

  test("callback errors recorded, never propagate to the writer (E16)") {
    val e = new Engine(TestSpark.spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("t", "k:", (_, _) => throw new RuntimeException("cb boom"))
    }))
    e.state.set("k:1", "v") // must not throw
    val st = e.list().head.keySpaceTriggers.head
    assert(st.totalErrors == 1 && st.lastError.exists(_.contains("cb boom")))
    assert(e.state.get("k:1").contains("v"))
    e.close()
  }

  test("transaction batches deliver all events after commit (E12)") {
    val e = new Engine(TestSpark.spark)
    val seen = ArrayBuffer.empty[String]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("t", "", (ctx, ev) =>
        seen += s"${ev.key}=${ctx.get("a").getOrElse("?")}")
    }))
    e.state.commit { txn => txn.set("a", "1"); txn.set("b", "2") }
    // both events fire only after both writes are visible
    assert(seen.toSeq == Seq("a=1", "b=1"))
    e.close()
  }

  test("external CDC stream drives the keyspace triggers (Delta-CDF-style path)") {
    // the same register surface can be fed from any changelog stream:
    // a streaming Dataset of change rows routed through fire() in
    // foreachBatch — the SURVEY §7.2.5 mapping for R4 beyond the
    // engine's own state table
    val spark = TestSpark.spark
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = new Engine(spark)
    val seen = ArrayBuffer.empty[String]
    e.load(LibraryDefinition("cdc", code = { b =>
      b.registerKeySpaceTrigger("t", "user:", (_, ev) =>
        seen += s"${ev.event}:${ev.key}")
    }))
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = mem.toDS().writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cdc-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, String)], _: Long) =>
        batch.collect().foreach { case (event, key) =>
          e.keyspace.fire(KeyEvent(event, key, System.currentTimeMillis(), None))
        }
      }
      .start()
    mem.addData(("set", "user:1"), ("del", "user:2"), ("set", "order:9"))
    q.processAllAvailable()
    q.stop()
    assert(seen.toSeq == Seq("set:user:1", "del:user:2")) // order:9 prefix-filtered
    e.close()
  }

  test("engine function + keyspace trigger integration (counting writes)") {
    val e = new Engine(TestSpark.spark)
    e.load(LibraryDefinition("audit", code = { b =>
      b.registerKeySpaceTrigger("t", "doc:", (ctx, _) => { ctx.incrBy("n_writes", 1); () })
      b.registerFunction("n_writes", (ctx, _) =>
        RespLong(ctx.get("n_writes").map(_.toLong).getOrElse(0L)),
        flags = Set(FunctionFlags.NoWrites))
    }))
    (1 to 5).foreach(i => e.state.set(s"doc:$i", s"v$i"))
    assert(e.call("audit", "n_writes") == RespLong(5))
    e.close()
  }
}
