package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** E11 memory accounting — the reference caps each library's V8 heap
  * (`v8_backend.rs:305-393`) and gates TFCALL under OOM by function
  * flags (`lib.rs:1293-1313`). The Spark-side analogue: exact
  * bytes-in-state counters (global + last-writer per-library),
  * `max-state-bytes` OOM call gating honoring allow-oom/no-writes,
  * and a hard `library-max-state-bytes` footprint cap that denies
  * GROWING writes while leaving deletions allowed (Redis exempts
  * memory-freeing commands from DENYOOM). */
class MemoryAccountingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sizeOfString(key: String, value: String): Long =
    key.length.toLong + StateTable.ValueField.length + value.length

  test("usedBytes tracks strings, hashes and lists exactly") {
    val st = new StateTable
    assert(st.usedBytes == 0L)
    st.set("k1", "hello")
    assert(st.usedBytes == sizeOfString("k1", "hello"))
    st.set("k1", "hi") // overwrite shrinks
    assert(st.usedBytes == sizeOfString("k1", "hi"))
    st.hset("h", "f1" -> "v1", "f2" -> "v22")
    val hBytes = 1L + (2 + 2) + (2 + 3) // key + f1/v1 + f2/v22
    assert(st.usedBytes == sizeOfString("k1", "hi") + hBytes)
    st.hdel("h", "f1")
    assert(st.usedBytes == sizeOfString("k1", "hi") + 1L + 2 + 3)
    st.rpush("l", "aa", "bbb")
    assert(st.usedBytes == sizeOfString("k1", "hi") + (1L + 2 + 3) + (1L + 2 + 3))
    st.lpop("l")
    assert(st.usedBytes == sizeOfString("k1", "hi") + (1L + 2 + 3) + (1L + 3))
    st.rpop("l") // list empties -> key gone
    st.del("k1")
    st.hdel("h", "f2")
    assert(st.usedBytes == 0L)
  }

  test("expiry and eviction release their bytes") {
    val st = new StateTable
    st.set("gone", "x")
    st.expire("gone", 1L)
    Thread.sleep(5)
    assert(st.get("gone").isEmpty) // lazy expiration fires here
    assert(st.usedBytes == 0L)
    st.setMaxKeys(1)
    st.set("a", "1"); st.set("b", "2") // a evicts
    assert(st.usedBytes == sizeOfString("b", "2"))
  }

  test("last-writer attribution moves between libraries") {
    val e = new Engine(spark)
    e.load(LibraryDefinition("liba", code =
      _.registerFunction("w", (ctx, _) => { ctx.set("shared", "0123456789"); RespNull })))
    e.load(LibraryDefinition("libb", code =
      _.registerFunction("w", (ctx, _) => { ctx.set("shared", "xy"); RespNull })))
    e.call("liba", "w")
    val full = sizeOfString("shared", "0123456789")
    assert(e.libraryStateBytes("liba") == full)
    assert(e.libraryStateBytes("libb") == 0L)
    assert(e.stateBytes == full)
    e.call("libb", "w") // overwrite re-attributes the WHOLE key
    assert(e.libraryStateBytes("liba") == 0L)
    assert(e.libraryStateBytes("libb") == sizeOfString("shared", "xy"))
    // host-side writes are unattributed but counted globally
    e.state.set("hostkey", "zz")
    assert(e.stateBytes ==
      sizeOfString("shared", "xy") + sizeOfString("hostkey", "zz"))
    assert(e.libraryStateBytes("libb") == sizeOfString("shared", "xy"))
    e.close()
  }

  test("library-max-state-bytes denies growth, allows shrink, recovers") {
    val e = new Engine(spark)
    e.load(LibraryDefinition("hog", code = { b =>
      b.registerFunction("put", (ctx, args) => {
        val Seq(RespString(k), RespString(v)) = args.take(2)
        ctx.set(k, v); RespNull
      })
      b.registerFunction("drop", (ctx, args) => {
        val Seq(RespString(k)) = args.take(1)
        ctx.del(k); RespNull
      })
    }))
    e.configSet("library-max-state-bytes", "40")
    e.call("hog", "put", Seq(RespString("k1"), RespString("0123456789012345678901234567890123456789")))
    assert(e.libraryStateBytes("hog") > 40)
    // over cap: further growth denied...
    intercept[OomException] {
      e.call("hog", "put", Seq(RespString("k2"), RespString("x")))
    }
    // ...but deletion is allowed (the library can shrink itself back)
    e.call("hog", "drop", Seq(RespString("k1")))
    assert(e.libraryStateBytes("hog") == 0L)
    e.call("hog", "put", Seq(RespString("k2"), RespString("x"))) // recovered
    e.close()
  }

  test("max-state-bytes OOM gating honors allow-oom and no-writes") {
    val e = new Engine(spark)
    e.load(LibraryDefinition("mix", code = { b =>
      b.registerFunction("w", (ctx, _) => { ctx.set("k", "v"); RespNull })
      b.registerFunction("r", (ctx, _) =>
        ctx.get("big").map(RespString).getOrElse(RespNull),
        flags = Set(FunctionFlags.NoWrites))
      b.registerFunction("wOom", (ctx, _) => { ctx.set("k2", "v"); RespNull },
        flags = Set(FunctionFlags.AllowOom))
    }))
    e.state.set("big", "x" * 100) // host fills the table past the cap
    e.configSet("max-state-bytes", "50")
    intercept[OomException](e.call("mix", "w")) // plain function: denied upfront
    assert(e.call("mix", "r") == RespString("x" * 100)) // no-writes: allowed
    e.call("mix", "wOom") // allow-oom: allowed
    e.configSet("max-state-bytes", "0")
    e.call("mix", "w") // unbounded again
    e.close()
  }

  test("save/load round-trip preserves usedBytes AND per-library attribution") {
    val e1 = new Engine(spark)
    e1.load(LibraryDefinition("lib", code =
      _.registerFunction("w", (ctx, _) => { ctx.set("k", "value"); RespNull })))
    e1.call("lib", "w")
    e1.state.set("hostkey", "zz") // host write: counted, unattributed
    val dir = java.nio.file.Files.createTempDirectory("graft-mem").toString
    e1.saveState(dir)
    val total = e1.stateBytes
    val libBytes = e1.libraryStateBytes("lib")
    assert(libBytes > 0L)
    e1.close()
    val e2 = new Engine(spark)
    e2.loadState(dir)
    // the counter cannot silently drift from the persisted state: both
    // the global count and the per-library attribution read identically
    assert(e2.stateBytes == total)
    assert(e2.libraryStateBytes("lib") == libBytes)
    // and a second round-trip is a fixed point
    val dir2 = java.nio.file.Files.createTempDirectory("graft-mem2").toString
    e2.saveState(dir2)
    val e3 = new Engine(spark)
    e3.loadState(dir2)
    assert(e3.stateBytes == total && e3.libraryStateBytes("lib") == libBytes)
    e3.close(); e2.close()
  }

  test("pre-round-12 snapshots (no __owner__ rows) restore unattributed") {
    val e1 = new Engine(spark)
    e1.load(LibraryDefinition("lib", code =
      _.registerFunction("w", (ctx, _) => { ctx.set("k", "value"); RespNull })))
    e1.call("lib", "w")
    val dir = java.nio.file.Files.createTempDirectory("graft-mem-old").toString
    val total = e1.stateBytes
    // simulate an old snapshot: strip the owner pseudo-rows
    e1.state.snapshot(spark)
      .filter(org.apache.spark.sql.functions.col("field") =!= StateTable.OwnerField)
      .write.mode("overwrite").parquet(dir)
    e1.close()
    val e2 = new Engine(spark)
    e2.loadState(dir)
    assert(e2.stateBytes == total)
    assert(e2.libraryStateBytes("lib") == 0L)
    e2.close()
  }

  test("over-cap atomic txn: growth denied at the growing op, shrink-only allowed") {
    val e = new Engine(spark)
    e.load(LibraryDefinition("hog", code = { b =>
      b.registerAsyncFunction("fill", (ctx, _) => {
        ctx.atomic { txn => txn.set("k1", "0123456789012345678901234567890123456789") }
        RespNull
      })
      b.registerAsyncFunction("growTxn", (ctx, _) => {
        ctx.atomic { txn => txn.set("k2", "x") }
        RespNull
      })
      b.registerAsyncFunction("shrinkTxn", (ctx, _) => {
        ctx.atomic { txn => txn.del("k1") } // memory-freeing: must run over cap
        RespNull
      })
      b.registerAsyncFunction("mixedTxn", (ctx, _) => {
        ctx.atomic { txn => txn.del("nothing"); txn.set("k3", "y") }
        RespNull
      })
    }))
    import scala.concurrent.Await
    import scala.concurrent.duration._
    def run(fn: String) = Await.result(e.callAsync("hog", fn), 30.seconds)
    run("fill")
    e.configSet("library-max-state-bytes", "40")
    assert(e.libraryStateBytes("hog") > 40)
    // a growing transaction dies at its first growing op...
    intercept[OomException](run("growTxn"))
    // ...a mixed txn dies at the grow even after an allowed del...
    intercept[OomException](run("mixedTxn"))
    // ...but a shrink-only transaction runs (DENYOOM exemption), and
    // the library recovers
    run("shrinkTxn")
    assert(e.libraryStateBytes("hog") == 0L)
    run("growTxn")
    e.close()
  }
}
