package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** E10: the sync-invocation lock watchdog — a function holding the
  * state lock past `lock-timeout` is aborted at its next state access
  * (or blocking call), the lock is released, and later invocations
  * succeed (reference: `lock-redis-timeout`, enforcement
  * `v8_backend.rs:581-604`, Abort policy `v8_script_ctx.rs:92-135`). */
class WatchdogSpec extends AnyFunSuite {

  private def newEngine() = new Engine(TestSpark.spark)

  private def hungLib = LibraryDefinition("hung", code = { lib =>
    // spins on state reads forever — dies only via the abort checkpoint
    lib.registerFunction("spin_reads", (ctx, _) => {
      while (true) { ctx.get("k") }
      RespNull
    })
    // sleeps forever — dies only via the watchdog's thread interrupt
    lib.registerFunction("sleep", (_, _) => {
      Thread.sleep(3600000L)
      RespNull
    })
    // writes one key, then hangs: proves partial writes persist
    // (reference semantics — completed commands have no rollback)
    lib.registerFunction("write_then_spin", (ctx, _) => {
      ctx.set("written", "yes")
      while (true) { ctx.get("k") }
      RespNull
    })
    lib.registerFunction("ok", (_, _) => RespString("ok"),
      flags = Set(FunctionFlags.NoWrites))
    lib.registerFunction("touch", (ctx, args) => {
      ctx.set(args.head.asInstanceOf[RespString].v, "t")
      RespString("touched")
    })
    // holds the lock ~600 ms with NO state access and NO blocking call:
    // the watchdog flags+interrupts it at the deadline but pure
    // computation has no checkpoint (the documented JVM limit — V8 can
    // preempt, the JVM cannot), so it runs to completion
    lib.registerFunction("busy600", (_, _) => {
      val until = System.currentTimeMillis() + 600
      while (System.currentTimeMillis() < until) {}
      RespString("busy-done")
    })
  })

  test("a read-spinning function is aborted at the deadline; the lock is released") {
    val e = newEngine()
    e.configSet("lock-timeout", "200")
    e.load(hungLib)
    val t0 = System.nanoTime()
    val ex = intercept[FunctionAbortedException] { e.call("hung", "spin_reads") }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(ex.getMessage.contains("lock-timeout"))
    assert(elapsedMs >= 200, f"aborted before the deadline ($elapsedMs%.0f ms)")
    assert(elapsedMs < 5000, f"abort took $elapsedMs%.0f ms — watchdog not firing")
    // the state lock is free: later calls (including writes) succeed
    assert(e.call("hung", "ok") == RespString("ok"))
    e.close()
  }

  test("a sleeping function is interrupted at the deadline") {
    val e = newEngine()
    e.configSet("lock-timeout", "200")
    e.load(hungLib)
    val t0 = System.nanoTime()
    intercept[InterruptedException] { e.call("hung", "sleep") }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, f"interrupt took $elapsedMs%.0f ms")
    assert(e.call("hung", "ok") == RespString("ok"))
    e.close()
  }

  test("writes executed before the abort persist (no rollback, like the reference)") {
    val e = newEngine()
    e.configSet("lock-timeout", "200")
    e.load(hungLib)
    intercept[FunctionAbortedException] { e.call("hung", "write_then_spin") }
    assert(e.state.get("written").contains("yes"))
    e.close()
  }

  test("lock-timeout 0 disables the watchdog; the stats record the abort as an error") {
    val e = newEngine()
    e.configSet("lock-timeout", "0")
    // with the watchdog off, a bounded loop completes untouched even
    // when it runs far past the (disabled) default deadline
    val lib = LibraryDefinition("slowok", code = { l =>
      l.registerFunction("slow", (ctx, _) => {
        val until = System.currentTimeMillis() + 800
        while (System.currentTimeMillis() < until) { ctx.get("k") }
        RespString("done")
      }, flags = Set(FunctionFlags.NoWrites))
    })
    e.load(lib)
    assert(e.call("slowok", "slow") == RespString("done"))
    // re-arm and check error accounting on an aborted call
    e.configSet("lock-timeout", "150")
    e.load(hungLib)
    intercept[FunctionAbortedException] { e.call("hung", "spin_reads") }
    val info = e.debug("hung").functions.find(_.name == "spin_reads").get
    assert(info.errors == 1)
    assert(info.lastError.exists(_.contains("lock-timeout")))
    e.close()
  }

  test("slow work escapes via executeAsync: the promise body outlives the deadline") {
    // the reference's contract exactly: the GIL timeout exists to push
    // heavy work OFF the lock — a sync function that escapes through
    // executeAsync commits instantly (watchdog disarms) and its
    // background body may run arbitrarily long
    val e = newEngine()
    e.configSet("lock-timeout", "150")
    e.load(LibraryDefinition("slowbg", code = { l =>
      l.registerFunction("bg", (ctx, _) => ctx.executeAsync { bgCtx =>
        Thread.sleep(600) // 4x the deadline, off the lock
        bgCtx.atomic(_.set("bg-done", "yes"))
        RespValue.RespString("done")
      })
    }))
    assert(e.call("slowbg", "bg") == RespValue.RespString("done"))
    assert(e.state.get("bg-done").contains("yes"))
    e.close()
  }

  test("concurrency: only the hung invocation is aborted; waiters proceed after release") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val e = newEngine()
    e.configSet("lock-timeout", "200")
    e.load(hungLib)
    // the busy holder wedges the lock for 600 ms — 3x the 200 ms
    // deadline — while three healthy WRITERS queue behind it. Queue
    // time must not count against their deadlines (the watchdog arms
    // once the lock is HELD, the reference's GIL-hold semantics), so
    // every writer completes and lands its write even though each
    // waited far past 200 ms
    val holder = Future(e.call("hung", "busy600"))
    Thread.sleep(50) // let the holder take the lock first
    val healthy = (1 to 3).map(i =>
      Future(e.call("hung", "touch", Seq(RespString(s"w$i")))))
    assert(Await.result(holder, 10.seconds) == RespString("busy-done"))
    healthy.foreach(f => assert(Await.result(f, 10.seconds) == RespString("touched")))
    (1 to 3).foreach(i => assert(e.state.get(s"w$i").contains("t")))
    e.close()
  }

  test("nested engine.call restores the outer invocation's watchdog") {
    // user code can hold an Engine reference and call another function
    // from inside a sync function; the inner call borrows the thread's
    // watch slot and MUST hand the outer deadline back — otherwise the
    // outer function runs unwatched after any nested call
    val e = newEngine()
    e.configSet("lock-timeout", "250")
    e.load(LibraryDefinition("inner", code = { l =>
      l.registerFunction("fast", (_, _) => RespString("ok"),
        flags = Set(FunctionFlags.NoWrites))
    }))
    e.load(LibraryDefinition("outer", code = { l =>
      l.registerFunction("nest_then_spin", (ctx, _) => {
        e.call("inner", "fast") // borrows + must restore the slot
        while (true) { ctx.get("k") }
        RespNull
      })
    }))
    val t0 = System.nanoTime()
    intercept[FunctionAbortedException] { e.call("outer", "nest_then_spin") }
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, f"outer ran unwatched for $elapsedMs%.0f ms after a nested call")
    assert(e.call("inner", "fast") == RespString("ok"))
    e.close()
  }

  test("a runaway keyspace-trigger callback is aborted; the writer completes (E10 over R4)") {
    // trigger callbacks run during commit notification dispatch — user
    // code under the state lock, exactly the wedge E10 exists to
    // prevent. The watchdog arms around subscriber dispatch: the
    // callback is aborted at its next state access, the abort is
    // recorded as a consumer error (never thrown at the writer), and
    // the write that fired the trigger lands.
    val e = newEngine()
    e.configSet("lock-timeout", "200")
    e.load(LibraryDefinition("trig", code = { l =>
      l.registerKeySpaceTrigger("hang", "k:", (ctx, _) => {
        while (true) { ctx.get("other") } // spins under the state lock
      })
    }))
    val t0 = System.nanoTime()
    e.state.set("k:1", "v") // must return, not wedge
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs < 5000, f"trigger callback ran unwatched for $elapsedMs%.0f ms")
    assert(e.state.get("k:1").contains("v"))
    val st = e.list().head.keySpaceTriggers.head
    assert(st.totalErrors == 1 && st.lastError.exists(_.contains("lock-timeout")))
    // the dispatch thread's interrupt was cleared on abort: later calls
    // on this same (writer) thread block and complete normally
    assert(e.state.get("k:1").contains("v"))
    e.close()
  }

  test("config validation: negative lock-timeout rejected, 0 accepted") {
    val e = newEngine()
    intercept[IllegalArgumentException] { e.configSet("lock-timeout", "-1") }
    e.configSet("lock-timeout", "0")
    assert(e.configGet("lock-timeout") == "0")
    e.close()
  }
}
