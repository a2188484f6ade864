package graft.core

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** The TFUNCTION DEBUG analogue ([[DebugSession]]): pause at entry,
  * inspect args and live state mid-pause, resume or abort, detach
  * releases everything (reference: `function_debug` command,
  * pytests/test_debugging.py). */
class DebugSessionSpec extends AnyFunSuite {

  private def newEngine() = {
    val e = new Engine(TestSpark.spark)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerFunction("double", (ctx, args) => {
        val k = args.head.asInstanceOf[RespString].v
        val v = ctx.get(k).map(_.toLong).getOrElse(0L)
        ctx.set(k, (v * 2).toString)
        RespLong(v * 2)
      })
      b.registerAsyncFunction("adouble", (ctx, args) => {
        val k = args.head.asInstanceOf[RespString].v
        RespLong(ctx.get(k).map(_.toLong).getOrElse(0L) * 2)
      })
    }))
    e
  }

  test("breakpoint pauses at entry; state is inspectable and WRITABLE mid-pause; resume completes") {
    val e = newEngine()
    e.state.set("k", "10")
    val dbg = e.attachDebugSession("lib")
    dbg.breakOn("double")
    val call = Future(e.call("lib", "double", Seq(RespString("k"))))
    val p = dbg.awaitPause().getOrElse(fail("invocation never paused"))
    assert(p.function == "double")
    assert(p.args == Seq(RespString("k")))
    // paused BEFORE the state lock: the debugger can read AND write
    // live state while the invocation waits (nothing is wedged)
    assert(e.state.get("k").contains("10"))
    e.state.set("k", "21")
    p.resume()
    // the resumed invocation sees the debugger's write
    assert(Await.result(call, 10.seconds) == RespLong(42))
    assert(e.state.get("k").contains("42"))
    dbg.close()
    e.close()
  }

  test("abort fails the paused invocation and records the error in stats") {
    val e = newEngine()
    val dbg = e.attachDebugSession("lib")
    dbg.breakOn("double")
    val call = Future(e.call("lib", "double", Seq(RespString("k"))))
    val p = dbg.awaitPause().getOrElse(fail("never paused"))
    p.abort("killed from inspector")
    val ex = intercept[FunctionAbortedException] { Await.result(call, 10.seconds) }
    assert(ex.getMessage.contains("killed from inspector"))
    val info = e.debug("lib").functions.find(_.name == "double").get
    assert(info.errors == 1)
    dbg.close()
    e.close()
  }

  test("close releases paused invocations, clears breakpoints, frees the library") {
    val e = newEngine()
    e.state.set("k", "3")
    val dbg = e.attachDebugSession("lib")
    dbg.breakOn("double")
    // a second session on the same library is refused while attached
    intercept[IllegalStateException] { e.attachDebugSession("lib") }
    val call = Future(e.call("lib", "double", Seq(RespString("k"))))
    assert(dbg.awaitPause().isDefined)
    dbg.close() // releases the paused invocation to run
    assert(Await.result(call, 10.seconds) == RespLong(6))
    // breakpoints are gone and the library accepts a fresh session
    assert(e.call("lib", "double", Seq(RespString("k"))) == RespLong(12))
    val dbg2 = e.attachDebugSession("lib")
    assert(dbg2.breakpointList.isEmpty)
    dbg2.close()
    e.close()
  }

  test("functions without breakpoints run untouched; unknown library refused") {
    val e = newEngine()
    val dbg = e.attachDebugSession("lib")
    dbg.breakOn("double")
    // the async sibling has no breakpoint: runs straight through
    e.state.set("k", "5")
    val out = Await.result(e.callAsync("lib", "adouble", Seq(RespString("k"))), 10.seconds)
    assert(out == RespLong(10))
    intercept[NoSuchElementException] { e.attachDebugSession("nope") }
    dbg.close()
    e.close()
  }

  test("async invocations pause on their pool thread") {
    val e = newEngine()
    e.state.set("k", "7")
    val dbg = e.attachDebugSession("lib")
    dbg.breakOn("adouble")
    val call = e.callAsync("lib", "adouble", Seq(RespString("k")))
    val p = dbg.awaitPause().getOrElse(fail("async invocation never paused"))
    assert(p.function == "adouble")
    // the caller thread is NOT blocked — the pool thread is paused
    assert(!call.isCompleted)
    p.resume()
    assert(Await.result(call, 10.seconds) == RespLong(14))
    dbg.close()
    e.close()
  }
}
