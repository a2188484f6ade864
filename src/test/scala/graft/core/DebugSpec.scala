package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** Error-introspection depth (the TFUNCTION DEBUG / verbose-error
  * surface): per-function call and error counters, last-error capture,
  * verbosity-controlled stack traces, and pending (nacked) ids in the
  * stream-trigger debug view. Reference shapes:
  * `pytests/test_debugging.py`, `test_verbose_error_reporting.py`. */
class DebugSpec extends AnyFunSuite {

  private def failingLib = LibraryDefinition("lib", code = { b =>
    b.registerFunction("boom", (_, _) => throw new RuntimeException("kapow"))
    b.registerFunction("ok", (_, _) => RespLong(1), flags = Set(FunctionFlags.NoWrites))
    b.registerStreamTrigger("t", "s:", (_, r) =>
      if (r.idMs == 2) throw new RuntimeException("stream kapow"))
  })

  test("per-function stats: calls, errors, lastError (E16 depth)") {
    val e = new Engine(TestSpark.spark)
    e.load(failingLib)
    e.call("lib", "ok")
    e.call("lib", "ok")
    intercept[RuntimeException](e.call("lib", "boom"))
    val fns = e.debug("lib").functions.map(f => f.name -> f).toMap
    assert(fns("ok").calls == 2 && fns("ok").errors == 0 && fns("ok").lastError.isEmpty)
    assert(fns("boom").calls == 1 && fns("boom").errors == 1)
    assert(fns("boom").lastError.exists(_.contains("kapow")))
    e.close()
  }

  test("error-verbosity config: terse has no frames, verbose carries the stack") {
    val e = new Engine(TestSpark.spark)
    e.load(failingLib)
    assert(e.configGet("error-verbosity") == "terse")
    intercept[RuntimeException](e.call("lib", "boom"))
    val terse = e.debug("lib").functions.find(_.name == "boom").get.lastError.get
    assert(!terse.contains("\tat "))

    e.configSet("error-verbosity", "verbose")
    intercept[RuntimeException](e.call("lib", "boom"))
    val verbose = e.debug("lib").functions.find(_.name == "boom").get.lastError.get
    assert(verbose.contains("kapow") && verbose.contains("\tat "))

    intercept[IllegalArgumentException](e.configSet("error-verbosity", "nope"))
    intercept[NoSuchElementException](e.configSet("not-a-key", "x"))
    e.close()
  }

  test("stream trigger debug view exposes pending (nacked) ids") {
    val e = new Engine(TestSpark.spark)
    e.load(failingLib)
    intercept[StreamDeliveryException] {
      e.streams.processBatch(Seq(
        StreamRecord("s:1", 1, 0, Map.empty), StreamRecord("s:1", 2, 0, Map.empty)))
    }
    val st = e.debug("lib").streamTriggers.head.streams("s:1")
    assert(st.pendingIds == Seq("2-0"))
    assert(st.lastError.exists(_.contains("stream kapow")))
    e.close()
  }

  test("debug of an unknown library is an error") {
    val e = new Engine(TestSpark.spark)
    intercept[NoSuchElementException](e.debug("ghost"))
    e.close()
  }

  test("invocation trace: off by default, bounded ring when enabled, newest first") {
    val e = new Engine(TestSpark.spark)
    e.load(failingLib)
    e.call("lib", "ok")
    assert(e.trace("lib").isEmpty) // tracing off by default
    e.configSet("trace-buffer-size", "3")
    e.call("lib", "ok")
    intercept[RuntimeException](e.call("lib", "boom"))
    val t = e.trace("lib")
    assert(t.size == 2)
    assert(t.head.function == "boom" && !t.head.ok &&
      t.head.error.exists(_.contains("kapow"))) // newest first
    assert(t(1).function == "ok" && t(1).ok && t(1).error.isEmpty)
    assert(t.forall(x => x.durationMs >= 0 && !x.isAsync))
    // ring bound: the buffer keeps only the last 3
    (1 to 5).foreach(_ => e.call("lib", "ok"))
    assert(e.trace("lib").size == 3 && e.trace("lib").forall(_.function == "ok"))
    intercept[IllegalArgumentException](e.configSet("trace-buffer-size", "-1"))
    e.close()
  }

  test("invocation trace covers the async path") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val e = new Engine(TestSpark.spark)
    e.configSet("trace-buffer-size", "8")
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerAsyncFunction("aok", (_, _) => RespLong(7))
    }))
    assert(Await.result(e.callAsync("lib", "aok"), 10.seconds) == RespLong(7))
    // the async trace lands on a pool-thread callback; poll briefly
    val deadline = System.currentTimeMillis() + 5000
    while (e.trace("lib").isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    val t = e.trace("lib")
    assert(t.nonEmpty && t.head.function == "aok" && t.head.isAsync && t.head.ok)
    e.close()
  }
}
