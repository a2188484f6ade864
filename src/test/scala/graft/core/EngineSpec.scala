package graft.core

import scala.concurrent.Await
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

class EngineSpec extends AnyFunSuite {

  private def newEngine() = new Engine(TestSpark.spark)

  private def counterLib(name: String = "mylib") = LibraryDefinition(name, code = { lib =>
    lib.registerFunction("ping", (_, _) => RespString("pong"),
      flags = Set(FunctionFlags.NoWrites))
    lib.registerFunction("incr", (ctx, args) => {
      val key = args.head.asInstanceOf[RespString].v
      RespLong(ctx.incrBy(key, 1))
    })
    lib.registerAsyncFunction("aping", (_, _) => RespString("pong-async"))
    lib.registerClusterFunction("remote_get", (ctx, args) => {
      val key = args.head.asInstanceOf[RespString].v
      ctx.get(key).map(RespString).getOrElse(RespNull)
    })
  })

  test("load + sync call") {
    val e = newEngine()
    e.load(counterLib())
    assert(e.call("mylib", "ping") == RespString("pong"))
    assert(e.call("mylib", "incr", Seq(RespString("c"))) == RespLong(1))
    assert(e.call("mylib", "incr", Seq(RespString("c"))) == RespLong(2))
    e.close()
  }

  test("async call runs on background pool") {
    val e = newEngine()
    e.load(counterLib())
    val out = Await.result(e.callAsync("mylib", "aping"), 10.seconds)
    assert(out == RespString("pong-async"))
    // calling an async fn synchronously is an error (TFCALL on async)
    intercept[IllegalStateException](e.call("mylib", "aping"))
    e.close()
  }

  test("no-writes flag blocks writes (E13)") {
    val e = newEngine()
    e.load(LibraryDefinition("rolib", code = { lib =>
      lib.registerFunction("sneaky", (ctx, _) => { ctx.set("k", "v"); RespNull },
        flags = Set(FunctionFlags.NoWrites))
    }))
    intercept[IllegalStateException](e.call("rolib", "sneaky"))
    assert(e.state.get("k").isEmpty)
    e.close()
  }

  test("empty library rejected") {
    val e = newEngine()
    intercept[IllegalArgumentException](e.load(LibraryDefinition("empty", code = _ => ())))
    e.close()
  }

  test("invalid names rejected") {
    val e = newEngine()
    intercept[IllegalArgumentException](e.load(LibraryDefinition("bad name", code = _ => ())))
    intercept[IllegalArgumentException](e.load(LibraryDefinition("lib", code = { b =>
      b.registerFunction("bad.fn", (_, _) => RespNull)
    })))
    intercept[IllegalArgumentException](
      e.load(LibraryDefinition("lib2", apiVersion = "9.9", code = { b =>
        b.registerFunction("f", (_, _) => RespNull)
      })))
    e.close()
  }

  test("duplicate load without replace fails; with replace upgrades") {
    val e = newEngine()
    e.load(counterLib())
    intercept[IllegalStateException](e.load(counterLib()))
    e.load(LibraryDefinition("mylib", code = { lib =>
      lib.registerFunction("ping", (_, _) => RespString("pong-v2"))
    }), replace = true)
    assert(e.call("mylib", "ping") == RespString("pong-v2"))
    // v1 functions are gone after replace
    intercept[NoSuchElementException](e.call("mylib", "incr", Seq(RespString("c"))))
    e.close()
  }

  test("failed load leaves previous version intact (E14 revert)") {
    val e = newEngine()
    e.load(counterLib())
    intercept[RuntimeException](e.load(LibraryDefinition("mylib", code = { lib =>
      lib.registerFunction("newfn", (_, _) => RespNull)
      throw new RuntimeException("boom during evaluation")
    }), replace = true))
    // old version still serves
    assert(e.call("mylib", "ping") == RespString("pong"))
    e.close()
  }

  test("upgrade cannot change a stream trigger's prefix") {
    val e = newEngine()
    def withPrefix(p: String) = LibraryDefinition("slib", code = { lib =>
      lib.registerStreamTrigger("t", p, (_, _) => ())
    })
    e.load(withPrefix("stream:"))
    intercept[IllegalArgumentException](e.load(withPrefix("other:"), replace = true))
    e.close()
  }

  test("cluster function via runOnKey / runOnShards (C7/C8)") {
    val e = newEngine()
    e.load(counterLib())
    e.state.set("user:1", "alice")
    e.load(LibraryDefinition("caller", code = { lib =>
      lib.registerFunction("lookup", (ctx, args) =>
        ctx.runOnKey(args.head.asInstanceOf[RespString].v, "remote_get"))
    }), replace = false)
    // runOnKey routes into mylib's cluster fn? cluster fns are per-library:
    // register caller's own remote fn instead
    e.load(LibraryDefinition("caller2", code = { lib =>
      lib.registerClusterFunction("remote_get", (ctx, args) => {
        val key = args.head.asInstanceOf[RespString].v
        ctx.get(key).map(RespString).getOrElse(RespNull)
      })
      lib.registerFunction("lookup", (ctx, args) =>
        ctx.runOnKey(args.head.asInstanceOf[RespString].v, "remote_get"))
    }))
    assert(e.call("caller2", "lookup", Seq(RespString("user:1"))) == RespString("alice"))
    e.close()
  }

  test("list introspection (E16)") {
    val e = newEngine()
    e.load(counterLib(), config = Map("mode" -> "test"))
    val infos = e.list()
    assert(infos.map(_.name) == Seq("mylib"))
    val lib = infos.head
    assert(lib.config("mode") == "test")
    assert(lib.functions.map(_.name).sorted == Seq("aping", "incr", "ping"))
    assert(lib.functions.find(_.name == "aping").get.isAsync)
    assert(lib.functions.find(_.name == "ping").get.flags == Set(FunctionFlags.NoWrites))
    assert(lib.clusterFunctions == Seq("remote_get"))
    e.close()
  }

  test("delete removes library") {
    val e = newEngine()
    e.load(counterLib())
    e.delete("mylib")
    intercept[NoSuchElementException](e.call("mylib", "ping"))
    intercept[NoSuchElementException](e.delete("mylib"))
    e.close()
  }

  test("library config is visible to functions (C10)") {
    val e = newEngine()
    e.load(LibraryDefinition("cfg", code = { lib =>
      lib.registerFunction("readcfg", (ctx, _) =>
        RespString(ctx.config.getOrElse("greeting", "none")))
    }), config = Map("greeting" -> "hello"))
    assert(e.call("cfg", "readcfg") == RespString("hello"))
    e.close()
  }

  test("sync call is isolated: all writes land together") {
    // Redis semantics: no rollback on failure, but no interleaving
    // either — the call holds the state lock for its whole duration (E8)
    val e = newEngine()
    e.load(LibraryDefinition("tx", code = { lib =>
      lib.registerFunction("twowrites", (ctx, _) => {
        ctx.set("a", "1"); ctx.set("b", "2"); RespNull
      })
    }))
    e.call("tx", "twowrites")
    assert(e.state.get("a").contains("1") && e.state.get("b").contains("2"))
    e.close()
  }

  test("hdel removes fields; the key disappears with its last field (Redis semantics)") {
    val e = newEngine()
    e.state.hset("h", "a" -> "1", "b" -> "2")
    assert(e.state.hdel("h", "a", "missing") == 1)
    assert(e.state.hget("h", "a").isEmpty && e.state.hget("h", "b").contains("2"))
    assert(e.state.hdel("h", "b") == 1)
    assert(!e.state.exists("h"))
    e.close()
  }

  test("every RESP reply shape rounds through call, nesting cap enforced (test_basics reply coverage)") {
    val e = newEngine()
    val shapes: Map[String, RespValue] = Map(
      "map" -> RespMap(Map("a" -> RespLong(1), "b" -> RespArray(Seq(RespString("x"))))),
      "set" -> RespSet(Set(RespLong(1), RespLong(2), RespString("s"))),
      "big" -> RespBigNumber(BigInt("123456789012345678901234567890")),
      "verbatim" -> RespVerbatim("txt", "hello"),
      "bin" -> RespBinary(Array[Byte](0, -1, 127)),
      "double" -> RespDouble(3.5),
      "bool" -> RespBool(true),
      "nil" -> RespNull)
    e.load(LibraryDefinition("shapes", code = { b =>
      shapes.foreach { case (n, v) =>
        b.registerFunction(n, (_, _) => v, flags = Set(FunctionFlags.NoWrites))
      }
      b.registerFunction("too_deep", (_, _) =>
        (1 to 101).foldLeft(RespNull: RespValue)((acc, _) => RespArray(Seq(acc))),
        flags = Set(FunctionFlags.NoWrites))
    }))
    shapes.foreach { case (n, v) => assert(e.call("shapes", n) == v, s"shape $n") }
    val ex = intercept[IllegalStateException](e.call("shapes", "too_deep"))
    assert(ex.getMessage.contains("depth"))
    e.close()
  }

  test("list WITHCODE surfaces the declared library source (E16)") {
    val e = newEngine()
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerFunction("f", (_, _) => RespNull, flags = Set(FunctionFlags.NoWrites))
    }, source = Some("registerFunction f -> null")))
    assert(e.list().head.code.isEmpty) // default: no code
    assert(e.list(withCode = true).head.code.contains("registerFunction f -> null"))
    e.close()
  }

  test("executeAsync: sync function escapes to background; call replies with the resolution (C5)") {
    val e = new Engine(TestSpark.spark, executionThreads = 2)
    val syncThread = new java.util.concurrent.atomic.AtomicLong
    val bgThread = new java.util.concurrent.atomic.AtomicLong
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerFunction("escape", (ctx, _) => {
        syncThread.set(Thread.currentThread().getId)
        ctx.set("sync_part", "committed") // commits with the sync section
        ctx.executeAsync { bg =>
          bgThread.set(Thread.currentThread().getId)
          // the sync part's write is already visible to the background
          val seen = bg.get("sync_part").getOrElse("missing")
          bg.set("bg_part", "done")
          RespString(s"resolved:$seen")
        }
      })
    }))
    assert(e.call("lib", "escape") == RespString("resolved:committed"))
    assert(syncThread.get != bgThread.get, "background body must run on the pool")
    assert(e.state.get("bg_part").contains("done"))
    e.close()
  }

  test("atomic block: async writes are invisible until the block commits (C6)") {
    val e = new Engine(TestSpark.spark, executionThreads = 2)
    val entered = new java.util.concurrent.CountDownLatch(1)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerAsyncFunction("batch", (ctx, _) => {
        ctx.atomic { txn =>
          txn.set("k1", "v1")
          entered.countDown()
          Thread.sleep(150) // widen the window a concurrent reader could observe
          txn.set("k2", "v2")
        }
        RespString("ok")
      })
    }))
    val fut = e.callAsync("lib", "batch")
    entered.await()
    // reader during the transaction: must see none or all of the writes,
    // never the partial state {k1 set, k2 unset}
    val k1 = e.state.get("k1")
    val k2 = e.state.get("k2")
    assert(k1.isDefined == k2.isDefined, s"partial transaction state observed: k1=$k1 k2=$k2")
    assert(Await.result(fut, 10.seconds) == RespString("ok"))
    assert(e.state.get("k1").contains("v1") && e.state.get("k2").contains("v2"))
    e.close()
  }

  test("async fn escaping through executeAsync completes with ONE execution thread (no deadlock)") {
    // regression: resolve() used to Await inside the pool thread, so the
    // nested executeAsync future could never be scheduled at
    // executionThreads=1 (the engine default) and failed only at the
    // 60 s timeout; the chain now resolves via flatMap
    val e = new Engine(TestSpark.spark) // executionThreads = 1
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerAsyncFunction("nested", (ctx, _) =>
        ctx.executeAsync { bg =>
          bg.set("nested_done", "yes")
          RespString("resolved")
        })
    }))
    assert(Await.result(e.callAsync("lib", "nested"), 10.seconds) == RespString("resolved"))
    assert(e.state.get("nested_done").contains("yes"))
    e.close()
  }

  test("concurrent callAsync invocations count exactly in E16 stats") {
    val e = new Engine(TestSpark.spark, executionThreads = 8)
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerAsyncFunction("maybe", (_, args) => args.head match {
        case RespLong(n) if n % 2 == 0 => RespLong(n)
        case _ => throw new RuntimeException("odd")
      })
    }))
    val n = 200
    val futs = (1 to n).map(i => e.callAsync("lib", "maybe", Seq(RespLong(i))))
    futs.foreach(f => scala.util.Try(Await.result(f, 30.seconds)))
    // error counters are bumped in an onComplete callback — give the
    // last few a moment to land before asserting exact counts
    val deadline = System.currentTimeMillis() + 10000
    def fnInfo() = e.list().head.functions.find(_.name == "maybe").get
    while (fnInfo().errors != n / 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    assert(fnInfo().calls == n.toLong, "lost call counts under concurrency")
    assert(fnInfo().errors == (n / 2).toLong, "lost error counts under concurrency")
    e.close()
  }

  test("remote tasks are bounded by remote-task-default-timeout (C7)") {
    val e = newEngine()
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerClusterFunction("slow", (_, _) => {
        Thread.sleep(1500)
        RespString("done")
      })
      // async context: does not hold the state lock, so the remote-task
      // timeout applies (runOnKey is an asyncClient method in the
      // reference)
      b.registerAsyncFunction("probe", (ctx, _) => ctx.runOnKey("k", "slow"),
        flags = Set(FunctionFlags.NoWrites))
    }))
    e.configSet("remote-task-default-timeout", "150")
    val ex = intercept[java.util.concurrent.TimeoutException](
      Await.result(e.callAsync("lib", "probe"), 30.seconds))
    assert(ex.getMessage.contains("remote task"))
    e.configSet("remote-task-default-timeout", "30000")
    assert(Await.result(e.callAsync("lib", "probe"), 30.seconds) == RespString("done"))
    intercept[IllegalArgumentException](e.configSet("remote-task-default-timeout", "0"))
    intercept[IllegalArgumentException](e.configSet("remote-task-default-timeout", "nope"))
    e.close()
  }

  test("atomic block is write-gated for no-writes functions (C6/E13)") {
    val e = newEngine()
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerAsyncFunction("ro", (ctx, _) => {
        ctx.atomic(_.set("x", "1"))
        RespNull
      }, flags = Set(FunctionFlags.NoWrites))
    }))
    val ex = intercept[IllegalStateException] {
      Await.result(e.callAsync("lib", "ro"), 10.seconds)
    }
    assert(ex.toString.contains("no-writes") || ex.getCause != null)
    assert(e.state.get("x").isEmpty)
    e.close()
  }
}
