package graft.core

import scala.concurrent.Await
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** Per-library ACL semantics, shaped after the reference's
  * `pytests/test_acl.py` (8 tests: denied key read, denied write,
  * revoked user, stream consumer denial, notification consumer denial,
  * async paths). A library is loaded AS a user; every key access —
  * sync call, async call, atomic transaction, stream record delivery,
  * keyspace notification — checks that user's prefix rules at access
  * time. */
class AclSpec extends AnyFunSuite {

  private def readerLib(user: String) = LibraryDefinition("lib", user = user, code = { b =>
    b.registerFunction("read", (ctx, args) => {
      val k = args.head.asInstanceOf[RespString].v
      ctx.get(k).map(RespString).getOrElse(RespNull)
    }, flags = Set(FunctionFlags.NoWrites))
    b.registerFunction("write", (ctx, args) => {
      val k = args.head.asInstanceOf[RespString].v
      ctx.set(k, "x"); RespString("ok")
    })
    b.registerAsyncFunction("aread", (ctx, args) => {
      val k = args.head.asInstanceOf[RespString].v
      ctx.get(k).map(RespString).getOrElse(RespNull)
    }, flags = Set(FunctionFlags.NoWrites))
  })

  test("denied key read: the user's prefix rules gate every get (sync + async)") {
    val e = new Engine(TestSpark.spark)
    e.state.set("data:1", "v")
    e.state.set("secret:1", "s")
    e.aclSetUser("alice", Seq(AclRule("data:")))
    e.load(readerLib("alice"))
    assert(e.call("lib", "read", Seq(RespString("data:1"))) == RespString("v"))
    val ex = intercept[AclException](e.call("lib", "read", Seq(RespString("secret:1"))))
    assert(ex.getMessage.contains("alice") && ex.getMessage.contains("secret:1"))
    val aex = intercept[AclException](
      Await.result(e.callAsync("lib", "aread", Seq(RespString("secret:1"))), 10.seconds))
    assert(aex.getMessage.contains("no read permissions"))
    e.close()
  }

  test("denied write: read-only rules allow get but refuse set / atomic writes") {
    val e = new Engine(TestSpark.spark)
    e.aclSetUser("bob", Seq(AclRule("data:", read = true, write = false)))
    e.state.set("data:1", "v")
    e.load(readerLib("bob"))
    assert(e.call("lib", "read", Seq(RespString("data:1"))) == RespString("v"))
    intercept[AclException](e.call("lib", "write", Seq(RespString("data:1"))))
    assert(e.state.get("data:1").contains("v"))
    // the atomic-transaction path is guarded identically
    val ctx = e.functionContext("lib")
    intercept[AclException](ctx.atomic(_.set("data:1", "nope")))
    assert(ctx.atomic(_.get("data:1")).contains("v"))
    e.close()
  }

  test("revoked user: deleting the user cuts off an already-loaded library immediately") {
    val e = new Engine(TestSpark.spark)
    e.aclSetUser("carol", Seq(AclRule("")))
    e.state.set("k", "v")
    e.load(readerLib("carol"))
    assert(e.call("lib", "read", Seq(RespString("k"))) == RespString("v"))
    e.aclDelUser("carol")
    val ex = intercept[AclException](e.call("lib", "read", Seq(RespString("k"))))
    assert(ex.getMessage.contains("does not exist"))
    // re-granting restores access
    e.aclSetUser("carol", Seq(AclRule("")))
    assert(e.call("lib", "read", Seq(RespString("k"))) == RespString("v"))
    e.close()
  }

  test("loading as an unknown user is refused; the default user is undeletable") {
    val e = new Engine(TestSpark.spark)
    intercept[AclException](e.load(readerLib("nobody")))
    assert(e.list().isEmpty)
    intercept[IllegalArgumentException](e.aclDelUser(Acl.DefaultUser))
    // default user has full access and is reported by list()
    e.load(readerLib(Acl.DefaultUser))
    assert(e.list().head.user == Acl.DefaultUser)
    e.close()
  }

  test("stream consumer: a denied stream key is a nack, delivery halts (stream_run_ctx.rs:144)") {
    val e = new Engine(TestSpark.spark)
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    e.aclSetUser("dave", Seq(AclRule("s:ok")))
    e.load(LibraryDefinition("slib", user = "dave", code = { b =>
      b.registerStreamTrigger("t", "s:", (_, r) => { seen += r.stream; () })
    }))
    val records = Seq(
      StreamRecord("s:ok:1", 1, 0, Map.empty),
      StreamRecord("s:denied", 1, 0, Map.empty))
    intercept[StreamDeliveryException](e.streams.processBatch(records))
    assert(seen.toSeq == Seq("s:ok:1"))
    val st = e.list().head.streamTriggers.head.streams("s:denied")
    assert(st.totalErrors == 1 && st.lastError.exists(_.contains("no read permissions")))
    e.close()
  }

  test("keyspace consumer: a denied notifying key is recorded as an error, not delivered") {
    val e = new Engine(TestSpark.spark)
    val fired = scala.collection.mutable.ArrayBuffer.empty[String]
    e.aclSetUser("erin", Seq(AclRule("k:ok")))
    e.load(LibraryDefinition("klib", user = "erin", code = { b =>
      b.registerKeySpaceTrigger("t", "k:", (_, ev) => { fired += ev.key; () })
    }))
    e.state.set("k:ok:1", "v")
    e.state.set("k:denied", "v")
    assert(fired.toSeq == Seq("k:ok:1"))
    val st = e.list().head.keySpaceTriggers.head
    assert(st.totalErrors == 1 && st.lastError.exists(_.contains("no read permissions")))
    e.close()
  }

  test("per-library isolation: one engine, two libraries, two users") {
    val e = new Engine(TestSpark.spark)
    e.state.set("a:1", "A"); e.state.set("b:1", "B")
    e.aclSetUser("ua", Seq(AclRule("a:")))
    e.aclSetUser("ub", Seq(AclRule("b:")))
    def lib(n: String, u: String) = LibraryDefinition(n, user = u, code = { b =>
      b.registerFunction("read", (ctx, args) =>
        ctx.get(args.head.asInstanceOf[RespString].v).map(RespString).getOrElse(RespNull),
        flags = Set(FunctionFlags.NoWrites))
    })
    e.load(lib("la", "ua")); e.load(lib("lb", "ub"))
    assert(e.call("la", "read", Seq(RespString("a:1"))) == RespString("A"))
    assert(e.call("lb", "read", Seq(RespString("b:1"))) == RespString("B"))
    intercept[AclException](e.call("la", "read", Seq(RespString("b:1"))))
    intercept[AclException](e.call("lb", "read", Seq(RespString("a:1"))))
    e.close()
  }

  test("a deleted library's in-flight context is denied, never escalated to the default user") {
    val e = new Engine(TestSpark.spark)
    e.state.set("data:1", "v")
    e.aclSetUser("carol", Seq(AclRule("data:")))
    e.load(readerLib("carol"))
    val ctx = e.functionContext("lib") // the context an in-flight async fn holds
    assert(ctx.get("data:1").contains("v"))
    e.delete("lib")
    // before the fix this fell back to the all-access default user
    val ex = intercept[AclException](ctx.get("data:1"))
    assert(ex.getMessage.contains("not loaded"))
    intercept[AclException](ctx.set("data:1", "w"))
    e.close()
  }

  test("scan hides key names under denied prefixes") {
    val e = new Engine(TestSpark.spark)
    e.state.set("data:1", "v")
    e.state.set("data:2", "v")
    e.state.set("secret:1", "s")
    e.aclSetUser("dave", Seq(AclRule("data:")))
    e.load(readerLib("dave"))
    val ctx = e.functionContext("lib")
    assert(ctx.scan("") == Seq("data:1", "data:2")) // secret:1 not even named
    assert(ctx.scan("secret:").isEmpty)
    e.close()
  }

  test("rule algebra: multiple rules union; longest-prefix not required; empty prefix = all") {
    val e = new Engine(TestSpark.spark)
    e.aclSetUser("frank", Seq(
      AclRule("cache:", read = true, write = true),
      AclRule("conf:", read = true, write = false)))
    e.load(readerLib("frank"))
    e.state.set("conf:x", "1")
    assert(e.call("lib", "read", Seq(RespString("conf:x"))) == RespString("1"))
    assert(e.call("lib", "write", Seq(RespString("cache:x"))) == RespString("ok"))
    intercept[AclException](e.call("lib", "write", Seq(RespString("conf:x"))))
    intercept[AclException](e.call("lib", "read", Seq(RespString("other:x"))))
    intercept[IllegalArgumentException](e.aclSetUser("bad name!", Seq(AclRule(""))))
    e.close()
  }
}
