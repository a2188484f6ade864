package graft.core

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, LongAdder}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** Concurrent-load stress over the composed Engine core (VERDICT r8
  * #5): the reference runs sync functions, the lock watchdog, LRU
  * eviction, active TTL expiry, atomic transactions, and keyspace
  * triggers on ONE lock (`redisgears_core/src/lib.rs:1368-1387` — the
  * GIL acquired around every invocation path); each of those is
  * spec'd solo here, and this spec is the missing composition: all of
  * them at once, from many threads, asserting
  *
  *   - no deadlock (every thread joins within the harness timeout);
  *   - no lost event (every k:-write's "set" notification fires
  *     exactly once, counted against the writers' own tally);
  *   - ordered per-key dispatch (each key has one writer issuing
  *     strictly increasing values; the trigger's at-notification-time
  *     snapshots must arrive strictly increasing per key);
  *   - the watchdog aborts only the hung invocations, and the lock is
  *     always released (post-stress calls succeed);
  *   - every TTL'd key leaves the table as exactly one terminal event
  *     ("expired" via the active sweep, or "evicted" if cap pressure
  *     claims it first — never both, never neither);
  *   - the atomic-txn counter matches the writers' tally exactly
  *     unless eviction provably claimed it (conditional recorded).
  */
class ConcurrencyStressSpec extends AnyFunSuite {

  private val Writers = 8
  private val WritesPerWriter = 150
  private val TtlKeys = 30
  private val ChurnKeys = 240
  private val MaxKeys = 120 // < 9 + 30 + 240: guarantees cap pressure

  test("writers + triggers + watchdog + TTL sweep + eviction churn compose on one lock") {
    val e = new Engine(TestSpark.spark)
    e.configSet("lock-timeout", "250")
    e.configSet("max-keys", MaxKeys.toString)

    // trigger-side observation logs (test-owned, thread-safe)
    val setLog = new ConcurrentLinkedQueue[(String, String)] // (key, snapshot value)
    val expiredLog = new ConcurrentLinkedQueue[String]
    val evictedLog = new ConcurrentLinkedQueue[String]
    val triggerErrors = new LongAdder

    e.load(LibraryDefinition("stress", code = { b =>
      b.registerFunction("put", (ctx, args) => {
        val k = args(0).asInstanceOf[RespString].v
        val v = args(1).asInstanceOf[RespString].v
        ctx.set(k, v)
        // atomic read-modify-write on a shared counter: the txn path
        // under the same lock as the direct write above
        ctx.atomic { txn =>
          val cur = txn.get("counter").map(_.toLong).getOrElse(0L)
          txn.set("counter", (cur + 1L).toString)
        }
        RespString("ok")
      })
      b.registerFunction("spin", (ctx, _) => {
        while (true) { ctx.get("nope") } // dies only via the E10 abort
        RespNull
      })
      b.registerFunction("probe", (ctx, _) =>
        RespLong(ctx.get("counter").map(_.toLong).getOrElse(0L)),
        flags = Set(FunctionFlags.NoWrites))
      // at-notification-time snapshot of the just-written value: the
      // per-key dispatch-order witness (one writer per key => values
      // must arrive strictly increasing)
      b.registerKeySpaceTrigger("watch_sets", "k:",
        (_, ev) => setLog.add(ev.key -> ev.snapshot.fold("")(_("v"))),
        onTriggerFired = Some((ctx, ev) => Map("v" -> ctx.get(ev.key).getOrElse(""))),
        eventTypes = Set("set"))
      b.registerKeySpaceTrigger("watch_expired", "",
        (_, ev) => expiredLog.add(ev.key), eventTypes = Set("expired"))
      b.registerKeySpaceTrigger("watch_evicted", "",
        (_, ev) => evictedLog.add(ev.key), eventTypes = Set("evicted"))
    }))

    val failures = new ConcurrentLinkedQueue[Throwable]
    val start = new CountDownLatch(1)
    val watchdogAborts = new LongAdder
    val stopChurn = new AtomicBoolean(false)

    def thread(name: String)(body: => Unit): Thread = {
      val t = new Thread(() => {
        start.await()
        try body catch { case x: Throwable => failures.add(x) }
      }, name)
      t.start(); t
    }

    // N writers, one key each, strictly increasing values
    val writers = (0 until Writers).map { w =>
      thread(s"writer-$w") {
        var i = 1
        while (i <= WritesPerWriter) {
          e.call("stress", "put",
            Seq(RespString(s"k:$w"), RespString(i.toString)))
          i += 1
        }
      }
    }
    // hung invocations racing the writers: each must be aborted by the
    // watchdog without wedging anyone else
    val hangers = (0 until 2).map { h =>
      thread(s"hanger-$h") {
        (0 until 3).foreach { _ =>
          try { e.call("stress", "spin"); failures.add(new AssertionError("spin returned")) }
          catch { case _: FunctionAbortedException => watchdogAborts.increment() }
        }
      }
    }
    // TTL keys + the active-expiry sweep racing everything else
    val ttlWriter = thread("ttl-writer") {
      (0 until TtlKeys).foreach { i =>
        e.state.set(s"t:$i", "v")
        e.state.expire(s"t:$i", 40L)
        Thread.sleep(2)
      }
    }
    val sweeper = thread("sweeper") {
      while (!stopChurn.get()) { e.state.sweepExpired(); Thread.sleep(10) }
    }
    // cap-pressure churn: single-touch keys that become the LRU
    // victims. Runs to completion (joined with the workers): the spin
    // hangers stall the global lock ~250 ms per abort, so a
    // time-gated churn could stop short of the cap and make the
    // eviction assertion vacuous
    val churner = thread("churner") {
      var i = 0
      while (i < ChurnKeys) {
        e.state.set(s"e:$i", "x"); i += 1; Thread.sleep(1)
      }
    }
    // read mixers: NoWrites sync calls interleaved under the same lock
    val readers = (0 until 2).map { r =>
      thread(s"reader-$r") {
        (0 until 200).foreach { _ => e.call("stress", "probe") }
      }
    }

    start.countDown()
    val workers = writers ++ hangers ++ readers :+ ttlWriter :+ churner
    workers.foreach { t =>
      t.join(120000)
      assert(!t.isAlive, s"deadlock: ${t.getName} still running after 120 s")
    }
    // let the last TTLs lapse, then one final sweep before stopping
    Thread.sleep(80)
    e.state.sweepExpired()
    stopChurn.set(true)
    sweeper.join(120000)
    assert(!sweeper.isAlive, "deadlock: sweeper still running after 120 s")

    assert(failures.isEmpty, s"worker failures: ${failures.asScala.map(_.toString).take(3)}")

    // --- no lost event: every put fired exactly one "set" ---
    val sets = setLog.asScala.toVector
    assert(sets.size == Writers * WritesPerWriter,
      s"set events ${sets.size} != ${Writers * WritesPerWriter}")
    // --- ordered per-key dispatch: snapshots strictly increasing ---
    sets.groupBy(_._1).foreach { case (key, evs) =>
      val vals = evs.map(_._2.toInt)
      assert(vals == (1 to WritesPerWriter).toVector,
        s"$key dispatched out of order (first divergence at ${vals.zip(1 to WritesPerWriter).indexWhere(p => p._1 != p._2)})")
    }
    // --- watchdog: all six hung invocations aborted, none leaked ---
    assert(watchdogAborts.sum() == 6L, s"watchdog aborts ${watchdogAborts.sum()} != 6")
    // --- every TTL'd key got exactly one terminal event ---
    val expired = expiredLog.asScala.toVector.filter(_.startsWith("t:"))
    val evictedT = evictedLog.asScala.toVector.filter(_.startsWith("t:"))
    val terminal = expired ++ evictedT
    assert(terminal.size == TtlKeys && terminal.distinct.size == TtlKeys,
      s"TTL terminal events: expired=${expired.size} evicted=${evictedT.size} " +
        s"(dups=${terminal.size - terminal.distinct.size}) != $TtlKeys once each")
    (0 until TtlKeys).foreach(i => assert(e.state.get(s"t:$i").isEmpty, s"t:$i survived"))
    // --- cap pressure really happened, and the table respects the cap ---
    assert(evictedLog.asScala.nonEmpty, "no eviction fired: churn did not exercise the cap")
    assert(e.state.size <= MaxKeys)
    // --- atomicity: the txn counter equals the writers' tally, unless
    // LRU provably claimed the counter key mid-run (then it restarted
    // from zero at least once and can only be lower, never higher) ---
    val counterEvicted = evictedLog.asScala.exists(_ == "counter")
    val counted = e.state.get("counter").map(_.toLong).getOrElse(0L)
    if (counterEvicted)
      assert(counted <= (Writers * WritesPerWriter).toLong)
    else
      assert(counted == (Writers * WritesPerWriter).toLong,
        s"txn counter $counted != ${Writers * WritesPerWriter} with no eviction of it")
    // --- the lock is free and the engine healthy after the storm ---
    assert(e.call("stress", "probe").isInstanceOf[RespLong])
    e.close()
  }
}
