package graft.core

import scala.collection.concurrent.TrieMap

/** One invocation paused at function entry by a [[DebugSession]]
  * breakpoint. The pause happens BEFORE the invocation takes the state
  * lock and before the E10 watchdog arms, so a paused function blocks
  * neither the keyspace nor other callers, and inspection reads run
  * freely while it waits. */
final class PausedInvocation private[core] (val id: Long, val function: String,
    val args: Seq[RespValue]) {
  private[core] val latch = new java.util.concurrent.CountDownLatch(1)
  @volatile private[core] var abortMsg: Option[String] = None
  val pausedAtMs: Long = System.currentTimeMillis()

  /** Release the invocation to run normally. */
  def resume(): Unit = latch.countDown()

  /** Release the invocation to fail with [[FunctionAbortedException]]. */
  def abort(msg: String = "aborted by debug session"): Unit = {
    abortMsg = Some(msg)
    latch.countDown()
  }
}

/** TFUNCTION DEBUG analogue — the reference opens a live V8 inspector
  * session against a library (`function_debug` command; 9 scenarios in
  * `pytests/test_debugging.py`). Scala closures have no bytecode
  * inspector to remote (the IDE debugs them), but the session
  * SEMANTICS port directly: attach to a loaded library, arm
  * breakpoints on its functions, catch invocations paused at entry,
  * inspect their arguments and the live state table, then resume or
  * abort each — and detaching releases everything. One session per
  * library at a time, like one inspector connection. */
final class DebugSession private[core] (engine: Engine, val library: String) {
  private val breakpoints = TrieMap.empty[String, Unit]
  private val pausedMap = TrieMap.empty[Long, PausedInvocation]
  private val seq = new java.util.concurrent.atomic.AtomicLong()
  @volatile private var closed = false

  /** Arm a breakpoint: subsequent invocations of `fn` pause at entry. */
  def breakOn(fn: String): Unit = {
    require(!closed, "debug session is closed")
    breakpoints.put(fn, ())
  }

  def clearBreak(fn: String): Unit = breakpoints.remove(fn)

  def breakpointList: Seq[String] = breakpoints.keys.toSeq.sorted

  /** Invocations currently paused at entry, oldest first. */
  def paused: Seq[PausedInvocation] = pausedMap.values.toSeq.sortBy(_.id)

  /** Inspector convenience: block until an invocation pauses (or the
    * timeout passes) and return it. */
  def awaitPause(timeoutMs: Long = 5000): Option[PausedInvocation] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (pausedMap.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(5)
    paused.headOption
  }

  def resumeAll(): Unit = paused.foreach(_.resume())

  /** Detach: clears breakpoints, releases every paused invocation to
    * run, and frees the library for a new session. Registration and
    * close share this session's monitor, so an invocation that passed
    * the breakpoint check either lands in `pausedMap` BEFORE close's
    * drain (and is resumed by it) or sees `closed` and skips the pause
    * — it can never await a latch nobody will release. */
  def close(): Unit = {
    this.synchronized {
      closed = true
      breakpoints.clear()
    }
    resumeAll()
    engine.detachDebugSession(library, this)
  }

  /** Engine hook, called at function entry on the invoking thread. */
  private[core] def maybePause(fn: String, args: Seq[RespValue]): Unit =
    if (!closed && breakpoints.contains(fn)) {
      val p = new PausedInvocation(seq.incrementAndGet(), fn, args)
      val registered = this.synchronized {
        if (closed) false
        else { pausedMap.put(p.id, p); true }
      }
      if (registered) {
        try p.latch.await()
        finally pausedMap.remove(p.id)
        p.abortMsg.foreach(m => throw new FunctionAbortedException(m))
      }
    }
}
