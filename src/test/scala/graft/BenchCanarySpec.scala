package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load-canary verdict rule ([[Bench.loadSuspect]]) — the
  * in-band noise detector the driver's BENCH report carries. Pinned so
  * a refactor can't silently re-introduce the JIT-warm-up false
  * positive (a quiet box's first sample runs ~2.4× the later ones even
  * after one warm-up pass) or stop catching real load shapes. */
class BenchCanarySpec extends AnyFunSuite {

  test("quiet-box warm-up shape (monotone decrease) is NOT load-suspect") {
    assert(!Bench.loadSuspect(Seq(0.282, 0.143, 0.117))) // measured r9 shape
    assert(!Bench.loadSuspect(Seq(0.339, 0.095, 0.088)))
    assert(!Bench.loadSuspect(Seq(0.10, 0.10, 0.10)))
  }

  test("mid-run and end-of-run load spikes ARE load-suspect") {
    assert(Bench.loadSuspect(Seq(0.10, 0.35, 0.11))) // loaded during the suite
    assert(Bench.loadSuspect(Seq(0.10, 0.11, 0.30))) // loaded at the end
    assert(Bench.loadSuspect(Seq(0.30, 0.29, 0.31, 0.09))) // load released late:
    // the min anchors at the quiet sample, earlier inflation shows
  }

  test("edges: boundary at exactly 2x, short and empty sample lists") {
    assert(!Bench.loadSuspect(Seq(0.10, 0.20))) // exactly 2x: not suspect (strict >)
    assert(Bench.loadSuspect(Seq(0.10, 0.201)))
    assert(!Bench.loadSuspect(Seq(0.10))) // one sample: no post-start evidence
    assert(!Bench.loadSuspect(Seq.empty))
  }

  test("positional rule: a missing canary0 is INDETERMINATE, not silently quiet") {
    // ADVICE r9: if canary0 failed, the middle sample must NOT inherit
    // the warm-up exemption — the verdict goes null instead
    assert(Bench.loadSuspectOpt(Seq(None, Some(0.30), Some(0.11))).isEmpty)
    assert(Bench.loadSuspectOpt(Seq(Some(0.10), None, None)).isEmpty) // no later evidence
    assert(Bench.loadSuspectOpt(Seq.empty).isEmpty)
    // present canary0: same verdict as the flat rule
    assert(Bench.loadSuspectOpt(Seq(Some(0.28), Some(0.14), Some(0.12))) == Some(false))
    assert(Bench.loadSuspectOpt(Seq(Some(0.10), Some(0.35), Some(0.11))) == Some(true))
    // canary0 present, one later sample missing: judge on what exists
    assert(Bench.loadSuspectOpt(Seq(Some(0.10), None, Some(0.30))) == Some(true))
  }
}
