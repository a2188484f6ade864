package graft.examples

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Keeps the living-documentation demo green in CI (VERDICT r8 #8):
  * `QuickStart.main` exercises load→trigger→stream→cluster→watchdog→
  * debug→evict→save/restore end-to-end and `require`s its own
  * invariants (counter served after upgrade refusal, watchdog abort,
  * save/restore round-trip), so running it IS the assertion. It
  * reuses the shared test session and leaves it running. */
class QuickStartSpec extends AnyFunSuite {
  test("runMain graft.examples.QuickStart completes against a tmp dir") {
    TestSpark.spark // force the shared session up before the demo
    QuickStart.main(Array.empty)
  }
}
