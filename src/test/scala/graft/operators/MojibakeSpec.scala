package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q368 — on the clean fixture every detector reads zero BY GENERATOR
  * CONSTRUCTION, so the gate pins only exactness; THIS spec drives
  * crafted corruption through the same core to prove each detector
  * actually fires, counts exactly, and attributes per source. */
class MojibakeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    TextAnalysis.mojibakeAudit(rows.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
  }

  test("each detector fires on its corruption class with exact counts") {
    val out = run(Seq(
      (1L, "a", "clean text here"),
      (2L, "a", "bad � decode �� left scars"),   // 3 U+FFFD
      (3L, "b", "binary\u0000nul\u0001bleed\u0002here\u0003"), // 4 C0 ctrls incl NUL
      (4L, "b", "tab\tand\nnewline\rare fine"),                 // exempt ctrls
      (5L, "c", "cafÃ© shows as ca fÃ Â mojibake"))) // Ã,Ã,Â
    val (aChars, aF, aC, aT, aSus, aPpm) = out("a")
    assert(aF == 3 && aC == 0 && aT == 0 && aSus == 1)
    assert(aPpm == 3L * 1000000 / aChars)
    val (_, bF, bC, bT, bSus, _) = out("b")
    assert(bF == 0 && bC == 4 && bT == 0 && bSus == 1,
      s"tab/newline/CR must be exempt (got ctrl=$bC)")
    val (_, cF, cC, cT, cSus, _) = out("c")
    assert(cF == 0 && cC == 0 && cT == 3 && cSus == 1)
  }

  test("clean corpus reads all-zero — the fixture gate's meaning") {
    val out = run(Seq((1L, "s", "perfectly ordinary ascii prose.")))
    val (_, f, c, t, sus, ppm) = out("s")
    assert(f == 0 && c == 0 && t == 0 && sus == 0 && ppm == 0)
  }
}
