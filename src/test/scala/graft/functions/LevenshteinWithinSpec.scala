package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[LevenshteinWithin]] — banded early-abandon DP cross-checked
  * against the classic full-matrix DP on crafted edges and a
  * deterministic pseudo-random corpus. */
class LevenshteinWithinSpec extends AnyFunSuite {

  private def full(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  private def banded(a: String, b: String, d: Int): Int =
    LevenshteinWithin.compute(UTF8String.fromString(a), UTF8String.fromString(b), d)

  test("crafted edges: empties, equality, band boundary, length guard") {
    assert(banded("", "", 0) == 0)
    assert(banded("", "abc", 4) == 3)
    assert(banded("abc", "", 2) == -1)
    assert(banded("same", "same", 0) == 0)
    assert(banded("kitten", "sitting", 4) == 3)
    assert(banded("kitten", "sitting", 3) == 3)
    assert(banded("kitten", "sitting", 2) == -1)
    assert(banded("abcdef", "abcdefghijk", 4) == -1) // length diff 5 > 4
    // distance exactly at the threshold must be returned, not dropped
    assert(banded("aaaa", "bbbb", 4) == 4)
    assert(banded("aaaa", "bbbb", 3) == -1)
    // multi-byte inputs take the char fallback: per-CHARACTER distance
    assert(banded("café", "cafe", 2) == 1)
    assert(banded("héllo", "hello", 2) == 1)
    assert(banded("ααα", "βββ", 4) == 3)
  }

  test("huge maxDist (up to Int.MaxValue) cannot overflow the band DP") {
    // past max(len1, len2) a larger band changes nothing, so compute
    // clamps d — without the clamp `inf = d + 1` wraps to Int.MinValue
    // and corrupts every cell (VERDICT r10 #5 boundary)
    for (d <- Seq(Int.MaxValue, Int.MaxValue - 1, 1 << 30, 1000000)) {
      assert(banded("kitten", "sitting", d) == 3, s"d=$d")
      assert(banded("", "abc", d) == 3, s"d=$d")
      assert(banded("abc", "", d) == 3, s"d=$d")
      assert(banded("aaaa", "bbbb", d) == 4, s"d=$d")
      assert(banded("same", "same", d) == 0, s"d=$d")
      // char fallback path takes the same clamp
      assert(banded("café", "cafe", d) == 1, s"d=$d")
    }
    // the clamp must not change any answer below the boundary: the
    // full DP stays the referee for threshold = max length
    val pairs = Seq(("kitten", "sitting"), ("abcde", "edcba"),
      ("aaabbb", "bbbaaa"), ("x", "yyyyyyyy"))
    for ((a, b) <- pairs) {
      val m = math.max(a.length, b.length)
      assert(banded(a, b, m) == full(a, b), s"($a, $b)")
      assert(banded(a, b, Int.MaxValue) == full(a, b), s"($a, $b)")
    }
  }

  test("agrees with the full DP on a deterministic pseudo-random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcde" // small alphabet: dense near-matches
    def word(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 1 to 2000) {
      val a = word(1 + rnd.nextInt(12))
      val b = if (rnd.nextBoolean()) word(1 + rnd.nextInt(12))
        else { // mutate a: the near-match regime the band must get right
          val chars = a.toCharArray
          (0 until rnd.nextInt(4)).foreach { _ =>
            chars(rnd.nextInt(chars.length)) = alphabet(rnd.nextInt(alphabet.length))
          }
          new String(chars)
        }
      for (d <- 0 to 5) {
        val want = { val f = full(a, b); if (f <= d) f else -1 }
        assert(banded(a, b, d) == want, s"($a, $b, d=$d)")
      }
    }
  }
}
