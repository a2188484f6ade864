package graft.operators

import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact duplicate-span removal (q86, the Lee et al. ACL'22 ExactSubstr
  * policy): crafted corpora prove cross-doc removal of ALL copies,
  * within-doc repeat removal, span-union coverage for overlapping
  * duplicate windows, and that short/unique docs pass through intact. */
class ExactSubstringSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def run(docs: Seq[(Long, String)], L: Int): Map[Long, (Int, Int, String)] = {
    val s = spark
    import s.implicits._
    Dedup.exactSubstringClean(docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3))))
      .toMap
  }

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a shared L-token span is cut from BOTH docs; unique text survives") {
    val shared = words("dup", 4)                  // exactly L=4 tokens
    val a = s"${words("a", 3)} $shared ${words("z", 3)}"
    val b = s"${words("b", 5)} $shared"
    val c = words("c", 8)                         // no duplicates
    val got = run(Seq((1L, a), (2L, b), (3L, c)), L = 4)
    assert(got(1L) == ((10, 4, md5hex(s"${words("a", 3)} ${words("z", 3)}"))))
    assert(got(2L) == ((9, 4, md5hex(words("b", 5)))))
    assert(got(3L) == ((8, 0, md5hex(c))))
  }

  test("a span repeated WITHIN one doc is removed (both copies)") {
    val span = words("r", 3)
    val text = s"$span ${words("mid", 4)} $span"
    val got = run(Seq((1L, text)), L = 3)
    assert(got(1L) == ((10, 6, md5hex(words("mid", 4)))))
  }

  test("overlapping duplicate windows union into one removed span") {
    // docs share an L+2-token run: 3 overlapping L-windows all duplicate,
    // and their union (L+2 tokens) is removed as one contiguous span
    val runTokens = words("s", 6)                 // L=4 -> 3 windows
    val a = s"$runTokens ${words("x", 3)}"
    val b = s"${words("y", 3)} $runTokens"
    val got = run(Seq((1L, a), (2L, b)), L = 4)
    assert(got(1L) == ((9, 6, md5hex(words("x", 3)))))
    assert(got(2L) == ((9, 6, md5hex(words("y", 3)))))
  }

  test("docs shorter than L never produce windows and pass through") {
    val t = words("t", 3)
    val got = run(Seq((1L, t), (2L, t)), L = 4)   // identical but < L tokens
    assert(got(1L) == ((3, 0, md5hex(t))))
    assert(got(2L) == ((3, 0, md5hex(t))))
  }

  test("a doc that is ONE duplicated window empties to the md5 of \"\"") {
    val t = words("w", 4)
    val got = run(Seq((1L, t), (2L, t)), L = 4)
    assert(got(1L) == ((4, 4, md5hex(""))))
    assert(got(2L) == ((4, 4, md5hex(""))))
  }

  test("repetitive worst case: a long fully-duplicated doc (starts ≈ tokens) empties") {
    // 2,000 tokens of period-3 repetition: every window is a duplicate,
    // so the duplicate-start list is as long as the doc itself — the
    // shape where a per-token exists-over-starts rebuild is quadratic
    // and the interval-merge rebuild must stay linear (one merged span)
    val t = (1 to 2000).map(i => s"p${i % 3}").mkString(" ")
    val uniq = words("u", 9)
    val got = run(Seq((1L, t), (2L, uniq)), L = 8)
    assert(got(1L) == ((2000, 2000, md5hex(""))))
    assert(got(2L) == ((9, 0, md5hex(uniq))))
  }

  test("alternating duplicate/unique spans: every gap slice survives, every span is cut") {
    // dup-span, unique, dup-span, unique, dup-span — three disjoint
    // removal intervals per doc, exercising the multi-gap rebuild path
    val (d1, d2, d3) = (words("da", 4), words("db", 4), words("dc", 4))
    val (u1, u2) = (words("ua", 2), words("ub", 2))
    val a = s"$d1 $u1 $d2 $u2 $d3"
    val b = s"$d3 ${words("uc", 2)} $d1 ${words("ud", 2)} $d2"
    val got = run(Seq((1L, a), (2L, b)), L = 4)
    assert(got(1L) == ((16, 12, md5hex(s"$u1 $u2"))))
    assert(got(2L) == ((16, 12, md5hex(s"${words("uc", 2)} ${words("ud", 2)}"))))
  }

  test("property: random corpora match a brute-force per-token reference") {
    // the interval-merge rebuild must agree with the DEFINITION (token p
    // survives iff no duplicate window starts in (p-L, p]) on corpora
    // it didn't see coming: small alphabet => dense accidental repeats,
    // overlapping and nested duplicate spans, cross- and within-doc
    val rnd = new scala.util.Random(1234)
    val L = 3
    (1 to 5).foreach { trial =>
      val docs = (1 to 12).map { id =>
        val n = 5 + rnd.nextInt(40)
        (id.toLong, (1 to n).map(_ => "w" + rnd.nextInt(6)).mkString(" "))
      }
      val got = run(docs, L)
      // brute force: count every length-L window across the corpus,
      // then filter each doc's tokens by the definition
      val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
      val winCounts = toks.values.flatMap(ts => ts.sliding(L).filter(_.length == L))
        .toSeq.groupBy(identity).map { case (w, xs) => w -> xs.size }
      docs.foreach { case (id, _) =>
        val ts = toks(id)
        val dupStarts = (0 to ts.length - L).filter { i =>
          winCounts(ts.slice(i, i + L)) >= 2
        }.map(_ + 1).toSet // 1-based
        val kept = ts.zipWithIndex.collect {
          case (t, i) if !dupStarts.exists(st => st <= i + 1 && i + 1 < st + L) => t
        }
        val (nTok, nRem, dig) = got(id)
        assert(nTok == ts.length, s"trial $trial doc $id n_tokens")
        assert(nRem == ts.length - kept.length, s"trial $trial doc $id n_removed")
        assert(dig == md5hex(kept.mkString(" ")), s"trial $trial doc $id digest")
      }
    }
  }

  test("xxhash64 window digest produces the identical cleaned output") {
    val s = spark
    import s.implicits._
    val shared = words("dup", 4)
    val docs = Seq(
      (1L, s"${words("a", 3)} $shared ${words("z", 3)}"),
      (2L, s"${words("b", 5)} $shared"),
      (3L, words("c", 8))).toDF("doc_id", "text")
    val md5Out = Dedup.exactSubstringClean(docs, "doc_id", "text", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    val xxOut = Dedup.exactSubstringClean(docs, "doc_id", "text", 4, windowDigest = "xxhash64")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(xxOut == md5Out)
  }
}
