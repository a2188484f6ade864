package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The greedy WordPiece segmenter (q241's kernel): MaxMatch equals a
  * brute-force reference walk, the word-level [UNK] rule, lossless
  * concatenation of non-UNK output, surrogate-pair safety, and
  * interpreted ≡ codegen through the registered function. */
class WordpieceSegmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def seg(vocab: Set[String], word: String): Seq[String] = {
    val e = WordpieceSegment(Literal(UTF8String.fromString(word),
      org.apache.spark.sql.types.StringType), vocab.toSeq)
    e.nullSafeEval(UTF8String.fromString(word))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  /** Straight-from-the-definition reference: at each position COMMIT
    * to the longest matching piece (## form when pos > 0) — greedy
    * MaxMatch never backtracks (the HuggingFace/BERT rule: a longest
    * match that strands the remainder still voids the word); None on
    * any failure. */
  private def ref(vocab: Set[String], word: String): Option[Seq[String]] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val hit = (word.length - pos to 1 by -1).iterator.map { l =>
        val raw = word.substring(pos, pos + l)
        (l, if (pos == 0) raw else "##" + raw)
      }.find(c => vocab.contains(c._2))
      hit match {
        case None => return None
        case Some((l, cand)) => out += cand; pos += l
      }
    }
    Some(out.result())
  }

  private val vocab = Set("un", "##aff", "##able", "##ffa", "a", "b",
    "##a", "##b", "ab", "##le", "x")

  test("greedy MaxMatch equals the reference over all short words") {
    val alphabet = "unafblex".toCharArray.distinct
    // every word of length ≤ 5 over the vocab's alphabet
    def words(n: Int): Iterator[String] =
      if (n == 0) Iterator("")
      else words(n - 1).flatMap(w => alphabet.iterator.map(c => w + c))
    (1 to 5).iterator.flatMap(words).foreach { w =>
      val got = seg(vocab, w)
      ref(vocab, w) match {
        case None => assert(got == Seq(WordpieceSegment.Unk), s"word '$w'")
        case Some(want) =>
          assert(got == want, s"word '$w'")
          // lossless concat: strip ## continuations and rebuild
          val rebuilt = got.head + got.tail.map(_.drop(2)).mkString
          assert(rebuilt == w, s"word '$w' concat")
      }
    }
  }

  test("greedy is longest-match-first, not fewest-pieces") {
    // "unaffable" -> un + ##aff + ##able is the canonical example;
    // "##ffa" is a decoy that a non-greedy search might prefer
    assert(seg(vocab, "unaffable") == Seq("un", "##aff", "##able"))
  }

  test("one uncovered position voids the whole word") {
    assert(seg(vocab, "abzle") == Seq(WordpieceSegment.Unk))
    assert(seg(vocab, "zab") == Seq(WordpieceSegment.Unk))
    // but full coverage segments fine around the same pieces
    assert(seg(vocab, "abable") == Seq("ab", "##able"))
  }

  test("empty word yields an empty piece array") {
    assert(seg(vocab, "") == Seq.empty)
  }

  test("surrogate pairs never split: fallback is UNK, not a torn half") {
    val gClef = new String(Character.toChars(0x1D11E)) // non-BMP
    // a vocab with only the torn halves must NOT match them
    val torn = Set(gClef.substring(0, 1), "##" + gClef.substring(1))
    assert(seg(torn, gClef) == Seq(WordpieceSegment.Unk))
    // a vocab holding the whole code point segments it
    assert(seg(Set(gClef, "##" + gClef), gClef + gClef) ==
      Seq(gClef, "##" + gClef))
  }

  test("interpreted == codegen through the registered function") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val words = Seq("unaffable", "abba", "xxxx", "zzz", "able", "ba")
    val lit = vocab.toSeq.sorted
    val viaPlan = words.toDF("w")
      .repartition(2)
      .withColumn("p", call_function("wordpiece_segment", col("w"),
        typedLit(lit)))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    words.foreach { w =>
      assert(viaPlan(w) == seg(vocab, w).toList, s"word '$w'")
    }
  }
}
