package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Viterbi unigram segmenter (q213's kernel): DP optimality against
  * exhaustive enumeration, the declared tie total-order, lossless
  * concatenation, unknown-character coverage, and interpreted ≡
  * codegen through the registered function. */
class UnigramSegmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def seg(vocab: Map[String, Long], unk: Long, word: String): Seq[String] = {
    val e = UnigramSegment(Literal(UTF8String.fromString(word),
        org.apache.spark.sql.types.StringType),
      vocab.keys.toSeq, vocab.keys.toSeq.map(vocab), unk)
    e.nullSafeEval(UTF8String.fromString(word))
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.asInstanceOf[UTF8String].toString).toSeq
  }

  /** All segmentations of `word` where every piece is in the vocab or
    * is a single (unk-priced) char; returns (cost, nPieces) per seg. */
  private def enumerate(vocab: Map[String, Long], unk: Long,
      word: String): Seq[(Seq[String], Long, Int)] = {
    if (word.isEmpty) return Seq((Nil, 0L, 0))
    (1 to word.length).flatMap { l =>
      val piece = word.take(l)
      val c = vocab.get(piece).orElse(if (l == 1) Some(unk) else None)
      c.toSeq.flatMap { pc =>
        enumerate(vocab, unk, word.drop(l)).map { case (rest, rc, rn) =>
          (piece +: rest, pc + rc, rn + 1)
        }
      }
    }
  }

  private val vocab = Map("a" -> 5L, "b" -> 5L, "c" -> 7L, "aa" -> 8L,
    "ab" -> 10L, "ba" -> 9L, "abc" -> 12L, "bca" -> 11L, "aab" -> 13L)
  private val unk = 100L

  test("DP reaches the exhaustive (cost, pieces) minimum on all short words") {
    val alphabet = "abc"
    val words = for {
      n <- 1 to 6
      i <- 0 until math.pow(3, n).toInt
    } yield (0 until n).map(k => alphabet((i / math.pow(3, k).toInt) % 3)).mkString
    words.foreach { w =>
      val got = seg(vocab, unk, w)
      val all = enumerate(vocab, unk, w)
      val best = all.map(s => (s._2, s._3)).min
      val gotCost = got.map(p => vocab.getOrElse(p, unk)).sum
      assert((gotCost, got.length) == best,
        s"$w: got $got (${(gotCost, got.length)}), best $best")
      assert(got.mkString == w, s"$w: not lossless")
    }
  }

  test("tie order: fewer pieces, then the longer final piece") {
    // "aaaa": a.a.a.a (20,4) vs aa.aa (16,2) -> cost wins outright
    assert(seg(vocab, unk, "aaaa") == Seq("aa", "aa"))
    // "aab": aa.b (13,2) and a.ab (15,2) and aab (13,1) -> aab
    assert(seg(vocab, unk, "aab") == Seq("aab"))
    // equal (cost, pieces), different final piece length:
    // v2: x.yz vs xy.z both cost 20, 2 pieces -> longer FINAL piece wins
    val v2 = Map("x" -> 10L, "z" -> 10L, "xy" -> 10L, "yz" -> 10L,
      "y" -> 99L)
    assert(seg(v2, unk, "xyz") == Seq("x", "yz"))
  }

  test("unknown characters segment at unk cost, never throw") {
    val got = seg(vocab, unk, "aqb")
    assert(got == Seq("a", "q", "b"))
    assert(seg(vocab, unk, "") == Nil)
  }

  test("non-BMP input: fallback pieces are whole code points, never surrogate halves") {
    val emoji = new String(Character.toChars(0x1F600)) // 2 UTF-16 chars
    // unknown astral char between known pieces: consumed as ONE piece
    val got = seg(vocab, unk, s"a${emoji}b")
    assert(got == Seq("a", emoji, "b"))
    assert(got.mkString == s"a${emoji}b", "not lossless")
    got.foreach { p =>
      assert(!(p.length == 1 && Character.isSurrogate(p.charAt(0))),
        s"lone surrogate half emitted: ${p.map(_.toInt)}")
    }
    // astral chars only, all-single-char vocab (maxLen == 1): each
    // code point is its own unk piece, still lossless
    val w2 = emoji + emoji
    val got2 = seg(Map("a" -> 1L), unk, w2)
    assert(got2 == Seq(emoji, emoji))
    // a vocab piece CONTAINING an astral char is matched whole
    val v3 = Map(s"a$emoji" -> 3L, "b" -> 5L)
    assert(seg(v3, unk, s"a${emoji}b") == Seq(s"a$emoji", "b"))
  }

  test("codegen path == interpreted path on the real corpus words") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val words = graft.operators.Tables.documents(spark, TestSpark.sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select("w").distinct().limit(200).as[String].collect()
    val pieces = vocab.keys.toArray
    val costs = pieces.map(vocab)
    val viaDf = words.toSeq.toDF("w")
      .withColumn("p", call_function("unigram_segment", col("w"),
        lit(pieces), lit(costs), lit(unk)))
      .as[(String, Seq[String])].collect().toMap
    words.foreach { w =>
      assert(viaDf(w) == seg(vocab, unk, w), w)
      assert(viaDf(w).mkString == w, s"$w: not lossless")
    }
  }

  test("q212: vocab counts match a driver-side substring recompute") {
    val texts = graft.operators.Tables.documents(spark, TestSpark.sf)
      .select(lower(col("text"))).collect().map(_.getString(0))
    val counts = new scala.collection.mutable.HashMap[String, Long]
    texts.foreach { t =>
      t.split("\\s+").filter(_.nonEmpty).foreach { w =>
        for (s <- 0 until w.length; l <- 1 to math.min(4, w.length - s))
          counts.updateWith(w.substring(s, s + l)) {
            c => Some(c.getOrElse(0L) + 1)
          }
      }
    }
    val top = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(500)
    val chars = counts.filter(_._1.length == 1).toSeq
    val want = (top ++ chars).distinct
      .map { case (p, n) => (p, n, p.length.toLong) }.toSet
    val got = graft.operators.TextAnalysis
      .qUnigramVocab(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("charCap over-cap path: coverage cut keeps the top chars only") {
    // crafted corpus: 40 distinct single-char words with strictly
    // decreasing counts (char i appears 100 - i times), charCap = 16 —
    // exactly the 16 most frequent characters survive the coverage
    // cut; the 24 dropped ones are the UNK tail (Kudo 2018
    // character_coverage). Uses case-stable BMP chars (the counter
    // lowercases) so substring = code point and counts don't fold.
    import spark.implicits._
    val alpha = ('a' to 'z') ++ ('0' to '9') ++ Seq('!', '#', '$', '%')
    val docs = alpha.zipWithIndex.map { case (c, i) =>
      (Seq.fill(100 - i)(c.toString).mkString(" "))
    }.toDF("text")
    val got = graft.operators.TextAnalysis
      .unigramPieceCounts(docs, maxLen = 4, vocabSize = 10, charCap = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val singles = got.filter(_._1.length == 1)
    // top-10 pieces are all single chars here too, so the union is
    // exactly the top-16 chars by (count desc, piece asc)
    val want = alpha.zipWithIndex.map { case (c, i) =>
      (c.toString, (100 - i).toLong)
    }.sortBy { case (p, n) => (-n, p) }.take(16).toSet
    assert(singles.toSet == want)
    assert(singles.length == 16)
    // under-cap corpora are untouched: cap larger than the alphabet
    val uncapped = graft.operators.TextAnalysis
      .unigramPieceCounts(docs, maxLen = 4, vocabSize = 10, charCap = 1 << 16)
      .collect().filter(_.getString(0).length == 1)
    assert(uncapped.length == alpha.length)
  }

  test("q213 end-to-end: fertility sane, pieces account for all words") {
    val rows = graft.operators.TextAnalysis
      .qUnigramSegment(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_words")
      val np = r.getAs[Long]("n_pieces")
      assert(np >= nw, "at least one piece per word")
      val fert = r.getAs[Long]("fertility_bp")
      assert(fert >= 10000 && fert < 100000, s"fertility $fert")
    }
  }
}
