package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Byte-level BPE (q375/q376) — exact-sequence verification against an
  * INDEPENDENT quadratic reference implementation written here (not
  * shared code), the GPT-2 byte<->unicode table against its published
  * anchors, the pre-tokenizer against hand-derived splits, and the
  * losslessness of the encode. */
class ByteBpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // --- independent reference: quadratic byte-BPE over a token list ---
  private def refByteToUnicode: Map[Int, String] = {
    val keep = (('!'.toInt to '~'.toInt) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (keep(b)) b -> b.toChar.toString
      else { val c = 256 + n; n += 1; b -> new String(Character.toChars(c)) }
    }.toMap
  }

  private def refSyms(tok: String): Vector[String] =
    tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => refByteToUnicode(b & 0xff)).toVector

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Quadratic reference learner: recount pairs from scratch each
    * round, argmax (count desc, pair asc in UTF-8 order), merge
    * left-to-right non-overlapping. */
  private def refLearn(tokens: Seq[(String, Long)], k: Int): Seq[(String, String)] = {
    var words = tokens.map { case (t, c) => (refSyms(t), c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (out.length < k && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts.update((a, b), counts.getOrElse((a, b), 0L) + c)
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy(identity)(Ordering.fromLessThan[((String, String), Long)] {
          case (((a1, b1), n1), ((a2, b2), n2)) =>
            if (n1 != n2) n1 > n2
            else if (a1 != a2) utf8Lt(a1, a2)
            else utf8Lt(b1, b2)
        })._1
        out += best
        words = words.map { case (syms, c) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              buf += (best._1 + best._2); i += 2
            } else { buf += syms(i); i += 1 }
          }
          (buf.result(), c)
        }
      }
    }
    out.toSeq
  }

  private def refEncode(tok: String, merges: Seq[(String, String)]): Vector[String] = {
    var syms = refSyms(tok)
    merges.foreach { case (a, b) =>
      val buf = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          buf += (a + b); i += 2
        } else { buf += syms(i); i += 1 }
      }
      syms = buf.result()
    }
    syms
  }

  test("byte<->unicode table matches the published GPT-2 anchors") {
    val t = Pipeline.ByteToUnicode
    assert(t.length == 256)
    assert(t.distinct.length == 256, "mapping must be a bijection")
    assert(t('A'.toInt) == "A" && t('z'.toInt) == "z" && t('!'.toInt) == "!")
    assert(t(' '.toInt) == "Ġ", "space must map to Ġ")
    assert(t('\n'.toInt) == "Ċ", "newline must map to Ċ")
    assert(t(0) == "Ā", "NUL must map to Ā (first shifted slot)")
    // every symbol is exactly one code point
    assert(t.forall(s => s.codePointCount(0, s.length) == 1))
  }

  test("GPT-2 pre-tokenizer splits match hand-derived expectations") {
    val re = Pipeline.Gpt2SplitPattern.r
    def split(s: String): Seq[String] = re.findAllIn(s).toSeq
    assert(split("Hello world's test") ==
      Seq("Hello", " world", "'s", " test"))
    assert(split("I'll pay $12.50!") ==
      Seq("I", "'ll", " pay", " $", "12", ".", "50", "!"))
    // trailing whitespace stays its own token; interior runs glue the
    // last space onto the following word
    assert(split("a  b ") == Seq("a", " ", " b", " "))
    assert(split("tab\tsep") == Seq("tab", "\t", "sep"))
  }

  test("learned merge sequence equals the independent reference exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cats sat"),
      (3L, "a mat, a cat!"),
      (4L, "cat cat cat the the")).toDF("doc_id", "text")
    val got = Pipeline.learnByteBpeMerges(docs, "text", 12)
      .map { case (_, a, b) => (a, b) }
    // reference pre-tokenization + frequency table, independently
    val re = Pipeline.Gpt2SplitPattern.r
    val toks = docs.collect().flatMap(r => re.findAllIn(r.getString(1)))
      .groupBy(identity).map { case (t, g) => (t, g.length.toLong) }.toSeq
    val want = refLearn(toks, 12)
    assert(got == want)
  }

  test("driver and distributed learners agree on the byte unit") {
    import spark.implicits._
    val docs = Seq((1L, "abab abab cdcd"), (2L, "abab cd"), (3L, "ée ée"))
      .toDF("doc_id", "text")
    val viaDriver = Pipeline.learnByteBpeMerges(docs, "text", 6)
    val viaDistributed = Pipeline.learnByteBpeMerges(docs, "text", 6,
      driverVocabCap = 0)
    assert(viaDriver == viaDistributed)
  }

  test("encode matches the reference and is lossless back to bytes") {
    import spark.implicits._
    val docs = Seq((1L, "hello hello world émojis naïve"),
      (2L, "hello world")).toDF("doc_id", "text")
    val merges = Pipeline.learnByteBpeMerges(docs, "text", 8)
    val plain = merges.map { case (_, a, b) => (a, b) }
    val toks = Seq("hello", " world", " émojis", " naïve")
    val enc = Pipeline.encodeByteBpe(toks.toDS(), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val inv = refByteToUnicode.map(_.swap)
    toks.foreach { t =>
      assert(enc(t) == refEncode(t, plain), s"token $t")
      // losslessness: mapped symbols decode back to the exact bytes
      val bytes = enc(t).flatMap(sym =>
        sym.codePoints().toArray.map(cp => inv(new String(Character.toChars(cp))).toByte))
      assert(bytes.toArray.sameElements(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8)), s"lossless $t")
    }
  }

  test("gate queries run on the fixture with sane shapes") {
    val m = Pipeline.qByteBpeMerges(spark, sf, numMerges = 10).collect()
    assert(m.length == 10)
    assert(m.map(_.getInt(0)).toSeq == (0 until 10))
    val e = Pipeline.qByteBpeEncode(spark, sf, numMerges = 10).collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      // merges only ever shrink the byte sequence
      assert(r.getLong(2) <= r.getLong(3),
        s"tokens ${r.getLong(2)} must be <= bytes ${r.getLong(3)}")
    }
  }
}
