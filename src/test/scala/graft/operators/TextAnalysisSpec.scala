package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Value-level tests for the round-5 text operators: PII redaction
  * (q58) and repetition metrics (q59). The corpus-wide parity with
  * DuckDB is covered by the oracle gate; these pin exact behavior on
  * crafted inputs the synthetic corpus can't exercise (real dup
  * sentences, adjacent/multiple PII, non-PII lookalikes). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q126 bigram diversity: repeated transitions collapse the ratio") {
    import spark.implicits._
    // en: "x y x y" -> bigrams (x y, y x, x y): 3 total, 2 distinct
    // fr: "a b" -> 1/1; single-token doc contributes nothing
    val docs = Seq(
      ("en", "x y x y"), ("fr", "a b"), ("fr", "c")).toDF("lang", "text")
    val out = TextAnalysis.bigramDiversity(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("en") === ((3L, 2L, 0.6667)))
    assert(out("fr") === ((1L, 1L, 1.0)))
    assert(out.size === 2)
  }

  test("q127 lang segments: per-sentence votes, tie-break, und fallback") {
    import spark.implicits._
    val docs = Seq(
      // one sentence each of en/es/fr stopwords -> 3-way tie, 'en' by
      // language-code tie-break, mixed = 1 - 1/3
      (1L, "the of and is it. el la de y en. le et est un que"),
      // monolingual: two en sentences -> mixed 0
      (2L, "the of and. the is it"),
      // no stopword hits at all -> und
      (3L, "zzz qqq")).toDF("doc_id", "text")
    val out = TextAnalysis.langSegments(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === (("en", 3L, 0.6667)))
    assert(out(2L) === (("en", 1L, 0.0)))
    assert(out(3L) === (("und", 1L, 0.0)))
  }

  test("piiRedact replaces every occurrence of every class, in order") {
    import spark.implicits._
    val rows = Seq(
      ("mail a.b-c_9@sub.example.org and x@y.io twice", "mail [EMAIL] and [EMAIL] twice"),
      ("call +1-555-0042 or +44-020-7946", "call [PHONE] or [PHONE]"),
      ("host 192.168.0.1 gw 10.0.255.254", "host [IP] gw [IP]"),
      ("mixed bob@corp.net +1-555-1234 172.16.3.4 end", "mixed [EMAIL] [PHONE] [IP] end"),
      // non-PII lookalikes survive: bare words, version-ish dotted pair
      ("nothing here v1.2 at x dot y", "nothing here v1.2 at x dot y"),
      ("", ""))
    val got = rows.map(_._1).toDF("text")
      .select(TextAnalysis.piiRedact(col("text")).as("red"))
      .collect().map(_.getString(0))
    got.zip(rows.map(_._2)).foreach { case (g, want) => assert(g == want) }
  }

  test("q58 finds the injected PII and leaves none behind") {
    val r = TextAnalysis.qPiiRedact(spark, sf)
      .agg(sum("n_docs"), sum("n_emails"), sum("n_phones"), sum("n_ips"),
        sum("n_pii_left")).collect().head
    val nDocs = r.getLong(0)
    assert(r.getLong(1) > 0 && r.getLong(1) < nDocs) // doc_id % 3 != 0 subset
    assert(r.getLong(2) > 0 && r.getLong(2) < nDocs) // doc_id % 2 == 0 subset
    assert(r.getLong(3) == nDocs)                    // every doc gets an IP
    assert(r.getLong(4) == 0, "redacted text still matches a PII pattern")
  }

  test("tfidf: one top term per doc, positive score, deterministic tie-break") {
    val rows = TextAnalysis.qTfidf(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == total)
    assert(rows.map(_.getLong(0)).distinct.length == total)
    rows.foreach(r => assert(r.getDouble(2) > 0.0,
      s"non-positive tfidf for doc ${r.getLong(0)}"))
    // deterministic: re-running yields the identical assignment
    val again = TextAnalysis.qTfidf(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.getString(1)))
  }

  test("unigram NLL: rare-token docs score higher than common-token docs") {
    val scored = TextAnalysis.qUnigramNll(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.size == Tables.documents(spark, sf).count())
    assert(scored.values.forall(_ > 0.0))
    // the doc whose tokens are on average most frequent in the corpus
    // must not out-score the rarest-token doc (sanity of the direction)
    assert(scored.values.max > scored.values.min)
  }

  test("bigram NLL: exact MLE on a hand-computed corpus; word order matters") {
    import spark.implicits._
    // corpus bigrams: doc1 "a b a b" -> (a,b),(b,a),(a,b); doc2 "a b c" -> (a,b),(b,c)
    // counts: c2(a,b)=3 c2(b,a)=1 c2(b,c)=1; c1(a)=3 c1(b)=2
    // doc1 nll = -(ln(3/3)+ln(1/2)+ln(3/3))/3 = ln2/3; doc2 = -(ln(3/3)+ln(1/2))/2 = ln2/2
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramNll(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) === ((3L, math.rint(math.log(2) / 3 * 1e4) / 1e4)))
    assert(out(2L) === ((2L, math.rint(math.log(2) / 2 * 1e4) / 1e4)))
    // order sensitivity: same bag of words, scrambled order -> rarer
    // transitions -> higher NLL than the in-order original
    val base = (1 to 20).map(i => (i.toLong, "the quick brown fox jumps"))
    val scrambled = base :+ (99L, "fox the jumps quick brown")
    val nll = TextAnalysis.bigramNll(scrambled.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nll(99L) > nll(1L))
  }

  test("corpus stats: language entropy is 0 monolingual, ln 2 at an even two-lang split") {
    import spark.implicits._
    val docs = Seq(
      ("mono", "en", "one two three"),
      ("mono", "en", "four five"),
      ("split", "en", "alpha beta"),
      ("split", "es", "gamma delta")).toDF("source", "lang", "text")
    val out = TextAnalysis.corpusStats(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("lang_entropy")).toMap
    assert(out("mono") === 0.0)
    assert(out("split") === math.rint(math.log(2) * 1e4) / 1e4)
  }

  test("oov rate: tokens outside the truncated vocabulary are counted per source") {
    import spark.implicits._
    // vocab limit 2 keeps the two most frequent tokens ("aa" x3, "bb" x2);
    // "zz" and "yy" fall outside -> srcB has 2 OOV of 4 tokens
    val docs = Seq(
      ("srcA", "aa aa bb"),
      ("srcB", "aa bb zz yy")).toDF("source", "text")
      .withColumn("doc_id", monotonically_increasing_id())
    val tmp = java.nio.file.Files.createTempDirectory("oov-test").toString
    docs.select(col("doc_id"), col("text"), lit("en").as("lang"), col("source"),
      length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = TextAnalysis.qOovRate(spark, tmp, vocabSize = 2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("srcA") === ((3L, 0L)))
    assert(out("srcB") === ((4L, 2L)))
  }

  test("repetition metrics move on genuinely repetitive text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b. a b. c d."),         // sents [a b, a b, c d.]: dup 1-2/3
      (2L, "spam spam spam spam"),    // one sentence; top gram 3/3
      (3L, "all distinct words here") // no repetition at all
    ).toDF("id", "txt")
    val m = TextAnalysis.repetitionMetrics(docs, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(1L)._1 == 3 && math.abs(m(1L)._2 - 0.3333) < 1e-9)
    // grams of doc1: "a b.","b. a","a b.","b. c","c d." → top 2/5
    assert(math.abs(m(1L)._3 - 0.4) < 1e-9)
    assert(m(2L)._2 == 0.0 && math.abs(m(2L)._3 - 1.0) < 1e-9)
    assert(m(3L)._2 == 0.0 && math.abs(m(3L)._3 - (1.0 / 3.0)) < 1e-4)
  }

  test("novelty (q90): first occurrence credits the earliest doc; dups score zero") {
    import spark.implicits._
    def w(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i").mkString(" ")
    val fresh = w("a", 5)                        // 3 distinct 3-gram windows
    val docs = Seq(
      (1L, fresh),                               // introduces everything: 1.0
      (2L, fresh),                               // verbatim dup of doc 1: 0.0
      (3L, s"$fresh ${w("z", 3)}"),              // 6 windows, 3 new: 0.5
      (4L, w("q", 2))                            // < n tokens: absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyScores(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((3L, 1.0)))
    assert(got(2L) == ((3L, 0.0)))
    assert(got(3L) == ((6L, 0.5)))
    assert(!got.contains(4L), "a doc below the window size has no novelty row")
    // repeated windows inside one doc count once (distinct per doc)
    val rep = Seq((1L, s"$fresh $fresh")).toDF("doc_id", "text")
    val r1 = TextAnalysis.noveltyScores(rep, "doc_id", "text", n = 3)
      .head()
    // 10 tokens -> 8 windows, but the doubled text folds them to 5
    // distinct grams ({a1a2a3, a2a3a4, a3a4a5, a4a5a1, a5a1a2})
    assert(r1.getLong(1) == 5L && r1.getDouble(2) == 1.0)
  }

  test("q102: per-language tertiles are balanced and NLL-monotone") {
    val rows = TextAnalysis.qNllBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byLang = rows.groupBy(_._1)
    assert(byLang.size == 5) // en/de/es/fr/zh in the synthetic corpus
    for ((lang, bs) <- byLang) {
      val sorted = bs.sortBy(_._2)
      // exactly buckets 1..3, ntile-balanced (sizes differ by <= 1)
      assert(sorted.map(_._2).toSeq == Seq(1, 2, 3), s"$lang buckets")
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang sizes ${sizes.toSeq}")
      // the cut is a ranking: mean NLL is non-decreasing bucket to
      // bucket (round-2 means can tie) and strictly increases end to end
      val means = sorted.map(_._4)
      assert(means(0) <= means(1) && means(1) <= means(2), s"$lang means ${means.toSeq}")
      assert(means(0) < means(2), s"$lang head==tail: ${means.toSeq}")
    }
  }

  test("q109: curriculum shards are balanced with every language in every shard") {
    val rows = TextAnalysis.qCurriculumShards(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.map(_._1).sorted.toSeq == (0 until 8))
    assert(rows.map(_._2).sum == 500)
    // round-robin per language: shard sizes differ by at most one doc
    // per language (5 langs in the synthetic corpus)
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 5, s"sizes ${sizes.toSeq}")
    // every shard sees every language
    assert(rows.forall(_._4 == 5), s"langs ${rows.map(_._4).toSeq}")
    // the deal balances difficulty: the spread of shard-mean NLL is far
    // inside the corpus-wide NLL spread
    val means = rows.map(_._3)
    val corpus = TextAnalysis.qUnigramNll(spark, sf).collect().map(_.getDouble(2))
    val corpusSpread = corpus.max - corpus.min
    assert(means.max - means.min <= 0.2 * corpusSpread,
      s"shard-mean spread ${means.max - means.min} vs corpus $corpusSpread")
  }

  private def docTokens(): Array[(Long, String, Array[String])] =
    Tables.documents(spark, sf).select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\s+").filter(_.nonEmpty)))

  test("q112 BM25 matches a driver-side brute force, same formula and tie-break") {
    val (k1, b) = (1.2, 0.75)
    val query = Seq("stream", "join", "window")
    val docs = docTokens()
    val dl = docs.map { case (id, _, ts) => id -> ts.length.toLong }.toMap
    val n = dl.size
    val avgdl = dl.values.sum.toDouble / n
    val df = query.map(t => t -> docs.count(_._3.contains(t)).toLong).toMap
    val scores = docs.flatMap { case (id, _, ts) =>
      val s = query.map { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) * (tf * (k1 + 1)) /
          (tf + k1 * ((1 - b) + b * dl(id) / avgdl))
      }.sum
      if (s > 0) Some(id -> s) else None
    }
    val expect = scores.sortBy { case (id, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, s), i) => (i + 1, id, math.rint(s * 1e4) / 1e4) }
    val got = TextAnalysis.qBm25(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(got.toSeq == expect.toSeq)
  }

  test("q113 stopword strip matches a driver-side df filter, order preserved") {
    val docs = docTokens()
    val n = docs.length
    val df = docs.flatMap(_._3.distinct).groupBy(identity).map { case (t, xs) => t -> xs.length }
    val common = df.filter { case (_, c) => c >= 0.8 * n }.keySet
    assert(common.nonEmpty, "the corpus must actually have ubiquitous terms")
    val expect = docs.map { case (id, _, ts) =>
      val kept = ts.filterNot(common)
      id -> ((ts.length, kept.length, kept.mkString(" ")))
    }.toMap
    val got = TextAnalysis.qStopwordStrip(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got == expect)
    // the strip must remove something somewhere but never everything everywhere
    assert(got.values.exists { case (nt, nk, _) => nk < nt })
    assert(got.values.exists { case (_, nk, _) => nk > 0 })
  }

  test("q114 importance weights match a driver-side smoothed log-ratio; target source scores high") {
    val target = "src0"
    val docs = docTokens()
    val all = docs.flatMap(_._3)
    val cAll = all.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val cTgt = docs.filter(_._2 == target).flatMap(_._3)
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val (totAll, totTgt, v) = (all.length.toLong,
      docs.filter(_._2 == target).map(_._3.length).sum.toLong, cAll.size.toLong)
    val expect = docs.map { case (id, _, ts) =>
      val w = ts.map { t =>
        math.log(((cTgt.getOrElse(t, 0L) + 1).toDouble / (totTgt + v)) /
          ((cAll(t) + 1).toDouble / (totAll + v)))
      }.sum / ts.length
      id -> math.rint(w * 1e4) / 1e4
    }.toMap
    val got = TextAnalysis.qImportanceWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == expect.keySet)
    for ((id, w) <- expect)
      assert(math.abs(got(id) - w) <= 1e-4 + 1e-9, s"doc $id: ${got(id)} vs $w")
    // documents FROM the target source must, on average, "sound like" it
    val bySource = docs.map { case (id, src, _) => src -> got(id) }
    val tgtMean = bySource.filter(_._1 == target).map(_._2).sum /
      bySource.count(_._1 == target)
    val restMean = bySource.filterNot(_._1 == target).map(_._2).sum /
      bySource.count(_._1 != target)
    assert(tgtMean > restMean,
      s"target-source mean $tgtMean must exceed non-target mean $restMean")
  }

  test("q117 Gopher rules match a driver-side re-derivation; the gate discriminates") {
    val gopherStops = Set("the", "a")
    val expect = docTokens().map { case (id, _, ts) =>
      val nW = ts.length
      val meanLen = ts.map(_.length).sum.toDouble / nW
      val symR = ts.count(t => t.contains("#") || t.contains("...")).toDouble / nW
      val alphaR = ts.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / nW
      val nStops = ts.distinct.count(gopherStops)
      id -> ((nW, nW >= 20 && nW <= 100000, meanLen >= 3.0 && meanLen <= 10.0,
        symR <= 0.1, alphaR >= 0.9, nStops >= 2))
    }.toMap
    val got = TextAnalysis.qGopherRules(spark, sf, requiredWords = Seq("the", "a"))
      .collect().map { r =>
      r.getLong(0) -> ((r.getInt(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
    }.toMap
    assert(got.keySet == expect.keySet)
    for ((id, (nW, rw, rm, rs, ra, rst)) <- expect) {
      val (gnW, grw, grm, grs, gra, grst, gpass) = got(id)
      assert(gnW == nW, s"doc $id words")
      assert((grw, grm, grs, gra, grst) == ((rw, rm, rs, ra, rst)), s"doc $id rules")
      assert(gpass == (rw && rm && rs && ra && rst), s"doc $id pass")
    }
    // the gate must actually separate: both outcomes occur, and at
    // least one failure comes from the stopword rule specifically
    val passes = got.values.map(_._7).toSeq
    assert(passes.contains(true) && passes.contains(false))
    assert(got.values.exists { case (_, rw, rm, rs, ra, rst, _) =>
      rw && rm && rs && ra && !rst })
  }

  test("q123 fertility matches a driver-side subword count per language") {
    val bpeRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).map { case (l, xs) =>
      val words = xs.map(_._2.split("\\s+", -1).length.toLong).sum
      val bpe = xs.map(t => bpeRe.findAllIn(t._2.toLowerCase).size.toLong).sum
      val chars = xs.map(_._2.length.toLong).sum
      l -> ((xs.length.toLong, words, bpe,
        bpe.toDouble / words, chars.toDouble / bpe))
    }
    val got = TextAnalysis.qFertility(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == expect.keySet)
    for ((l, (nd, w, bpe, fert, cpt)) <- expect) {
      val (gn, gw, gb, gf, gc) = got(l)
      assert((gn, gw, gb) == ((nd, w, bpe)), s"lang $l counts")
      assert(math.abs(gf - fert) <= 1e-6 && math.abs(gc - cpt) <= 1e-6, s"lang $l ratios")
      // a space-separated word costs at least one subword piece
      assert(gf >= 1.0)
    }
  }

  test("q124 char entropy matches a driver-side Shannon computation; crafted extremes bracket") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def entropy(text: String): (Long, Long, Double) = {
      val counts = text.toLowerCase.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val h = (math.log(n.toDouble) -
        counts.map(c => c * math.log(c.toDouble)).sum / n) / math.log(2.0)
      (n, counts.size.toLong, h)
    }
    val got = TextAnalysis.qCharEntropy(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == docs.map(_._1).toSet)
    for ((id, text) <- docs) {
      val (n, d2, h) = entropy(text)
      val (gn, gd, gh) = got(id)
      assert((gn, gd) == ((n, d2)), s"doc $id counts")
      assert(math.abs(gh - h) <= 1e-6, s"doc $id entropy $gh vs $h")
      // natural text sits strictly between degenerate and uniform
      assert(gh > 0.0 && gh <= math.log(gd.toDouble) / math.log(2.0) + 1e-9)
    }
    // crafted extremes through the same operator: a one-char doc has
    // zero entropy; a 64-distinct-char doc is exactly 6 bits
    import spark.implicits._
    val crafted = Seq((1L, "aaaaaaaa"),
      (2L, ('!' to '`').mkString)).toDF("doc_id", "text")
    val ch = TextAnalysis.charEntropy(crafted).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(math.abs(ch(1L)) < 1e-12)
    assert(math.abs(ch(2L) - 6.0) < 1e-9)
  }

  test("q261: LLR collocations match a driver-side G² recompute") {
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val w = t.toLowerCase.split("\\s+")
      if (w.length < 2) Seq.empty else w.sliding(2).map(p => (p(0), p(1)))
    }
    val bc = bigrams.groupBy(identity).map { case (b, g) => b -> g.length.toLong }
    val r = bc.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val c = bc.groupBy(_._1._2).map { case (w2, g) => w2 -> g.values.sum }
    val n = bc.values.sum
    def term(o: Long, rr: Long, cc: Long): Double =
      if (o > 0) o.toDouble * math.log(o.toDouble * n / (rr.toDouble * cc))
      else 0.0
    val want = bc.toSeq.filter(_._2 >= 5).map { case ((w1, w2), o11) =>
      val (r1, c1) = (r(w1), c(w2))
      val g2 = 2.0 * (term(o11, r1, c1) + term(r1 - o11, r1, n - c1) +
        term(c1 - o11, n - r1, c1) + term(n - r1 - c1 + o11, n - r1, n - c1))
      (w1, w2, o11, r1, c1, g2)
    }.sortBy { case (w1, w2, _, _, _, g2) => (-g2, w1, w2) }.take(20)
    val got = TextAnalysis.qCollocationLlr(spark, sf).collect()
    assert(got.length == math.min(20, want.length))
    got.zip(want).foreach { case (row, (w1, w2, o11, r1, c1, g2)) =>
      assert(row.getString(0) == w1 && row.getString(1) == w2,
        s"pair order: ${row.getString(0)} ${row.getString(1)} vs $w1 $w2")
      assert(row.getLong(2) == o11 && row.getLong(3) == r1 &&
        row.getLong(4) == c1 && row.getLong(5) == n)
      assert(math.abs(row.getDouble(6) - g2) < 1e-4, s"$w1 $w2 llr")
      assert(row.getDouble(6) >= -1e-9, "G² is nonnegative")
    }
  }

  test("q257: held-out NLL matches a driver-side split + add-1 LM") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Int = {
      md.reset()
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (Integer.parseInt(hex.substring(0, 4), 16) % 5)
    }
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = docs.flatMap { case (id, src, t) =>
      t.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(w => (id, src, bucket(id), w))
    }
    val train = toks.filter(_._3 != 0)
    val test = toks.filter(_._3 == 0)
    assert(test.nonEmpty && train.nonEmpty, "split produced both folds")
    val cnts = train.groupBy(_._4).map { case (w, v) => w -> v.length.toLong }
    val n = train.length.toLong
    val v = cnts.size.toLong
    val got = TextAnalysis.qHeldoutPerplexity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    val bySrc = test.groupBy(_._2)
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val oov = rows.count(r => !cnts.contains(r._4)).toLong
      val nll = rows.map { r =>
        -math.log((cnts.getOrElse(r._4, 0L).toDouble + 1.0) / (n + v).toDouble)
      }.sum / rows.length
      val (gd, gt, go, gp, gn) = got(src)
      assert(gd == rows.map(_._1).distinct.length.toLong, s"$src n_docs")
      assert(gt == rows.length.toLong, s"$src n_tokens")
      assert(go == oov, s"$src n_oov")
      assert(gp == oov * 1000000L / rows.length, s"$src oov_ppm")
      assert(math.abs(gn - nll) < 1e-6, s"$src nll: $gn vs $nll")
    }
  }
}
