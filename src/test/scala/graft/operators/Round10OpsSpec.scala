package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 surface: PassJoin candidate completeness, the weighted
  * inversion-count expression, the Levenshtein threshold clamp, the
  * pinned JaroWinkler non-ASCII divergence, and the q103c/d/e split
  * consistency. The q274/q276/q277/q278 RESULT contracts are already
  * pinned by Round9OpsSpec's brute-force recomputations — those specs
  * now verify the r10 scale-shape rewrites produce identical output. */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def lev(a: String, b: String): Int = {
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

  test("passJoinCandidates is COMPLETE for ed <= tau (random strings, incl. short/empty)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // tiny alphabet + mixed lengths (0..12) force plenty of true pairs
    // and exercise the empty-segment path (len < tau+1); the second
    // population adds longer strings over a wider alphabet (multi-char
    // segments, word-like shapes) so both segment-size regimes run
    val names = (Seq("", "a", "ab") ++ (1 to 80).map { _ =>
      val n = rnd.nextInt(13)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    } ++ (1 to 60).map { _ =>
      val n = 10 + rnd.nextInt(26)
      (1 to n).map(i => if (i % 6 == 5) ' ' else ('a' + rnd.nextInt(8)).toChar)
        .mkString
    }).distinct
    for (tau <- Seq(1, 2, 4)) {
      val want = (for {
        Seq(x, y) <- names.sorted.combinations(2)
        if lev(x, y) <= tau
      } yield (x, y)).toSet
      val dict = names.toDF("name")
      val got = Dedup.passJoinCandidates(dict, tau).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val missing = want -- got
      assert(missing.isEmpty,
        s"tau=$tau: PassJoin lost true pairs: ${missing.take(5)}")
      // self-pairs must be present (distance-0 record pairs are real output)
      names.foreach(n => assert(got.contains((n, n)), s"self-pair lost: '$n'"))
    }
  }

  test("q274/q280 dictionary rewrite: identical pair sets to the naive brand-blocked join") {
    // the r9 -> r10 contract: same answer, different (scalable) plan
    val parts = Tables.part(spark, sf).select("p_brand", "p_partkey", "p_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def jw(a: String, b: String): Double = graft.functions.JaroWinklerExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val wantJw = (for {
      (brand, group) <- parts.groupBy(_._1).toSeq
      Array((_, ka, na), (_, kb, nb)) <- group.sortBy(_._2).combinations(2)
      if jw(na, nb) >= 0.9
    } yield (brand, ka, kb)).toSet
    val gotJw = Dedup.qJaroWinklerPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotJw == wantJw && gotJw.nonEmpty)
  }

  test("jaroWinklerDictMatches prefix filter is COMPLETE (random strings vs brute force)") {
    import spark.implicits._
    def jw(a: String, b: String): Double = graft.functions.JaroWinklerExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    val rnd = new scala.util.Random(11)
    // word-like strings over a small alphabet: plenty of jw >= 0.9
    // pairs, repeated chars (multiset occurrence tokens), short tails
    val names = (Seq("a", "ab", "aa bb") ++ (1 to 120).map { _ =>
      val n = 4 + rnd.nextInt(16)
      (1 to n).map(i => if (i % 5 == 4) ' ' else ('a' + rnd.nextInt(5)).toChar)
        .mkString
    }).distinct
    for (t <- Seq(0.9, 0.85)) {
      val want = (for {
        x <- names; y <- names if x <= y && jw(x, y) >= t
      } yield (x, y)).toSet
      val got = Dedup.jaroWinklerDictMatches(names.toDF("name"), t).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val missing = want -- got
      assert(missing.isEmpty, s"t=$t: prefix filter lost pairs: ${missing.take(5)}")
      assert(got == want, s"t=$t: extra pairs: ${(got -- want).take(5)}")
    }
  }

  test("pair_inversions: weighted merge count equals brute-force discordant pairs") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    // grouped value-domain form: distinct (x, y) with multiplicities
    val groups = (1 to 60).map(_ =>
      (rnd.nextInt(5).toLong, rnd.nextInt(8).toLong, (1 + rnd.nextInt(4)).toLong))
      .groupBy(t => (t._1, t._2))
      .map { case ((x, y), g) => (x, y, g.map(_._3).sum) }.toSeq
    // brute force over the EXPANDED multiset (indexed — combinations()
    // would dedupe equal elements and drop multiplicities)
    val items = groups.flatMap { case (x, y, c) => Seq.fill(c.toInt)((x, y)) }
    val want = (for {
      i <- items.indices; j <- (i + 1) until items.size
      (xa, ya) = items(i); (xb, yb) = items(j)
      s = math.signum(xa.compare(xb)) * math.signum(ya.compare(yb))
      if s < 0
    } yield 1L).sum
    val got = groups.toDF("x", "y", "c")
      .agg(expr("pair_inversions(collect_list(struct(x, y, c)))"))
      .head().getLong(0)
    assert(got == want && want > 0)
    // edge cases: empty, singleton, all-tied
    assert(Seq((1L, 1L, 5L)).toDF("x", "y", "c")
      .agg(expr("pair_inversions(collect_list(struct(x, y, c)))"))
      .head().getLong(0) == 0L)
  }

  test("levenshtein_within: a huge maxDist degrades to plain levenshtein (no overflow)") {
    import spark.implicits._
    val df = Seq(("kitten", "sitting"), ("abc", "xyz"), ("", "abcd"))
      .toDF("a", "b")
    graft.functions.GraftFunctions.register(spark)
    val got = df.selectExpr("levenshtein_within(a, b, 2147483647) AS d")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(3, 3, 4))
  }

  test("jaro_winkler walks chars: pinned non-ASCII case (documented DuckDB byte-walk divergence)") {
    // char-walk: café/cafe -> m=3, t=0, jaro=(3/4+3/4+1)/3, prefix 3
    val j = (3.0 / 4 + 3.0 / 4 + 1.0) / 3.0
    val want = j + 3 * 0.1 * (1.0 - j)
    val got = graft.functions.JaroWinklerExpr.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("café"),
      org.apache.spark.unsafe.types.UTF8String.fromString("cafe"))
    assert(math.abs(got - want) < 1e-12)
    // the byte-walk value (what DuckDB computes: 5 bytes vs 4) differs —
    // the divergence this spec makes visible
    val byteJaro = (3.0 / 5 + 3.0 / 4 + 1.0) / 3.0
    assert(math.abs(got - (byteJaro + 3 * 0.1 * (1.0 - byteJaro))) > 1e-3)
  }

  test("q283: golden records match a driver-side union-find + survivorship walk") {
    val parts = Tables.part(spark, sf)
      .select("p_partkey", "p_brand", "p_name", "p_retailprice")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        BigDecimal(r.getDouble(3)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    // union-find over ed<=1 pairs within brand
    val parent = scala.collection.mutable.Map(parts.map(p => p._1 -> p._1): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb))
        parent(hi) = lo }
    }
    for {
      (brand, g) <- parts.groupBy(_._2)
      Array(a, b) <- g.combinations(2)
      if lev(a._3, b._3) <= 1
    } union(a._1, b._1)
    val clusters = parts.groupBy(p => find(p._1)).filter(_._2.length > 1)
    val want = clusters.map { case (cl, recs) =>
      val modeName = recs.groupBy(_._3).map { case (n, g) => (n, g.length) }
        .toSeq.sortBy { case (n, c) => (-c, n) }.head._1
      (cl, recs.length.toLong, recs.map(_._3).distinct.length.toLong,
        recs.map(_._1).min, recs.map(_._4).max - recs.map(_._4).min, modeName)
    }.toSet
    val got = Dedup.qGoldenRecord(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q284: per-week Kendall counts match a brute-force pair walk") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
      .collect().map { r =>
        val day = r.get(1) match {
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case dt: java.time.LocalDateTime => dt.toLocalDate
          case d: java.sql.Date => d.toLocalDate
        }
        (r.getLong(0), day)
      }.toMap
    val d0 = ord.values.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val rev = li.groupBy { case (ok, pk, _) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, ord(ok)) / 7, pk)
    }.map { case (k, g) => k -> g.map(_._3).sum }
    val paired = rev.flatMap { case ((w, pk), x) =>
      rev.get((w + 1, pk)).map(y => (w, x, y)) }.toSeq
    val gotRows = Stats.qRankStability(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    val byWeek = paired.groupBy(_._1)
    assert(gotRows.keySet == byWeek.keySet && gotRows.nonEmpty)
    byWeek.foreach { case (w, items) =>
      var conc = 0L; var disc = 0L; var tx = 0L; var ty = 0L; var txy = 0L
      for { i <- items.indices; j <- (i + 1) until items.size } {
        val (_, xa, ya) = items(i); val (_, xb, yb) = items(j)
        val s = math.signum(xa.compare(xb)) * math.signum(ya.compare(yb))
        if (s > 0) conc += 1 else if (s < 0) disc += 1
        else if (xa == xb && ya == yb) txy += 1
        else if (xa == xb) tx += 1 else ty += 1
      }
      assert(gotRows(w) == ((items.size.toLong, conc, disc, tx, ty, txy)),
        s"week $w mismatch")
    }
  }

  test("q103c/d/e: the single-column split projects q103a exactly") {
    val a = Dedup.qSoftDedupCounts(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val c = Dedup.qSoftDedupNDocs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = Dedup.qSoftDedupNInClusters(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = Dedup.qSoftDedupNComponents(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.nonEmpty && c.keySet == a.keySet && d.keySet == a.keySet &&
      e.keySet == a.keySet)
    a.foreach { case (src, (nd, nc, ncomp)) =>
      assert(c(src) == nd && d(src) == nc && e(src) == ncomp)
    }
  }
}
