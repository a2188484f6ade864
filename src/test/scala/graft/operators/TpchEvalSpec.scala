package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The round-16 batch (q226–q231: the remaining TPC-H join shapes and
  * the classifier-eval harness + Mann–Whitney) — driver-side
  * recomputation of each contract on the raw sf0.001 rows, so a
  * same-wrong-answer-on-both-engines bug can't hide behind the DuckDB
  * oracle. */
class TpchEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // raw relational rows for the recomputes (timestamps as epoch µs —
  // the session returns java.time values otherwise)
  private lazy val li: Seq[(Long, Long, Long, Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))"""),
        unix_micros(col("l_shipdate").cast("timestamp")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
  private lazy val ord: Map[Long, (Long, String, Long)] =
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        unix_micros(col("o_orderdate").cast("timestamp")))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2),
        r.getLong(3))).toMap
  private lazy val cust: Map[Long, Int] = Tables.customer(spark, sf)
    .select("c_custkey", "c_nationkey").collect()
    .map(r => r.getLong(0) -> r.getInt(1)).toMap
  private lazy val supp: Map[Long, (Int, String, Long)] =
    Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_nationkey"), col("s_name"),
        expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2), r.getLong(3)))
      .toMap
  private lazy val natName: Map[Int, String] = Tables.nation(spark, sf)
    .select("n_nationkey", "n_name").collect()
    .map(r => r.getInt(0) -> r.getString(1)).toMap
  private lazy val natRegion: Map[Int, Int] = Tables.nation(spark, sf)
    .select("n_nationkey", "n_regionkey").collect()
    .map(r => r.getInt(0) -> r.getInt(1)).toMap
  private lazy val regName: Map[Int, String] = Tables.region(spark, sf)
    .select("r_regionkey", "r_name").collect()
    .map(r => r.getInt(0) -> r.getString(1)).toMap

  test("q226: Q5 cycle join matches a nested-loop recompute") {
    val y96 = java.time.Instant.parse("1996-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val y97 = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val want = li.flatMap { case (ok, _, sk, rev, _) =>
      for {
        (ck, _, od) <- ord.get(ok)
        if od >= y96 && od < y97
        cNat <- cust.get(ck)
        (sNat, _, _) <- supp.get(sk)
        if cNat == sNat && regName(natRegion(sNat)) == "ASIA"
      } yield (natName(sNat), rev)
    }.groupBy(_._1).map { case (n, rs) => (n, rs.map(_._2).sum, rs.size.toLong) }
      .toSet
    val got = Relational.qLocalSupplierVolume(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q227: the rollup rewrite equals the literal EXISTS/NOT-EXISTS scan") {
    // literal double-correlated form, straight from Q21's definition
    val fLines = li.flatMap { case (ok, _, sk, _, ship) =>
      ord.get(ok).collect { case (_, "F", od) =>
        (ok, sk, ship > od + 60L * 86400000000L)
      }
    }
    val byOrder = fLines.groupBy(_._1)
    val waiting = fLines.filter(_._3).map(t => (t._1, t._2)).distinct
      .filter { case (ok, sk) =>
        val others = byOrder(ok).filter(_._2 != sk)
        others.exists(_ => true) && !others.exists(_._3)
      }
    val want = waiting.map { case (_, sk) =>
      (supp(sk)._2, natName(supp(sk)._1)) }
      .groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }
      .toSeq.sortBy(t => (-t._3, t._1)).take(20).toSet
    val got = Relational.qWaitingSuppliers(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q228: packed argmin equals the literal per-part min scan") {
    val eur = supp.filter { case (_, (nk, _, _)) =>
      regName(natRegion(nk)) == "EUROPE" }
    val pairs = li.map(t => (t._2, t._3)).distinct
      .filter(p => eur.contains(p._2))
    val want = pairs.groupBy(_._1).map { case (pk, ps) =>
      val (bk, bb) = ps.map { case (_, sk) => (sk, eur(sk)._3) }
        .minBy { case (sk, bal) => (bal, sk) } match {
          case (sk, bal) => (sk, bal)
        }
      (pk, bk, bb)
    }.toSeq.sortBy { case (pk, sk, bal) => (-bal, sk, pk) }.take(100).toSet
    val got = Relational.qMinCostSupplier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(6))).toSet
    assert(got == want)
    assert(got.size == math.min(100, pairs.map(_._1).distinct.size))
  }

  test("q229: doubled-rank U, tie term, and z match a sort-based recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val base = ev.filter(_._1 == "view").map(_._2)
    val got = Stats.qMannWhitney(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    for (arm <- Seq("click", "error", "signup", "purchase")) {
      val a = ev.filter(_._1 == arm).map(_._2)
      val all = (a.map((_, 1)) ++ base.map((_, 0))).sortBy(_._1)
      // doubled average rank per tie group, walked directly
      var i = 0; var r1d = 0L; var tie = 0L
      while (i < all.length) {
        var j = i
        while (j < all.length && all(j)._1 == all(i)._1) j += 1
        val cnt = (j - i).toLong
        val dr = 2L * i + cnt + 1 // 2·cum_before + cnt + 1
        r1d += all.slice(i, j).count(_._2 == 1) * dr
        tie += cnt * cnt * cnt - cnt
        i = j
      }
      val (n1, n2) = (a.length.toLong, base.length.toLong)
      val n = n1 + n2
      val twoU1 = r1d - n1 * (n1 + 1)
      val v12 = BigInt(n1) * BigInt(n2) *
        (BigInt(n + 1) * BigInt(n) * BigInt(n - 1) - BigInt(tie))
      val z = (twoU1 - n1 * n2).toDouble *
        math.sqrt(3.0 * n.toDouble * (n - 1).toDouble) /
        math.sqrt(v12.toDouble)
      val (gn1, gn2, gu1, gu2, gtie, gz) = got(arm)
      assert((gn1, gn2) == (n1, n2))
      assert(gu1 == twoU1, s"$arm two_u1")
      assert(gu2 == 2 * n1 * n2 - twoU1, s"$arm two_u2")
      assert(gtie == tie, s"$arm tie_term")
      assert(math.abs(gz - z) < 2e-6, s"$arm z: got $gz want ~$z")
    }
  }

  // the literal proxy score, mirrored with Spark's split semantics
  // (limit -1: trailing empty tokens are kept, exactly like
  // split(text, '\\s+') in the plan); (doc_id, score, is_pos)
  private lazy val scored: Seq[(Long, Long, Long)] =
    Tables.documents(spark, sf)
      .select("doc_id", "n_chars", "text").collect()
      .map { r =>
        val stops = Set("the", "a", "of", "and", "to", "in", "is", "it")
        val toks = r.getString(2).toLowerCase.split("\\s+", -1)
        val hits = toks.count(stops.contains).toLong
        val dhits = toks.distinct.count(stops.contains).toLong
        val score = toks.length.toLong * 100 + hits * 10 + dhits
        (r.getLong(0), score, if (r.getAs[Number]("n_chars").longValue >= 300) 1L else 0L)
      }

  test("q230: decile rates match a rank-walk recompute; rates are monotone-ish") {
    val n = scored.size.toLong
    val want = scored.sortBy(t => (t._2, t._1)).zipWithIndex
      .map { case ((_, sc, en), idx) => ((idx.toLong * 10) / n, sc, en) }
      .groupBy(_._1).map { case (dec, rows) =>
        val nd = rows.size.toLong
        (dec, nd, rows.map(_._3).sum, rows.map(_._3).sum * 1000000L / nd,
          rows.map(_._2).sum / nd, rows.map(_._2).min, rows.map(_._2).max)
      }.toSet
    val got = Stats.qCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
    // the top decile must be positive-richer than the bottom (the
    // score actually ranks the label)
    val byDec = got.map(t => t._1 -> t._4).toMap
    assert(byDec(byDec.keys.max) > byDec(byDec.keys.min))
  }

  test("q231: every operating point matches threshold-scan counts") {
    val n = scored.size.toLong
    val totalPos = scored.map(_._3).sum
    val got = Stats.qPrCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.map(_._1).toSet == (1L to 9L).toSet)
    got.foreach { case (k, thr, tp, fp, fn, pPpm, rPpm, f1) =>
      // threshold = smallest score with #(score ≥ t) ≥ max(k·n/10, 1)
      val rk = math.max(k * n / 10, 1L)
      val cands = scored.map(_._2).distinct.sorted(Ordering[Long].reverse)
        .filter(t => scored.count(_._2 >= t) >= rk)
      assert(thr == cands.head, s"k=$k threshold")
      val tpW = scored.count(s => s._2 >= thr && s._3 == 1).toLong
      val fpW = scored.count(s => s._2 >= thr && s._3 == 0).toLong
      assert((tp, fp, fn) == ((tpW, fpW, totalPos - tpW)), s"k=$k counts")
      assert(pPpm == tp * 1000000 / (tp + fp), s"k=$k precision")
      assert(rPpm == tp * 1000000 / math.max(totalPos, 1), s"k=$k recall")
      val f1W = if (pPpm + rPpm > 0) 2 * pPpm * rPpm / (pPpm + rPpm) else 0L
      assert(f1 == f1W, s"k=$k f1")
    }
  }

  test("q232: rank-identity AUC equals brute-force pair counting") {
    val pos = scored.filter(_._3 == 1L).map(_._2)
    val neg = scored.filter(_._3 == 0L).map(_._2)
    // 2U = 2·#(pos>neg) + #(pos==neg), straight from the definition
    var twoU = 0L
    for (p <- pos; q <- neg)
      twoU += (if (p > q) 2L else if (p == q) 1L else 0L)
    val aucPpm = (BigInt(twoU) * 1000000 /
      (BigInt(pos.size) * BigInt(neg.size) * 2)).toLong
    val r = Stats.qRocAuc(spark, sf).collect().head
    assert(r.getLong(0) == pos.size.toLong)
    assert(r.getLong(1) == neg.size.toLong)
    assert(r.getLong(2) == twoU, "two_u")
    assert(r.getLong(3) == aucPpm, "auc_ppm")
    assert(r.getLong(4) == 2 * aucPpm - 1000000L, "gini_ppm")
    // the score must actually rank the label (sanity, not tautology)
    assert(aucPpm > 500000L)
  }

  test("q233: Kruskal–Wallis group sums, tie term, and H match a rank walk") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = ev.sortBy(_._2)
    var i = 0; var tie = 0L
    val twoR = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    while (i < all.length) {
      var j = i
      while (j < all.length && all(j)._2 == all(i)._2) j += 1
      val cnt = (j - i).toLong
      val dr = 2L * i + cnt + 1
      all.slice(i, j).foreach { case (t, _) => twoR(t) += dr }
      tie += cnt * cnt * cnt - cnt
      i = j
    }
    val n = all.length.toLong
    val byType = ev.groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val ssum = byType.keys.map(t => twoR(t).toDouble * twoR(t).toDouble /
      byType(t).toDouble).sum
    val h = (ssum * 3.0 / (n.toDouble * (n + 1).toDouble) -
      3.0 * (n + 1).toDouble) /
      (1.0 - tie.toDouble /
        (n.toDouble * n.toDouble * n.toDouble - n.toDouble))
    val got = Stats.qKruskalWallis(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == byType.keySet)
    got.foreach { case (t, (ni, tr, gn, gtie, gh)) =>
      assert(ni == byType(t), s"$t n_i")
      assert(tr == twoR(t), s"$t two_r")
      assert(gn == n); assert(gtie == tie)
      assert(math.abs(gh - h) < 1e-5, s"H: got $gh want ~$h")
    }
  }

  test("q234: Welch t and df match a direct two-sample recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val base = ev.filter(_._1 == "view").map(_._2)
    val got = Stats.qWelchT(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    for (arm <- Seq("click", "error", "signup", "purchase")) {
      val a = ev.filter(_._1 == arm).map(_._2)
      def varOverN(xs: Seq[Long]): Double = {
        val n = xs.length.toDouble
        val s = xs.sum.toDouble
        val q = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
        (q - s * s / n) / (n - 1.0) / n
      }
      val (va, vb) = (varOverN(a), varOverN(base))
      val t = (a.sum.toDouble / a.length - base.sum.toDouble / base.length) /
        math.sqrt(va + vb)
      val df = (va + vb) * (va + vb) /
        (va * va / (a.length - 1.0) + vb * vb / (base.length - 1.0))
      val (n1, n2, s1, s2, gt, gdf) = got(arm)
      assert((n1, n2) == (a.length.toLong, base.length.toLong))
      assert((s1, s2) == (a.sum, base.sum))
      assert(math.abs(gt - t) < 2e-6, s"$arm t: got $gt want ~$t")
      assert(math.abs(gdf - df) < 2e-4, s"$arm df: got $gdf want ~$df")
    }
  }

  // quantity in centi-units per line, keyed like `li`
  private lazy val liQty: Seq[(Long, Long, Long, Long, Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("""CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))"""),
        unix_micros(col("l_shipdate").cast("timestamp")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

  test("q235: cross-multiplied small-qty predicate equals the float-avg scan") {
    val brandParts = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#1")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val slice = liQty.filter(t => brandParts.contains(t._2))
    val perPart = slice.groupBy(_._2).map { case (pk, xs) =>
      pk -> (xs.map(_._4).sum, xs.length.toLong) }
    // the literal Q17 predicate qty < (1/5)·avg, kept exact as a
    // BigInt rational so a boundary tie can't flap on float rounding
    val small = slice.filter { t =>
      val (sq, n) = perPart(t._2)
      BigInt(5) * t._4 * n < BigInt(sq)
    }
    val r = Relational.qSmallQtyRevenue(spark, sf).collect().head
    assert(r.getLong(0) == small.size.toLong, "n_small_lines")
    assert(r.getLong(1) == small.map(_._2).distinct.size.toLong, "n_parts")
    assert(r.getLong(2) == small.map(_._5).sum, "small_rev_x1e4")
    assert(small.nonEmpty)
  }

  test("q236: the k=0 bucket exists iff some customer has only urgent orders") {
    val prio = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nonUrgent = prio.filter(_._2 != "1-URGENT").groupBy(_._1)
      .map { case (k, v) => k -> v.size.toLong }
    val wantDist = cust.keys.toSeq.map(k => nonUrgent.getOrElse(k, 0L))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSet
    val got = Relational.qCustOrderDistribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == wantDist)
    assert(got.toSeq.map(_._2).sum == cust.size.toLong)
  }

  test("q237: above-mean filter matches the literal per-part value scan") {
    val pairs = li.map(t => (t._2, t._3)).distinct
      .filter(p => supp.contains(p._2))
    val value = pairs.groupBy(_._1).map { case (pk, ps) =>
      pk -> (ps.map(p => supp(p._2)._3).sum, ps.size.toLong) }
    val total = value.values.map(_._1).sum
    val nParts = value.size.toLong
    val want = value.filter { case (_, (v, _)) => v * nParts * 10 > total * 12 }
      .toSeq.sortBy { case (pk, (v, _)) => (-v, pk) }.take(100)
      .map { case (pk, (v, n)) => (pk, v, n) }.toSet
    val got = Relational.qImportantStock(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("q238: dormant high-balance set matches the literal subquery pair") {
    val bal = Tables.customer(spark, sf)
      .select(col("c_custkey"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val posBal = bal.values.filter(_ > 0)
    val cut = java.time.Instant.parse("2000-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val recent = ord.collect { case (_, (ck, _, od)) if od >= cut => ck }.toSet
    val want = bal.filter { case (ck, b) =>
      b * posBal.size > posBal.sum && !recent.contains(ck) }
      .keys.map(ck => natName(cust(ck)))
      .groupBy(identity).map { case (n, v) => (n, v.size.toLong) }.toSet
    val got = Relational.qDormantHighValue(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q239: eager-agg HAVING equals the literal IN-subquery form") {
    val perOrder = liQty.groupBy(_._1)
      .map { case (ok, xs) => ok -> xs.map(_._4).sum }
    val want = perOrder.filter(_._2 > 30000L).toSeq
      .sortBy { case (ok, q) => (-q, ok) }.take(100)
      .map { case (ok, q) => (ok, ord(ok)._1, q) }.toSet
    val got = Relational.qLargeVolumeCustomer(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(1), r.getLong(4))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q240: majority-shipper chain matches the literal nested scan") {
    val red = Tables.part(spark, sf)
      .filter(col("p_name").startsWith("red")).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val y97 = java.time.Instant.parse("1997-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val y98 = java.time.Instant.parse("1998-01-01T00:00:00Z")
      .toEpochMilli * 1000L
    val slice = liQty.filter(t => red.contains(t._2) &&
      t._6 >= y97 && t._6 < y98)
    val perPair = slice.groupBy(t => (t._2, t._3))
      .map { case (k, xs) => k -> xs.map(_._4).sum }
    val perPart = slice.groupBy(_._2).map { case (pk, xs) => pk -> xs.map(_._4).sum }
    val dominant = perPair.filter { case ((pk, _), q) => 2 * q > perPart(pk) }
    val want = dominant.toSeq.map { case ((_, sk), q) =>
      (natName(supp(sk)._1), sk, q) }
      .groupBy(_._1).map { case (n, xs) =>
        (n, xs.map(_._2).distinct.size.toLong,
          xs.size.toLong, xs.map(_._3).sum) }.toSet
    val got = Relational.qExcessShippers(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q243: floored-ppm chi-square matches a BigInt cell walk") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rMarg = docs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cMarg = docs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = docs.length.toLong
    val chi2 = cells.map { case ((l, s), o) =>
      val d = BigInt(o) * n - BigInt(rMarg(l)) * cMarg(s)
      (d * d * 1000000 / (BigInt(n) * rMarg(l) * cMarg(s))).toLong
    }.sum
    val r = Stats.qChiSquare(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == cells.size.toLong)
    assert(r.getLong(2) == (rMarg.size - 1).toLong * (cMarg.size - 1))
    assert(r.getLong(3) == chi2, "chi2_ppm")
    // a floored-ppm sum can undershoot the real χ²·10⁶ by at most
    // one ppm per cell — pin the bracket against a float recompute
    val real = cells.map { case ((l, s), o) =>
      val e = rMarg(l).toDouble * cMarg(s) / n
      (o - e) * (o - e) / e
    }.sum * 1e6
    assert(chi2 <= real + 1e-3 && chi2 > real - cells.size - 1e-3)
  }

  test("q244: ANOVA F matches the textbook SSB/SSW recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = ev.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val n = ev.length.toDouble
    val k = groups.size.toDouble
    val grand = ev.map(_._2).sum.toDouble / n
    val ssb = groups.values.map { xs =>
      val m = xs.sum.toDouble / xs.length
      xs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { xs =>
      val m = xs.sum.toDouble / xs.length
      xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val got = Stats.qAnovaF(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == groups.keySet)
    got.foreach { case (t, (ni, si, gn, gk, gf)) =>
      assert(ni == groups(t).length.toLong)
      assert(si == groups(t).sum)
      assert(gn == ev.length.toLong); assert(gk == groups.size.toLong)
      assert(math.abs(gf - f) < 1e-4, s"F: got $gf want ~$f")
    }
  }

  test("q273: Cohen's d / Hedges' g match the textbook pooled recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val view = ev.filter(_._1 == "view").map(_._2)
    val got = Stats.qCohensD(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == Set("click", "error", "signup", "purchase"))
    got.foreach { case (arm, (n1, n2, s1, s2, dEff, g)) =>
      val a = ev.filter(_._1 == arm).map(_._2)
      assert(n1 == a.length.toLong && n2 == view.length.toLong)
      assert(s1 == a.sum && s2 == view.sum)
      val m1 = a.sum.toDouble / a.length; val m2 = view.sum.toDouble / view.length
      val ss1 = a.map(x => (x - m1) * (x - m1)).sum
      val ss2 = view.map(x => (x - m2) * (x - m2)).sum
      val sp = math.sqrt((ss1 + ss2) / (a.length + view.length - 2))
      val d = (m1 - m2) / sp
      val hedges = 1.0 - 3.0 / (4.0 * (a.length + view.length) - 9.0)
      assert(math.abs(dEff - d) < 1e-5, s"$arm d: $dEff vs $d")
      assert(math.abs(g - d * hedges) < 1e-5, s"$arm g")
      assert(math.abs(g) <= math.abs(dEff), s"$arm correction shrinks |d|")
    }
  }

  test("q246: Cramér's V derives from the exact chi2_ppm and min dim") {
    val docs = Tables.documents(spark, sf)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rMarg = docs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cMarg = docs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val n = docs.length.toLong
    val chi2 = cells.map { case ((l, s), o) =>
      val d = BigInt(o) * n - BigInt(rMarg(l)) * cMarg(s)
      (d * d * 1000000 / (BigInt(n) * rMarg(l) * cMarg(s))).toLong
    }.sum
    val m = math.min(rMarg.size - 1, cMarg.size - 1).toLong
    val v = math.sqrt(chi2.toDouble / 1e6 / (n.toDouble * m.toDouble))
    val r = Stats.qCramersV(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == chi2, "chi2_ppm")
    assert(r.getLong(2) == m, "min_dim")
    assert(math.abs(r.getDouble(3) - v) < 1e-5, s"V: ${r.getDouble(3)} vs $v")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  test("q247: kappa matches the exact-rational recompute of pred-vs-lang") {
    import graft.functions.{StopwordsEn, StopwordsEs, StopwordsFr}
    val docs = Tables.documents(spark, sf)
      .select("text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def pred(text: String): String = {
      val toks = text.toLowerCase.split("\\s+").distinct.toSet
      val en = StopwordsEn.count(toks); val es = StopwordsEs.count(toks)
      val fr = StopwordsFr.count(toks)
      if (math.max(en, math.max(es, fr)) == 0) "und"
      else if (en >= es && en >= fr) "en"
      else if (es >= fr) "es" else "fr"
    }
    val pairs = docs.map { case (t, l) => (pred(t), l) }
    val n = pairs.length.toLong
    val agree = pairs.count { case (p, t) => p == t }.toLong
    val rm: Map[String, Long] =
      pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cm: Map[String, Long] =
      pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val peNum: BigInt = (rm.keySet ++ cm.keySet).toSeq.map { cls =>
      BigInt(rm.getOrElse(cls, 0L)) * BigInt(cm.getOrElse(cls, 0L))
    }.sum
    val kappa = (BigInt(n) * agree - peNum).toDouble /
      (BigInt(n) * n - peNum).toDouble
    val r = Stats.qCohenKappa(spark, sf).collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == agree, "n_agree")
    assert(r.getLong(2) == peNum.toLong, "pe_num")
    assert(r.getLong(3) == agree * 1000000L / n, "po_ppm")
    assert(r.getLong(4) == (peNum * 1000000 / (BigInt(n) * n)).toLong, "pe_ppm")
    assert(math.abs(r.getDouble(5) - kappa) < 1e-6, s"kappa ${r.getDouble(5)} vs $kappa")
  }

  test("q248: Brown–Forsythe W matches a sort-walk median + textbook F on deviations") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val groups = ev.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    val med = groups.map { case (t, xs) => t -> xs((xs.length + 1) / 2 - 1) }
    val devs = ev.map { case (t, v) => (t, math.abs(v - med(t))) }
    val dg = devs.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val n = ev.length.toDouble; val k = groups.size.toDouble
    val grand = devs.map(_._2).sum.toDouble / n
    val ssb = dg.values.map { xs =>
      val m = xs.sum.toDouble / xs.length
      xs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = dg.values.map { xs =>
      val m = xs.sum.toDouble / xs.length
      xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val w = (ssb / (k - 1)) / (ssw / (n - k))
    val got = Stats.qLevene(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    assert(got.keySet == groups.keySet)
    // all exact per-type statistics first, so a median-rule slip
    // reports as the median, not as a mysterious W drift
    got.foreach { case (t, (ni, mc, sad, gn, gk, _)) =>
      assert(ni == groups(t).length.toLong)
      assert(mc == med(t), s"$t median")
      assert(sad == dg(t).sum, s"$t sum_absdev")
      assert(gn == ev.length.toLong); assert(gk == groups.size.toLong)
    }
    got.values.foreach { case (_, _, _, _, _, gw) =>
      assert(math.abs(gw - w) < 1e-4, s"W: got $gw want ~$w")
    }
  }

  test("q249: per-lag CCF matches a direct Pearson over the daily rollup") {
    val ev = Tables.events(spark, sf)
      .select(expr("datediff(to_date(ts), date'1970-01-01')"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)))
    val daily = ev.groupBy(_._1).map { case (d, xs) =>
      d -> (xs.length.toLong, xs.map(_._2).sum)
    }
    val got = Stats.qCrossCorrelation(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    assert(got.keySet == (0 to 7).toSet)
    (0 to 7).foreach { lag =>
      val pairs = daily.keys.toSeq.flatMap { t =>
        daily.get(t - lag).map { case (_, yl) => (daily(t)._1, yl) }
      }
      val nd = pairs.length.toDouble
      val sa = pairs.map(_._1).sum; val sb = pairs.map(_._2).sum
      val sab = pairs.map(p => BigInt(p._1) * p._2).sum
      val saa = pairs.map(p => BigInt(p._1) * p._1).sum
      val sbb = pairs.map(p => BigInt(p._2) * p._2).sum
      val r = (nd * sab.toDouble - sa.toDouble * sb.toDouble) /
        math.sqrt((nd * saa.toDouble - sa.toDouble * sa.toDouble) *
          (nd * sbb.toDouble - sb.toDouble * sb.toDouble))
      val (gn, gsa, gsb, gr) = got(lag)
      assert(gn == pairs.length.toLong, s"lag $lag n_days")
      assert(gsa == sa, s"lag $lag sum_x"); assert(gsb == sb, s"lag $lag sum_y")
      assert(math.abs(gr - r) < 1e-5, s"lag $lag ccf: $gr vs $r")
    }
  }

  test("q250: MASE matches direct absolute-error sums at lags 1 and 7") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("datediff(to_date(ts), date'1970-01-01')"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong))
    val daily = ev.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val types = ev.map(_._1).distinct
    val got = Stats.qSeasonalError(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == types.toSet)
    types.foreach { t =>
      def errs(l: Long) = daily.keys.filter(_._1 == t).toSeq.flatMap {
        case (_, day) => daily.get((t, day - l)).map { yl =>
          math.abs(daily((t, day)) - yl)
        }
      }
      val e1 = errs(1); val e7 = errs(7)
      val mase = (e7.sum.toDouble / e7.length) / (e1.sum.toDouble / e1.length)
      val (n1, s1, n7, s7, gm) = got(t)
      assert(n1 == e1.length.toLong, s"$t n1"); assert(s1 == e1.sum, s"$t sae1")
      assert(n7 == e7.length.toLong, s"$t n7"); assert(s7 == e7.sum, s"$t sae7")
      assert(math.abs(gm - mase) < 1e-6, s"$t mase: $gm vs $mase")
    }
  }

  test("q252: subsample CI matches a driver-side md5-bit replication") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map { r =>
        md.reset()
        val hex = md.digest(r.getLong(1).toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        (r.getString(0), java.lang.Long.parseLong(hex.substring(0, 8), 16),
          r.getLong(2))
      }
    val byType = ev.groupBy(_._1)
    val got = Stats.qSubsampleCi(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      val reps = (0 until 32).map { b =>
        val in = rows.filter(r => ((r._2 >> b) & 1L) == 1L)
        (b, in.map(_._3).sum.toDouble / in.length)
      }.sortBy { case (b, m) => (m, b) }.map(_._2)
      val (n, sv, mean, lo, hi) = got(t)
      assert(n == rows.length.toLong); assert(sv == rows.map(_._3).sum)
      // operator output is round(·, 6): allow the half-ulp
      assert(math.abs(mean - sv.toDouble / n / 100.0) < 5.1e-7)
      assert(math.abs(lo - reps(1) / 100.0) < 5.1e-7, s"$t ci_lo")
      assert(math.abs(hi - reps(30) / 100.0) < 5.1e-7, s"$t ci_hi")
      assert(lo <= mean && mean <= hi, s"$t band should cover the mean")
    }
  }

  test("q255: JSD matrix matches a driver recompute; symmetric-bounded") {
    val docs = Tables.documents(spark, sf)
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val sources = docs.map(_._1).distinct.sorted
    val langs = docs.map(_._2).distinct
    val cnt = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tot = docs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    def jsd(sa: String, sb: String): Double = langs.map { l =>
      val p = cnt.getOrElse((sa, l), 0L).toDouble / tot(sa)
      val q = cnt.getOrElse((sb, l), 0L).toDouble / tot(sb)
      val m = (p + q) / 2.0
      (if (p > 0) p * math.log(p / m) else 0.0) +
        (if (q > 0) q * math.log(q / m) else 0.0)
    }.sum / 2.0
    val got = Stats.qJsDivergence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val wantPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield (sources(i), sources(j))
    assert(got.keySet == wantPairs.toSet)
    wantPairs.foreach { case (sa, sb) =>
      val (na, nb, g) = got((sa, sb))
      assert(na == tot(sa)); assert(nb == tot(sb))
      assert(math.abs(g - jsd(sa, sb)) < 1e-6, s"($sa,$sb): $g vs ${jsd(sa, sb)}")
      assert(g >= 0.0 && g <= math.log(2.0) + 1e-9, s"($sa,$sb) out of [0, ln2]")
    }
  }
}
