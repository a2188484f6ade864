package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q274–q279 (blocked edit-distance pairs, Benford audit, interval
  * concurrency sweep, decile lift, Kendall τ-b, runs test) —
  * driver-side recomputation of each contract on raw fixture data, so
  * a same-wrong-answer-on-both-engines bug can't hide behind the
  * DuckDB oracle. */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def cents(d: Double): Long =
    new java.math.BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("q274: pairs match a classic DP Levenshtein recomputation") {
    def lev(a: String, b: String): Int = {
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
    val parts = Tables.part(spark, sf).select("p_brand", "p_partkey", "p_name")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val want = (for {
      (brand, group) <- parts.groupBy(_._1).toSeq
      Array((_, ka, na), (_, kb, nb)) <- group.sortBy(_._2).combinations(2)
      if math.abs(na.length - nb.length) <= 4
      d = lev(na, nb) if d <= 4
    } yield (brand, ka, kb, d.toLong)).toSet
    val got = Dedup.qEditDistancePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q275: digit counts match a driver-side first-digit tally; Benford freqs") {
    val prices = Tables.lineitem(spark, sf).select("l_extendedprice")
      .collect().map(r => cents(r.getDouble(0)))
    val tally = prices.map(_.toString.head.asDigit).filter(d => d >= 1 && d <= 9)
      .groupBy(identity).map { case (d, g) => (d, g.size.toLong) }
    val total = tally.values.sum.toDouble
    val got = Stats.qBenfordAudit(spark, sf).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == tally.keySet)
    tally.foreach { case (d, n) =>
      val (nObs, obsF, expF) = got(d)
      assert(nObs == n && obsF == n / total)
      assert(math.abs(expF - math.log10(1.0 + 1.0 / d)) < 1e-12)
    }
    // a natural money column should not be wildly off Benford: the
    // modal digit must be a low digit, not 8/9
    val modal = tally.maxBy(_._2)._1
    assert(modal <= 4, s"modal first digit $modal — degenerate fixture?")
  }

  test("q276: concurrency histogram matches a driver-side sweep") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // sessionize at 30 min, per user
    val iv = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val ts = rows.map(_._2).sorted
      val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (s0, e0) = (ts.head, ts.head)
      ts.tail.foreach { t =>
        if (t - e0 >= 30L * 60 * 1000000) { sessions += ((s0, e0)); s0 = t }
        e0 = t
      }
      sessions += ((s0, e0))
      sessions
    }
    // sweep: +1 at start, -1 at end; same-instant +1 first; RANGE
    // semantics = group points by (t, d) and apply whole groups
    val pts = (iv.map(i => (i._1, 1L)) ++ iv.map(i => (i._2, -1L)))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .sortBy { case ((t, d), _) => (t, -d) }
    val hist = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var conc = 0L
    pts.zip(pts.tail).foreach { case (((t, d), c), ((tn, _), _)) =>
      conc += d * c
      if (tn > t) hist(conc) += tn - t
    }
    val got = Relational.qConcurrencySweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == hist.toMap.filter(_._2 > 0) && got.nonEmpty)
    assert(got.keySet.max > 1, "max concurrency 1 — degenerate fixture?")
  }

  test("q277: decile lift matches a driver-side exact-rank cut") {
    val spend = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (k, g) => (k, g.map(_._2).sum) }.toSeq
    val n = spend.size.toLong
    val want = spend.sortBy { case (k, c) => (-c, k) }.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
      .map { case (dec, rows) =>
        (dec, (rows.size.toLong, rows.map(_._1._2).sum)) }
    val got = Relational.qDecileLift(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1)
    assert(got.map(x => (x._1, (x._2._1, x._2._2))).toMap == want)
    // cumulative column really accumulates in decile order
    val cums = got.map(_._2._3).toSeq
    assert(cums == got.map(_._2._2).scanLeft(0L)(_ + _).tail.toSeq)
    // top decile holds the largest share (gains-table sanity)
    assert(got.head._2._2 == got.map(_._2._2).max)
  }

  test("q278: Kendall tau-b matches a brute-force pair recomputation") {
    val spend = Tables.orders(spark, sf).select("o_custkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (k, g) => (k, (g.size.toLong, g.map(_._2).sum)) }
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .collect().flatMap(r => spend.get(r.getLong(0))
        .map(xy => (r.getInt(1), r.getLong(0), xy._1, xy._2)))
    val want = cust.groupBy(_._1).map { case (nat, g) =>
      var (c, d, tx, ty, txy) = (0L, 0L, 0L, 0L, 0L)
      val rows = g.sortBy(_._2)
      for (i <- rows.indices; j <- (i + 1) until rows.size) {
        val sx = java.lang.Long.compare(rows(i)._3, rows(j)._3)
        val sy = java.lang.Long.compare(rows(i)._4, rows(j)._4)
        if (sx * sy > 0) c += 1 else if (sx * sy < 0) d += 1
        else if (sx == 0 && sy != 0) tx += 1
        else if (sy == 0 && sx != 0) ty += 1 else txy += 1
      }
      val den = math.sqrt((c + d + tx).toDouble * (c + d + ty).toDouble)
      (nat, (c, d, tx, ty, txy,
        if (den == 0) None else Some((c - d).toDouble / den)))
    }
    val got = Stats.qKendallTau(spark, sf).collect().map { r =>
      (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), if (r.isNullAt(6)) None else Some(r.getDouble(6))))
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (nat, (c, d, tx, ty, txy, tau)) =>
      val g = got(nat)
      assert((g._1, g._2, g._3, g._4, g._5) == (c, d, tx, ty, txy), s"nation $nat counts")
      (g._6, tau) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"nation $nat tau")
        case (a, b) => assert(a == b)
      }
    }
    // dependence between order count and spend must be present
    assert(want.values.flatMap(_._6).exists(_ > 0.3))
  }

  test("q282: k-anonymity audit matches a driver-side QI walk") {
    val nOrd = Tables.orders(spark, sf).select("o_custkey").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.size.toLong).toMap
    val groups = Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .collect()
      .map { r =>
        val qi = (r.getInt(1), r.getString(2),
          math.floor(r.getDouble(3) / 6000.0).toLong)
        val sens = math.min(nOrd.getOrElse(r.getLong(0), 0L), 3L)
        (qi, sens)
      }
      .groupBy(_._1).map { case (qi, rows) =>
        qi -> (rows.size.toLong, rows.map(_._2).distinct.size.toLong)
      }
    val got = Pipeline.qKAnonymity(spark, sf).collect().map { r =>
      ((r.getInt(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getInt(5), r.getInt(6)))
    }.toMap
    assert(got.keySet == groups.keySet)
    groups.foreach { case (qi, (n, ldiv)) =>
      val (gn, gl, ka, ld) = got(qi)
      assert(gn == n && gl == ldiv, s"$qi size/ldiv")
      assert(ka == (if (n >= 5) 1 else 0) && ld == (if (ldiv >= 2) 1 else 0), s"$qi flags")
    }
    // the audit must find actual risk AND actual safety to be useful
    assert(got.values.exists(_._3 == 0), "no at-risk group — degenerate QI?")
  }

  test("q279: runs test matches a driver-side median/runs walk") {
    val daily = Tables.orders(spark, sf)
      .select(unix_micros(col("o_orderdate").cast("timestamp")).as("d"),
        col("o_totalprice"))
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (d, g) => (d, g.map(_._2).sum) }.toSeq.sortBy(_._1)
    val n = daily.size
    val med = daily.map(_._2).sorted.apply(math.max(1, math.ceil(n / 2.0).toInt) - 1)
    val above = daily.map(_._2 > med)
    val runs = 1L + above.zip(above.tail).count { case (a, b) => a != b }
    val n1 = above.count(identity).toLong
    val n2 = n - n1
    val r = Stats.qRunsTest(spark, sf).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (n1, n2, runs))
    val (a, b) = (n1.toDouble, n2.toDouble)
    val mu = 2.0 * a * b / (a + b) + 1.0
    val sig = math.sqrt(2.0 * a * b * (2.0 * a * b - a - b) /
      ((a + b) * (a + b) * (a + b - 1.0)))
    assert(math.abs(r.getDouble(3) - (runs - mu) / sig) < 1e-9)
    assert(n1 > 0 && n2 > 0 && runs > 1, "degenerate series")
  }
}
