package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q151–q157 (PPS sampling, OLS trend, collocation lift, Z-order
  * layout, session paths, throttle-dedup, daily autocorrelation) —
  * driver-side recomputation of each operator's contract on raw data,
  * so a same-wrong-answer-on-both-engines bug can't hide behind the
  * DuckDB oracle. */
class AnalyticsExtrasSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def round(v: Double, scale: Int): Double =
    new JBigDecimal(v).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  // raw events with µs-exact timestamps for the reference walks
  private lazy val rawEvents: Array[(Long, Long, Long, String)] =
    Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("q151: PPS selection matches a driver-side integer pin walk") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split("\\s+", -1).length.toLong))
    val k = 16L
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      val tw = sorted.map(_._3).sum
      var cw = 0L
      var nSel = 0L
      var tokSel = 0L
      sorted.foreach { case (_, _, w) =>
        cw += w
        if ((cw * k) / tw > ((cw - w) * k) / tw) { nSel += 1; tokSel += w }
      }
      src -> ((rows.length.toLong, nSel, tw, tokSel))
    }
    val got = Pipeline.qPpsSample(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // pins land: every source with >= 16 docs of weight < tw/16 selects 16
    got.foreach { case (_, (_, nSel, _, _)) => assert(nSel >= 1 && nSel <= 16) }
  }

  test("q152: OLS core recovers an exact synthetic slope") {
    import spark.implicits._
    val tbl = Seq(("g1", 1, 7.0), ("g1", 2, 9.0), ("g1", 3, 11.0),
      ("g1", 4, 13.0), ("g1", 5, 15.0)).toDF("g0", "x0", "y0")
    val out = Relational.trendOls(tbl, col("g0"), col("x0"), col("y0"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq == Seq(("g1", 5L, 2.0, 11.0)))
  }

  test("q153: collocation lift matches driver-computed exact counts") {
    import spark.implicits._
    // "x y" 6 times (x, y nowhere else); "a b" 5 times but 'a' also
    // appears 10 times solo -> diluted lift; "p q" only 4 times: below
    // minCount, must not appear
    val docs = (Seq.fill(6)("x y") ++ Seq.fill(5)("a b") ++
      Seq.fill(10)("a") ++ Seq.fill(4)("p q")).toDF("text")
    val got = TextAnalysis.collocationLift(docs, minCount = 5, topK = 20)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // N = 12 + 10 + 10 + 8 = 40 tokens
    // lift(x,y) = 6*40*1e6/(6*6) = 6_666_666 (integer div of 240e6/36)
    // lift(a,b) = 5*40*1e6/(15*5) = 2_666_666
    assert(got.toSeq == Seq(("x", "y", 6L, 6666666L), ("a", "b", 5L, 2666666L)))
  }

  test("q154: z-order buckets match a driver-side Morton interleave") {
    def spread(v: Long): Long = {
      var x = v & 0xFFFFL
      x = (x | (x << 8)) & 0x00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0FL
      x = (x | (x << 2)) & 0x33333333L
      x = (x | (x << 1)) & 0x55555555L
      x
    }
    // unit anchors for the spread chain itself
    assert(spread(0xFFFFL) == 0x55555555L)
    assert(spread(1L) == 1L && spread(2L) == 4L && spread(3L) == 5L)
    val keys = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (pmin, pmax) = (keys.map(_._1).min, keys.map(_._1).max)
    val (smin, smax) = (keys.map(_._2).min, keys.map(_._2).max)
    def grid(v: Long, lo: Long, hi: Long): Long =
      if (hi == lo) 0L else ((v - lo) * 65535L) / (hi - lo)
    val want = keys.groupBy { case (p, s) =>
      ((spread(grid(p, pmin, pmax)) | (spread(grid(s, smin, smax)) << 1)) >> 26).toInt
    }.map { case (b, rows) =>
      b -> ((rows.length.toLong, rows.map(_._1).min, rows.map(_._1).max,
        rows.map(_._2).min, rows.map(_._2).max))
    }
    val got = Bucketing.qZorderStats(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
  }

  test("q155: session entry/exit matrix matches a driver-side session walk") {
    val gapUs = 10L * 60 * 1000000
    val sessions = rawEvents.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[String]
      var prev = Long.MinValue
      sorted.foreach { case (_, us, _, tpe) =>
        if (prev == Long.MinValue || us - prev >= gapUs) {
          if (cur.nonEmpty) out += cur.toSeq
          cur = scala.collection.mutable.ArrayBuffer(tpe)
        } else cur += tpe
        prev = us
      }
      if (cur.nonEmpty) out += cur.toSeq
      out
    }
    val want = sessions.groupBy(s => (s.head, s.last)).map { case (k, ss) =>
      k -> ((ss.length.toLong, ss.count(_.length == 1).toLong,
        round(ss.map(_.length.toLong).sum.toDouble / ss.length, 4)))
    }
    val got = Relational.qSessionPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == sessions.length.toLong)
  }

  test("q156: throttle-dedup matches a driver-side lag walk") {
    val want = rawEvents.groupBy(_._4).map { case (tpe, evs) =>
      var dropped = 0L
      evs.groupBy(_._1).foreach { case (_, ue) =>
        val sorted = ue.sortBy(e => (e._2, e._3))
        sorted.sliding(2).foreach {
          case Array(a, b) => if (b._2 - a._2 < 60000000L) dropped += 1
          case _ =>
        }
      }
      tpe -> ((evs.length.toLong, dropped,
        round(dropped.toDouble / evs.length, 4)))
    }
    val got = Relational.qEventThrottle(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want)
  }

  test("q158: streaming throttle state reaches the batch q156 answer exactly") {
    val batch = Relational.qEventThrottle(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val stream = graft.streaming.EventTime.qStreamingThrottle(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("q167: streaming sessionize state reaches the batch q74 answer exactly") {
    val batch = Relational.qSessionize(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val stream = graft.streaming.EventTime.qStreamingSessionize(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("q159: standardized residuals match driver-side contingency math") {
    val cells = Tables.documents(spark, sf).select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rowM = cells.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val colM = cells.groupBy(_._1._2).map { case (s0, m) => s0 -> m.values.sum }
    val tot = cells.values.sum
    val want = cells.map { case ((l, src), n) =>
      val e = (rowM(l) * colM(src)).toDouble / tot
      (l, src) -> ((n, round(e, 4), round((n.toDouble - e) / math.sqrt(e), 4)))
    }
    val got = Relational.qContingencyResiduals(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == want)
  }

  test("q160: Gini matches a driver-side sorted-rank walk") {
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split("\\s+", -1).length.toLong))
    val want = docs.groupBy(_._1).map { case (src, rows) =>
      val sorted = rows.sortBy(x => (x._3, x._2))
      val n = sorted.length.toLong
      val sw = sorted.map(_._3).sum
      val siw = sorted.zipWithIndex.map { case ((_, _, w), i) => (i + 1) * w }.sum
      src -> ((n, sw,
        round(2.0 * siw / (n * sw).toDouble - (n + 1).toDouble / n.toDouble, 6)))
    }
    val got = Pipeline.qGiniConcentration(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == want)
    // a Gini is in [0, 1)
    got.values.foreach { case (_, _, g) => assert(g >= 0.0 && g < 1.0) }
  }

  test("q161: co-occurrence lift matches driver-side user-set intersection") {
    val ut = rawEvents.map(e => (e._1, e._4)).distinct
    val nu = ut.map(_._1).distinct.length.toLong
    val marg = ut.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val byUser = ut.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val want = byUser.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case ((a, b), v) =>
        (a, b) -> ((v.length.toLong,
          v.length.toLong * nu * 1000000L / (marg(a) * marg(b))))
      }
    val got = Relational.qTypeCooccurrence(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("q162: cents reconciliation matches driver-side exact arithmetic") {
    def cents(v: Double): Long =
      new JBigDecimal(v).setScale(2, RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val want = Tables.orders(spark, sf)
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(1), cents(r.getDouble(2)) - li.getOrElse(r.getLong(0), 0L)))
      .groupBy(_._1).map { case (p, rows) =>
        val d = rows.map(_._2)
        p -> ((d.length.toLong, d.count(_ == 0L).toLong,
          d.count(x => x != 0 && math.abs(x) <= 100).toLong,
          d.count(x => math.abs(x) > 100).toLong, d.map(math.abs).max))
      }
    val got = Relational.qTotalpriceAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
  }

  test("q176: Mann-Kendall S, tie-corrected variance, and z match driver math") {
    val want = rawEvents.groupBy(_._4).map { case (tpe, evs) =>
      val daily = evs.groupBy(e => e._2 / 86400000000L)
        .map { case (day, es) => (day, es.length.toLong) }.toSeq.sortBy(_._1)
      val cs = daily.map(_._2)
      val sStat = (for (i <- cs.indices; j <- (i + 1) until cs.length)
        yield java.lang.Long.signum(cs(j) - cs(i)).toLong).sum
      val n = cs.length.toLong
      val tie = cs.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * (t - 1) * (2 * t + 5) }).sum
      val varX18 = n * (n - 1) * (2 * n + 5) - tie
      val num = if (sStat > 0) (sStat - 1).toDouble
        else if (sStat < 0) (sStat + 1).toDouble else 0.0
      tpe -> ((n, sStat, varX18, round(num / math.sqrt(varX18.toDouble / 18.0), 4)))
    }
    val got = Relational.qMannKendall(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == want)
  }

  test("q177: CUSUM changepoint matches a driver-side argmax walk") {
    val want = rawEvents.groupBy(_._4).map { case (tpe, evs) =>
      val daily = evs.groupBy(e => e._2 / 86400000000L)
        .map { case (day, es) => (day, es.length.toLong) }.toSeq.sortBy(_._1)
      val n = daily.length.toLong
      val s0 = daily.map(_._2).sum
      var cum = 0L
      val devs = daily.zipWithIndex.init.map { case ((day, c), i) =>
        cum += c
        (day, i + 1L, cum, math.abs(n * cum - (i + 1) * s0))
      }
      val (day, k, cumAt, dev) = devs.maxBy { case (d0, _, _, v) => (v, -d0) }
      tpe -> ((n, day, k, dev,
        round(cumAt.toDouble / k, 4),
        round((s0 - cumAt).toDouble / (n - k), 4)))
    }
    val got = Relational.qCusumChangepoint(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), java.time.LocalDate.parse(r.getString(2)).toEpochDay,
          r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == want)
  }

  test("q175: KM risk table matches a driver-side survival walk") {
    val byUser = rawEvents.groupBy(_._1)
    val subjects = byUser.values.toSeq.flatMap { evs =>
      val views = evs.filter(_._4 == "view").map(_._2)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val purch = evs.filter(e => e._4 == "purchase" && e._2 >= fv).map(_._2)
        if (purch.nonEmpty) Some(((purch.min - fv) / 3600000000L, true))
        else Some(((evs.map(_._2).max - fv) / 3600000000L, false))
      }
    }
    val cells = subjects.groupBy(_._1).map { case (h, ss) =>
      (h, ss.size.toLong, ss.count(_._2).toLong, ss.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    val totals = cells.map(_._2).sum
    var before = 0L
    val want = cells.map { case (h, nHere, d, c) =>
      val risk = totals - before
      before += nHere
      (h, risk, d, c, d * 1000000L / risk)
    }.filter(_._3 > 0)
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    val got = Relational.qHazardTable(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
    // risk sets are non-increasing in time
    val sorted = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(sorted == sorted.sorted(Ordering[Long].reverse))
  }

  test("q174: weekday seasonality matches a driver-side profile") {
    val want = rawEvents.groupBy(_._4).flatMap { case (tpe, evs) =>
      val daily = evs.groupBy(e => e._2 / 86400000000L)
        .map { case (day, es) => (day, es.length.toLong) }
      val st = daily.values.sum
      val ndt = daily.size.toLong
      // epoch day 0 = 1970-01-01 = Thursday; Spark dayofweek: Sun=1
      daily.groupBy { case (day, _) => (((day + 4) % 7) + 1).toInt }
        .map { case (dow, cells) =>
          val s0 = cells.values.sum
          val nd = cells.size.toLong
          (tpe, dow) -> ((s0, nd, s0 * ndt * 10000L / (nd * st)))
        }
    }
    val got = Relational.qWeekdaySeasonality(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want)
    // indexes center on 10000 by construction
    val idx = got.values.map(_._3)
    assert(idx.min < 10000L && idx.max > 10000L)
  }

  test("q172: peak 6h window matches a driver-side two-pointer sweep") {
    val spanUs = 6L * 3600 * 1000000
    val want = rawEvents.groupBy(_._4).map { case (tpe, evs) =>
      val us = evs.map(_._2).sorted
      var lo = 0
      var best = 0L
      us.zipWithIndex.foreach { case (t, hi) =>
        while (us(lo) <= t - spanUs) lo += 1
        // count of events in (t - 6h, t]; RANGE peers at equal t share
        // the same frame, so evaluate at the LAST index of each t
        if (hi + 1 >= us.length || us(hi + 1) != t) {
          val w = (hi - lo + 1).toLong
          if (w > best) best = w
        }
      }
      // min ts among all positions achieving the peak
      lo = 0
      var minAt = Long.MaxValue
      us.zipWithIndex.foreach { case (t, hi) =>
        while (us(lo) <= t - spanUs) lo += 1
        if (hi + 1 >= us.length || us(hi + 1) != t) {
          if ((hi - lo + 1).toLong == best && t < minAt) minAt = t
        }
      }
      tpe -> ((best, minAt))
    }
    val got = Relational.qPeakWindowLoad(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
  }

  test("q164: MAD fence matches a driver-side robust-statistics walk") {
    // exact interpolated percentile, the ANSI definition both engines use
    def pctl(vs: Seq[Double], p: Double): Double = {
      val s0 = vs.sorted
      val idx = p * (s0.length - 1)
      val i = idx.toInt
      if (i + 1 >= s0.length) s0(i) else s0(i) + (idx - i) * (s0(i + 1) - s0(i))
    }
    val vals = Tables.events(spark, sf).select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = vals.groupBy(_._1).map { case (t, vs) =>
      val xs = vs.map(_._2).toSeq
      val med = pctl(xs, 0.5)
      val adev = xs.map(x => math.abs(x - med))
      val mad = pctl(adev, 0.5)
      val out = adev.count(_ > 5.0 * mad).toLong
      t -> ((xs.length.toLong, round(med, 4), round(mad, 4), out,
        round(out.toDouble / xs.length, 4)))
    }
    val got = Relational.qMadOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got == want)
  }

  test("q165: trigram paths match a driver-side sliding walk") {
    val want = rawEvents.groupBy(_._1).values.toSeq
      .flatMap { evs =>
        evs.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
          .filter(_.length == 3).map(t => (t(0), t(1), t(2)))
      }
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }.toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }
      .take(25)
    val got = Relational.qEventTrigrams(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3)))
    assert(got.toSeq == want)
  }

  test("q157: lag-1 autocorrelation matches driver-side exact Pearson") {
    val want = rawEvents.groupBy(_._4).flatMap { case (tpe, evs) =>
      val daily = evs.groupBy(e => e._2 / 86400000000L)
        .map { case (day, es) => (day, es.length.toLong) }.toSeq.sortBy(_._1)
      val pairs = daily.map(_._2).sliding(2).collect {
        case Seq(a, b) => (b, a)
      }.toSeq
      if (pairs.isEmpty) None
      else {
        val m = pairs.length.toLong
        val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
        val sxy = pairs.map(p => p._1 * p._2).sum
        val sxx = pairs.map(p => p._1 * p._1).sum
        val syy = pairs.map(p => p._2 * p._2).sum
        val dx = m * sxx - sx * sx; val dy = m * syy - sy * sy
        val r = if (dx > 0 && dy > 0)
          Some(round((m * sxy - sx * sy).toDouble /
            math.sqrt(dx.toDouble * dy.toDouble), 6))
        else None
        Some(tpe -> ((m, r)))
      }
    }
    val got = Relational.qDailyAutocorr(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q269: top-k with ties keeps every boundary tie and only them") {
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
    val sorted = qty.toSeq.sortBy { case (p, q) => (-q, p) }
    val thr = sorted(9)._2
    val want = qty.filter(_._2 >= thr)
    val got = Relational.qTopKTies(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(g => (g._2, g._3)).toMap == want)
    // RANK semantics: ties share a rank; ranks jump after tie groups
    val byQty = got.groupBy(_._3)
    byQty.foreach { case (_, g) => assert(g.map(_._1).distinct.length == 1) }
    got.foreach { case (rk, _, q) =>
      assert(rk == 1 + got.count(_._3 > q), s"rank law for qty $q")
    }
  }

  test("q270: tolerance as-of matches a per-user sequential walk") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("CAST(unix_micros(ts) div 1000000 AS BIGINT)"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // purchases deduped per (user, second) with max cents — the
    // operator's right-side contract
    val purch = ev.filter(_._3 == "purchase")
      .groupBy(p => (p._2, p._4)).map { case ((u, s), g) =>
        (u, s, g.map(_._5).max)
      }.toSeq.groupBy(_._1)
      .map { case (u, v) => u -> v.sortBy(_._2) }
    val want = ev.filter(_._3 != "purchase").map { case (id, u, _, sec, _) =>
      val prior = purch.getOrElse(u, Seq.empty).filter(_._2 <= sec)
      val last = prior.lastOption
      val ok = last.exists(p => sec - p._2 <= 172800L)
      id -> (if (ok) Some((last.get._3, sec - last.get._2)) else None)
    }.toMap
    val got = Relational.qAsofTolerance(spark, sf).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some((r.getLong(2), r.getLong(3))))
    }.toMap
    assert(got.keySet == want.keySet)
    assert(got == want)
    val matched = got.values.count(_.isDefined)
    assert(matched > 0 && matched < got.size,
      "tolerance must bind: some matches, some stale")
  }
}
