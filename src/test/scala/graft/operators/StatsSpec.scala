package graft.operators

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q178–q185 (unpivot, Spearman, LOCF gap-fill, Theil–Sen, Fano,
  * mutual information, Page CUSUM) — driver-side recomputation of each
  * operator's contract on raw data (or a pinned synthetic series), so
  * a same-wrong-answer-on-both-engines bug can't hide behind the
  * DuckDB oracle. */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def round6(v: Double): Double =
    new JBigDecimal(v).setScale(6, RoundingMode.HALF_UP).doubleValue()

  // (event_type, day-epoch, count) daily rollup recomputed driver-side
  private lazy val dailyCounts: Map[String, Seq[(Long, Long)]] =
    Tables.events(spark, sf)
      .select(col("event_type"), expr("datediff(to_date(ts), date'1970-01-01')"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1).toLong))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.groupBy(_._2).map { case (d, g) => (d, g.size.toLong) }
          .toSeq.sortBy(_._1)
      }

  test("q178: every melted cell equals the exact BigDecimal rollup") {
    val raw = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount").collect()
    // valueOf = shortest-string parse: the clean ≤2-decimal intent of
    // the raw columns, then EXACT decimal products/sums as the plan does
    def d2(v: Double): JBigDecimal =
      JBigDecimal.valueOf(v).setScale(2, RoundingMode.HALF_UP)
    val one = new JBigDecimal(1)
    val want = raw.groupBy(r => (r.getString(0), r.getString(1))).flatMap {
      case ((f, st), rows) =>
        def sum(g: org.apache.spark.sql.Row => JBigDecimal) =
          rows.map(g).foldLeft(JBigDecimal.ZERO)(_.add(_))
            .setScale(6, RoundingMode.HALF_UP).doubleValue()
        Seq(
          (f, st, "sum_qty", sum(r => d2(r.getDouble(2)))),
          (f, st, "sum_price", sum(r => d2(r.getDouble(3)))),
          (f, st, "sum_disc_price", sum(r =>
            d2(r.getDouble(3)).multiply(one.subtract(d2(r.getDouble(4)))))),
          (f, st, "n_rows", rows.size.toDouble))
    }.toSet
    val got = Stats.qUnpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(got == want)
    assert(got.size == raw.map(r => (r.getString(0), r.getString(1)))
      .distinct.length * 4)
  }

  test("q179: Spearman matches an exact BigInt rank recomputation") {
    val raw = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val want = raw.groupBy(_._1).map { case (f, rows) =>
      def ranks2(xs: Seq[Double]): Seq[Long] = {
        // doubled average rank: 2*minrank + ties - 1
        val sorted = xs.sorted
        val first = sorted.zipWithIndex.groupBy(_._1)
          .map { case (v, g) => v -> (g.map(_._2).min + 1L, g.size.toLong) }
        xs.map { v => val (r, c) = first(v); 2 * r + c - 1 }
      }
      val rx = ranks2(rows.map(_._2).toSeq)
      val ry = ranks2(rows.map(_._3).toSeq)
      val n = BigInt(rows.size)
      def s(v: Seq[Long]) = v.map(BigInt(_)).sum
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val vx = n * sp(rx, rx) - s(rx) * s(rx)
      val vy = n * sp(ry, ry) - s(ry) * s(ry)
      val cov = n * sp(rx, ry) - s(rx) * s(ry)
      f -> round6(cov.toDouble / math.sqrt(vx.toDouble * vy.toDouble))
    }
    val got = Stats.qSpearman(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == want)
  }

  test("q180: LOCF summary matches a driver-side carry-forward walk") {
    val raw = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_orderpriority"),
        expr("datediff(to_date(o_orderdate), date'1970-01-01')"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG)"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2).toLong,
        r.getLong(3)))
    val want = raw.groupBy(_._1).map { case (k, rows) =>
      val byDay = rows.groupBy(_._2).map { case (d, g) =>
        d -> g.map(_._3).sum }
      val mn = byDay.keys.min
      val mx = byDay.keys.max
      var lastV = 0L
      var checksum = 0L
      var nObs = 0L
      (mn to mx).foreach { d =>
        byDay.get(d).foreach { v => lastV = v; nObs += 1 }
        checksum += (d - mn) * lastV
      }
      k -> ((mx - mn + 1, nObs, mx - mn + 1 - nObs, checksum))
    }
    val got = Stats.qLocfGapfill(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == want)
    // the fixture must actually exercise filling somewhere
    assert(got.values.exists(_._3 > 0))
  }

  test("q181: Theil–Sen equals the lower-median pairwise slope walk") {
    val want = dailyCounts.map { case (t, days) =>
      val pairs = for {
        i <- days.indices; j <- (i + 1) until days.size
      } yield {
        val (d1, c1) = days(i); val (d2, c2) = days(j)
        (((c2 - c1).toDouble / (d2 - d1).toDouble), d1, d2, c2 - c1, d2 - d1)
      }
      val sorted = pairs.sortBy(p => (p._1, p._2, p._3))
      val med = sorted((pairs.size + 1) / 2 - 1)
      t -> ((pairs.size.toLong, med._4, med._5, round6(med._1)))
    }
    val got = Stats.qTheilSen(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3).toLong, r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (t, (np, dc, dd, slope)) =>
      val (wnp, wdc, wdd, wslope) = want(t)
      assert((np, dc, dd, slope) == ((wnp, wdc, wdd, wslope)), s"type $t")
    }
  }

  test("q182: Fano factor equals the exact integer dispersion formula") {
    val hourly = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts))"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.groupBy(_._2).map(_._2.size.toLong).toSeq
      }
    val want = hourly.collect { case (t, cs) if cs.size > 1 =>
      val n = cs.size.toLong
      val sc = cs.sum
      val scc = cs.map(c => c * c).sum
      t -> ((n, sc * 100 / n, (n * scc - sc * sc) * 10000 / ((n - 1) * sc)))
    }
    val got = Stats.qFanoFactor(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
  }

  test("q183: MI and entropies match a driver-side cell fold") {
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), expr("hour(ts)")).collect()
      .map(r => (r.getString(0), r.getInt(1)))
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val nn = cells.values.sum.toDouble
    val rowm = cells.groupBy(_._1._1).map { case (t, g) => t -> g.values.sum }
    val colm = cells.groupBy(_._1._2).map { case (h, g) => h -> g.values.sum }
    val mi = cells.map { case ((t, h), c) =>
      c / nn * math.log(c * nn / (rowm(t).toDouble * colm(h).toDouble))
    }.sum
    val hT = -rowm.values.map(r => r / nn * math.log(r / nn)).sum
    val hH = -colm.values.map(s => s / nn * math.log(s / nn)).sum
    val row = Stats.qMutualInfo(spark, sf).collect().head
    assert(row.getLong(0) == cells.size.toLong)
    assert(row.getLong(1) == nn.toLong)
    assert(row.getDouble(2) == round6(mi))
    assert(row.getDouble(3) == round6(hT))
    assert(row.getDouble(4) == round6(hH))
    // sanity: MI bounded by both marginal entropies, all non-negative
    assert(row.getDouble(2) >= 0 && row.getDouble(2) <= math.min(
      row.getDouble(3), row.getDouble(4)) + 1e-9)
  }

  test("q185: drawdown identity equals the literal max(0,·) recursion") {
    val want = dailyCounts.collect { case (t, days) if days.size > 7 =>
      val sum7 = days.take(7).map(_._2).sum
      var s = 0L
      var maxS = 0L
      var firstAlarm: Option[(Long, Long)] = None
      days.drop(7).foreach { case (d, c) =>
        s = math.max(0L, s + 7 * c - sum7)
        maxS = math.max(maxS, s)
        if (s > 3 * sum7 && firstAlarm.isEmpty) firstAlarm = Some((d, s))
      }
      t -> ((days.size.toLong, sum7, maxS,
        firstAlarm.map(a => LocalDate.ofEpochDay(a._1).toString)
          .getOrElse("none"),
        firstAlarm.map(_._2).getOrElse(-1L)))
    }
    val got = Stats.qPageCusum(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))).toMap
    assert(got == want)
  }

  test("q187: windowed funnel depths match a driver-side chain search") {
    val w = 86400000000L
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val want = byUser.values.flatMap { evs =>
      val vs = evs.filter(_._2 == "view").map(_._3)
      val cs = evs.filter(_._2 == "click").map(_._3).sorted
      val ps = evs.filter(_._2 == "purchase").map(_._3).sorted
      if (vs.isEmpty) None
      else Some {
        // exhaustive (not greedy) search over chains per view window
        val depth = vs.map { tv =>
          val reach3 = cs.exists(tc => tc >= tv && tc <= tv + w &&
            ps.exists(tp => tp >= tc && tp <= tv + w))
          val reach2 = cs.exists(tc => tc >= tv && tc <= tv + w)
          if (reach3) 3 else if (reach2) 2 else 1
        }.max
        depth
      }
    }.groupBy(identity).map { case (d0, g) => (d0, g.size.toLong) }
    val got = Stats.qWindowFunnel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == want)
    assert(got.values.sum == byUser.values.count(_.exists(_._2 == "view")))
  }

  test("q188: spike days match an exact dyadic-weight recomputation") {
    val want = dailyCounts.map { case (t, days) =>
      val byDay = days.toMap
      val scored = days.flatMap { case (d0, c) =>
        val lags = (1L to 30L).flatMap(l =>
          byDay.get(d0 - l).map(cl => cl * (1L << (30 - l))))
        if (lags.size >= 7)
          Some((d0, (c << 30) > 2 * lags.sum))
        else None
      }
      t -> ((scored.size.toLong,
        scored.count(_._2).toLong,
        scored.find(_._2).map(s =>
          LocalDate.ofEpochDay(s._1).toString).getOrElse("none")))
    }
    val got = Stats.qEwmaSpikes(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == want)
    assert(got.values.forall(_._1 > 0))
  }

  test("q189: each fact lands in exactly one SCD2 version; revenue exact") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
        expr("unix_timestamp(o_orderdate)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // driver-side SCD2: per customer, versions ordered by (date, okey)
    val versions = orders.groupBy(_._1).map { case (ck, os) =>
      val sorted = os.sortBy(o => (o._4, o._2))
      ck -> sorted.zipWithIndex.map { case ((_, _, st, vf), i) =>
        val vt = if (i + 1 < sorted.length) sorted(i + 1)._4 else 4102444800L
        (st, vf, vt)
      }
    }
    val okToCk = orders.map(o => o._2 -> o._1).toMap
    val facts = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), expr("unix_timestamp(l_shipdate)"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))" +
          " * 10000 AS LONG)"))
      .collect()
      .map(r => (okToCk(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val want = facts.map { case (ck, ship, rev) =>
      val hits = versions(ck).filter(v => ship >= v._2 && ship < v._3)
      assert(hits.length <= 1,
        s"fact must match at most one version, got ${hits.length}")
      (hits.headOption.map(_._1).getOrElse("NONE"), rev)
    }.groupBy(_._1).map { case (st, g) =>
      st -> ((g.length.toLong, g.map(_._2).sum))
    }
    val got = Relational.qTemporalJoin(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // every fact is accounted for, and pre-history facts exist in this
    // generator (ship dates are independent of order dates)
    assert(got.values.map(_._1).sum == facts.length.toLong)
    assert(got.contains("NONE"))
  }

  test("q190: PSI matches a driver-side ntile-edge band walk") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"),
        expr("datediff(to_date(ts), date'1970-01-01')"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3).toLong))
    val want = rows.groupBy(_._1).map { case (t, evs) =>
      val pivot = evs.map(_._4).min + (evs.map(_._4).max - evs.map(_._4).min) / 2
      val (first, second) = evs.partition(_._4 <= pivot)
      val sortedF = first.sortBy(e => (e._2, e._3))
      val n = sortedF.length
      // ntile: first (n mod 10) tiles get ceil(n/10)
      val base = n / 10; val extra = n % 10
      val sizes = (0 until 10).map(i => base + (if (i < extra) 1 else 0))
      val edges = sizes.init.scanLeft(0)(_ + _).tail
        .map(cum => sortedF(cum - 1)._2)
      def band(v: Double) = 1 + edges.count(_ < v)
      def dist(xs: Seq[Double]) = {
        val c = xs.groupBy(band).map { case (b, g) => b -> g.size.toLong }
        (1 to 10).map(b => c.getOrElse(b, 0L))
      }
      val cf = dist(first.map(_._2).toSeq)
      val cs = dist(second.map(_._2).toSeq)
      val nf = cf.sum; val ns = cs.sum
      val psi = (0 until 10).map { i =>
        val p = (cf(i) + 1).toDouble / (nf + 10)
        val q = (cs(i) + 1).toDouble / (ns + 10)
        (p - q) * math.log(p / q)
      }.sum
      t -> ((nf, ns, round(psi, 6)))
    }
    val got = Stats.qPsiDrift(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (t, (nf, ns, psi)) =>
      val (wnf, wns, wpsi) = want(t)
      assert((nf, ns) == ((wnf, wns)), s"type $t halves")
      assert(math.abs(psi - wpsi) < 1e-9, s"type $t psi $psi vs $wpsi")
    }
  }

  test("q262: weekly PSI timeline matches a driver-side band walk") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"),
        expr("datediff(to_date(ts), date'1970-01-01')"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getInt(3).toLong))
    val d0 = rows.map(_._4).min
    val tagged = rows.map(r => (r._1, r._2, r._3, (r._4 - d0) / 7))
    val want = tagged.groupBy(_._1).flatMap { case (t, evs) =>
      val base = evs.filter(_._4 == 0L)
      val sortedB = base.sortBy(e => (e._2, e._3))
      val n = sortedB.length
      val tile = n / 10; val extra = n % 10
      val sizes = (0 until 10).map(i => tile + (if (i < extra) 1 else 0))
      val edges = sizes.init.scanLeft(0)(_ + _).tail
        .map(cum => sortedB(cum - 1)._2)
      def band(v: Double) = 1 + edges.count(_ < v)
      def dist(xs: Seq[Double]) = {
        val c = xs.groupBy(band).map { case (b, g) => b -> g.size.toLong }
        (1 to 10).map(b => c.getOrElse(b, 0L))
      }
      val cb = dist(base.map(_._2).toSeq)
      val nb = cb.sum
      evs.filter(_._4 > 0L).groupBy(_._4).map { case (wk, wevs) =>
        val cw = dist(wevs.map(_._2).toSeq)
        val nw = cw.sum
        val psi = (0 until 10).map { i =>
          val p = (cw(i) + 1).toDouble / (nw + 10)
          val q = (cb(i) + 1).toDouble / (nb + 10)
          (p - q) * math.log(p / q)
        }.sum
        (t, wk) -> ((nw, round(psi, 6)))
      }
    }
    val got = Stats.qPsiTimeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (nw, psi)) =>
      assert(nw == want(k)._1, s"$k n_events")
      assert(math.abs(psi - want(k)._2) < 1e-9, s"$k psi")
    }
  }

  test("q268: weekly P50/P90 are the exact ranked elements") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("datediff(to_date(ts), date'1970-01-01')"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val d0 = rows.map(_._2).min
    val want = rows.groupBy(r => (r._1, (r._2 - d0) / 7)).map {
      case (k, evs) =>
        val sorted = evs.map(_._3).sorted
        val n = sorted.length.toLong
        def at(rank: Long) = sorted((rank - 1).toInt)
        k -> ((n, at((n + 1) / 2), at((9 * n + 9) / 10)))
    }
    val got = Stats.qPercentileTimeline(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"$k") }
  }

  test("q271: equi-depth edges are the exact per-decile ranked elements") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).flatMap { case (t, evs) =>
      val sorted = evs.map(_._2).sorted
      val n = sorted.length.toLong
      (1 to 9).map(j => (t, j) -> ((n, sorted(((j * n + 9) / 10 - 1).toInt))))
    }
    val got = Stats.qEquidepthEdges(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"$k") }
    // edges are non-decreasing per type
    got.keys.map(_._1).foreach { t =>
      val es = (1 to 9).map(j => got((t, j))._2)
      assert(es.zip(es.tail).forall { case (a, b) => a <= b }, t)
    }
  }

  test("q272: A² matches the midrank recompute; self-comparison is exactly 0") {
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val blocks = rows.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, g) =>
      (g.count(_._1 == "purchase").toLong, g.count(_._1 == "view").toLong)
    }
    val na = blocks.map(_._1).sum; val nb = blocks.map(_._2).sum
    val nn = na + nb
    var (cumA, cumB, cumH) = (0L, 0L, 0L)
    var (sa, sb) = (0.0, 0.0)
    blocks.foreach { case (ba, bb) =>
      val h = ba + bb
      val h2 = 2 * cumH + h; val ba2 = 2 * cumA + ba; val bb2 = 2 * cumB + bb
      val y = (h2 * (2 * nn - h2) - nn * h).toDouble
      if (y > 0) {
        val xa = (nn * ba2 - na * h2).toDouble
        val xb = (nn * bb2 - nb * h2).toDouble
        sa += h.toDouble * xa * xa / y
        sb += h.toDouble * xb * xb / y
      }
      cumA += ba; cumB += bb; cumH += h
    }
    val a2 = (nn - 1).toDouble / (nn.toDouble * nn) * (sa / na + sb / nb)
    val r = Stats.qAndersonDarling(spark, sf).collect().head
    assert(r.getLong(0) == na && r.getLong(1) == nb)
    assert(r.getLong(2) == blocks.length.toLong)
    assert(math.abs(r.getDouble(3) - a2) < 1e-5, s"A²: ${r.getDouble(3)} vs $a2")
    // identical samples: X = N·2B̄ − n_a·2H̄ vanishes block by block
    val self = Stats.qAndersonDarling(spark, sf, "view", "view")
      .collect().head
    assert(self.getDouble(3) == 0.0, "self-comparison A² must be exactly 0")
  }

  private def round(v: Double, scale: Int): Double =
    new JBigDecimal(v).setScale(scale, RoundingMode.HALF_UP).doubleValue()

  test("q185: a synthetic level shift raises the alarm at the right day") {
    import spark.implicits._
    // 7 burn-in days at 10/day, then 10 quiet days, then a shift to
    // 25/day: dev = 7*25-70 = 105/day, alarm (>210) on the 3rd shifted
    // day (S = 315)
    val days = (1 to 7).map(i => ("a", LocalDate.of(2024, 1, i), 10L)) ++
      (8 to 17).map(i => ("a", LocalDate.of(2024, 1, i), 10L)) ++
      (18 to 22).map(i => ("a", LocalDate.of(2024, 1, i), 25L))
    val daily = days.toDF("event_type", "day", "c")
      .withColumn("day", col("day").cast("date"))
    val row = Stats.pageCusum(daily).collect().head
    assert(row.getString(0) == "a")
    assert(row.getLong(2) == 70L) // sum7
    assert(row.getString(4) == "2024-01-20") // third shifted day
    assert(row.getLong(5) == 315L)
    assert(row.getLong(3) == 525L) // max S at the last day
  }
}
