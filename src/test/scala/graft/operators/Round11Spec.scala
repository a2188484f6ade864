package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 distribution-comparison family (q359–q364): each statistic
  * is rebuilt driver-side from raw collected events with NONE of the
  * operators' devices — plain per-row ranks/ECDFs over materialized
  * arrays — so an error in the value-domain machinery cannot cancel
  * against itself. */
class Round11Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val arms = Seq("click", "error", "signup", "purchase")

  /** (arm -> (sorted arm cents, sorted view cents)) off one raw scan. */
  private lazy val raw: Map[String, (Array[Long], Array[Long])] = {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    arms.map(a => a -> (byType(a), byType("view"))).toMap
  }

  // pooled ECDF gap diff(v) = cum1(v)*n2 - cum2(v)*n1 at every pooled value
  private def gaps(xs: Array[Long], ys: Array[Long]): Seq[(Long, Long, Long)] = {
    val pooled = (xs ++ ys).distinct.sorted
    pooled.map { v =>
      val c1 = xs.count(_ <= v).toLong
      val c2 = ys.count(_ <= v).toLong
      val cnt = xs.count(_ == v).toLong + ys.count(_ == v).toLong
      (c1 * ys.length - c2 * xs.length, cnt, v)
    }.toSeq
  }

  test("q359 KS: d_num matches the brute-force sup over pooled values") {
    val got = Stats.qKsTest(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    arms.foreach { a =>
      val (xs, ys) = raw(a)
      val want = gaps(xs, ys).map { case (d, _, _) => math.abs(d) }.max
      assert(got(a) == want, a)
    }
  }

  test("q360 CvM: t_num matches the brute-force pooled sum of squared gaps") {
    val got = Stats.qCvmTest(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    arms.foreach { a =>
      val (xs, ys) = raw(a)
      val want = gaps(xs, ys).map { case (d, cnt, _) =>
        BigInt(cnt) * BigInt(d) * BigInt(d) }.sum
      assert(got(a) == want.toDouble, a) // exact value, correctly-rounded cast
    }
  }

  test("q361 Kuiper: D+ and D- match the signed sups") {
    val got = Stats.qKuiperTest(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    arms.foreach { a =>
      val (xs, ys) = raw(a)
      val ds = gaps(xs, ys).map(_._1)
      assert(got(a)._1 == math.max(ds.max, 0L), a)
      assert(got(a)._2 == math.max(-ds.min, 0L), a)
    }
  }

  test("q362 Mood: cells match a literal split at the pooled discrete median") {
    val got = Stats.qMoodMedian(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("v_med"), r.getAs[Long]("a_above"),
          r.getAs[Long]("b_above"), r.getAs[Double]("chi2")))).toMap
    arms.foreach { a =>
      val (xs, ys) = raw(a)
      val pooled = (xs ++ ys).sorted
      val med = pooled((pooled.length - 1) / 2) // value at rank ceil(N/2)
      val aAbove = xs.count(_ > med).toLong
      val bAbove = ys.count(_ > med).toLong
      assert(got(a)._1 == med, a)
      assert(got(a)._2 == aAbove, a)
      assert(got(a)._3 == bAbove, a)
      val (n1, n2) = (xs.length.toLong, ys.length.toLong)
      val (aB, bB) = (n1 - aAbove, n2 - bAbove)
      val det = aAbove.toDouble * bB - bAbove.toDouble * aB
      val denom = n1.toDouble * n2 * (aAbove + bAbove) * (aB + bB)
      val chi2 = if (denom > 0) (n1 + n2) * det * det / denom else 0.0
      assert(math.abs(got(a)._4 - chi2) < 1e-6, a)
    }
  }

  test("q363 Brunner-Munzel matches a per-row midrank recompute") {
    val got = Stats.qBrunnerMunzel(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("sd1"), r.getAs[Long]("sd2"),
          r.getAs[Double]("q1"), r.getAs[Double]("q2"),
          r.getAs[Double]("w_bm")))).toMap
    arms.foreach { a =>
      val (xs, ys) = raw(a)
      val (n1, n2) = (xs.length, ys.length)
      val pooled = (xs ++ ys).sorted
      def midrank(arr: Array[Long], v: Long): Double = {
        val below = arr.count(_ < v); val eq = arr.count(_ == v)
        below + (eq + 1) / 2.0
      }
      val r1 = xs.map(v => midrank(pooled, v))
      val r2 = ys.map(v => midrank(pooled, v))
      val w1 = xs.map(v => midrank(xs, v))
      val w2 = ys.map(v => midrank(ys, v))
      // doubled pooled rank sums are exact integers
      assert(got(a)._1 == math.round(2 * r1.sum), a)
      assert(got(a)._2 == math.round(2 * r2.sum), a)
      val m1 = r1.sum / n1; val m2 = r2.sum / n2
      // q_i = 4·n_i² Σ (R − R* − R̄ + (n+1)/2)²
      val q1 = 4.0 * n1 * n1 * r1.zip(w1).map { case (r, w) =>
        val t = r - w - m1 + (n1 + 1) / 2.0; t * t }.sum
      val q2 = 4.0 * n2 * n2 * r2.zip(w2).map { case (r, w) =>
        val t = r - w - m2 + (n2 + 1) / 2.0; t * t }.sum
      assert(math.abs(got(a)._3 - q1) / math.max(q1, 1.0) < 1e-9, a)
      assert(math.abs(got(a)._4 - q2) / math.max(q2, 1.0) < 1e-9, a)
      val s1sq = q1 / (4.0 * n1 * n1 * (n1 - 1))
      val s2sq = q2 / (4.0 * n2 * n2 * (n2 - 1))
      val se = math.sqrt(n1 * s1sq + n2 * s2sq)
      val w = if (se > 0) n1.toDouble * n2 * (m2 - m1) / ((n1 + n2) * se) else 0.0
      assert(math.abs(got(a)._5 - w) < 1e-5, a)
    }
  }

  test("q371 Yuen: trim moments and t match a literal sort-and-trim recompute") {
    val got = Stats.qYuenTrimmed(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    arms.foreach { a =>
      val (xs0, ys0) = raw(a)
      def side(arr: Array[Long]) = {
        val n = arr.length
        val k = n / 10
        val sorted = arr.sorted
        val trimmed = sorted.slice(k, n - k)
        val lo = sorted(k) // rank k+1
        val hi = sorted(n - k - 1) // rank n-k
        val tsum = trimmed.sum
        val tsumsq = trimmed.map(v => v * v).sum
        (n.toLong, k.toLong, (n - 2 * k).toLong, lo, hi, tsum, tsumsq)
      }
      val (n1, k1, h1, lo1, hi1, tsum1, tsumsq1) = side(xs0)
      val (n2, k2, h2, lo2, hi2, tsum2, tsumsq2) = side(ys0)
      val r = got(a)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("k1") == k1 &&
        r.getAs[Long]("h1") == h1, a)
      assert(r.getAs[Long]("lo1") == lo1 && r.getAs[Long]("hi1") == hi1, a)
      assert(r.getAs[Long]("lo2") == lo2 && r.getAs[Long]("hi2") == hi2, a)
      assert(r.getAs[Long]("tsum1") == tsum1 && r.getAs[Long]("tsumsq1") == tsumsq1, a)
      assert(r.getAs[Long]("tsum2") == tsum2 && r.getAs[Long]("tsumsq2") == tsumsq2, a)
      val wsum1 = tsum1 + k1 * (lo1 + hi1)
      val wsumsq1 = tsumsq1 + k1 * (lo1 * lo1 + hi1 * hi1)
      val wsum2 = tsum2 + k2 * (lo2 + hi2)
      val wsumsq2 = tsumsq2 + k2 * (lo2 * lo2 + hi2 * hi2)
      val swsq1 = (wsumsq1 - wsum1.toDouble * wsum1 / n1) / (n1 - 1)
      val swsq2 = (wsumsq2 - wsum2.toDouble * wsum2 / n2) / (n2 - 1)
      val d1 = (n1 - 1) * swsq1 / (h1.toDouble * (h1 - 1))
      val d2v = (n2 - 1) * swsq2 / (h2.toDouble * (h2 - 1))
      val t = (tsum1.toDouble / h1 - tsum2.toDouble / h2) / math.sqrt(d1 + d2v)
      assert(math.abs(r.getAs[Double]("t_yuen") - t) < 1e-5, a)
    }
  }

  test("q364 Hodges-Lehmann matches the literal median of pairwise dollar diffs") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(FLOOR(value) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byType = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = Stats.qHodgesLehmann(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("npairs"), r.getAs[Long]("hl_lo"),
          r.getAs[Long]("hl_hi")))).toMap
    arms.foreach { a =>
      val xs = byType(a); val ys = byType("view")
      // small enough at the spec's sf to materialize every difference
      val diffs = (for (x <- xs; y <- ys) yield x - y).sorted
      val w = diffs.length.toLong
      val lo = diffs(((w + 1) / 2 - 1).toInt)
      val hi = diffs((w / 2 + 1 - 1).toInt)
      assert(got(a)._1 == w, a)
      assert(got(a)._2 == lo, a)
      assert(got(a)._3 == hi, a)
    }
  }
}
