package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 second continuation: brute-force driver-side recomputes
  * for the k-sample paired/ordered family (Friedman, Cochran's Q,
  * Jonckheere–Terpstra, Page's L) — each statistic rebuilt from raw
  * collected rows with none of the operators' devices (no value-domain
  * rollups, no range-partition offsets), so an error in the machinery
  * cannot cancel. */
class Round10cSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** (custkey, yr) -> summed cents for complete 1996–98 blocks, plus
    * doubled within-block average ranks. */
  private lazy val blockRanks: Map[Long, Map[Long, Long]] = {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1999-01-01"))
      .select(col("o_custkey").cast("long"),
        year(col("o_orderdate")).cast("long"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val spend = rows.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val byCust = spend.groupBy(_._1._1)
    byCust.collect { case (ck, vs) if vs.size == 3 =>
      val yv = vs.map { case ((_, yr), v) => (yr, v) }.toSeq
      ck -> yv.map { case (yr, v) =>
        val less = yv.count(_._2 < v)
        val eq = yv.count(_._2 == v)
        // doubled average rank: 2*(less+1) + (eq-1)
        yr -> (2L * (less + 1) + eq - 1)
      }.toMap
    }
  }

  test("q299 Friedman matches a per-block rank recount") {
    val n = blockRanks.size.toLong
    assert(n > 50, s"fixture degenerate: only $n complete blocks")
    val dSum = blockRanks.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sumDsq = blockRanks.values.flatten.map(d => d._2 * d._2).sum
    val got = Stats.qFriedman(spark, sf).collect()
    assert(got.length === 3)
    got.foreach { r =>
      assert(r.getAs[Long]("d_sum") === dSum(r.getAs[Long]("yr")))
      assert(r.getAs[Long]("n_blocks") === n)
      assert(r.getAs[Long]("sum_d_sq") === sumDsq)
    }
    // ranks within each block must sum to k(k+1) doubled = 12
    blockRanks.values.foreach(m => assert(m.values.sum === 12L))
    // textbook (Conover) tie-corrected Friedman in AVERAGE-rank units,
    // computed independently of the doubled-rank algebra: the formula
    // the operator's doubled form must reduce to (the earlier /n slip
    // agreed between plan, oracle AND a recount derived from the
    // operator — this recount is derived from the textbook instead)
    val rj = dSum.view.mapValues(_.toDouble / 2.0).toMap
    val sumR2 = sumDsq.toDouble / 4.0
    val s = rj.values.map(r => math.pow(r - n * 2.0, 2)).sum
    val want = 2.0 * s / (sumR2 - n * 12.0)
    assert(math.abs(got.head.getAs[Double]("chi2_f") - want) < 1e-5)
    // and the classic untied spelling must agree on this fixture's
    // near-tieless data
    val untied = 12.0 / (n * 12.0) *
      rj.values.map(r => r * r).sum - 3.0 * n * 4.0
    assert(math.abs(want - untied) < 1e-6 * math.abs(untied) + 1e-4)
  }

  test("q302 Page's L matches the weighted rank fold") {
    val n = blockRanks.size.toLong
    val twoL = blockRanks.values.flatten
      .map { case (yr, d) => (yr - 1995L) * d }.sum
    val got = Stats.qPageTrend(spark, sf).collect().head
    assert(got.getAs[Long]("n_blocks") === n)
    assert(got.getAs[Long]("two_l") === twoL)
    val want = (twoL / 2.0 - 12.0 * n) / math.sqrt(2.0 * n)
    assert(math.abs(got.getAs[Double]("z_page") - want) < 1e-5)
  }

  test("q300 Cochran's Q matches a per-user flag recount") {
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("long"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val flags = rows.groupBy(_._1).view.mapValues { es =>
      def in(lo: String, hi: Option[String]) = es.exists(e =>
        e._2 == "purchase" && e._3 >= lo && hi.forall(e._3 < _))
      (in("2024-01-01", Some("2024-01-11")),
        in("2024-01-11", Some("2024-01-21")),
        in("2024-01-21", None))
    }.toMap
    val got = Stats.qCochranQ(spark, sf).collect().head
    assert(got.getAs[Long]("n_users") === flags.size.toLong)
    val g1 = flags.values.count(_._1).toLong
    val g2 = flags.values.count(_._2).toLong
    val g3 = flags.values.count(_._3).toLong
    assert(got.getAs[Long]("g1") === g1)
    assert(got.getAs[Long]("g2") === g2)
    assert(got.getAs[Long]("g3") === g3)
    val ls = flags.values.map(v =>
      Seq(v._1, v._2, v._3).count(identity).toLong)
    assert(got.getAs[Long]("sum_l") === ls.sum)
    assert(got.getAs[Long]("sum_l_sq") === ls.map(l => l * l).sum)
    val den = (3L * ls.sum - ls.map(l => l * l).sum).toDouble
    if (den > 0) {
      val want = 2.0 * (3.0 * (g1.toDouble * g1 + g2.toDouble * g2 +
        g3.toDouble * g3) - ls.sum.toDouble * ls.sum) / den
      assert(math.abs(got.getAs[Double]("q_stat") - want) < 1e-5)
    }
  }

  test("q301 Jonckheere-Terpstra matches an all-pairs brute force") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(substring(col("o_orderpriority"), 1, 1).cast("long"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // O(n^2) over the sf0.001 fixture (~1.5k orders): the ground truth
    var twoJt = 0L
    var i = 0
    while (i < rows.length) {
      var j = i + 1
      while (j < rows.length) {
        val (ga, va) = rows(i); val (gb, vb) = rows(j)
        if (ga != gb) {
          val (lo, hi) = if (ga < gb) (va, vb) else (vb, va)
          if (lo < hi) twoJt += 2L else if (lo == hi) twoJt += 1L
        }
        j += 1
      }
      i += 1
    }
    val got = Stats.qJonckheereTerpstra(spark, sf).collect().head
    assert(got.getAs[Long]("two_jt") === twoJt)
    val ns = (1 to 5).map(k =>
      got.getAs[Long](s"n$k").toDouble)
    assert(ns.sum.toLong === rows.length.toLong)
    (1 to 5).foreach(k => assert(got.getAs[Long](s"n$k") ===
      rows.count(_._1 == k.toLong).toLong))
    val nn = ns.sum
    val s2 = ns.map(x => x * x).sum
    val s3 = ns.map(x => x * x * (2 * x + 3)).sum
    val want = (twoJt / 2.0 - (nn * nn - s2) / 4.0) /
      math.sqrt((nn * nn * (2 * nn + 3) - s3) / 72.0)
    assert(math.abs(got.getAs[Double]("z_jt") - want) < 1e-5)
  }

  test("q303 log-rank matches a per-hour hypergeometric recount") {
    // q175's subject construction rebuilt driver-side from raw events,
    // plus the first-view cohort tag
    val rows = graft.operators.Tables.events(spark, sf)
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val subj = rows.groupBy(_._1).flatMap { case (uid, es) =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val conv = es.filter(e => e._2 == "purchase" && e._3 >= fv)
          .map(_._3 - fv)
        val durUs = if (conv.nonEmpty) conv.min
          else es.map(_._3).max - fv
        Some((if (uid % 2 == 0) 1L else 0L,
          durUs / 3600000000L, if (conv.nonEmpty) 1L else 0L))
      }
    }.toSeq
    val byDur = subj.groupBy(_._2).toSeq.sortBy(_._1)
    var o1 = 0L; var e1 = 0.0; var v = 0.0; var nTimes = 0L
    var nRisk = subj.length.toLong
    var n1Risk = subj.map(_._1).sum
    byDur.foreach { case (_, rows) =>
      val d = rows.map(_._3).sum
      val d1 = rows.filter(_._1 == 1L).map(_._3).sum
      if (d > 0) {
        nTimes += 1; o1 += d1
        e1 += d.toDouble * n1Risk / nRisk
        if (nRisk > 1)
          v += d.toDouble * (n1Risk.toDouble / nRisk) *
            (1.0 - n1Risk.toDouble / nRisk) * (nRisk - d) / (nRisk - 1.0)
      }
      nRisk -= rows.length
      n1Risk -= rows.map(_._1).sum
    }
    val got = Stats.qLogRank(spark, sf).collect().head
    assert(got.getAs[Long]("n_times") === nTimes)
    assert(got.getAs[Long]("o1") === o1)
    assert(math.abs(got.getAs[Double]("e1") - e1) < 1e-5)
    assert(math.abs(got.getAs[Double]("v") - v) < 1e-5)
    val z = (o1 - e1) / math.sqrt(v)
    assert(math.abs(got.getAs[Double]("z_logrank") - z) < 1e-4)
    // sf0.001 has ~13 distinct conversion hours (latencies are short);
    // the gate's sf0.01 has ~85 — just guard against a collapsed table
    assert(nTimes > 5, s"fixture degenerate: only $nTimes event hours")
  }
}
