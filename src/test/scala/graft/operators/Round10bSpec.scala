package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 continuation surface: brute-force recomputations for the
  * three new classical tests (Wilcoxon signed-rank, McNemar,
  * Cochran–Armitage), the integer-EWMA detector core against an
  * independent reference recursion (synthetic + fixture), and the
  * q298 batch↔streaming parity asserted in-suite (the gate pins both
  * against the DuckDB recursive-CTE oracle independently). The nine
  * TPC-H completion shapes (q286–q294) are oracle-gated; here only
  * their non-SQL contracts (q292's ties-survive rule) get a spec. */
class Round10bSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q295 Wilcoxon signed-rank matches a driver-side rank walk") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_custkey").cast("long"),
        year(col("o_orderdate")).cast("int"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCust = rows.groupBy(_._1)
    val diffs = byCust.values.flatMap { os =>
      val s96 = os.filter(_._2 == 1996).map(_._3)
      val s97 = os.filter(_._2 == 1997).map(_._3)
      if (s96.nonEmpty && s97.nonEmpty) Some(s97.sum - s96.sum) else None
    }.filter(_ != 0L).toSeq
    // doubled average ranks of |diff| over the sorted tie groups
    val groups = diffs.groupBy(d => math.abs(d)).toSeq.sortBy(_._1)
    var cum = 0L
    var twoWPlus = 0L; var twoWMinus = 0L; var tie = 0L
    groups.foreach { case (_, ds) =>
      val cnt = ds.size.toLong
      val dr = 2L * (cum + cnt) - cnt + 1L
      val pos = ds.count(_ > 0).toLong
      twoWPlus += pos * dr
      twoWMinus += (cnt - pos) * dr
      tie += cnt * cnt * cnt - cnt
      cum += cnt
    }
    val n = diffs.size.toLong
    val got = Stats.qWilcoxonSignedRank(spark, sf).collect().head
    assert(got.getAs[Long]("n_pairs") === n)
    assert(got.getAs[Long]("two_w_plus") === twoWPlus)
    assert(got.getAs[Long]("two_w_minus") === twoWMinus)
    assert(got.getAs[Long]("tie_term") === tie)
    // the built-in identity: W+ + W- = n(n+1)/2 (doubled: n(n+1))
    assert(twoWPlus + twoWMinus === n * (n + 1))
    assert(n > 10, s"fixture degenerate: only $n informative pairs")
  }

  test("q296 McNemar matches a driver-side 2x2 recount") {
    // ts is TIMESTAMP_NTZ: format to fixed-width wall-clock strings so the
    // midnight cut compares lexically, timezone-free, exactly as the
    // operator's `ts < '2024-01-16'` NTZ comparison does
    val rows = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id").cast("long"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val mid = "2024-01-16 00:00:00"
    val byUser = rows.groupBy(_._1).view.mapValues { es =>
      val a = es.exists(e => e._2 == "purchase" && e._3 < mid)
      val b = es.exists(e => e._2 == "purchase" && e._3 >= mid)
      (a, b)
    }.toMap
    val got = Stats.qMcNemar(spark, sf).collect().head
    assert(got.getAs[Long]("n_users") === byUser.size.toLong)
    assert(got.getAs[Long]("n_both") ===
      byUser.values.count(v => v._1 && v._2).toLong)
    assert(got.getAs[Long]("n_early_only") ===
      byUser.values.count(v => v._1 && !v._2).toLong)
    assert(got.getAs[Long]("n_late_only") ===
      byUser.values.count(v => !v._1 && v._2).toLong)
    assert(got.getAs[Long]("n_neither") ===
      byUser.values.count(v => !v._1 && !v._2).toLong)
    val b = got.getAs[Long]("n_early_only").toDouble
    val c = got.getAs[Long]("n_late_only").toDouble
    if (b + c > 0)
      assert(math.abs(got.getAs[Double]("chi2") -
        (b - c) * (b - c) / (b + c)) < 1e-6)
  }

  test("q297 Cochran–Armitage matches a driver-side trend recount") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val retByOrder = li.groupBy(_._1).view
      .mapValues(ls => if (ls.exists(_._2 == "R")) 1L else 0L).toMap
    val os = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).substring(0, 1).toLong))
      .filter(o => retByOrder.contains(o._1))
    val n = os.length.toLong
    val rTot = os.map(o => retByOrder(o._1)).sum
    val sumSn = os.map(_._2).sum
    val sumS2n = os.map(o => o._2 * o._2).sum
    val sumSr = os.map(o => o._2 * retByOrder(o._1)).sum
    val got = Stats.qCochranArmitage(spark, sf).collect().head
    assert(got.getAs[Long]("n_orders") === n)
    assert(got.getAs[Long]("n_returned") === rTot)
    assert(got.getAs[Long]("sum_sn") === sumSn)
    assert(got.getAs[Long]("sum_s2n") === sumS2n)
    assert(got.getAs[Long]("sum_sr") === sumSr)
    val tnum = (n * sumSr - rTot * sumSn).toDouble
    val m = n.toDouble * sumS2n - sumSn.toDouble * sumSn
    val v = rTot.toDouble * (n - rTot) * m / n
    if (v > 0)
      assert(math.abs(got.getAs[Double]("z_score") - tnum / math.sqrt(v)) < 1e-5)
  }

  /** Independent reference for the integer-EWMA recursion. */
  private def ewmaRef(series: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    var e = 0L; var n = 0L; var spikes = 0L; var first = -1L
    series.sortBy(_._1).foreach { case (h, c) =>
      val v = c * 1000000L
      if (n == 0L) e = v
      else {
        if (2L * v > 3L * e) { spikes += 1; if (first < 0) first = h }
        e = (v + e) / 2L
      }
      n += 1L
    }
    (n, e, spikes, first)
  }

  test("ewmaSpikes core: synthetic step series spikes exactly where the reference says") {
    // flat 10/hour for 48h, then a 40/hour burst: the first burst hour
    // must spike (40e6·2 > ~10e6·3) and the EWMA must converge back
    import spark.implicits._
    val series = (0L until 48L).map(h => ("t", h, 10L)) ++
      (48L until 52L).map(h => ("t", h, 40L))
    val df = series.toDF("event_type", "h", "c")
    val got = Stats.ewmaSpikes(spark, df).collect().head
    val (n, e, spikes, first) = ewmaRef(series.map(x => (x._2, x._3)))
    assert(got.getAs[Long]("n_hours") === n)
    assert(got.getAs[Long]("final_ewma_micro") === e)
    assert(got.getAs[Long]("n_spikes") === spikes)
    assert(got.getAs[Long]("first_spike_hour") === first)
    assert(first === 48L, "the burst onset must be the first spike")
    assert(spikes >= 1L)
  }

  test("q298b batch fold matches the reference recursion on the fixture") {
    val hourly = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("event_type"),
        expr("unix_timestamp(date_trunc('HOUR', ts)) div 3600").as("h"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = hourly.groupBy(_._1).view
      .mapValues(s => ewmaRef(s.map(x => (x._2, x._3)).toSeq)).toMap
    val got = Stats.qEwmaMonitor(spark, sf).collect()
    assert(got.length === expect.size)
    got.foreach { r =>
      val (n, e, spikes, first) = expect(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_hours") === n)
      assert(r.getAs[Long]("final_ewma_micro") === e)
      assert(r.getAs[Long]("n_spikes") === spikes)
      assert(r.getAs[Long]("first_spike_hour") === first)
    }
  }

  test("q298 streaming EWMA equals the batch fold bit for bit (eleventh parity)") {
    val batch = Stats.qEwmaMonitor(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val stream = graft.streaming.EventTime.qStreamingEwma(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(stream === batch)
  }

  test("q292 top supplier: ties-survive rule (every row equals the max)") {
    val got = Relational.qTopSupplier(spark, sf).collect()
    assert(got.nonEmpty)
    val mx = got.map(_.getAs[Long]("total_rev_x1e4")).max
    assert(got.forall(_.getAs[Long]("total_rev_x1e4") == mx))
  }
}
