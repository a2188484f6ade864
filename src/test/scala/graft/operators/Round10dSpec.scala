package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-10 third continuation: brute-force driver-side recomputes
  * for the model-diagnostics batch (CMH, Cliff's delta, Jarque–Bera,
  * Ljung–Box, von Neumann, Brier decomposition) plus the q310
  * stream/batch coverage parity. Each statistic is rebuilt from raw
  * collected rows with none of the operators' devices (no value-domain
  * cumulatives, no n-scaled moment combos), so an error in the
  * machinery cannot cancel against itself. */
class Round10dSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q304 CMH cells, chi-square and OR_MH match a raw recount") {
    // raw truth: order -> (exposed, returned, stratum) from plain scans
    val ret = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), (col("l_returnflag") === "R"))
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.exists(_.getBoolean(1))).toMap
    val nat = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reg = spark.read.parquet(s"$sf/region.parquet")
      .select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_mktsegment"),
        col("c_nationkey").cast("long"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1) == "BUILDING"), reg(nat(r.getLong(2))))).toMap
    val cells = scala.collection.mutable.Map[String, Array[Long]]()
    spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
      .collect()
      .foreach { r =>
        ret.get(r.getLong(0)).foreach { rr =>
          val (x, stratum) = cust(r.getLong(1))
          val c = cells.getOrElseUpdate(stratum, Array(0L, 0L, 0L, 0L))
          val idx = (if (x) 0 else 2) + (if (rr) 0 else 1)
          c(idx) += 1
        }
      }
    val got = Stats.qCmh(spark, sf).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val c = cells(r.getAs[String]("stratum"))
      assert(r.getAs[Long]("n11") === c(0))
      assert(r.getAs[Long]("n10") === c(1))
      assert(r.getAs[Long]("n01") === c(2))
      assert(r.getAs[Long]("n00") === c(3))
    }
    val sumA = cells.values.map(_(0)).sum.toDouble
    val sumE = cells.values.map { c =>
      val nk = c.sum.toDouble
      (c(0) + c(1)) * (c(0) + c(2)) / nk
    }.sum
    val sumV = cells.values.map { c =>
      val nk = c.sum.toDouble
      if (nk > 1)
        (c(0) + c(1)).toDouble * (c(2) + c(3)) * (c(0) + c(2)) *
          (c(1) + c(3)) / (nk * nk * (nk - 1))
      else 0.0
    }.sum
    val wantChi = (sumA - sumE) * (sumA - sumE) / sumV
    assert(math.abs(got.head.getAs[Double]("chi2_cmh") - wantChi) < 1e-4)
    val orMh = cells.values.map(c => c(0).toDouble * c(3) / c.sum).sum /
      cells.values.map(c => c(1).toDouble * c(2) / c.sum).sum
    assert(math.abs(got.head.getAs[Double]("or_mh") - orMh) < 1e-4)
  }

  test("q305 Cliff's delta matches an all-pairs brute force per arm") {
    val vals = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val views = vals.filter(_._1 == "view").map(_._2)
    val got = Stats.qCliffsDelta(spark, sf).collect()
      .map(r => r.getAs[String]("pair") -> r).toMap
    assert(got.keySet === Set("click", "error", "signup", "purchase"))
    got.foreach { case (arm, r) =>
      val xs = vals.filter(_._1 == arm).map(_._2)
      var gt = 0L; var lt = 0L; var tie = 0L
      xs.foreach { x =>
        views.foreach { y =>
          if (x > y) gt += 1 else if (x < y) lt += 1 else tie += 1
        }
      }
      assert(r.getAs[Long]("n1") === xs.length.toLong, arm)
      assert(r.getAs[Long]("n2") === views.length.toLong, arm)
      assert(r.getAs[Long]("n_gt") === gt, arm)
      assert(r.getAs[Long]("n_lt") === lt, arm)
      assert(r.getAs[Long]("n_tie") === tie, arm)
      val want = (gt - lt).toDouble / (xs.length.toDouble * views.length)
      assert(math.abs(r.getAs[Double]("cliffs_delta") - want) < 1e-5, arm)
    }
  }

  test("q306 Jarque-Bera matches moments computed the pedestrian way") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Stats.qJarqueBera(spark, sf).collect()
    assert(got.length === 5)
    got.foreach { r =>
      val xs = rows.filter(_._1 == r.getAs[String]("o_orderpriority"))
        .map(_._2.toDouble)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val m2 = xs.map(x => (x - mean) * (x - mean)).sum / n
      val m3 = xs.map(x => math.pow(x - mean, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - mean, 4)).sum / n
      val g1 = m3 / math.pow(m2, 1.5)
      val g2 = m4 / (m2 * m2) - 3.0
      assert(r.getAs[Long]("n") === xs.length.toLong)
      assert(math.abs(r.getAs[Double]("skewness") - g1) < 1e-4)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") - g2) < 1e-4)
      val jb = n * (g1 * g1 / 6.0 + g2 * g2 / 24.0)
      assert(math.abs(r.getAs[Double]("jb") - jb) < 1e-2)
    }
  }

  /** Per-type daily count series, day-ordered — shared by the two
    * serial-dependence recounts. */
  private lazy val dailyByType: Map[String, Array[Double]] = {
    spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
      .groupBy(_._1).view.mapValues { rs =>
        rs.groupBy(_._2).view.mapValues(_.length.toDouble)
          .toArray.sortBy(_._1).map(_._2)
      }.toMap
  }

  test("q307 Ljung-Box matches textbook autocorrelations") {
    val got = Stats.qLjungBox(spark, sf).collect()
    got.foreach { r =>
      val xs = dailyByType(r.getAs[String]("event_type"))
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val den = xs.map(x => (x - mean) * (x - mean)).sum
      val rhos = (1 to 7).map { k =>
        val num = (0 until xs.length - k)
          .map(t => (xs(t) - mean) * (xs(t + k) - mean)).sum
        num / den
      }
      assert(r.getAs[Long]("n_days") === xs.length.toLong)
      (1 to 7).foreach { k =>
        assert(math.abs(r.getAs[Double](s"rho$k") - rhos(k - 1)) < 1e-4,
          s"lag $k")
      }
      val q = n * (n + 2.0) *
        rhos.zipWithIndex.map { case (rho, i) => rho * rho / (n - i - 1) }.sum
      assert(math.abs(r.getAs[Double]("q_lb") - q) < 1e-2)
    }
  }

  test("q308 von Neumann ratio matches the successive-difference walk") {
    val got = Stats.qVonNeumann(spark, sf).collect()
    got.foreach { r =>
      val xs = dailyByType(r.getAs[String]("event_type"))
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val d2sum = xs.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum
      val ssq = xs.map(x => (x - mean) * (x - mean)).sum
      val eta = d2sum / ssq // n·Σd²/(nΣx²−S²) = Σd²/Σ(x−x̄)²
      assert(math.abs(r.getAs[Double]("eta") - eta) < 1e-4)
      val z = (eta - 2.0) / math.sqrt(4.0 * (n - 2) / (n * n - 1.0))
      assert(math.abs(r.getAs[Double]("z_vn") - z) < 1e-4)
    }
  }

  test("q309 Brier decomposition: raw recount + Murphy identity") {
    val got = Stats.qBrierDecomposition(spark, sf).collect().head
    val brier = got.getAs[Double]("brier")
    val rel = got.getAs[Double]("reliability")
    val res = got.getAs[Double]("resolution")
    val unc = got.getAs[Double]("uncertainty")
    // Murphy identity — exact up to floating round-off + the 1e-6
    // output rounding
    assert(math.abs(brier - (rel - res + unc)) < 1e-5)
    // raw recount via an independent per-document pass (the operator
    // aggregates the score domain; this walks documents)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(lower(col("text")), col("n_chars").cast("long")).collect()
      .map { r =>
        val toks = r.getString(0).split("\\s+").filter(_.nonEmpty)
        val stops = Set("the", "a", "of", "and", "to", "in", "is", "it")
        val hits = toks.count(stops.contains)
        val dhits = toks.distinct.count(stops.contains)
        val score = toks.length * 100L + hits * 10L + dhits
        val pos = if (r.getLong(1) >= 300) 1L else 0L
        (score, pos)
      }
    val n = docs.length.toDouble
    val wantBrier = docs.map { case (s, o) =>
      val p = s / 9000.0; (p - o) * (p - o)
    }.sum / n
    assert(math.abs(brier - wantBrier) < 1e-5)
    val obar = docs.map(_._2).sum / n
    assert(math.abs(unc - obar * (1 - obar)) < 1e-5)
    val byScore = docs.groupBy(_._1)
    val wantRel = byScore.values.map { g =>
      val pk = g.head._1 / 9000.0
      val ok = g.map(_._2).sum.toDouble / g.length
      g.length * (pk - ok) * (pk - ok)
    }.sum / n
    assert(math.abs(rel - wantRel) < 1e-5)
    val wantRes = byScore.values.map { g =>
      val ok = g.map(_._2).sum.toDouble / g.length
      g.length * (ok - obar) * (ok - obar)
    }.sum / n
    assert(math.abs(res - wantRes) < 1e-5)
  }

  test("q310 streaming coverage equals the batch interval union exactly") {
    val cols = Seq("CAST(user_id AS BIGINT) AS user_id",
      "CAST(n_islands AS BIGINT) AS n_islands",
      "CAST(covered_sec AS BIGINT) AS covered_sec")
    val batch = Relational.qIntervalCoverage(spark, sf)
      .selectExpr(cols: _*).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stream = graft.streaming.EventTime.qStreamingCoverage(spark, sf)
      .selectExpr(cols: _*).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("q311 Zipf fit matches a driver-side rank walk and OLS") {
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), lower(col("text"))).collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty)
        .map(w => (r.getString(0), w)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = TextAnalysis.qZipf(spark, sf).collect()
    got.foreach { r =>
      val src = r.getAs[String]("source")
      val ranked = freq.collect { case ((s0, w), f) if s0 == src => (w, f) }
        .toSeq.sortBy { case (w, f) => (-f, w) }.take(1000)
      assert(r.getAs[Long]("n_top") === ranked.length.toLong, src)
      val pts = ranked.zipWithIndex.map { case ((_, f), i) =>
        (math.log(i + 1.0), math.log(f.toDouble))
      }
      val n = pts.length.toDouble
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val syy = pts.map(p => p._2 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-4, src)
      // natural text: the head slope sits in the Zipf regime
      assert(slope < 0.0, src)
      val r2 = (n * sxy - sx * sy) * (n * sxy - sx * sy) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(math.abs(r.getAs[Double]("fit_r2") - r2) < 1e-4, src)
    }
  }

  test("q312 Heaps checkpoints and fit match a first-seen scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").cast("long"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1).split("\\s+")
        .filter(_.nonEmpty)))
    val mx = docs.map(_._1).max
    val firstSeen = scala.collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (d0, ws) =>
      ws.foreach(w => if (!firstSeen.contains(w)) firstSeen(w) = d0)
    }
    val got = TextAnalysis.qHeaps(spark, sf).collect()
    assert(got.length === 8)
    got.foreach { r =>
      val cut = r.getAs[Long]("cut")
      val nTokens = docs.filter(_._1 * 8 <= mx * cut).map(_._2.length.toLong).sum
      val nTypes = firstSeen.values.count(_ * 8 <= mx * cut).toLong
      assert(r.getAs[Long]("threshold_doc") === mx * cut / 8)
      assert(r.getAs[Long]("n_tokens") === nTokens, s"cut $cut")
      assert(r.getAs[Long]("n_types") === nTypes, s"cut $cut")
    }
    assert(got.map(_.getAs[Long]("n_tokens")).toSeq ===
      got.map(_.getAs[Long]("n_tokens")).toSeq.sorted)
    // since round 11 the gate hashes only the exact sufficient
    // statistics; the transcendental (beta, lnK) tail is pinned HERE
    // against a driver-side OLS on the same integers. (The driver
    // fixture's vocabulary is FIXED at ~31 types, so its beta is
    // legitimately ~0 — the degenerate "stopped being novel" reading;
    // the growing-vocabulary regime is pinned on a crafted corpus
    // below.)
    val fitRows = TextAnalysis.heapsFit(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("long").as("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > 0)).collect()
    val xs = got.map(r => math.log(r.getAs[Long]("n_tokens").toDouble))
    val ys = got.map(r => math.log(r.getAs[Long]("n_types").toDouble))
    val k = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val den = k * sxx - sx * sx
    val betaWant = if (den > 0) (k * sxy - sx * sy) / den else 0.0
    val beta = fitRows.head.getAs[Double]("heaps_beta")
    assert(math.abs(beta - betaWant) < 1e-5, s"beta $beta vs $betaWant")
    val lnkWant = (sy - math.rint(betaWant * 1e6) / 1e6 * sx) / k
    assert(math.abs(fitRows.head.getAs[Double]("heaps_lnk") - lnkWant)
      < 1e-5)
    assert(beta >= 0.0 && beta < 1.0)
  }

  test("q312 core: a growing-vocabulary corpus fits 0 < beta < 1") {
    import spark.implicits._
    // doc d contributes ~sqrt growth: types "w<j>" for j <= 4*sqrt(d+1)
    // plus repeated filler of existing types — vocabulary grows
    // sublinearly in tokens, the Heaps regime
    val toks = (0L until 64L).flatMap { d0 =>
      val newTypes = (0 until (4 * math.sqrt(d0 + 1.0)).toInt)
        .map(j => (d0, s"w$j"))
      val filler = (0 until 20).map(j => (d0, s"w${j % 3}"))
      newTypes ++ filler
    }.toDF("doc_id", "w")
    val fit = TextAnalysis.heapsFit(toks).collect()
    val beta = fit.head.getAs[Double]("heaps_beta")
    assert(beta > 0.0 && beta < 1.0, s"beta $beta")
    // types strictly grow across the checkpoints in this corpus
    val types = fit.map(_.getAs[Long]("n_types")).toSeq
    assert(types === types.sorted && types.distinct.length > 1)
  }

  test("q314 streaming LOCF equals a driver-side spine walk exactly") {
    // batch truth: full calendar spine per type, carry-forward level,
    // checksum = sum of idx*level — computed the pedestrian way
    val days = Tables.events(spark, sf)
      .selectExpr("event_type",
        "CAST(unix_micros(ts) div 86400000000 AS BIGINT) AS d")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val want = days.map { case (tpe, ds) =>
      val cnt = ds.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val mn = ds.min; val mx = ds.max
      var lvl = 0L; var sum = 0L; var obs = 0L
      (mn to mx).foreach { d0 =>
        cnt.get(d0).foreach { c => lvl = c; obs += 1 }
        sum += (d0 - mn) * lvl
      }
      tpe -> (mx - mn + 1, obs, mx - mn + 1 - obs, sum)
    }
    val got = graft.streaming.EventTime.qStreamingLocf(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val (nd, no, nf, ck) = want(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") === nd)
      assert(r.getAs[Long]("n_obs") === no)
      assert(r.getAs[Long]("n_filled") === nf)
      assert(r.getAs[Long]("locf_checksum") === ck)
    }
  }

  test("q315 confusion cells and summary match a per-doc recount") {
    val stops = Map(
      "en" -> Set("the", "a", "of", "and", "to", "in", "is", "it"),
      "es" -> Set("el", "la", "de", "y", "en", "es", "un", "que"),
      "fr" -> Set("le", "la", "de", "et", "en", "est", "un", "que"))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), lower(col("text"))).collect()
      .map { r =>
        val toks = r.getString(1).split("\\s+").filter(_.nonEmpty).distinct.toSet
        val en = (toks & stops("en")).size
        val es = (toks & stops("es")).size
        val fr = (toks & stops("fr")).size
        val pred =
          if (Seq(en, es, fr).max == 0) "und"
          else if (en >= es && en >= fr) "en"
          else if (es >= fr) "es" else "fr"
        (r.getString(0), pred)
      }
    val got = TextAnalysis.qLangConfusion(spark, sf).collect()
    val classes = (docs.map(_._1) ++ docs.map(_._2)).distinct.toSet
    assert(got.map(_.getAs[String]("cls")).toSet === classes)
    var tpTotal = 0L
    got.foreach { r =>
      val cls = r.getAs[String]("cls")
      val nA = docs.count(_._1 == cls).toLong
      val nP = docs.count(_._2 == cls).toLong
      val tp = docs.count(d0 => d0._1 == cls && d0._2 == cls).toLong
      assert(r.getAs[Long]("n_actual") === nA, cls)
      assert(r.getAs[Long]("n_pred") === nP, cls)
      assert(r.getAs[Long]("tp") === tp, cls)
      val p = if (nP > 0) tp.toDouble / nP else 0.0
      val rr = if (nA > 0) tp.toDouble / nA else 0.0
      assert(math.abs(r.getAs[Double]("prec") - p) < 1e-6, cls)
      assert(math.abs(r.getAs[Double]("rec") - rr) < 1e-6, cls)
      tpTotal += tp
    }
    val acc = tpTotal.toDouble / docs.length
    assert(math.abs(got.head.getAs[Double]("accuracy") - acc) < 1e-6)
  }

  test("q316 Grubbs matches a direct max-deviation recount") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderpriority"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val got = Stats.qGrubbs(spark, sf).collect()
    assert(got.length === 5)
    got.foreach { r =>
      val xs = rows.filter(_._1 == r.getAs[String]("o_orderpriority"))
        .map(_._2)
      val n = xs.length.toLong
      val s1 = xs.sum
      val maxdev = xs.map(x => math.abs(n * x - s1)).max
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("maxdev_scaled") === maxdev)
      val mean = s1.toDouble / n
      val sd = math.sqrt(
        xs.map(x => (x - mean) * (x - mean)).sum / (n - 1.0))
      val g = xs.map(x => math.abs(x - mean)).max / sd
      assert(math.abs(r.getAs[Double]("grubbs_g") - g) < 1e-4)
    }
  }

  test("q317 Cronbach's alpha matches an item-variance recount") {
    val spend = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1999-01-01"))
      .select(col("o_custkey").cast("long"),
        year(col("o_orderdate")).cast("long"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap
    val blocks = spend.groupBy(_._1._1).collect {
      case (_, vs) if vs.size == 3 =>
        val m = vs.map { case ((_, yr), v) => yr -> v }
        (m(1996L).toDouble, m(1997L).toDouble, m(1998L).toDouble)
    }.toSeq
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1.0)
    }
    val vSum = variance(blocks.map(_._1)) + variance(blocks.map(_._2)) +
      variance(blocks.map(_._3))
    val vTot = variance(blocks.map(b => b._1 + b._2 + b._3))
    val alpha = 1.5 * (1.0 - vSum / vTot)
    val got = Stats.qCronbachAlpha(spark, sf).collect().head
    assert(got.getAs[Long]("n_blocks") === blocks.length.toLong)
    assert(got.getAs[Long]("k") === 3L)
    assert(math.abs(got.getAs[Double]("cronbach_alpha") - alpha) < 1e-4)
  }

  test("q318 MASE matches a driver-side lag walk") {
    val got = Stats.qMase(spark, sf).collect()
    got.foreach { r =>
      val xs = dailyByType(r.getAs[String]("event_type")).map(_.toLong)
      val n = xs.length
      val d1 = (1 until n).map(t => math.abs(xs(t) - xs(t - 1))).sum
      val d7 = (7 until n).map(t => math.abs(xs(t) - xs(t - 7))).sum
      assert(r.getAs[Long]("n_days") === n.toLong)
      assert(r.getAs[Long]("sum_abs_d1") === d1)
      assert(r.getAs[Long]("sum_abs_d7") === d7)
      val mase = (d7.toDouble / (n - 7)) / (d1.toDouble / (n - 1))
      assert(math.abs(r.getAs[Double]("mase") - mase) < 1e-4)
    }
  }

  test("q319 Hellinger matrix matches a per-pair histogram recount") {
    def bucket(n: Long): Long =
      if (n <= 64) 64 else if (n <= 128) 128 else if (n <= 256) 256
      else if (n <= 512) 512 else if (n <= 1024) 1024
      else if (n <= 2048) 2048 else 4096
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("n_chars").cast("long")).collect()
      .map(r => (r.getString(0), bucket(r.getLong(1))))
    val bySource = docs.groupBy(_._1).view.mapValues { rs =>
      rs.groupBy(_._2).view.mapValues(_.length.toDouble / rs.length).toMap
    }.toMap
    val got = TextAnalysis.qHellingerMatrix(spark, sf).collect()
    val sources = bySource.keys.toSeq.sorted
    val expectedPairs = (for {
      i <- sources.indices; j <- i + 1 until sources.length
      if (bySource(sources(i)).keySet &
        bySource(sources(j)).keySet).nonEmpty
    } yield (sources(i), sources(j))).toSet
    assert(got.map(r => (r.getAs[String]("src_a"),
      r.getAs[String]("src_b"))).toSet === expectedPairs)
    got.foreach { r =>
      val pa = bySource(r.getAs[String]("src_a"))
      val pb = bySource(r.getAs[String]("src_b"))
      val common = pa.keySet & pb.keySet
      val bc = common.toSeq.map(b => math.sqrt(pa(b) * pb(b))).sum
      assert(r.getAs[Long]("n_buckets_common") === common.size.toLong)
      assert(math.abs(r.getAs[Double]("bhattacharyya") - bc) < 1e-5)
      assert(math.abs(r.getAs[Double]("hellinger_sq") - (1.0 - bc)) < 1e-5)
      // BC is a coefficient in [0, 1]
      assert(bc >= 0.0 && bc <= 1.0 + 1e-9)
    }
  }

  test("q313 Woolf statistic matches the ln-OR dispersion recount") {
    val got = Stats.qWoolf(spark, sf).collect()
    val cells = got.map(r => (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00")))
    // cells must agree with q304's (shared construction)
    val cmh = Stats.qCmh(spark, sf).collect()
      .map(r => (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
        r.getAs[Long]("n01"), r.getAs[Long]("n00"))).toSet
    assert(cells.toSet === cmh)
    val okCells = cells.filter(c => c._1 > 0 && c._2 > 0 && c._3 > 0 && c._4 > 0)
    assert(got.head.getAs[Long]("k_used") === okCells.length.toLong)
    val ws = okCells.map { c =>
      val or = c._1.toDouble * c._4 / (c._2.toDouble * c._3)
      val w = 1.0 / (1.0 / c._1 + 1.0 / c._2 + 1.0 / c._3 + 1.0 / c._4)
      (w, math.log(or))
    }
    val sw = ws.map(_._1).sum
    val lbar = ws.map(p => p._1 * p._2).sum / sw
    val chi = ws.map(p => p._1 * (p._2 - lbar) * (p._2 - lbar)).sum
    assert(math.abs(got.head.getAs[Double]("woolf_chi2") - chi) < 1e-4)
    assert(math.abs(got.head.getAs[Double]("ln_or_pooled") - lbar) < 1e-4)
  }
}
