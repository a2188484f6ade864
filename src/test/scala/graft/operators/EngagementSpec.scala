package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The round-15 batch (q193–q223: engagement, experimentation, view
  * maintenance, profiling, TPC-H shapes, streaming parities) —
  * driver-side recomputation of each contract on the raw sf0.001
  * rows, so a same-wrong-answer-on-both-engines bug can't hide behind
  * the DuckDB oracle. */
class EngagementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // (user_id, event_type, epoch-day, us, event_id, cents) raw replay
  private lazy val evRaw: Seq[(Long, String, Long, Long, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("datediff(to_date(ts), date'1970-01-01')"),
        unix_micros(col("ts")), col("event_id"),
        expr("CAST(ROUND(value * 100, 0) AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong,
        r.getLong(3), r.getLong(4), r.getLong(5)))

  test("q193: merged rollup == direct build on every type; error in band") {
    val got = Stats.qHllRollup(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("merged_eq_direct"),
        s"${r.getAs[String]("event_type")}: merged sketch != direct")
      assert(r.getAs[Double]("err_pct") < 5.0,
        s"${r.getAs[String]("event_type")}: err ${r.getAs[Double]("err_pct")}%")
      assert(r.getAs[Double]("est_merged") == r.getAs[Double]("est_direct"))
    }
  }

  test("q194: masks, popcounts, and streaks match a bit-level recompute") {
    val anchor = evRaw.map(_._3).max
    val want = evRaw.map(e => (e._1, anchor - e._3))
      .filter(i => i._2 >= 0 && i._2 <= 61).distinct
      .groupBy(_._1).map { case (u, idxs) =>
        val mask = idxs.map(i => 1L << i._2).sum
        var streak = 0L
        while (streak <= 62 && (mask & (1L << streak)) != 0) streak += 1
        (u, mask, java.lang.Long.bitCount(mask).toLong, streak,
          java.lang.Long.bitCount(mask & 127L).toLong)
      }.toSet
    val got = Stats.qActivityBitmask(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
  }

  test("q195: cells and z match an exact driver recompute") {
    val perUser = evRaw.groupBy(_._1).map { case (_, rows) =>
      val cut = rows.map(_._4).min + 259200000000L
      def exp(t: String) =
        if (rows.exists(r => r._2 == t && r._4 < cut)) 1L else 0L
      (exp("view"), exp("click"), exp("error"), exp("signup"),
        if (rows.exists(r => r._2 == "purchase" && r._4 >= cut)) 1L else 0L)
    }.toSeq
    val n = perUser.size.toLong
    val nc = perUser.map(_._5).sum
    def z(ne: Long, ce: Long, nu: Long, cu: Long): Double =
      if (ne > 0 && nu > 0 && ce + cu > 0 && ce + cu < ne + nu) {
        val p = (ce + cu).toDouble / (ne + nu).toDouble
        val v = (ce.toDouble / ne.toDouble - cu.toDouble / nu.toDouble) /
          math.sqrt(p * (1.0 - p) * (1.0 / ne.toDouble + 1.0 / nu.toDouble))
        v
      } else 0.0
    val want = Seq(
      ("view", perUser.map(_._1).sum,
        perUser.filter(_._1 == 1).map(_._5).sum),
      ("click", perUser.map(_._2).sum,
        perUser.filter(_._2 == 1).map(_._5).sum),
      ("error", perUser.map(_._3).sum,
        perUser.filter(_._3 == 1).map(_._5).sum),
      ("signup", perUser.map(_._4).sum,
        perUser.filter(_._4 == 1).map(_._5).sum)
    ).map { case (t, e, ec) => (t, e, ec, n - e, nc - ec) }
    val got = Stats.qExposureConversion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).sortBy(_._1)
    assert(got.map(g => (g._1, g._2, g._3, g._4, g._5)).toSet ==
      want.toSet)
    got.foreach { g =>
      val w = want.find(_._1 == g._1).get
      assert(math.abs(g._6 - z(w._2, w._3, w._4, w._5)) < 1e-6, g._1)
    }
  }

  test("q196: moments match exact BigInt sufficient statistics") {
    val want = evRaw.groupBy(_._2).map { case (t, rows) =>
      val vs = rows.map(r => BigInt(r._6))
      val n = BigInt(vs.size)
      val s1 = vs.sum; val s2 = vs.map(v => v * v).sum
      val s3 = vs.map(v => v * v * v).sum; val s4 = vs.map(v => v.pow(4)).sum
      val a2 = (n * s2 - s1 * s1).toDouble
      val a3 = (n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1).toDouble
      val a4 = (n * n * n * s4 - 4 * n * n * s1 * s3 +
        6 * n * s1 * s1 * s2 - 3 * s1.pow(4)).toDouble
      t -> (vs.size.toLong, a3 / (a2 * math.sqrt(a2)), a4 / (a2 * a2) - 3.0)
    }
    val got = Stats.qHigherMoments(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, sk, ku) = want(r.getString(0))
      assert(r.getLong(1) == n)
      assert(math.abs(r.getDouble(4) - sk) < 1e-6, s"${r.getString(0)} skew")
      assert(math.abs(r.getDouble(5) - ku) < 1e-6, s"${r.getString(0)} kurt")
    }
  }

  test("q197: med7 equals the sorted-frame middle at every day") {
    val want = evRaw.groupBy(_._2).flatMap { case (t, rows) =>
      val daily = rows.groupBy(_._3).map { case (d, g) => (d, g.size.toLong) }
        .toSeq.sortBy(_._1)
      daily.indices.map { i =>
        val frame = daily.slice(math.max(0, i - 3), math.min(daily.size, i + 4))
          .map(_._2).sorted
        val med = frame((frame.size + 1) / 2 - 1)
        (t, daily(i)._1, daily(i)._2, med,
          if (daily(i)._2 > 2 * med) 1L else 0L)
      }
    }.toSet
    val got = Stats.qRollingMedian(spark, sf).collect()
      .map(r => (r.getString(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay,
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want)
  }

  test("q198: bins match the cumulative-offset plan; contiguous fills") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(d => (d._1, d._2 / 50)).map { case ((s, f), g) =>
      (s, f, g.size.toLong, g.map(_._3).sum)
    }.toSeq.groupBy(_._1).flatMap { case (s, files) =>
      val sorted = files.sortBy(_._2)
      val cums = sorted.scanLeft(0L)(_ + _._4)
      sorted.zip(cums).map { case ((_, _, nd, b), prev) =>
        (s, prev / 65536L, nd, b)
      }.groupBy(_._2).map { case (bin, g) =>
        val bytes = g.map(_._4).sum
        (s, bin, g.size.toLong, g.map(_._3).sum, bytes,
          bytes * 10000 / 65536L)
      }
    }.toSet
    val got = Bucketing.qCompactionPlan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }

  test("q199: attribution matches an ordered driver replay") {
    val want = evRaw.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var last = Long.MinValue
      rows.sortBy(r => (r._4, r._5)).flatMap { case (_, t, _, us, _, cents) =>
        t match {
          case "purchase" =>
            val bucket =
              if (last == Long.MinValue || us - last / 8 > 86400000000L)
                "unattributed"
              else if (last % 8 == 2) "click" else "view"
            Some((bucket, cents))
          case "click" => last = math.max(last, us * 8 + 2); None
          case "view"  => last = math.max(last, us * 8 + 1); None
          case _       => None
        }
      }
    }.groupBy(_._1).map { case (b, g) =>
      (b, g.size.toLong, g.map(_._2).sum)
    }.toSet
    val got = Stats.qLastTouch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("q200: streaming attribution == batch q199 bit for bit") {
    val batch = Stats.qLastTouch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val stream = graft.streaming.EventTime.qStreamingAttribution(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stream == batch)
  }

  // exact 1e-4-dollar line revenue + (orderkey, priority) pairs for the
  // join-shaped specs below
  private lazy val liRev: Seq[(Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  private lazy val ordPrio: Map[Long, String] =
    Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap

  test("q201: delta terms sum to the direct full-join recompute") {
    val fullWant = liRev.flatMap { case (k, rev) =>
      ordPrio.get(k).map(p => (p, rev))
    }.groupBy(_._1).map { case (p, g) => p -> (g.map(_._2).sum, g.size.toLong) }
    val got = Relational.qDeltaView(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == fullWant.keySet)
    got.foreach { r =>
      val (rev, n) = fullWant(r.getString(0))
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == r.getLong(4),
        s"${r.getString(0)}: terms don't sum to total")
      assert(r.getLong(4) == rev, s"${r.getString(0)}: total != direct")
      assert(r.getLong(5) == n)
      // all three terms are genuinely exercised somewhere
    }
    assert(got.map(_.getLong(2)).sum > 0 && got.map(_.getLong(3)).sum > 0)
  }

  test("q202: rolling distinct equals the windowed set recompute") {
    val du = evRaw.map(e => (e._2, e._3, e._1)).distinct
    val want = du.map(d => (d._1, d._2)).distinct.map { case (t, end) =>
      val users = du.filter(d =>
        d._1 == t && d._2 >= end - 6 && d._2 <= end).map(_._3).toSet
      val today = du.filter(d => d._1 == t && d._2 == end).map(_._3).toSet
      (t, end, users.size.toLong, today.size.toLong)
    }.toSet
    val got = Relational.qRollingDistinct(spark, sf).collect()
      .map(r => (r.getString(0),
        java.time.LocalDate.parse(r.getString(1)).toEpochDay,
        r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
  }

  test("q203: sampled aggregates match the md5-keyed driver replay") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val keep = ordPrio.keySet.filter(k => md5hex(s"js:$k").take(2) < "0c")
    val joined = liRev.flatMap { case (k, rev) =>
      ordPrio.get(k).map(p => (p, k, rev))
    }
    val want = joined.groupBy(_._1).map { case (p, g) =>
      val sg = g.filter(r => keep(r._2))
      (p, g.map(_._2).distinct.size.toLong, g.size.toLong, g.map(_._3).sum,
        sg.map(_._2).distinct.size.toLong, sg.size.toLong, sg.map(_._3).sum)
    }.toSet
    val got = Relational.qJoinSample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want)
    // the sample is non-trivial on this fixture
    assert(got.exists(_._5 > 0))
  }

  test("q204: modal bucket, count, and tie count match a recompute") {
    val want = evRaw.groupBy(_._2).map { case (t, rows) =>
      // floorDiv mirrors the operator's FLOOR(value): integer `/`
      // truncates toward zero, which diverges on negative cents — a
      // fixture regen with negative values would then fail spuriously
      val counts = rows.groupBy(r => Math.floorDiv(r._6, 100L)).map { case (b, g) =>
        (b, g.size.toLong)
      }
      val modal = counts.values.max
      (t, counts.filter(_._2 == modal).keys.min, modal,
        counts.count(_._2 == modal).toLong)
    }.toSet
    val got = Relational.qMode(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
  }

  test("q205: first-5 names are the sorted alphabetical head per nation") {
    val cn = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_name"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nn = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val want = cn.groupBy(c => nn(c._1)).map { case (n, g) =>
      (n, g.size.toLong, g.map(_._2).sorted.take(5).mkString(","))
    }.toSet
    val got = Relational.qListAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
  }

  test("q206: subtraction equals the direct after-state; deletes real") {
    val joined = liRev.flatMap { case (k, rev) =>
      ordPrio.get(k).map(p => (p, k, rev))
    }
    val want = joined.groupBy(_._1).map { case (p, g) =>
      val kept = g.filter(_._2 % 13 != 0)
      (p, g.map(_._3).sum, g.filter(_._2 % 13 == 0).map(_._3).sum,
        kept.map(_._3).sum, kept.size.toLong)
    }.toSet
    val got = Relational.qRetractionView(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    got.foreach(r => assert(r._2 - r._3 == r._4))
    assert(got.exists(_._3 > 0))
  }

  test("q207: FD stats match per-edge recomputes; key edges hold") {
    def recompute(pairs: Seq[(Long, String)], name: String) = {
      val byL = pairs.groupBy(_._1).map { case (_, g) =>
        g.map(_._2).distinct.size.toLong
      }.toSeq
      (name, byL.size.toLong, byL.count(_ > 1).toLong, byL.max,
        if (byL.forall(_ == 1)) 1L else 0L)
    }
    val ords = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("string"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = Set(
      recompute(ords.map(o => (o._1, o._3)), "o_orderkey->o_orderpriority"),
      recompute(ords.map(o => (o._2, o._3)), "o_custkey->o_orderpriority"),
      recompute(nat, "n_nationkey->n_regionkey"))
    val got = Relational.qFdAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got.size == 6)
    assert(want.subsetOf(got))
    // declared keys must hold; the custkey edge must not (fanout > 1)
    val holds = got.map(g => g._1 -> g._5).toMap
    assert(holds("o_orderkey->o_orderpriority") == 1L)
    assert(holds("n_nationkey->n_regionkey") == 1L)
    assert(holds("c_custkey->c_nationkey") == 1L)
  }

  test("q208: CUPED theta/adjusted means match an exact recompute") {
    val days = evRaw.map(_._3)
    val pivot = days.min + (days.max - days.min) / 2
    val pu = evRaw.groupBy(_._1).map { case (u, rows) =>
      val x = rows.filter(r => r._2 == "purchase" && r._3 <= pivot)
        .map(_._6).sum
      val y = rows.filter(r => r._2 == "purchase" && r._3 > pivot)
        .map(_._6).sum
      (u % 2, BigInt(x), BigInt(y))
    }.toSeq
    val n = BigInt(pu.size)
    val sx = pu.map(_._2).sum; val sy = pu.map(_._3).sum
    val sxy = pu.map(p => p._2 * p._3).sum
    val sxx = pu.map(p => p._2 * p._2).sum
    val cov = (n * sxy - sx * sy).toDouble
    val varx = (n * sxx - sx * sx).toDouble
    val theta = if (varx > 0) cov / varx else 0.0
    val rows = Stats.qCuped(spark, sf).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val arm = r.getLong(0)
      val armRows = pu.filter(_._1 == arm)
      val nA = armRows.size.toLong
      val sxA = armRows.map(_._2).sum.toDouble
      val syA = armRows.map(_._3).sum.toDouble
      assert(r.getLong(1) == nA)
      val meanAdj = (syA - theta * (sxA - nA.toDouble * sx.toDouble / n.toDouble)) /
        nA.toDouble / 100.0
      assert(math.abs(r.getAs[Double]("mean_adjusted") - meanAdj) < 1e-6, s"arm $arm")
      assert(math.abs(r.getAs[Double]("theta") - theta) < 1e-6)
    }
  }

  test("q214: streamed HLL registers == batch udaf build bit for bit") {
    import org.apache.spark.sql.Encoders
    val streamed = graft.streaming.EventTime.streamedHllRegisters(spark, sf)
    val build = udaf(new graft.functions.HllSketch(12), Encoders.scalaLong)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(build(xxhash64(col("user_id"))).as("regs"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("regs")).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (t, regs) =>
      assert(java.util.Arrays.equals(regs, batch(t)), t)
    }
  }

  test("q242: streamed CMS matrices == batch udaf build bit for bit") {
    import org.apache.spark.sql.Encoders
    val streamed = graft.streaming.EventTime.streamedCmsState(spark, sf)
    val build = udaf(new graft.functions.CountMin(4, 1024), Encoders.STRING)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(build(col("user_id").cast("string")).as("st"))
      .collect().map { r =>
        val st = r.getStruct(1)
        r.getString(0) -> (st.getAs[Long]("n"),
          st.getAs[Seq[Long]]("counts").toArray)
      }.toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (t, (n, counts)) =>
      assert(n == batch(t)._1, s"$t n")
      assert(java.util.Arrays.equals(counts, batch(t)._2), s"$t counts")
      assert(counts.sum == 4 * n, s"$t row sums") // every row counts each item
    }
  }

  test("q265: streamed Bloom filter == batch bloom_filter_agg byte for byte") {
    graft.functions.GraftFunctions.register(spark)
    val streamed = graft.streaming.EventTime.streamedBloomState(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("bloom_filter_agg(xxhash64(user_id), 4096L)").as("b"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("b")).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (t, bits) =>
      assert(java.util.Arrays.equals(bits, batch(t)), s"$t filter bytes")
    }
    // no false negatives by construction: every seen user tests present
    val users = Tables.events(spark, sf)
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    users.groupBy(_._1).foreach { case (t, hs) =>
      val bf = org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(streamed(t)))
      assert(hs.forall(h => bf.mightContainLong(h._2)), s"$t false negative")
    }
  }

  test("q245: streamed KMV bottom-k == independent batch bottom-k bit for bit") {
    import org.apache.spark.sql.expressions.Window
    val streamed = graft.streaming.EventTime.streamedKmvState(spark, sf)
    // independent formulation: window-rank the distinct md5 domain —
    // the DEFINITION of bottom-k, not a second run of KmvSketch
    val batch = Tables.events(spark, sf)
      .select(col("event_type"),
        md5(col("user_id").cast("string").cast("binary")).as("h"))
      .distinct()
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy("event_type").orderBy("h")))
      .filter(col("r") <= 16)
      .groupBy("event_type")
      .agg(sort_array(collect_list(col("h"))).as("hs"))
      .collect().map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[String]]("hs").toVector.toSeq).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (t, hs) =>
      assert(hs == batch(t), t)
      assert(hs.length <= 16 && hs == hs.sorted && hs.distinct == hs, t)
    }
  }

  test("q263: two-proportion z matches the textbook pooled recompute") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val conv = rows.groupBy(_._1).map { case (u, evs) =>
      (u, evs.exists(e => e._2 == "purchase" && e._3 >= 95))
    }
    val (a, b) = conv.partition(_._1 % 2 == 0)
    val (na, ca) = (a.size.toLong, a.count(_._2).toLong)
    val (nb, cb) = (b.size.toLong, b.count(_._2).toLong)
    val pp = (ca + cb).toDouble / (na + nb)
    val den = math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    val r = Stats.qTwoProportion(spark, sf).collect().head
    assert(r.getLong(0) == na && r.getLong(1) == ca)
    assert(r.getLong(2) == nb && r.getLong(3) == cb)
    assert(r.getLong(4) == ca * 1000000L / na)
    assert(r.getLong(5) == cb * 1000000L / nb)
    if (den > 0) {
      val z = (ca.toDouble / na - cb.toDouble / nb) / den
      assert(math.abs(r.getDouble(6) - z) < 1e-6, s"z ${r.getDouble(6)} vs $z")
    } else assert(r.isNullAt(6), "degenerate variance must yield NULL z")
  }

  test("q264: rank movers match a driver-side weekly leaderboard walk") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"),
        expr("datediff(to_date(CAST(l_shipdate AS TIMESTAMP)), date'1970-01-01')"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val d0 = li.map(_._2).min
    val weekly = li.map { case (p, d) => ((d - d0) / 7, p) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val ranked = weekly.groupBy(_._1._1).flatMap { case (w, cells) =>
      cells.toSeq.map { case ((_, p), c) => (p, c) }
        .sortBy { case (p, c) => (-c, p) }.zipWithIndex
        .collect { case ((p, c), i) if i < 100 => (w, p) -> (i + 1, c) }
    }
    val want = ranked.toSeq.flatMap { case ((w, p), (rk, c)) =>
      ranked.get((w - 1, p)).map { case (prk, pc) =>
        (w, p, rk, prk, prk - rk, c, pc)
      }
    }.sortBy { case (w, p, _, _, d, _, _) => (-d, w, p) }.take(10)
    val got = Stats.qRankMovers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want.map { case (w, p, rk, prk, d, c, pc) =>
      (w, p, rk, prk, d, c, pc)
    })
  }

  test("q258: RFM cells match driver-side value-domain quintile cuts") {
    val perUser = evRaw.groupBy(_._1).map { case (u, rows) =>
      (u, rows.map(_._4).max, rows.length.toLong, rows.map(_._6).sum)
    }.toSeq
    val gmax = perUser.map(_._2).max
    val m = perUser.map { case (u, last, f, mon) =>
      (u, (gmax - last) / 86400000000L, f, mon)
    }
    // cut_q = smallest v with 5·cum ≥ q·n = the ⌈q·n/5⌉-th smallest
    def cuts(vals: Seq[Long]): Seq[Long] = {
      val n = vals.length.toLong
      val sorted = vals.sorted
      (1 to 4).map(q => sorted(((q * n + 4) / 5 - 1).toInt))
    }
    val rc = cuts(m.map(_._2)); val fc = cuts(m.map(_._3))
    val mc = cuts(m.map(_._4))
    def qn(v: Long, c: Seq[Long]): Int = 1 + c.count(v > _)
    val want = m.groupBy(x => (qn(x._2, rc), qn(x._3, fc), qn(x._4, mc)))
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._4).sum) }
    val got = Stats.qRfmSegments(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got.values.map(_._1).sum == perUser.size.toLong,
      "cells partition the users")
  }

  test("q215: discrete percentiles are the exact ranked data elements") {
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = vals.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val n = sorted.length.toLong
      def at(rank: Long) = sorted((rank - 1).toInt)
      (t, n, at((n + 1) / 2), at((9 * n + 9) / 10), at((99 * n + 99) / 100))
    }.toSet
    val got = Stats.qPercentileDisc(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == want)
  }

  test("q216: interpolated fills match an integer endpoint recompute") {
    val daily = evRaw.groupBy(e => (e._2, e._3))
      .map { case ((t, d), g) => ((t, d), g.map(_._6).sum) }
    val want = daily.keys.groupBy(_._1).map { case (tpe, keys) =>
      val obs = daily.collect { case ((`tpe`, d), v) => (d, v) }.toSeq.sortBy(_._1)
      val (d0, d1) = (obs.map(_._1).min, obs.map(_._1).max)
      val om = obs.toMap
      var nInterp = 0L; var sumFilled = 0L; var checksum = 0L
      (d0 to d1).foreach { t =>
        val v = om.get(t) match {
          case Some(x) => x
          case None =>
            nInterp += 1
            val (pt, pv) = obs.filter(_._1 < t).last
            val (nt, nv) = obs.filter(_._1 > t).head
            (pv * (nt - t) + nv * (t - pt)) / (nt - pt)
        }
        sumFilled += v; checksum += v * (t % 997)
      }
      (tpe, d1 - d0 + 1, d1 - d0 + 1 - nInterp, nInterp, sumFilled, checksum)
    }.toSet
    val got = Stats.qInterpolate(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
  }

  test("q219: shares and in-region ranks match an exact recompute") {
    val ordCust = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val custNat = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val natInfo = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val regName = Tables.region(spark, sf)
      .select(col("r_regionkey").cast("long"), col("r_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val rolled = liRev.flatMap { case (ok, rev) =>
      ordCust.get(ok).flatMap(custNat.get).map { nk =>
        val (nn, rk) = natInfo(nk)
        ((regName(rk), nn), rev)
      }
    }.groupBy(_._1).map { case (k, g) => (k._1, k._2, g.map(_._2).sum) }.toSeq
    val want = rolled.groupBy(_._1).flatMap { case (_, nations) =>
      val total = nations.map(_._3).sum
      val ranked = nations.sortBy(n => (-n._3, n._2)).zipWithIndex
      ranked.map { case ((r, n, rev), i) =>
        (r, n, rev, total, (BigInt(rev) * 1000000 / total).toLong,
          (i + 1).toLong)
      }
    }.toSet
    val got = Relational.qRegionShare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    // shares per region sum to ~1e6 (floor residue < nations)
    got.groupBy(_._1).foreach { case (r, g) =>
      val s = g.map(_._5).sum
      assert(s > 1000000 - g.size && s <= 1000000, s"$r share sum $s")
    }
  }

  test("q220: weighted median is the exact cumulative-weight crossing") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars"),
        graft.functions.tokenCount(col("text")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = docs.groupBy(_._1).map { case (src, g) =>
      val sorted = g.sortBy(d => (d._3, d._2))
      val total = sorted.map(_._4).sum
      var cum = 0L
      val wmed = sorted.find { d => cum += d._4; cum * 2 >= total }.get._3
      val med = sorted((sorted.length + 1) / 2 - 1)._3
      (src, g.length.toLong, total, wmed, med)
    }.toSet
    val got = Stats.qWeightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
  }

  test("q221: bins, counts, and zone bounds match an integer recompute") {
    val want = evRaw.groupBy(_._2).flatMap { case (t, rows) =>
      val vs = rows.map(_._6)
      val (mn, mx) = (vs.min, vs.max)
      vs.groupBy(v => (v - mn) * 10 / (mx - mn + 1)).map { case (b, g) =>
        (t, b, g.size.toLong, g.min, g.max)
      }
    }.toSet
    val got = Stats.qEquiWidthHist(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
    got.foreach(r => assert(r._2 >= 0 && r._2 <= 9, s"bin ${r._2}"))
  }

  test("q222: row/distinct counts match; fixture tables carry no dupes") {
    val got = Stats.qDuplicateRows(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSet ==
      Set("events", "orders", "lineitem", "documents"))
    got.foreach { r =>
      assert(r._2 - r._3 == r._4, r._1)
      assert(r._4 == 0L, s"${r._1}: unexpected duplicate rows")
    }
    assert(got.find(_._1 == "events").get._2 == evRaw.size)
  }

  test("q223: every r matches an exact BigInt recompute") {
    val raw = Tables.lineitem(spark, sf)
      .select(
        expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)),
        BigInt(r.getLong(2))))
    val n = BigInt(raw.size)
    def corr(a: Seq[BigInt], b: Seq[BigInt]): Double = {
      val sa = a.sum; val sb = b.sum
      val cov = (n * a.zip(b).map { case (x, y) => x * y }.sum - sa * sb)
        .toDouble
      val va = (n * a.map(x => x * x).sum - sa * sa).toDouble
      val vb = (n * b.map(x => x * x).sum - sb * sb).toDouble
      if (va > 0 && vb > 0) cov / math.sqrt(va) / math.sqrt(vb) else 0.0
    }
    val (xs, ys, zs) = (raw.map(_._1).toSeq, raw.map(_._2).toSeq,
      raw.map(_._3).toSeq)
    val want = Map("qty~price" -> corr(xs, ys),
      "qty~discount" -> corr(xs, zs), "price~discount" -> corr(ys, zs))
    val got = Stats.qCorrMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 3)
    got.foreach { g =>
      assert(g._2 == raw.size.toLong)
      assert(math.abs(g._3 - want(g._1)) < 1e-6, g._1)
    }
    // no sign pin: unlike real TPC-H (extprice = qty * partprice),
    // this generator draws price independent of quantity (r ~ 0.003)
  }

  private def weekLabel(widx: Long): String =
    java.time.LocalDate.ofEpochDay(widx * 7).toString

  test("q217: movement identity holds; flags match a set recompute") {
    val weekly = evRaw.map(e => (e._1, e._3 / 7)).distinct
    val byUser = weekly.groupBy(_._1).map { case (u, g) =>
      u -> g.map(_._2).toSet
    }
    val weeks = weekly.map(_._2).distinct
    val want = weeks.map { m =>
      val active = byUser.filter(_._2.contains(m))
      val nNew = active.count(_._2.min == m)
      val nRet = active.count(_._2.contains(m - 1))
      val nRes = active.count(u => u._2.min != m && !u._2.contains(m - 1))
      val nChurn = active.count(!_._2.contains(m + 1))
      (weekLabel(m), active.size.toLong, nNew.toLong,
        nRet.toLong, nRes.toLong, nChurn.toLong)
    }.toSet
    val got = Stats.qGrowthAccounting(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    assert(got.size >= 2, "fixture must span multiple weeks")
    got.foreach(r => assert(r._2 == r._3 + r._4 + r._5,
      s"${r._1}: active != new + retained + resurrected"))
  }

  test("q218: stickiness matches the exact integer recompute") {
    val du = evRaw.map(e => (e._1, e._3)).distinct
    val want = du.groupBy(_._2 / 7).map { case (widx, g) =>
      val nDays = g.map(_._2).distinct.size.toLong
      val sumDau = g.map(_._2).distinct
        .map(d => g.filter(_._2 == d).map(_._1).distinct.size.toLong).sum
      val wau = g.map(_._1).distinct.size.toLong
      (weekLabel(widx), nDays, wau, sumDau, sumDau * 10000 / (nDays * wau))
    }.toSet
    val got = Stats.qStickiness(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
  }

  // full lineitem replay with the join/filter columns the TPC-H-shape
  // specs need: (orderkey, partkey, returnflag, shipdate-iso, rev)
  private lazy val liFull: Seq[(Long, Long, String, String, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
        to_date(col("l_shipdate")).cast("string"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
          (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getLong(4)))

  test("q209: top-10 matches a total-order recompute") {
    val ords = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).cast("string"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
    val building = Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val om = ords.filter(o => o._3 < "1998-06-01" && building(o._2))
      .map(o => o._1 -> (o._3, o._4)).toMap
    val want = liFull.filter(l => l._4 > "1998-06-01" && om.contains(l._1))
      .groupBy(_._1).map { case (k, g) =>
        (k, om(k)._1, om(k)._2, g.map(_._5).sum)
      }.toSeq.sortBy(r => (-r._4, r._1)).take(10)
    assert(want.nonEmpty, "fixture no longer matches the q209 date/segment constants")
    val got = Relational.qShippingPriority(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(r => (-r._4, r._1))
    assert(got == want)
  }

  test("q210: top-20 lost revenue matches a recompute") {
    val ords97 = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).cast("string"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(o => o._3 >= "1997-01-01" && o._3 < "1997-04-01")
      .map(o => o._1 -> o._2).toMap
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
    val nn = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val want = liFull.filter(l => l._3 == "R" && ords97.contains(l._1))
      .groupBy(l => ords97(l._1)).map { case (ck, g) =>
        val (name, nk) = custs(ck)
        (ck, name, nn(nk), g.map(_._5).sum, g.size.toLong)
      }.toSeq.sortBy(r => (-r._4, r._1)).take(20)
    assert(want.nonEmpty, "fixture no longer matches the q210 quarter constants")
    val got = Relational.qReturnedItems(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4))).toSeq.sortBy(r => (-r._4, r._1))
    assert(got == want)
  }

  test("q211: promo shares match an exact recompute") {
    val promo = Tables.part(spark, sf)
      .select(col("p_partkey"), (col("p_type") === "PROMO").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = liFull.filter(l => l._4 >= "1997-01-01" && l._4 < "1998-01-01")
      .groupBy(_._4.substring(0, 7)).map { case (m, g) =>
        val p = g.filter(l => promo(l._2) == 1L).map(_._5).sum
        val t = g.map(_._5).sum
        (m, p, t, math.rint(p.toDouble / t.toDouble * 1e6) / 1e6)
      }.toSet
    assert(want.nonEmpty, "fixture no longer matches the q211 year constant")
    val got = Relational.qPromoShare(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // compare share at 1e-6 tolerance, the rest exactly
    assert(got.map(g => (g._1, g._2, g._3)) == want.map(w => (w._1, w._2, w._3)))
    got.foreach { g =>
      val w = want.find(_._1 == g._1).get
      assert(math.abs(g._4 - w._4) < 1e-6, g._1)
    }
  }
}
