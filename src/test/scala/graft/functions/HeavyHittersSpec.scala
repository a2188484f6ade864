package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{Tables, TextAnalysis}

/** The Misra–Gries sketch's two guarantees, checked against exact
  * counts: presence of every item above n/m, and estimates inside
  * [true − n/m, true]. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("corpus tokens: presence above n/m and two-sided estimate bounds") {
    val m = 64
    val got = TextAnalysis.qHeavyHitters(spark, sf, m).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got.size <= m)
    val exact = Tables.documents(spark, sf)
      .select(explode(graft.functions.tokens(lower(col("text")))).as("t"))
      .filter(length(col("t")) > 0)
      .groupBy("t").agg(count("*").as("c")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val bound = n / m // integer floor is conservative for the >= check
    // guarantee 1: every token with true count > n/m is reported
    exact.foreach { case (t, c) =>
      if (c > n.toDouble / m) assert(got.contains(t), s"heavy item '$t' ($c > $n/$m) missing")
    }
    // guarantee 2: true - n/m <= estimate <= true
    got.foreach { case (t, est) =>
      val truth = exact.getOrElse(t, 0L)
      assert(est <= truth, s"'$t' overestimated: $est > $truth")
      assert(est >= truth - bound - 1, s"'$t' underestimated: $est < $truth - $bound")
    }
  }

  test("crafted skew: the dominant item survives decrements and merges") {
    import spark.implicits._
    val m = 8
    // 300 copies of "hot" interleaved with 600 distinct cold items
    val items = (0 until 600).flatMap(i =>
      if (i % 2 == 0) Seq("hot", s"cold$i") else Seq(s"cold$i"))
    val ds = spark.createDataset(items).repartition(4)
    val got = ds.select(new MisraGries(m).toColumn.name("hh")).head()
    val hot = got.find(_._1 == "hot")
    val n = items.size
    assert(hot.isDefined, "dominant item missing from the sketch")
    assert(hot.get._2 <= 300 && hot.get._2 >= 300 - n / m)
  }

  test("merge is size-bounded and count-preserving") {
    val mg = new MisraGries(4)
    val a = (0 until 10).foldLeft(mg.zero)((b, i) => mg.reduce(b, s"a$i"))
    val b = (0 until 10).foldLeft(mg.zero)((b2, i) => mg.reduce(b2, "x"))
    val merged = mg.merge(a, b)
    assert(merged.counters.size <= 4)
    assert(merged.n == 20)
    assert(merged.counters.get("x").exists(_ >= 10 - 20 / 4))
  }

  test("property: bounds hold for random streams under random split/merge trees") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val genStream = for {
      n <- Gen.choose(1, 400)
      // zipfian-ish: small ints are frequent, tail is long
      items <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.choose(0, 3), 3 -> Gen.choose(0, 20), 2 -> Gen.choose(0, 200)))
    } yield items.map(_.toString)
    val genM = Gen.choose(2, 16)
    // fold a random split of the stream into per-chunk sketches, then
    // merge left-to-right — models arbitrary partitioning + merge order
    val prop = Prop.forAll(genStream, genM, Gen.choose(1, 8)) { (items, m, chunks) =>
      val mg = new MisraGries(m)
      val sketches = items.grouped(math.max(1, items.size / chunks)).toSeq
        .map(c => c.foldLeft(mg.zero)(mg.reduce))
      val merged = sketches.reduce(mg.merge)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val sizeOk = merged.counters.size <= m && merged.n == n
      val presence = exact.forall { case (k, c) =>
        c.toDouble <= n.toDouble / m || merged.counters.contains(k)
      }
      val bounds = merged.counters.forall { case (k, est) =>
        val t = exact.getOrElse(k, 0L)
        est <= t && est >= t - n / m - 1
      }
      sizeOk && presence && bounds
    }
    val result = check(Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
