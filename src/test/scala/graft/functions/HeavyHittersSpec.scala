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
}
