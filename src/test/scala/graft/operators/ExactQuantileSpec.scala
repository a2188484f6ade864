package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q148/q149: exact K-th order statistics by iterative threshold
  * refinement — checked against a literal sort on the same data, with
  * small buckets/cap so the test actually exercises multiple
  * refinement rounds (not just the bounded tail). */
class ExactQuantileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("refinement equals literal sorted rank on duplicated, negative-heavy data") {
    val rnd = new scala.util.Random(42)
    // duplicates on purpose: draw from a small value set plus noise
    val xs = Seq.fill(5000)(rnd.nextInt(40) - 20 + (rnd.nextInt(4) * 0.25))
    val df = xs.toDF("x")
    val sorted = xs.sorted
    for (k <- Seq(1, 7, 2500, 4999, 5000)) {
      val got = Pipeline.exactOrderStatistic(df, col("x"), k,
        buckets = 8, cap = 50)
      assert(got == sorted(k - 1), s"rank $k: got $got want ${sorted(k - 1)}")
    }
  }

  test("all-equal values terminate and return the value") {
    val df = Seq.fill(1000)(3.25).toDF("x")
    assert(Pipeline.exactOrderStatistic(df, col("x"), 500,
      buckets = 8, cap = 50) == 3.25)
  }

  test("sub-ulp range (massive ties around one double) resolves via the tail") {
    val v = 1.0
    val xs = Seq.fill(400)(v) ++ Seq.fill(400)(Math.nextUp(v)) ++ Seq(2.0)
    val df = xs.toDF("x")
    assert(Pipeline.exactOrderStatistic(df, col("x"), 400,
      buckets = 4, cap = 10) == v)
    assert(Pipeline.exactOrderStatistic(df, col("x"), 401,
      buckets = 4, cap = 10) == Math.nextUp(v))
    assert(Pipeline.exactOrderStatistic(df, col("x"), 801,
      buckets = 4, cap = 10) == 2.0)
  }

  test("q148 matches a literal sort of lineitem prices") {
    val li = Tables.lineitem(spark, TestSpark.sf)
    val prices = li.select(col("l_extendedprice").cast("double"))
      .as[Double].collect().sorted
    val out = Pipeline.qExactQuantiles(spark, TestSpark.sf)
      .orderBy("p").as[(Double, Long, Double)].collect()
    assert(out.length == 3)
    out.foreach { case (p, k, value) =>
      assert(k == math.max(1L, math.ceil(p * prices.length).toLong))
      assert(value == prices(k.toInt - 1), s"p=$p")
    }
  }

  test("q149 latencies are 3 nondecreasing ranks from real conversions") {
    val out = Pipeline.qConversionLatency(spark, TestSpark.sf)
      .orderBy("p").as[(Double, Long, Long)].collect()
    assert(out.length == 3)
    assert(out.map(_._3).toSeq == out.map(_._3).sorted.toSeq)
    assert(out.forall(_._3 > 0))
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
  }
}
