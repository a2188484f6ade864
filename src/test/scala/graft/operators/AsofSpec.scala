package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The as-of join: value equality against a driver-side brute force,
  * inclusive-boundary semantics, and the scale contract (one window
  * shuffle, no nested-loop join in the plan). */
class AsofSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("as-of enrich equals a driver-side brute force") {
    val got = Relational.qAsofEnrich(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap

    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ords = Tables.orders(spark, sf)
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = ev.flatMap { case (eid, uid, ts) =>
      ords.getOrElse(uid, Array.empty[Long]).filter(_ <= ts) match {
        case s if s.nonEmpty => Some(eid -> s.max / 1000000)
        case _ => None
      }
    }.toMap
    assert(got.size == expected.size)
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("inclusive boundary and latest-wins semantics") {
    import spark.implicits._
    val left = Seq((1L, Timestamp.valueOf("2020-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2020-01-02 00:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, Timestamp.valueOf("2020-01-01 00:00:00"), "exact"),
      (1L, Timestamp.valueOf("2019-12-31 00:00:00"), "older"),
      (2L, Timestamp.valueOf("2020-01-03 00:00:00"), "future")).toDF("k", "t", "v")
    val out = Relational.asofJoin(left, "k", "t", right, "k", "t", "v")
      .select("k", "asof_v").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "exact") // equal time matches (inclusive)
    assert(out(2L) == null) // only-future right rows do not match
  }

  test("plan: one window exchange, no nested-loop or cartesian join (scale contract)") {
    val plan = Relational.qAsofEnrich(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"as-of must not plan a nested loop:\n$plan")
    assert(plan.contains("Window"), "expected the union-sort-window shape")
  }
}
