package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Tables

/** q224: the foreachBatch-maintained JOIN view must land bit-exactly on
  * the from-scratch recompute after the 3-batch CDC replay — inserts
  * via q201's delta algebra, deletes via q206's subtraction, both
  * exercised across batch boundaries (lines arrive before AND after
  * their order; deletes ride the final batch). */
class DeltaViewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().toSet[Row].map(_.toSeq)

  test("q224: incrementally-maintained view equals the direct recompute") {
    val got = DeltaView.qStreamingView(spark, sf)

    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"),
      (expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
        (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)")))
        .as("rev"))
    val surviving = Tables.orders(spark, sf)
      .filter(!(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 3 =!= 2))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val want = li.join(surviving, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("rev").as("rev_x1e4"), count(lit(1)).as("n_lines"))

    assert(rows(got) == rows(want))
  }

  test("q224: the replay genuinely defers and retracts") {
    // deferred lines exist: some lineitem lands in an EARLIER batch
    // than its order (batch(line) < batch(order)), so the t1-only
    // formulation (ΔL⋈O∪ΔO at line-arrival time) would MISS them —
    // the L⋈ΔO term is load-bearing, not decorative
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"),
        ((col("l_orderkey") + col("l_linenumber")) % 3).as("lb"))
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), (col("o_orderkey") % 3).as("ob"))
    val deferred = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("lb") < col("ob")).count()
    assert(deferred > 0, "replay has no early-arriving lines")
    // retractions exist: some order with key%13=0 arrives before the
    // final batch (so the delete in batch 2 must subtract real mass)
    val retracted = ord
      .filter(col("o_orderkey") % 13 === 0 && col("ob") =!= 2).count()
    assert(retracted > 0, "replay has no retractable orders")
  }
}
