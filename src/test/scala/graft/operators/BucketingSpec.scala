package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The co-located-join contract: joining two tables bucketed by the
  * join key with equal bucket counts must plan WITHOUT a shuffle
  * exchange on either side, and produce the same answer as the
  * shuffled join. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed lineitem-orders join plans with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft-bkt").toString
    Bucketing.bucketize(spark, sf, wh)
    // at sf0.001 orders would broadcast, which hides what the layout
    // buys; at the scale bucketing targets, neither fact side fits a
    // broadcast — model that by disabling auto-broadcast in this scope
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedLookupEnrich(spark)
      // one exchange is legitimate: the final tiny groupBy(priority).
      // The JOIN itself must not shuffle — walk the plan below the join.
      // AdaptiveSparkPlanExec hides its inner plan from collect — unwrap
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
      }
      assert(joins.nonEmpty, s"expected a shuffled-family join, plan:\n$plan")
      val shufflesBelowJoin = joins.flatMap(_.collect {
        case e: ShuffleExchangeLike => e
      })
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join must not shuffle either side, plan:\n$plan")

      // identical answer to the ad-hoc (shuffling) q03 formulation
      val expect = Relational.qLookupEnrich(spark, sf).collect()
        .map((r: Row) => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect()
        .map((r: Row) => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_orders_bkt")
    }
  }

  test("partitioned layout prunes non-matching event types at the scan") {
    val dir = Files.createTempDirectory("graft-part").toString + "/events"
    val ev = Tables.events(spark, sf)
    Bucketing.writePartitioned(ev, dir, "event_type")
    val filtered = spark.read.parquet(dir).filter(col("event_type") === "click")
    val scans = filtered.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "event_type")),
      s"no partition filter on event_type: ${scan.partitionFilters}")
    // only the click directory is read
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .forall(_.values.getString(0) == "click"))
    // and the pruned read returns exactly the filtered rows
    assert(filtered.count() ==
      ev.filter(col("event_type") === "click").count())
  }
}
