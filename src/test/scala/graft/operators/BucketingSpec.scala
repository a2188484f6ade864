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

  test("range-sorted layout: disjoint per-file ranges, window touches a strict file subset") {
    val dir = Files.createTempDirectory("graft-rs").toString + "/events"
    val ev = Tables.events(spark, sf).select("event_id", "ts", "value")
    Bucketing.writeRangeSorted(ev, dir, "event_id", files = 8)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.toString).sorted
    assert(parts.length > 1, "need multiple files for disjointness to mean anything")
    // per-file min/max of the sort column — the stats parquet row-group
    // skipping uses; range layout makes them pairwise disjoint
    val ranges = parts.map { p =>
      val r = spark.read.parquet(p).agg(min("event_id"), max("event_id")).head()
      (r.getLong(0), r.getLong(1))
    }
    ranges.sortBy(_._1).sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: $hi >= $lo2")
      case _ => ()
    }
    // a window predicate's rows live in a strict subset of files
    val (lo, hi) = (100L, 400L)
    val touching = ranges.count { case (mn, mx) => mx >= lo && mn <= hi }
    assert(touching < parts.length, "window should not touch every file")
    // correctness unchanged by the layout
    assert(spark.read.parquet(dir).filter(col("event_id").between(lo, hi)).count() ==
      ev.filter(col("event_id").between(lo, hi)).count())
  }

  test("z-ordered layout: 2-D box queries touch a strict file subset on both dims") {
    val dir = Files.createTempDirectory("graft-zo").toString + "/events"
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "value")
    Bucketing.writeZOrdered(ev, dir, "event_id", "user_id", files = 8)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.toString).sorted
    assert(parts.length > 4, "need several files for pruning to mean anything")
    // per-file 2-D min-max boxes — what parquet stats expose to the scan
    val boxes = parts.map { p =>
      val r = spark.read.parquet(p)
        .agg(min("event_id"), max("event_id"), min("user_id"), max("user_id")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // a 2-D box predicate (quarter of each domain) overlaps few boxes;
    // a single-column range layout can never prune on the second dim
    val (eLo, eHi, uLo, uHi) = (0L, 249L, 0L, 3L)
    val touching = boxes.count { case (emn, emx, umn, umx) =>
      emx >= eLo && emn <= eHi && umx >= uLo && umn <= uHi
    }
    assert(touching < parts.length,
      s"2-D box touched every file: ${boxes.mkString(", ")}")
    assert(touching <= parts.length / 2,
      s"2-D box should prune at least half the files, touched $touching/${parts.length}")
    // the second dimension prunes BY ITSELF (the range-sorted layout's gap)
    val uOnly = boxes.count { case (_, _, umn, umx) => umx >= uLo && umn <= uHi }
    assert(uOnly < parts.length, "user_id-only predicate should prune some files")
    // correctness unchanged by the layout
    val expected = ev.filter(col("event_id").between(eLo, eHi) &&
      col("user_id").between(uLo, uHi)).count()
    assert(spark.read.parquet(dir).filter(col("event_id").between(eLo, eHi) &&
      col("user_id").between(uLo, uHi)).count() == expected)
    assert(spark.read.parquet(dir).count() == ev.count())
  }

  test("training-shard writer: lossless, deterministic, hash-balanced, manifest-consistent") {
    val docs = Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("shards").toString
    val manifest = Bucketing.writeTrainingShards(docs, dir, shards = 8)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(manifest.keySet == (0 to 7).toSet, "every shard directory exists")
    // lossless: every doc exactly once across shards
    val back = spark.read.parquet(s"$dir/data")
    assert(back.select("doc_id").distinct().count() == docs.count())
    assert(back.count() == docs.count())
    // the manifest matches what a loader would actually read per shard
    val perShard = back.groupBy("shard").agg(
      count("*").as("n"),
      sum(graft.functions.tokenCount(col("text"))).cast("long").as("t"),
      sum(length(col("text"))).cast("long").as("c"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(perShard == manifest)
    // hash balance: no shard more than 2x the smallest at 500 docs / 8
    val sizes = manifest.values.map(_._1)
    assert(sizes.max <= 2 * sizes.min, s"imbalanced: $manifest")
    // deterministic shard assignment: a second write lands every doc
    // in the same shard
    val dir2 = Files.createTempDirectory("shards2").toString
    Bucketing.writeTrainingShards(docs, dir2, shards = 8)
    val a = back.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.read.parquet(s"$dir2/data").select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    // a loader reading one shard directory scans only that directory
    val one = spark.read.parquet(s"$dir/data/shard=3")
    assert(one.count() == manifest(3)._1)
  }
}
