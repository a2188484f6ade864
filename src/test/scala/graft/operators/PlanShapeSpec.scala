package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exchange-count regression tests: the scaladoc shuffle-shape claims
  * of the window/rollup operators, asserted against the physical plan
  * so a refactor that silently adds an exchange fails here, not in a
  * 100 TB run. Counts are taken from the FINAL adaptive plan (query
  * executed first). */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def shuffles(df: DataFrame): Int = {
    df.queryExecution.toRdd.foreach(_ => ()) // finalize the adaptive plan
    // AQE hides exchanges inside query-stage boundaries: recurse
    // through AdaptiveSparkPlanExec/QueryStageExec wrappers so the
    // count sees the physical exchanges, not the stage facade
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => 0
      }
      self + nested + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  test("q147 order streaks: exactly ONE exchange (repartition by customer)") {
    assert(shuffles(Relational.qOrderStreaks(spark, sf)) == 1)
  }

  test("q151 PPS sampling: ONE exchange — both windows and the rollup ride the source key") {
    assert(shuffles(Pipeline.qPpsSample(spark, sf)) == 1)
  }

  test("q160 Gini: ONE exchange — rank window and rollup share the source key") {
    assert(shuffles(Pipeline.qGiniConcentration(spark, sf)) == 1)
  }

  test("q155 session paths: TWO exchanges — user-key windows + the tiny (entry, exit) rollup") {
    assert(shuffles(Relational.qSessionPaths(spark, sf)) == 2)
  }

  test("q156 throttle: TWO exchanges — (user, type) lag window + the per-type rollup") {
    assert(shuffles(Relational.qEventThrottle(spark, sf)) == 2)
  }

  test("q165 trigrams: TWO exchanges and a TakeOrdered head (no global sort)") {
    val df = Relational.qEventTrigrams(spark, sf)
    assert(shuffles(df) == 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k head:\n$plan")
  }

  test("q209 shipping priority: pushed filters, broadcast dims, TakeOrdered cut") {
    val df = Relational.qShippingPriority(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k head:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"nested loop crept in:\n$plan")
    // every scan carries its pushed predicate
    val pushed = "PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|EqualTo)".r
    assert(pushed.findAllIn(plan).size >= 3, s"filters not pushed:\n$plan")
  }

  test("q206 retraction: the delta term joins via broadcast, not a base shuffle") {
    val df = Relational.qRetractionView(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast delta:\n$plan")
  }

  test("q199 last touch: user window and rollup — no join, no global sort") {
    val df = Stats.qLastTouch(spark, sf)
    val n = shuffles(df)
    assert(n <= 2, s"expected window + tiny rollup only, saw $n exchanges")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("q252 subsample CI: the 64 replicate aggregates ride ONE fact rollup") {
    val df = Stats.qSubsampleCi(spark, sf)
    // one type-keyed rollup + the tiny melt/window stages; the point
    // is what is ABSENT: no 32× explode of the fact table (the
    // conditional-aggregate one-pass claim)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("generate explode(arrays_zip"),
      s"fact-table explode crept in:\n$plan")
    assert(shuffles(df) <= 3, "CI pipeline grew extra exchanges")
  }

  test("q258 RFM: no global user sort — quintiles come from value-domain cuts") {
    val df = Stats.qRfmSegments(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    // the user table must never pass through a single-partition window
    // or a global Sort: cuts ride bounded value-domain rollups
    assert(!plan.contains("Window [row_number()"),
      s"a user-ranking window crept in:\n$plan")
  }

  test("q267 A-Res sample: one scan + TakeOrdered head, no global sort") {
    val df = Pipeline.qWeightedSample(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k head:\n$plan")
    assert(shuffles(df) <= 1, "A-Res sample should shuffle at most the top-k gather")
  }

  test("q254 hard negatives: broadcast query set against one corpus scan") {
    val df = Similarity.qHardNegatives(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"query set not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
  }

  test("q274/q280 dictionary similarity joins: equi-joins everywhere the corpus flows") {
    // the r10 shape: the expensive similarity runs once per DISTINCT
    // name pair (dictionary level), and EVERY join — the candidate
    // stages (PassJoin segments for q274, rarity-prefix signature
    // tokens for q280) and the record expansion (name / (brand, name)
    // keys) — is an equi-join: no cartesian, no nested loop anywhere.
    Seq(("q274", Dedup.qEditDistancePairs(spark, sf)),
      ("q280", Dedup.qJaroWinklerPairs(spark, sf))).foreach {
      case (name, df) =>
        df.queryExecution.toRdd.foreach(_ => ())
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin") ||
          plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"$name: expected equi-joins on the expansion keys:\n$plan")
        assert(!plan.contains("CartesianProduct"),
          s"$name: cartesian crept in:\n$plan")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name: a candidate stage degraded to a nested loop:\n$plan")
    }
  }

  /** WindowExec nodes of the final adaptive plan, unwrapped. */
  private def windowNodes(df: DataFrame): Seq[org.apache.spark.sql.execution.window.WindowExec] = {
    df.queryExecution.toRdd.foreach(_ => ())
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.window.WindowExec] = {
      val self = p match {
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
        case _ => Seq.empty
      }
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case _ => Seq.empty
      }
      self ++ nested ++ p.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("q277 decile lift: no single-partition rank over the customer aggregate") {
    // the r10 shape: the rank is range-partitioned with broadcast
    // offsets — the row_number window must be partitioned (by pid);
    // unpartitioned windows may only ride the BOUNDED tables (the
    // per-partition offset rollup and the ten-row decile report),
    // which aggregate by pid / decile directly beneath
    val ws = windowNodes(Relational.qDecileLift(spark, sf))
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("pid") || sub.contains("decile"),
        s"a data-scaled single-partition window crept in:\n$w")
    }
    assert(ws.exists(w => w.partitionSpec.nonEmpty &&
      w.toString.contains("row_number")),
      "the rank window lost its pid partitioning")
  }

  test("q276 concurrency sweep: no single-partition window over the boundary table") {
    // same device: the timeline cumsum is (pid)-partitioned after a
    // range exchange; unpartitioned windows may only ride the bounded
    // per-partition offset table
    val ws = windowNodes(Relational.qConcurrencySweep(spark, sf))
    assert(ws.nonEmpty)
    ws.filter(w => w.partitionSpec.isEmpty).foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("pid"),
        s"a data-scaled single-partition window crept in:\n$w")
    }
    assert(ws.exists(_.partitionSpec.nonEmpty),
      "the sweep window lost its pid partitioning")
  }

  test("q320 Fleiss: one fact exchange — the k-repartition feeds rollup, subject rollup and join") {
    // the explicit repartition(k) is the only data-scaled exchange:
    // HashPartitioning(k) satisfies the (k, cat) rollup's clustered
    // distribution, the k rollups reuse it (ReusedExchange), and the
    // subject side broadcasts into the join. The other four counted
    // exchanges are the ≤3-row category rollup and single-row folds.
    val df = Stats.qFleissKappa(spark, sf)
    assert(shuffles(df) == 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"the category branch must reuse the k-repartition:\n$plan")
  }

  test("q322/q323 serial diagnostics: every window partitioned by event_type") {
    Seq(Stats.qDurbinWatson(spark, sf), Stats.qPettitt(spark, sf))
      .foreach { df =>
        val ws = windowNodes(df)
        assert(ws.nonEmpty)
        assert(ws.forall(_.partitionSpec.nonEmpty),
          "a single-partition window crept into a calendar walk")
      }
  }

  test("q321 weighted kappa: the cut device rides partitioned windows only") {
    val ws = windowNodes(Stats.qWeightedKappa(spark, sf))
    assert(ws.nonEmpty)
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "the quintile cuts must come from the per-year value-domain window")
  }

  test("q329 HL: the lone unpartitioned window walks the bounded score domain") {
    val ws = windowNodes(Stats.qHosmerLemeshow(spark, sf))
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("sm#") || sub.contains("value#"),
        s"an unpartitioned window must ride the score-domain rollup:\n$w")
    }
  }

  test("q334/q335 text rank windows partition by source") {
    Seq(TextAnalysis.qTermBurstiness(spark, sf),
      TextAnalysis.qKeyness(spark, sf)).foreach { df =>
      val ws = windowNodes(df)
      assert(ws.nonEmpty)
      assert(ws.forall(_.partitionSpec.nonEmpty),
        "a vocab rank window lost its source partitioning")
    }
  }

  test("q336/q350 argmin/top-k cuts are TakeOrdered, never a global sort") {
    Seq("q336" -> Stats.qDecisionStump(spark, sf),
      "q350" -> Relational.qAssociationRules(spark, sf)).foreach {
      case (name, df) =>
        df.queryExecution.toRdd.foreach(_ => ())
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("TakeOrderedAndProject"),
          s"$name lost its top-k head:\n$plan")
    }
  }

  test("q358 ABC: the revenue cumulative rides the offset device") {
    val ws = windowNodes(Relational.qAbcClassification(spark, sf))
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.toString.contains("pid"),
        s"a data-scaled single-partition window crept into the ABC rank:\n$w")
    }
    assert(ws.exists(_.partitionSpec.nonEmpty),
      "the part cumulative lost its pid partitioning")
  }

  test("q346 SPRT: the enrollment cumulative rides the offset device") {
    // the per-arm LLR walk must never move the user aggregate into a
    // single partition: data-scaled windows partition by (arm, pid)
    // after the range exchange; unpartitioned windows are absent and
    // the offset windows partition by arm over the bounded pid table
    val ws = windowNodes(Stats.qSprt(spark, sf))
    assert(ws.nonEmpty)
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "a single-partition window crept into the SPRT walk")
    assert(ws.exists(_.toString.contains("pid")),
      "the walk lost its range-partition offset device")
  }

  test("q278 Kendall tau: no pair join — one value-domain shuffle feeds the inversion walk") {
    // the r10 shape: Knight's formulation — the customer aggregate
    // groups to its (nation, x, y) value domain and every downstream
    // term is a rollup of that grouped table; no self-join of the
    // customer table anywhere (the r9 shape's quadratic candidate
    // growth), so no join may carry the CUSTOMER table on both sides
    val df = Stats.qKendallTau(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    // the physical agg folds pair_inversions into its (unprinted)
    // result expressions — assert it on the optimized logical plan
    assert(df.queryExecution.optimizedPlan.toString.contains("pair_inversions"),
      s"inversion-count expression missing from the plan:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"a pair join crept back in:\n$plan")
  }

  test("q287 forecast revenue: pushed scan filters, one codegen stage, one tiny final-agg exchange") {
    // the TPC-H Q6 claim: the date range reaches the parquet reader,
    // nothing shuffles except the single-row partial→final gather
    val df = Relational.qForecastRevenue(spark, sf)
    assert(shuffles(df) == 1, "Q6 shape must shuffle only the final partials")
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*(GreaterThan|LessThan)".r
    assert(pushed.findFirstIn(plan).isDefined, s"date filter not pushed:\n$plan")
    // codegen'd stages render as "*(n)" in the plan string
    assert(plan.contains("*(1)"), s"scan leg fell out of codegen:\n$plan")
  }

  test("q294 discounted revenue: the OR-block predicate never breaks the hash equi-join") {
    val df = Relational.qDiscountedRevenue(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), s"partkey equi-join missing:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"the disjunction degraded the join to a nested loop:\n$plan")
  }

  test("q301 Jonckheere-Terpstra: no single-partition window over the cents domain") {
    // fourth consumer of the range-partition offset device: the five
    // per-group cumulatives ride pid-partitioned windows; unpartitioned
    // windows may only ride the bounded per-partition offset table
    val ws = windowNodes(Stats.qJonckheereTerpstra(spark, sf))
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("pid"),
        s"a data-scaled single-partition window crept in:\n$w")
    }
    assert(ws.exists(_.partitionSpec.nonEmpty),
      "the cumulative windows lost their pid partitioning")
  }

  test("q305 Cliff's delta: every window partitioned (by pair) — no global walk") {
    val ws = windowNodes(Stats.qCliffsDelta(spark, sf))
    assert(ws.nonEmpty)
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "the value-domain cumulative lost its pair partitioning")
  }

  test("q311 Zipf: the rank window is partitioned by source") {
    val ws = windowNodes(TextAnalysis.qZipf(spark, sf))
    assert(ws.nonEmpty)
    assert(ws.forall(_.partitionSpec.nonEmpty),
      "the vocab rank window lost its source partitioning")
  }

  test("q359 KS family: TWO data exchanges + the 4-row presentation sort") {
    // union of arm filters (scan-shaped, no shuffle) → (pair, v)
    // rollup (1) → pair-keyed windows (2: the cumulative AND the
    // totals ride the same partitioning — r11 moved the totals from a
    // separate groupBy+broadcast-join into an unordered window for
    // exactly this) → the final pair agg reuses the window's
    // partitioning → the trailing orderBy range-sorts the 4 OUTPUT
    // rows (3 — free at any scale). A fourth exchange means the
    // totals fell back to their own aggregate or the final agg
    // stopped reusing the window's partitioning.
    assert(shuffles(Stats.qKsTest(spark, sf)) == 3)
  }

  test("q371 Yuen: same machinery count — trim sums add nothing") {
    assert(shuffles(Stats.qYuenTrimmed(spark, sf)) == 3)
  }

  test("q362 Mood: the conditional-min median adds no exchange") {
    assert(shuffles(Stats.qMoodMedian(spark, sf)) == 3)
  }

  test("q364 Hodges-Lehmann: four data exchanges + the presentation sort") {
    // (pair, v) rollup (1) → the a×b difference join shuffles on pair
    // (2) → (pair, dv) rollup (3) → pair-keyed cumulative+total
    // windows (4) → 4-row output sort (5); the median cuts ride the
    // window partitioning
    assert(shuffles(Stats.qHodgesLehmann(spark, sf)) == 5)
  }

  test("q251 link prediction: final plan reads ONLY checkpointed blocks") {
    // the single-materialization contract (r11): the orderkey
    // self-join runs once into a localCheckpoint; the final job —
    // wedge join, anti-join probe, degree joins — must consume
    // checkpointed RDD scans only. A parquet scan in the final plan
    // means some consumer re-derived the edge set from source, the
    // exact recompute this shape exists to prevent (ReuseExchange
    // cannot reach across a checkpoint boundary).
    val df = Graph.qLinkPrediction(spark, sf)
    df.queryExecution.toRdd.foreach(_ => ())
    def hasFileScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      val self = p.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec] ||
        p.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      val nested = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          hasFileScan(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          hasFileScan(q.plan)
        case _ => false
      }
      self || nested || p.children.exists(hasFileScan)
    }
    assert(!hasFileScan(df.queryExecution.executedPlan),
      "q251's final plan re-reads source files instead of the checkpointed edge set")
  }

  test("q312 Heaps: no window at all — checkpoints are conditional sums") {
    val ws = windowNodes(TextAnalysis.qHeaps(spark, sf))
    assert(ws.isEmpty,
      s"q312 should be pure rollups; found windows:\n${ws.mkString("\n")}")
  }

  test("q295 Wilcoxon: no single-partition rank over the |diff| domain") {
    // same device as q276/q277: the cumulative count is pid-partitioned
    // after a range exchange; unpartitioned windows ride only the
    // bounded per-partition offset table
    val ws = windowNodes(Stats.qWilcoxonSignedRank(spark, sf))
    assert(ws.nonEmpty)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      val sub = w.child.toString
      assert(sub.contains("pid"),
        s"a data-scaled single-partition window crept in:\n$w")
    }
    assert(ws.exists(_.partitionSpec.nonEmpty),
      "the cumulative window lost its pid partitioning")
  }
}
