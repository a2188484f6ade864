package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The relational operator surface (SURVEY.md §2.4/§2.5).
  *
  * The reference (RedisGears) has no relational operators — every join,
  * aggregation, sort and window is hand-written user JS looping over
  * `client.call` results (e.g. the SCAN+HGET count loop in
  * `/root/reference/docs/docs/concepts/Sync_Async.md` and the cross-shard
  * sum in `Cluster_Support.md`). This module supplies that surface
  * natively as declarative DataFrame plans so Catalyst gets pushdown,
  * pruning, join selection and whole-stage codegen, and AQE re-plans at
  * runtime — the design point for 100 TB inputs.
  *
  * Scale notes per query are inline: small dimensions are broadcast
  * explicitly; aggregations rely on partial (map-side) aggregation; sorts
  * are top-k (`TakeOrderedAndProject`), never global sorts.
  */
object Relational {

  import Tables._

  /** §2.5 Q1 — stream-trigger count analogue: events per event_type.
    * Partial agg on 5 distinct keys → a few rows shuffled per partition. */
  def qTriggerCount(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("event_type").agg(count("*").as("n"))

  /** §2.5 Q2 — keyspace-trigger prefix match as a pushed-down predicate
    * (`StartsWith` reaches the parquet scan). */
  def qPrefixFilter(s: SparkSession, d: String): DataFrame =
    events(s, d).filter(col("event_type").startsWith("c"))
      .agg(count("*").as("n"))

  /** §2.5 Q3 — onTriggerFired lookup-enrich as a join, with EAGER
    * AGGREGATION: lineitem revenue is collapsed to one row per orderkey
    * BEFORE the join (sum is decomposable across the join because
    * o_orderkey is orders' key — every lineitem matches exactly one
    * order). Map-side partial aggregation then shrinks the fact-side
    * shuffle by the lineitems-per-order factor (~4× here), the join
    * reuses the aggregation's hash partitioning on the same key (no
    * extra exchange), and the join itself becomes 1:1 instead of 4:1 —
    * the textbook two-level-aggregation win that grows with scale.
    * Catalyst has no eager-aggregation rewrite, so the plan declares it. */
  def qLookupEnrich(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(orders(s, d).select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("rev")), 2).as("revenue"))

  /** §2.5 Q4 — cross-shard fan-out/gather (runOnShards) as a global agg.
    * COUNT(DISTINCT) expands to a two-stage partial/final plan. */
  def qCrossShardSum(s: SparkSession, d: String): DataFrame =
    events(s, d).agg(
      round(sum("value"), 2).as("sum_value"),
      count_distinct(col("user_id")).as("n_users"))

  /** §2.5 Q5 — checkpoint ordering (max stream id per key). */
  def qCheckpointOrder(s: SparkSession, d: String): DataFrame =
    events(s, d).groupBy("user_id")
      .agg(unix_timestamp(max("ts")).as("max_ts_sec"))

  /** §2.5 Q6 — tumbling event-time window (batch-equivalent of the
    * Structured Streaming hourly window; oracle-comparable). */
  def qStreamWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"),
        col("event_type"))
      .agg(count("*").as("n"), round(sum("value"), 2).as("sum_value"))

  /** Semi join (EXISTS): orders that have at least one lineitem. */
  def qSemiJoin(s: SparkSession, d: String): DataFrame =
    orders(s, d).join(lineitem(s, d).select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .agg(count("*").as("n"), round(sum("o_totalprice"), 2).as("sum_price"))

  /** Anti join (NOT EXISTS): customers with no orders. */
  def qAntiJoin(s: SparkSession, d: String): DataFrame =
    customer(s, d).join(orders(s, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count("*").as("n"))

  /** Top-k: ORDER BY + LIMIT plans as TakeOrderedAndProject — per
    * partition top-10 then a single-partition merge; no global sort. */
  def qTopK(s: SparkSession, d: String): DataFrame =
    orders(s, d).select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** Ranking window: each customer's highest-value order. */
  def qWindowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(s, d).withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey")
  }

  /** Analytic window: per-user LAG over the event stream — counts events
    * whose value increased vs the previous event (event_id is the
    * deterministic order key; ts has ns precision the oracle keeps but
    * Spark truncates). */
  def qWindowLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    events(s, d)
      .withColumn("prev", lag("value", 1).over(w))
      .filter(col("prev").isNotNull && col("value") > col("prev"))
      .agg(count("*").as("n_increases"))
  }

  /** ROLLUP aggregation (grouping sets). NULL group markers are coalesced
    * to 'ALL' so the oracle compare is null-free. */
  def qRollup(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).rollup("l_returnflag", "l_linestatus")
      .agg(count("*").as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))

  /** CUBE aggregation over events. */
  def qCube(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .cube("event_type")
      .agg(count("*").as("n"), round(sum("value"), 2).as("sum_value"))
      .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
        col("n"), col("sum_value"))

  /** q62: explicit GROUPING SETS — the third member of the
    * rollup/cube/grouping-sets family (§2.4 aggregations row), with a
    * set shape neither rollup nor cube produces: per-returnflag totals
    * and per-linestatus totals but no (flag, status) cross — i.e. two
    * independent marginal views in one pass over the fact table.
    * `grouping()` disambiguates a real NULL from an "aggregated-away"
    * column. One shuffle; Spark expands rows per set with partial aggs. */
  def qGroupingSets(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      // grouping() is only resolvable inside the Aggregate itself
      .agg(
        when(grouping(col("l_returnflag")) === 1, lit("ALL"))
          .otherwise(col("l_returnflag")).as("returnflag"),
        when(grouping(col("l_linestatus")) === 1, lit("ALL"))
          .otherwise(col("l_linestatus")).as("linestatus"),
        count("*").as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select("returnflag", "linestatus", "n", "sum_qty")

  /** Set op: users who clicked INTERSECT users who purchased. */
  def qSetIntersect(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.filter(col("event_type") === "click").select("user_id")
      .intersect(e.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** Set op: users who viewed EXCEPT users who purchased. */
  def qSetExcept(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
    e.filter(col("event_type") === "view").select("user_id")
      .except(e.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** Scalar functions: JSON extraction from the schemaless `props`
    * payload (the reference's dynamic JS-value analogue, SURVEY §1.3),
    * plus string/date built-ins. */
  def qScalarJson(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod")).agg(count("*").as("n"))

  /** Global distinct aggregation over two columns. */
  def qDistinctAgg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).agg(
      count_distinct(col("l_partkey")).as("n_parts"),
      count_distinct(col("l_suppkey")).as("n_supps"))

  /** TPC-H Q1 shape — the headline partial-agg benchmark: wide scan,
    * pushed filter, 4-key groupBy with many aggregates. */
  def qPricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count("*").as("count_order"))

  /** TPC-H Q5 shape — multi-join with broadcast dimensions. nation and
    * region are tiny at any SF → explicit broadcast keeps the big
    * customer⋈orders⋈lineitem chain shuffle-free on the dim side. */
  def qRevenueByNation(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).select("l_orderkey", "l_extendedprice", "l_discount")
      // EAGER AGGREGATION down the join chain: revenue is re-aggregated
      // to the next join's key before each shuffle join (valid because
      // each join is N:1 on that key), so every exchange carries partial
      // sums, never fact rows: lineitem rows → one row per orderkey →
      // one row per custkey → 25 nation rows before the broadcast dims.
      // At 100 TB the orderkey/custkey shuffles shrink by the fan-in at
      // each level; the dims stay broadcast. Catalyst has no
      // eager-aggregation rewrite, so the plan declares it.
      .groupBy("l_orderkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("rev")).as("rev"))
      .join(customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(sum(col("rev")).as("rev"))
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).select("r_regionkey", "r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(round(sum(col("rev")), 2).as("revenue"))

  /** Theta/range join: parts joined to lineitems of the same size class
    * via a range condition on quantity — exercises non-equi join
    * planning. Kept selective so the build side broadcasts. */
  def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select("p_partkey", "p_size", "p_retailprice")
      .filter(col("p_size") <= 5)
    lineitem(s, d).select("l_partkey", "l_quantity")
      .join(broadcast(p), col("l_partkey") === col("p_partkey") &&
        col("l_quantity") >= col("p_size"))
      .agg(count("*").as("n"), round(sum("p_retailprice"), 2).as("sum_price"))
  }

  /** As-of join WITHOUT a range join: for each left row, the latest
    * right value with `rTime <= lTime` for the same key. Implemented as
    * the union-tag-sort-window formulation — both sides union on
    * (key, time), a window partitioned by key and ordered by
    * (time, side) carries the last non-null right value forward, and
    * only left rows survive. ONE shuffle on the key, linear in
    * |left| + |right|; the pure inequality-join formulation plans a
    * nested-loop O(|left|·|right|) and dies at scale. Right rows sort
    * before left rows at equal time, making the match inclusive. */
  def asofJoin(left: DataFrame, lKey: String, lTime: String,
      right: DataFrame, rKey: String, rTime: String, rValue: String): DataFrame = {
    val vType = right.schema(rValue).dataType
    val l = left
      .withColumn("__k", col(lKey)).withColumn("__t", col(lTime))
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(vType))
    val r = right.select(
      col(rKey).as("__k"), col(rTime).as("__t"),
      lit(0).as("__side"), col(rValue).as("__v"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asof_$rValue", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__side", "__v")
  }

  /** q44: enrich each event with the user's most recent order date as
    * of the event time (the trading-style as-of lookup). Oracle: DuckDB
    * native ASOF JOIN. */
  def qAsofEnrich(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val ord = orders(s, d).select(col("o_custkey"), col("o_orderdate"))
    asofJoin(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate", "o_orderdate")
      .filter(col("asof_o_orderdate").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("asof_o_orderdate")).as("asof_order_sec"))
  }

  /** Event types present in the synthetic events table — pinned so the
    * pivot never runs the driver-side values-discovery job
    * (`pivot(col)` without values collects DISTINCT to the driver; with
    * an explicit list the plan is a single pass at any scale). */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")

  /** q73: pivot — hourly event counts with one column per event type
    * (long-to-wide, the report/feature-matrix shape). Single
    * aggregation pass: each pivot cell is a conditional count folded
    * map-side, so the shuffle carries (hour × types) partial rows.
    * Absent combinations surface as null from `pivot`; filled to 0 to
    * match the conditional-count oracle. */
  def qPivot(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)

  /** q74: batch sessionization (gaps-and-islands) — per-user sessions
    * split at >= 10-minute silences, built from `lag` + a running sum
    * of session-start markers, then per-user session stats. The batch
    * counterpart of q39's streaming `session_window` (same gap rule,
    * no watermark cutoff — every session counts). Scale: both windows
    * partition by user_id, so the whole query is ONE shuffle on the
    * user key followed by partition-local ordered walks; no global
    * sort anywhere. Timestamp comparisons stay in the timestamp domain
    * (µs-exact) rather than flooring to seconds. */
  def qSessionize(s: SparkSession, d: String, gapMinutes: Int = 10): DataFrame =
    sessionize(events(s, d).select(col("user_id"), col("ts")), gapMinutes)

  /** Gaps-and-islands sessionization of a (user_id, ts) DataFrame —
    * the reusable core of [[qSessionize]], crafted-input-tested in
    * OperatorsSpec. */
  def sessionize(ev: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val cum = Window.partitionBy("user_id").orderBy("ts")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(byUser)
    ev
      .withColumn("new_sess",
        when(prev.isNull ||
          col("ts") >= prev + expr(s"INTERVAL $gapMinutes minutes"), 1).otherwise(0))
      .withColumn("sess", sum("new_sess").over(cum))
      .groupBy("user_id", "sess")
      .agg(count("*").as("n_ev"))
      .groupBy("user_id")
      .agg(count("*").as("n_sessions"),
        max("n_ev").as("max_session_events"),
        sum("n_ev").cast("long").as("n_events"))
  }

  /** q130: trailing-window anomaly detection — per event type, each
    * hour's event count z-scored against the trailing 24 OBSERVED
    * hours (rows-framed window: mean, sample stddev over rows −24..−1),
    * flagged at |z| ≥ 3. The ops-monitoring primitive every ingest
    * pipeline runs against its own throughput: a traffic spike, a
    * stuck producer, a replay storm all surface here first. Hours with
    * under 12 trailing observations or zero variance don't score (no
    * baseline yet).
    *
    * Scale shape: the corpus reduces to an (event_type, hour) count
    * table in one map-side-partial agg — everything after runs on that
    * hours-sized table; the window partitions by event type so the
    * sort is per-type and bounded. In streaming this is q38's tumbling
    * count feeding the same window. */
  def qAnomalyHours(s: SparkSession, d: String): DataFrame =
    anomalyHours(Tables.events(s, d))

  /** The q130 core over any (event_type, ts) frame. */
  def anomalyHours(ev: DataFrame): DataFrame = {
    val hourly = ev
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_ts"))
      .agg(count(lit(1)).as("n"))
    val trail = Window.partitionBy("event_type").orderBy("hour_ts")
      .rowsBetween(-24, -1)
    hourly
      .withColumn("mu", avg(col("n")).over(trail))
      .withColumn("sd", stddev_samp(col("n")).over(trail))
      .withColumn("n_trail", count(lit(1)).over(trail))
      .filter(col("n_trail") >= 12 && col("sd") > 0)
      .withColumn("z", (col("n") - col("mu")) / col("sd"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_scored"),
        sum(when(abs(col("z")) >= 3, 1L).otherwise(0L)).as("n_anomalous"),
        round(max(abs(col("z"))), 4).as("max_abs_z"))
  }

  /** q131: ordered funnel analysis — of the users who ever viewed, how
    * many then clicked (first click AT/after their first view), and how
    * many completed a purchase after that click with the whole chain
    * inside a 24-hour attribution window. The event-sequence question
    * (conversion, signup flows, abandonment) that plain per-type counts
    * can't answer because ORDER matters.
    *
    * Scale shape: three stages, each a user-keyed partial agg over a
    * pre-filtered event type, joined user-to-user — sets shrink
    * monotonically down the funnel, every shuffle is on user_id, and
    * timestamps compare as integer microseconds (`unix_micros`) so both
    * engines see identical instants (the oracle divides DuckDB's
    * nanoseconds by 1000 to match). */
  def qFunnel(s: SparkSession, d: String): DataFrame =
    funnel(Tables.events(s, d))

  /** The q131 core over any (user_id, event_type, ts) frame;
    * `capUs` is the view-to-purchase attribution window (default 24 h). */
  def funnel(ev0: DataFrame, capUs: Long = 86400000000L): DataFrame = {
    val ev = ev0.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") >= col("v_us"))
      .groupBy("user_id", "v_us").agg(min(col("us")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") >= col("c_us") &&
        col("us") <= col("v_us") + lit(capUs))
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
      .select(col("n_view"), col("n_view_click"), col("n_full_funnel"),
        round(col("n_view_click").cast("double") / col("n_view"), 4)
          .as("click_rate"),
        round(col("n_full_funnel").cast("double") / col("n_view"), 4)
          .as("conversion_rate"))
  }

  /** q132: cohort retention — users grouped by first-activity day (the
    * cohort), counted as retained on each later day they reappear,
    * for offsets 0..7. THE product-analytics table (does week-1
    * retention hold across cohorts?), and for a data pipeline the
    * contributor-churn view of a crawl (do sources that appear keep
    * appearing?).
    *
    * Scale shape: first a user-keyed min (cohort assignment), then one
    * join back on user_id and a distinct over (cohort, offset, user) —
    * every shuffle is user- or cohort-keyed, counts are exact
    * integers, and day truncation happens identically in both engines
    * (truncation only moves DOWN, so the µs-vs-ns representation gap
    * cannot flip a day). */
  def qCohortRetention(s: SparkSession, d: String): DataFrame =
    cohortRetention(Tables.events(s, d))

  /** The q132 core over any (user_id, ts) frame. */
  def cohortRetention(ev: DataFrame): DataFrame = {
    val days = ev.select(col("user_id"),
      date_trunc("day", col("ts")).as("day")).distinct()
    val cohort = days.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    days.join(cohort, Seq("user_id"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= 7)
      .groupBy(unix_timestamp(col("cohort_day")).as("cohort_ts"), col("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** q137: first-order Markov transition matrix over per-user event
    * sequences — P(next=b | current=a) with transition counts. The
    * user-journey summary the per-type counts (q01) and the fixed
    * funnel (q131) can't give: which step FOLLOWS which, for every
    * pair, with no hand-declared path. Reads beside q79 (the text
    * bigram LM) as the same estimator applied to behavior instead of
    * tokens.
    *
    * Scale shape: one user-keyed window (partitioned by user_id, the
    * same shuffle key every event operator here uses) emits lag-1
    * pairs; everything after is a (types×types)-sized agg and a
    * types-sized window. Ordering ties break on event_id so both
    * engines see one canonical sequence (ts compares as integer
    * microseconds — the oracle divides DuckDB ns by 1000). */
  def qTransitionMatrix(s: SparkSession, d: String): DataFrame =
    transitionMatrix(Tables.events(s, d))

  /** The q137 core over any (user_id, event_type, ts, event_id) frame. */
  def transitionMatrix(ev0: DataFrame): DataFrame = {
    val ev = ev0.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val seq = Window.partitionBy("user_id").orderBy("us", "event_id")
    val pairs = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(seq))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"),
        col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy("prev_type")
    counts.withColumn("p",
      round(col("n").cast("double") / sum(col("n")).over(byPrev), 6))
  }

  /** q138: inter-arrival regularity per user — the bot/SDK-retry
    * detector. Humans arrive bursty (coefficient of variation ≈ 1 for
    * Poisson, >1 for bursts); schedulers and scripted crawlers arrive
    * on a clock (CV → 0). The flag feeds the same curation path as
    * q117's rule gate: traffic from regular-interval users is machine
    * traffic and poisons engagement-weighted sampling.
    *
    * Scale shape: one user-keyed window for the lag gaps, then a
    * user-keyed agg — the identical shuffle, so AQE coalesces them.
    * Gaps are integer microseconds; their sum telescopes to the span
    * (exactly representable), so mean is engine-exact and only the
    * stddev is floating point, reported as the dimensionless CV
    * rounded to 4dp. Tie order within an equal timestamp cannot
    * change the gap multiset (sorted differences), so no tiebreak
    * column is needed. */
  def qGapRegularity(s: SparkSession, d: String): DataFrame =
    gapRegularity(Tables.events(s, d))

  /** The q138 core over any (user_id, ts) frame; users with fewer than
    * `minGaps` gaps have no stable estimate and are dropped. */
  def gapRegularity(ev0: DataFrame, minGaps: Int = 9,
      cvFlag: Double = 0.3): DataFrame = {
    val ev = ev0.select(col("user_id"), unix_micros(col("ts")).as("us"))
    val seq = Window.partitionBy("user_id").orderBy("us")
    ev.withColumn("gap", (col("us") - lag(col("us"), 1).over(seq)).cast("double"))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        avg(col("gap")).as("mu"),
        stddev_samp(col("gap")).as("sd"))
      .filter(col("n_gaps") >= minGaps)
      .select(col("user_id"), col("n_gaps"),
        round(col("mu") / 1e6, 4).as("mean_gap_s"),
        round(col("sd") / col("mu"), 4).as("cv"),
        (round(col("sd") / col("mu"), 4) < cvFlag).as("is_regular"))
  }

  /** q139: salted two-phase aggregation — the skew-survival form of a
    * global agg, proven equal to the direct one by the gate (the
    * oracle IS the direct `GROUP BY event_type`). With 5 event types
    * and millions of rows per type, a plain groupBy hashes all 100 TB
    * onto 5 reducer keys; salting first aggregates on (type, salt) —
    * `salts`× more, evenly-hashed keys, each partial bounded — then
    * reduces the salts-sized partials. Spark's map-side partial
    * aggregation already bounds the FIRST shuffle's volume; the salt
    * bounds the per-key REDUCE state, which is what dies on a hot key
    * (and what AQE's skew handling only fixes for joins, not aggs).
    * sum/count re-aggregate losslessly; avg derives from them — the
    * standard algebraic-aggregate decomposition.
    *
    * Only the double sum is floating point (association differs from
    * the oracle's single-pass sum by ~1 ulp per partial), so money
    * totals round to 4dp as everywhere else in the gate. */
  def qSaltedAgg(s: SparkSession, d: String): DataFrame =
    saltedAgg(Tables.events(s, d))

  /** q140: key-skew audit over the event table's shuffle key — the
    * number you read BEFORE picking a partitioning: per-user_id row
    * counts reduced to max share, top-10 share, and the Gini
    * coefficient. Gini near 0 = uniform keys (plain hash partitioning
    * is fine); near 1 = a few keys own the table (salt, q139, or
    * AQE skew handling required). This is the planning audit the
    * brief's "salting for skew" lever depends on.
    *
    * Scale shape: the corpus reduces to a keys-sized count table in
    * one map-side partial agg. The Gini rank window runs over THAT
    * table (at billions of keys it becomes a range-partitioned sort +
    * partition-offset cumsum — same note as q129's vocab window); the
    * top-10 is a TakeOrderedAndProject, never a global sort. The Gini
    * sum is tie-order invariant (equal counts contribute c·Σ(2i−k−1)
    * over the tied rank range regardless of order within it), so no
    * tiebreak column is needed, and everything stays integer until
    * the final two divisions. */
  def qKeySkew(s: SparkSession, d: String): DataFrame =
    keySkew(Tables.events(s, d), col("user_id"))

  /** The q140 core: skew statistics of `key`'s count distribution. */
  def keySkew(tbl: DataFrame, key: Column): DataFrame = {
    val c = tbl.groupBy(key.as("k")).agg(count(lit(1)).as("n"))
    val w = Window.orderBy("n")
    // gini = (2·Σ i·n_i − (k+1)·Σn) / (k·Σn) with i the ascending rank
    val g = c.withColumn("i", row_number().over(w))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_count"),
        sum(col("i") * col("n")).as("s2"))
    val top10 = c.orderBy(col("n").desc).limit(10)
      .agg(sum(col("n")).as("t10"))
    g.crossJoin(top10).select(
      col("n_keys"), col("n_rows"), col("max_count"),
      round(col("max_count").cast("double") / col("n_rows"), 6)
        .as("max_share"),
      round(col("t10").cast("double") / col("n_rows"), 6).as("top10_share"),
      round((lit(2) * col("s2") - (col("n_keys") + 1) * col("n_rows"))
        .cast("double") / (col("n_keys") * col("n_rows")), 6).as("gini"))
  }

  /** q141: fuzzy name-variant detection — the entity-resolution join:
    * pairs of distinct part names within Levenshtein distance 2
    * ("cold bolt" / "old bolt"), each with its row count, the input to
    * a canonicalization MERGE (q96's shape). The oracle is the
    * UNBLOCKED all-pairs truth, so the gate proves the blocked plan
    * loses nothing on this vocabulary.
    *
    * Scale shape: the name VOCABULARY (not the table) self-joins —
    * Zipf/Heaps keeps it orders of magnitude smaller than the rows —
    * and the join is blocked on the last token plus a length band, so
    * candidate fanout is per-block-bounded instead of |vocab|². At a
    * real catalog the block key generalizes to any cheap canonical
    * signature (metaphone, sorted token set); the within-block
    * Levenshtein is the only DP cost paid. */
  def qNameVariants(s: SparkSession, d: String): DataFrame =
    nameVariants(Tables.part(s, d), col("p_name"))

  /** The q141 core: within-distance pairs of distinct values of
    * `name`, blocked on last token + length band. */
  def nameVariants(tbl: DataFrame, name: Column, maxDist: Int = 2): DataFrame = {
    val names = tbl.groupBy(name.as("nm")).agg(count(lit(1)).as("n_rows"))
      .withColumn("blk", element_at(split(col("nm"), " "), -1))
    val a = names.select(col("blk"), col("nm").as("name_a"),
      col("n_rows").as("rows_a"))
    val b = names.select(col("blk"), col("nm").as("name_b"),
      col("n_rows").as("rows_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
        col("rows_a"), col("rows_b"))
  }

  /** q143: SCD2 (slowly-changing-dimension type-2) history build — the
    * warehouse-standard versioned dimension: each customer's order
    * stream becomes closed [valid_from, valid_to) intervals over the
    * tracked attribute (order priority), with a far-future sentinel
    * closing the current version (avoids nullable hash-compare
    * ambiguity) and an is_current flag. This is the batch construction
    * a CDC consumer (q96's changeset shape) maintains incrementally.
    *
    * Scale shape: ONE shuffle on the dimension key; versioning is a
    * per-key window (lead), keys are numerous so parallelism is full;
    * no global sort, no driver state. Ties (same customer, same date)
    * order by the order key, so version numbering is engine-exact. */
  def qScd2(s: SparkSession, d: String): DataFrame = scd2(Tables.orders(s, d))

  /** 2100-01-01T00:00:00Z — the open-interval sentinel. */
  val OpenEndSec = 4102444800L

  def scd2(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("valid_from_sec"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderpriority").as("state"),
        unix_timestamp(col("o_orderdate")).as("valid_from_sec"))
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to_sec",
        coalesce(lead(col("valid_from_sec"), 1).over(w), lit(OpenEndSec)))
      .withColumn("is_current",
        (col("valid_to_sec") === OpenEndSec).cast("int"))
      .select("o_custkey", "version", "o_orderkey", "state",
        "valid_from_sec", "valid_to_sec", "is_current")
  }

  /** q144: interval union (coverage) per user — each event claims the
    * window [ts, ts+5min); overlapping claims merge, and the answer is
    * merged-island count + total covered seconds per user. The classic
    * gaps-and-islands shape: activity coverage, ad-exposure dedup,
    * sensor uptime — anywhere raw durations double-count overlap.
    * q74's sessionizer is the gap-split cousin; this is the measure-
    * theoretic union of explicit intervals.
    *
    * Scale shape: one shuffle on user_id; island detection is the
    * running-max window trick (rows-unbounded-preceding max of the
    * interval end), all partition-local per user, all integer
    * arithmetic — engine-exact at any scale. */
  def qIntervalCoverage(s: SparkSession, d: String): DataFrame =
    intervalCoverage(Tables.events(s, d), 300L)

  def intervalCoverage(ev: DataFrame, lenSec: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("s"), col("e"))
    val prevMax = w.rowsBetween(Window.unboundedPreceding, -1)
    ev.select(col("user_id"), unix_timestamp(col("ts")).as("s"))
      .withColumn("e", col("s") + lenSec)
      .withColumn("new_island",
        when(max(col("e")).over(prevMax).isNull ||
          col("s") > max(col("e")).over(prevMax), 1).otherwise(0))
      .withColumn("island", sum(col("new_island")).over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("i_start"), max(col("e")).as("i_end"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("i_end") - col("i_start")).as("covered_sec"))
  }

  /** The q139 core: `salts`-way salted sum/count/avg of `value` per
    * event_type over any (event_type, user_id, event_id, value) frame. */
  def saltedAgg(ev: DataFrame, salts: Int = 16): DataFrame = {
    val partial = ev
      .withColumn("salt",
        pmod(hash(col("user_id"), col("event_id")), lit(salts)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value")).as("ps"), count(lit(1)).as("pn"))
    partial.groupBy("event_type")
      .agg(round(sum(col("ps")), 4).as("sum_value"),
        sum(col("pn")).as("n"),
        round(sum(col("ps")) / sum(col("pn")), 6).as("avg_value"))
  }

  /** q145: referential-integrity audit — per foreign-key edge of the
    * star schema, row count, orphan count (child rows whose key has no
    * parent), and orphan share. The data-contract check every pipeline
    * runs before training joins: a silent orphan becomes a silent
    * row-drop in an inner join downstream.
    *
    * Scale shape: each edge is ONE left join aggregated in the same
    * pass (no second counting job). The parent side is projected to
    * its key column only before the join — at 100 TB the build side is
    * the key set, not the table — and the tiny dims (nation, region)
    * are broadcast explicitly, so only the fact→fact edges shuffle. */
  def qFkOrphans(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val edges = Seq(
      ("lineitem->orders", li, col("l_orderkey"),
        orders(s, d), col("o_orderkey"), false),
      ("lineitem->part", li, col("l_partkey"),
        part(s, d), col("p_partkey"), false),
      ("lineitem->supplier", li, col("l_suppkey"),
        supplier(s, d), col("s_suppkey"), false),
      ("orders->customer", orders(s, d), col("o_custkey"),
        customer(s, d), col("c_custkey"), false),
      ("customer->nation", customer(s, d), col("c_nationkey"),
        nation(s, d), col("n_nationkey"), true),
      ("supplier->nation", supplier(s, d), col("s_nationkey"),
        nation(s, d), col("n_nationkey"), true),
      ("nation->region", nation(s, d), col("n_regionkey"),
        region(s, d), col("r_regionkey"), true))
    edges.map { case (name, child, ck, parent, pk, bc) =>
      fkOrphanEdge(name, child, ck, parent, pk, bc)
    }.reduce(_.union(_))
  }

  /** One q145 edge: single-pass left-join + aggregate.
    *
    * Semantics: the parent side is reduced to its distinct KEY SET, so
    * the check is set membership (`EXISTS`), not a raw join — a child
    * row counts as orphaned iff its key appears zero times in the
    * parent, and a duplicated parent key can never fan the child out.
    * (A plain SQL left join against a parent with duplicate keys would
    * inflate COUNT(*); an FK audit wants membership, so the distinct is
    * deliberate. The q145 oracle left-joins the raw parent, which
    * agrees because it only targets primary-key columns.) */
  def fkOrphanEdge(name: String, child: DataFrame, ck: Column,
      parent: DataFrame, pk: Column, bcast: Boolean): DataFrame = {
    val keys0 = parent.select(pk.cast("long").as("__pk")).distinct()
    val keys = if (bcast) broadcast(keys0) else keys0
    child.select(ck.cast("long").as("__ck"))
      .join(keys, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("orph"))
      .select(lit(name).as("relation"), col("n_rows"),
        col("orph").cast("long").as("n_orphans"),
        round(col("orph").cast("double") / col("n_rows"), 6)
          .as("orphan_share"))
  }

  /** q146: Benford first-digit audit over order totals — the classic
    * fabricated-data / pipeline-corruption screen: the distribution of
    * leading digits of a naturally-spread positive measure follows
    * log10(1+1/d); a flat or spiked profile flags synthetic or
    * truncated values. Output per digit: count, observed share,
    * Benford expectation, and the excess.
    *
    * Scale shape: a full scan collapsed by map-side partial agg onto 9
    * groups — the shuffle moves ≤ 9 rows per partition regardless of
    * input size. The digit extraction is pure codegen'd arithmetic
    * (floor/log10/power), no string formatting. An off-by-one-ulp
    * log10 at an exact power of 10 would misplace the mantissa by a
    * factor of 10, so the mantissa is re-normalized into [1, 10)
    * before the digit is taken — the helper is safe on arbitrary
    * positive columns, not just 2-decimal prices. */
  def qBenford(s: SparkSession, d: String): DataFrame =
    benford(orders(s, d), col("o_totalprice"))

  def benford(tbl: DataFrame, v: Column): DataFrame = {
    val m0 = v / pow(lit(10.0), floor(log10(v)))
    val m = when(m0 >= 10.0, m0 / 10.0).when(m0 < 1.0, m0 * 10.0).otherwise(m0)
    val counts = tbl.filter(v > 0)
      .select(floor(m).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = Window.partitionBy()
    counts
      .withColumn("share", round(col("n") / sum(col("n")).over(total), 6))
      .withColumn("benford_p", round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("excess", round(col("share") - col("benford_p"), 6))
      .select("digit", "n", "share", "benford_p", "excess")
  }

  /** q147: per-customer consecutive-month order streaks — the
    * gaps-and-islands idiom on a calendar grid: distinct active months
    * per customer, runs of consecutive months (the island key is
    * month_index − row_number, constant within a run), streak count
    * and longest streak. Retention/engagement-tenure analytics in one
    * windowed pass; q144 is the continuous-time cousin.
    *
    * Scale shape: ONE shuffle, on the customer key alone — the input
    * is explicitly repartitioned by k, which satisfies the clustering
    * requirement of the (k, midx) dedup aggregate ([k] ⊆ [k, midx]),
    * the window's partitionBy(k), and both downstream group-bys, so
    * EnsureRequirements inserts no further exchange. All arithmetic is
    * integer and partition-local. Customers are numerous → full
    * parallelism, no skew. */
  def qOrderStreaks(s: SparkSession, d: String): DataFrame =
    monthStreaks(orders(s, d), col("o_custkey"), col("o_orderdate"))

  def monthStreaks(tbl: DataFrame, key: Column, ts: Column): DataFrame = {
    val months = tbl
      .select(key.as("k"), (year(ts) * 12 + month(ts)).cast("long").as("midx"))
      .repartition(col("k"))
      .dropDuplicates("k", "midx")
    val w = Window.partitionBy("k").orderBy("midx")
    months
      .withColumn("island", col("midx") - row_number().over(w))
      .groupBy(col("k"), col("island"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("k"))
      .agg(sum(col("run_len")).as("n_active_months"),
        count(lit(1)).as("n_streaks"),
        max(col("run_len")).as("longest_streak"))
      .select(col("k").as("o_custkey"), col("n_active_months"),
        col("n_streaks"), col("longest_streak"))
  }
}
