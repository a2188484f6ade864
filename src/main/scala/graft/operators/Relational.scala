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

  // one-outstanding-cache slots (q159 cells / q161 user-type pairs):
  // each rerun swaps in the new cached frame and releases the previous
  private val lastCellsCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()
  private val lastUtCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

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

  /** q189: fact-to-SCD2 temporal join — every lineitem priced against
    * the priority STATE ITS CUSTOMER WAS IN WHEN THE ITEM SHIPPED
    * (valid_from ≤ ship < valid_to against the q143 dimension): the
    * point-in-time join every warehouse needs to avoid attributing
    * facts to a dimension's CURRENT state (the classic SCD2 consumer
    * q143 only builds). Revenue is exact integer 1e-4-dollar units
    * (decimal parse of both factors, decimal product, ×10⁴ → long).
    *
    * Scale shape: equi-join on the customer key with a residual
    * interval predicate — shuffles once on custkey; each fact matches
    * AT MOST one version (the SCD2 intervals partition time from the
    * first order onward), so no fanout. Facts shipping BEFORE their
    * customer's first version — this generator does not enforce
    * ship ≥ order date — land in an explicit 'NONE' bucket instead of
    * silently vanishing from an inner join (~8% at sf0.001; an audit
    * must account for every fact). The dimension's per-key version
    * list is orders-per-customer-bounded. */
  def qTemporalJoin(s: SparkSession, d: String): DataFrame = {
    val dim = scd2(Tables.orders(s, d))
      .select(col("o_custkey").as("dck"), col("state"),
        col("valid_from_sec"), col("valid_to_sec"))
    val fact = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"),
        unix_timestamp(col("l_shipdate")).as("ship_sec"),
        ((col("l_extendedprice").cast("decimal(18,2)")
          * (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          * 10000).cast("long").as("rev_e4"))
    fact.join(dim,
        col("ck") === col("dck") &&
          col("ship_sec") >= col("valid_from_sec") &&
          col("ship_sec") < col("valid_to_sec"),
        "left")
      .groupBy(coalesce(col("state"), lit("NONE")).as("state"))
      .agg(count(lit(1)).as("n_lines"), sum("rev_e4").as("revenue_e4"))
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

  /** q152: per-nation revenue trend — ordinary least squares of order
    * total on order date, computed from EXACT sufficient statistics.
    * The per-group linear-trend fit is the standard drift monitor over
    * any partitioned measure (revenue by region, tokens by source,
    * latency by service); at 100 TB it is one aggregation: the five
    * sufficient sums (n, Σx, Σy, Σxy, Σx²) partial-aggregate map-side
    * onto one row per group, and the slope algebra runs post-shuffle on
    * those scalars.
    *
    * Determinism: x is integer days since a fixed epoch and y a
    * 2-decimal DECIMAL, so every sum is exact integer/decimal addition
    * (order-invariant across partition schedules and engines — the
    * q103 lesson); only the final scalar formula touches doubles, and
    * +,·,/ are IEEE correctly-rounded, identical on every platform
    * (unlike libm transcendentals — the q146 lesson). */
  def qTrendOls(s: SparkSession, d: String): DataFrame =
    trendOls(
      orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey")),
      col("n_name"),
      datediff(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01"))),
      col("o_totalprice"))

  /** The q152 core: groupwise OLS of `y` on `x` over any frame.
    * `x` must be integral, `y` at most 2-decimal for exact sums. */
  def trendOls(tbl: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val prep = tbl.select(group.as("g"), x.cast("long").as("x"),
      y.cast("decimal(18,2)").as("y"))
    val d = (c: Column) => c.cast("double")
    prep.groupBy("g")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("g"), col("n").as("n_rows"),
        round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))), 6)
          .as("slope_per_day"),
        round(d(col("sy")) / d(col("n")), 2).as("avg_y"))
  }

  /** q155: session entry/exit paths — [[sessionize]]'s gaps-and-islands
    * core extended to the landing/exit-page report: per session, the
    * first and last event type (total order (ts, event_id) — µs ties
    * broken deterministically), rolled up to (entry, exit) cells with
    * bounce counts (single-event sessions). Where-users-arrive ×
    * where-they-leave is the canonical engagement matrix.
    *
    * Scale shape: both windows and the session collapse partition by
    * user_id — ONE shuffle on the user key, then partition-local
    * ordered walks; the final (entry, exit) rollup moves ≤ |types|²
    * rows per partition. */
  def qSessionPaths(s: SparkSession, d: String, gapMinutes: Int = 10): DataFrame = {
    val ev = events(s, d).select("user_id", "ts", "event_id", "event_type")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(byUser)
    val sess = ev
      .withColumn("new_sess", when(prev.isNull ||
        col("ts") >= prev + expr(s"INTERVAL $gapMinutes minutes"), 1).otherwise(0))
      .withColumn("sess", sum("new_sess").over(cum))
    val inSess = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sess
      .withColumn("entry_type", first("event_type").over(inSess))
      .withColumn("exit_type", last("event_type").over(inSess))
      .withColumn("n_ev", count(lit(1)).over(inSess))
      // entry/exit/n_ev are constants within a session: distinct
      // collapses each session to one row, no order sensitivity
      .select("user_id", "sess", "entry_type", "exit_type", "n_ev")
      .distinct()
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounces"),
        round(sum("n_ev").cast("double") / count(lit(1)), 4).as("avg_events"))
  }

  /** q156: telemetry throttle-dedup — an event is a near-duplicate when
    * the SAME (user, type) fired within `windowSec` of the previous
    * firing (raw-predecessor rule: each event compares to its immediate
    * predecessor, the standard double-click / retry-storm suppressor;
    * window-expressible, unlike the kept-predecessor variant which is
    * inherently sequential). Reports per-type totals, drops, and drop
    * share — the dashboard that sizes a client-side debounce.
    *
    * Scale shape: one shuffle on (user_id, event_type), a
    * partition-local lag, then a ≤|types|-row rollup. µs-domain
    * comparison, no second flooring. */
  def qEventThrottle(s: SparkSession, d: String, windowSec: Int = 60): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    val prev = lag(col("ts"), 1).over(w)
    events(s, d).select("user_id", "event_type", "ts", "event_id")
      .withColumn("dup", prev.isNotNull &&
        unix_micros(col("ts")) - unix_micros(prev) < windowSec * 1000000L)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("dup"), 1L).otherwise(0L)).as("n_dropped"),
        round(sum(when(col("dup"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)), 4).as("drop_share"))
  }

  /** q157: lag-1 autocorrelation of the daily event-count series, per
    * type — the burstiness/seasonality screen that complements q130's
    * z-score anomalies (q130 finds outlier hours; this measures whether
    * adjacent days co-move at all — near 0 = memoryless load, near ±1 =
    * trending/alternating, the input to capacity forecasting).
    *
    * Determinism: daily counts are integers, so all six sufficient sums
    * are exact longs; the Pearson formula then runs on scalars in
    * IEEE-exact +,·,/,√ (sqrt IS correctly rounded, unlike log/exp).
    * A zero-variance series yields null rather than an engine-dependent
    * NaN/Inf. Scale: two shuffles, both tiny post-partial-agg
    * ((type, day) cells, then |types| rows). */
  def qDailyAutocorr(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val d2 = (c: Column) => c.cast("double")
    daily.withColumn("cp", lag(col("c"), 1).over(w))
      .filter(col("cp").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("m"), sum("c").as("sx"), sum("cp").as("sy"),
        sum(col("c") * col("cp")).as("sxy"),
        sum(col("c") * col("c")).as("sxx"),
        sum(col("cp") * col("cp")).as("syy"))
      .select(col("event_type"), col("m").as("n_pairs"),
        round(when(
          (col("m") * col("sxx") - col("sx") * col("sx")) > 0 &&
          (col("m") * col("syy") - col("sy") * col("sy")) > 0,
          d2(col("m") * col("sxy") - col("sx") * col("sy")) /
            sqrt(d2(col("m") * col("sxx") - col("sx") * col("sx")) *
                 d2(col("m") * col("syy") - col("sy") * col("sy")))), 6)
          .as("lag1_autocorr"))
  }

  /** q164: robust outlier screen — per event type, the median/MAD
    * (median absolute deviation) fence: a value is an outlier when
    * |x − median| > 5·MAD. Unlike the q130 z-score, median/MAD have a
    * 50% breakdown point, so the fence itself survives the very
    * outliers it hunts (Hampel's rule; the robust-statistics standard
    * for telemetry with heavy tails). Both medians are the exact
    * interpolated percentile — the ANSI definition both engines share
    * (the q104 parity). Output per type: n, median, MAD, outlier
    * count and share.
    *
    * Scale shape: two grouped exact-percentile passes + one counting
    * agg, all keyed on the |types|-sized group; the medians broadcast
    * back. At 100 TB swap the exact percentile for the q148
    * threshold-refinement loop (exact, no sort) or the q49 sketch —
    * the fence logic is unchanged. */
  def qMadOutliers(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("value"), col("med"),
        abs(col("value") - col("med")).as("adev"))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max("med"), 4).as("median"),
        round(max("mad"), 4).as("mad"),
        sum(when(col("adev") > lit(5.0) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_share",
        round(col("n_outliers").cast("double") / col("n"), 4))
  }

  /** q165: frequent behavior sequences — the top 3-step event-type
    * paths (trigrams over each user's time-ordered stream), the
    * sequence-mining step up from q137's one-step Markov matrix:
    * "view→click→purchase" vs "error→error→error" is the difference
    * between a working funnel and a retry storm, and neither is
    * visible in pairwise transitions. Deterministic top-k cut
    * (count desc, then the lexicographic triple).
    *
    * Scale shape: one shuffle on user_id, partition-local double-lead
    * window walk, then a ≤|types|³-group agg and a TakeOrdered head. */
  def qEventTrigrams(s: SparkSession, d: String, topK: Int = 25): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, d).select("user_id", "event_type", "ts", "event_id")
      .withColumn("t2", lead("event_type", 1).over(w))
      .withColumn("t3", lead("event_type", 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("t2").as("e2"), col("t3").as("e3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("e1"), col("e2"), col("e3"))
      .limit(topK)
  }

  /** q176: Mann–Kendall trend test — the NON-PARAMETRIC companion to
    * q152's OLS slope: S = Σ sgn(c_j − c_i) over ordered day pairs of
    * the daily count series, with the tie-corrected variance
    * (18·Var = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)) and the
    * continuity-corrected z. Detects monotone drift without assuming
    * linearity or normal noise — the standard trend test on count
    * series (Mann 1945, Kendall 1975). S and 18·Var are exact
    * integers; only the final z touches doubles (÷, √ — IEEE-exact).
    *
    * Scale shape: the pair join is per-type day×day — days per group
    * is calendar-bounded (30² here; even a decade is ~3.6k² ≈ 10⁷ per
    * group), so the quadratic lives inside a bounded group, never on
    * row counts. */
  def qMannKendall(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(lastDailyCache.getAndSet(daily)).foreach(_.unpersist(blocking = false))
    val sStat = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.day") < col("b.day"))
      .groupBy(col("a.event_type").as("event_type"))
      .agg(sum(signum(col("b.c") - col("a.c")).cast("long")).as("s_stat"))
    val ties = daily.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_levels"), sum("t").as("n_days"),
        sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    sStat.join(ties, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
          .as("var_x18"))
      .withColumn("z", round(
        when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
          .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
          .otherwise(lit(0.0)) /
          sqrt(col("var_x18").cast("double") / 18.0), 4))
  }

  private val lastDailyCache =
    new java.util.concurrent.atomic.AtomicReference[DataFrame]()

  /** q177: CUSUM changepoint detection — for each type's daily count
    * series, the split point maximizing the scaled cumulative
    * deviation |K_k| = |n·Σ_{i≤k}c_i − k·Σc| (the classic CUSUM
    * statistic ×n, kept integer so argmax is exact; Page 1954): WHEN
    * did this metric's level shift, where q130 only says that an hour
    * is anomalous and q152/q176 only that a monotone trend exists.
    * Tie-break earliest day. Reports the segment means (exact sums,
    * scalar division at the end).
    *
    * Scale shape: one (type, day) rollup, partition-local cumsum
    * windows, a per-type TakeOrdered-1 via row_number — tiny after the
    * first map-side collapse. */
  def qCusumChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("event_type")
    val scored = daily
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", count(lit(1)).over(tot))
      .withColumn("s", sum("c").over(tot))
      .filter(col("k") < col("n"))
      .withColumn("dev", abs(col("n") * col("cum") - col("k") * col("s")))
    val pick = Window.partitionBy("event_type")
      .orderBy(col("dev").desc, col("day"))
    scored.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        // string day: a raw DATE column hashes engine-dependently
        // (date32 vs timestamp) downstream
        col("day").cast("string").as("cp_day"),
        col("k").as("k"), col("dev").as("abs_dev"),
        round(col("cum").cast("double") / col("k"), 4).as("mean_before"),
        round((col("s") - col("cum")).cast("double") / (col("n") - col("k")), 4)
          .as("mean_after"))
  }

  /** q175: Kaplan–Meier risk table for view→purchase conversion —
    * survival analysis with CENSORING, the statistic family q149's
    * percentiles silently get wrong: computing latency quantiles over
    * converters only ignores every user still "at risk" who never
    * converted, biasing time-to-event low. Here each viewer
    * contributes a duration (first view → earliest qualifying
    * purchase) flagged event, or (first view → their last observed
    * activity) flagged censored; the product-limit ingredients at each
    * distinct event hour — subjects at risk, events, censored exits,
    * and the exact integer hazard d·1e6 div n_risk — ARE the KM
    * estimator (S(t) = Π(1 − hazard); the curve derives client-side,
    * because a running float product would be the one non-exact step).
    *
    * Scale shape: two user-keyed aggs build the duration table; cells
    * collapse to DISTINCT HOURS (bounded by the observation window, ≤
    * a few thousand rows at any corpus size), so the risk-set reverse
    * cumsum runs as a single-partition window over a provably tiny
    * frame. All integer arithmetic. */
  def qHazardTable(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select("user_id", "event_type", "ts")
    val fv = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("fv"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(fv, Seq("user_id"))
      .filter(unix_micros(col("ts")) >= col("fv"))
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts")) - col("fv")).as("dur_us"))
    val lastSeen = ev.groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"))
    val subjects = fv
      .join(conv, Seq("user_id"), "left")
      .join(lastSeen, Seq("user_id"))
      .select(
        when(col("dur_us").isNotNull, col("dur_us"))
          .otherwise(col("last_us") - col("fv")).as("dur_us"),
        col("dur_us").isNotNull.as("is_event"))
      .select(expr("dur_us div 3600000000").as("dur_h"), col("is_event"))
    val cells = subjects.groupBy("dur_h")
      .agg(count(lit(1)).as("n_here"),
        sum(when(col("is_event"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("is_event"), 0L).otherwise(1L)).as("n_censored"))
    val wRisk = Window.orderBy("dur_h")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cells
      .withColumn("n_risk", sum("n_here").over(wRisk))
      .filter(col("n_events") > 0)
      .select(col("dur_h"), col("n_risk"), col("n_events"), col("n_censored"),
        expr("n_events * 1000000L div n_risk").as("hazard_ppm"))
  }

  /** q174: weekday seasonality profile — per event type, each
    * day-of-week's average daily count as a 1e4-scaled integer index
    * against the type's overall daily average (10000 = flat; the
    * weekly rhythm that q157's lag-1 autocorrelation detects but
    * cannot localize). Completes the time-series audit family: trend
    * (q152), outlier hours (q130), robust fences (q164), burstiness
    * (q138), autocorrelation (q157), peak load (q172), seasonality
    * here. The index is exact integer arithmetic — (sum_dow ·
    * n_days_total · 1e4) div (n_days_dow · sum_total) — so the profile
    * hashes identically everywhere.
    *
    * Scale: one scan onto (type, day) cells map-side, then two
    * tiny rollups; ISO day-of-week from the date, identical in both
    * engines. */
  def qWeekdaySeasonality(s: SparkSession, d: String): DataFrame = {
    val daily = events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val byDow = daily
      .groupBy(col("event_type"), dayofweek(col("day")).as("dow"))
      .agg(sum("c").as("s"), count(lit(1)).as("nd"))
    val tot = daily.groupBy("event_type")
      .agg(sum("c").as("st"), count(lit(1)).as("ndt"))
    byDow.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("dow"),
        col("s").as("n_events"), col("nd").as("n_days"),
        expr("s * ndt * 10000L div (nd * st)").as("seasonality_idx"))
  }

  /** q172: peak sliding-window load — for each event type, the highest
    * event count in ANY trailing 6-hour window (evaluated at event
    * times, which is where the maximum of a right-continuous sliding
    * count always sits), plus the earliest µs timestamp achieving it.
    * The capacity-planning number: "what burst must this type's
    * consumer absorb?" — and the RANGE-frame member of the window
    * family (q10/q11/q130 are ROWS frames; a RANGE frame counts by
    * time distance, so sparse and dense regions are measured by the
    * same clock, not the same row budget).
    *
    * r13 OPTIMIZATION (VERDICT r12 #6; guide §2.5 — this note used to
    * DESCRIBE the day-split fix and the code didn't implement it): the
    * old frame partitioned by event_type only — |types| tasks however
    * many cores exist, one long partition-local walk each, plus a
    * persisted full-event frame self-joined against its own peak
    * rollup. Now each event is windowed inside its (event_type, day)
    * chunk, with the events from the trailing `span` of the PREVIOUS
    * chunk duplicated in as evaluation-exempt context rows (span ≤
    * chunk, so one extra copy bounds the overlap): every trailing
    * window is complete inside its chunk, the counts are bit-identical,
    * and the work spreads over |types|·|days| partitions. The peak +
    * earliest-timestamp pair collapses to ONE max(struct(w6, −us))
    * aggregate — no persist, no self-join, one pass. Exact integers
    * end to end. */
  def qPeakWindowLoad(s: SparkSession, d: String, windowHours: Int = 6): DataFrame = {
    val spanUs = windowHours * 3600L * 1000000L
    val chunkUs = math.max(86400L * 1000000L, spanUs) // ≥ span ⇒ context spans 1 chunk back
    val e = events(s, d)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val evalRows = e.select(col("event_type"), col("us"),
      expr(s"us div $chunkUs").as("chunk"), lit(true).as("eval"))
    // an event in the trailing (span−1) µs of a chunk also serves as
    // frame CONTEXT for the next chunk's earliest evaluation points
    val ctxRows = e.filter(expr(s"us % $chunkUs >= ${chunkUs - (spanUs - 1)}"))
      .select(col("event_type"), col("us"),
        expr(s"us div $chunkUs + 1").as("chunk"), lit(false).as("eval"))
    val w = Window.partitionBy("event_type", "chunk").orderBy("us")
      .rangeBetween(-(spanUs - 1), 0)
    evalRows.unionAll(ctxRows)
      .withColumn("w6", count(lit(1)).over(w))
      .filter(col("eval"))
      .groupBy("event_type")
      .agg(max(struct(col("w6"), (-col("us")).as("nus"))).as("m"))
      .select(col("event_type"), col("m.w6").as("peak_events"),
        (-col("m.nus")).as("peak_at_us"))
  }

  /** q159: contingency-table independence audit (lang × source) — the
    * per-cell standardized Pearson residual (n−e)/√e against the
    * independence expectation e = row·col/N. A |residual| ≳ 2 cell
    * means that language is over/under-represented in that source —
    * the mix-design check behind per-source language budgets (q115)
    * and the audit that catches a crawler whose language mix shifted.
    * Per-CELL residuals rather than the summed χ² statistic: the cells
    * are what you act on, and a sum of per-cell doubles would be
    * addition-order-dependent where the per-row scalar math is
    * IEEE-deterministic (the q103 lesson, applied preemptively).
    *
    * Scale: one scan collapsed map-side onto |langs|·|sources| cells;
    * the margins are aggregations OF THE CELLS (nothing corpus-sized
    * shuffles twice), broadcast back onto them. */
  def qContingencyResiduals(s: SparkSession, d: String): DataFrame = {
    val cells = documents(s, d).groupBy("lang", "source")
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(lastCellsCache.getAndSet(cells)).foreach(_.unpersist(blocking = false))
    val rows = cells.groupBy("lang").agg(sum("n").as("r"))
    val cols = cells.groupBy("source").agg(sum("n").as("c"))
    val total = rows.agg(sum("r")).head().getLong(0)
    val e = (col("r") * col("c")).cast("double") / total.toDouble
    val out = cells.join(broadcast(rows), Seq("lang"))
      .join(broadcast(cols), Seq("source"))
      .select(col("lang"), col("source"), col("n"),
        round(e, 4).as("expected"),
        round((col("n").cast("double") - e) / sqrt(e), 4).as("std_residual"))
    out
  }

  /** q161: event-type co-occurrence — for every unordered type pair,
    * how many users did BOTH, and the association lift vs independence
    * (n_both·N_users/(n_a·n_b), exact 1e6-scaled integer — the q153
    * ranking trick on user sets instead of token positions). The
    * market-basket matrix over behaviors: which actions travel
    * together, the input to funnel design (q131 assumes an order;
    * this measures which orders exist at all).
    *
    * Scale shape: distinct (user, type) is one shuffle; the pair join
    * is user-keyed with per-user fanout ≤ |types|² (bounded, tiny);
    * margins are type-sized. No all-pairs anything. */
  def qTypeCooccurrence(s: SparkSession, d: String): DataFrame = {
    val ut = events(s, d).select("user_id", "event_type").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Option(lastUtCache.getAndSet(ut)).foreach(_.unpersist(blocking = false))
    val nUsers = ut.select("user_id").distinct().count()
    val marg = ut.groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val pairs = ut.as("a")
      .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(marg.select(col("event_type").as("type_a"), col("cnt").as("na"))), Seq("type_a"))
      .join(broadcast(marg.select(col("event_type").as("type_b"), col("cnt").as("nb"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"),
        expr(s"n_both * ${nUsers}L * 1000000L div (na * nb)").as("lift_ppm"))
  }

  /** q162: order-total reconciliation — the cross-table consistency
    * audit every warehouse runs: does o_totalprice equal the sum of
    * its lineitem extended prices? Differences are computed in EXACT
    * integer cents (2-decimal DECIMAL → ×100 → BIGINT; float money
    * arithmetic would manufacture phantom mismatches), bucketed per
    * order priority: exact matches, within-a-dollar, and larger, plus
    * the worst absolute gap. (On TPC-H proper the totals include tax
    * and discount, so large "mismatches" are expected — the audit
    * reports the distribution, it doesn't assert zero.)
    *
    * Scale: lineitem collapses to per-order cents map-side (one
    * shuffle on orderkey), joins orders on its key, then a ≤|priorities|
    * rollup. All integer. */
  def qTotalpriceAudit(s: SparkSession, d: String): DataFrame = {
    val liCents = lineitem(s, d).groupBy("l_orderkey")
      .agg(sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("li_cents"))
    orders(s, d)
      .join(liCents, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderpriority"),
        (expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)") -
          coalesce(col("li_cents"), lit(0L))).as("diff_cents"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("diff_cents") === 0, 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("diff_cents") =!= 0 && abs(col("diff_cents")) <= 100, 1L)
          .otherwise(0L)).as("n_within_dollar"),
        sum(when(abs(col("diff_cents")) > 100, 1L).otherwise(0L)).as("n_over_dollar"),
        max(abs(col("diff_cents"))).as("max_abs_cents"))
  }

  /** q350: association rules over order baskets — the
    * support/confidence/lift formulation of co-purchase (Agrawal '93;
    * q163 ranks nodes, q173 serves neighbors — this emits the RULES a
    * merchandiser reads: "A ⇒ B, confidence 41%, lift 3.2"): top-10
    * rules by lift with a support floor, both directions of every
    * qualifying pair.
    *
    * Exactness/determinism: support, item counts and the order count
    * are exact; confidence is a floored ppm and lift an
    * exact-rational-valued double (N·c(AB)/(c(A)·c(B))), so the
    * (lift DESC, antecedent, consequent) top-k is a deterministic
    * total order cut by TakeOrdered — never a global sort.
    *
    * Scale shape: the pair rollup is the q163/q253-audited basket
    * device (per-order fanout ≤ lines², support floor); item counts
    * join on partkey (shuffle, item-aggregate-sized); the order count
    * broadcasts from a 1-row aggregate. */
  def qAssociationRules(s: SparkSession, d: String,
      minSupport: Long = 3L, topK: Int = 10): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d2 = (c: Column) => c.cast("double")
    // r12 OPTIMIZATION (guide §2.4, the orderPartPairs device): ONE
    // basket rollup (orderkey exchange + in-row sorted part set) feeds
    // the order count, the per-item supports, and the pair supports —
    // the old shape paid a distinct(o, p) exchange, a second distinct
    // for n_orders, and an orderkey self-join for the pairs. Row
    // multisets identical (collect_set dedups (o, p); the in-plan
    // expansion emits exactly the a.p < b.p join pairs).
    val baskets = lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
      .localCheckpoint()
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    val item = baskets.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c_item"))
    val pair = baskets.select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps) - i - 1),
               y -> struct(x AS pa, y AS pb))))""")).as("e"))
      .groupBy(col("e.pa").as("pa"), col("e.pb").as("pb"))
      .agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minSupport)
    val rules = pair.select(col("pa").as("ante"), col("pb").as("cons"),
        col("c_ab"))
      .unionAll(pair.select(col("pb").as("ante"), col("pa").as("cons"),
        col("c_ab")))
    rules
      .join(item.select(col("p").as("ante"), col("c_item").as("c_ante")),
        Seq("ante"))
      .join(item.select(col("p").as("cons"), col("c_item").as("c_cons")),
        Seq("cons"))
      .crossJoin(broadcast(nOrders))
      .withColumn("confidence_ppm",
        expr("CAST(CAST(c_ab AS DECIMAL(38,0)) * 1000000 div c_ante AS BIGINT)"))
      .withColumn("lift", round(
        d2(dec(col("n_orders")) * col("c_ab")) /
          d2(dec(col("c_ante")) * col("c_cons")), 6))
      .orderBy(col("lift").desc, col("ante"), col("cons"))
      .limit(topK)
      .select(col("ante"), col("cons"), col("c_ab").as("support"),
        col("c_ante"), col("c_cons"), col("confidence_ppm"), col("lift"))
  }

  /** q358: ABC (Pareto) classification of parts by revenue — the
    * inventory-analytics classic (class A = the parts covering the
    * first 80% of revenue, B to 95%, C the tail; the 80/20 read q160's
    * Gini compresses to one number, materialized as the actionable
    * three-way split): per class, part count, revenue, and shares in
    * floored ppm.
    *
    * Scale/determinism: the revenue rank over the PART AGGREGATE rides
    * the range-partition + broadcast-offset cumulative device (the
    * q277 precedent — no single-partition window over a data-scaled
    * table); class boundaries compare exact integers
    * (cum·100 ≤ total·80), ties broken by the unique (revenue DESC,
    * partkey) order.
    *
    * Scale shape: one partkey rollup (fact-sized exchange), the
    * offset-device cumulative over the part aggregate, a 3-row class
    * rollup. */
  def qAbcClassification(s: SparkSession, d: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rev = lineitem(s, d)
      .select(col("l_partkey").as("p"), revX1e4.as("r"))
      .groupBy("p").agg(sum(col("r")).as("v"))
    val tot = rev.agg(sum(col("v")).as("v_tot"),
      count(lit(1)).as("n_parts"))
    val parts = rev.repartitionByRange(col("v").desc, col("p"))
      .withColumn("pid", spark_partition_id())
    val offs = parts.groupBy("pid")
      .agg(sum(col("v")).as("pv"))
      .withColumn("off", coalesce(sum("pv").over(
        Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    val local = Window.partitionBy("pid")
      .orderBy(col("v").desc, col("p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offs), Seq("pid"))
      .withColumn("cum", col("off") + sum(col("v")).over(local))
      .crossJoin(broadcast(tot))
      .withColumn("abc_class",
        when(dec(col("cum")) * 100 <= dec(col("v_tot")) * 80, lit("A"))
          .when(dec(col("cum")) * 100 <= dec(col("v_tot")) * 95, lit("B"))
          .otherwise(lit("C")))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"), sum(col("v")).as("revenue_x1e4"))
      .crossJoin(broadcast(tot.select(col("v_tot"),
        col("n_parts").as("n_parts_tot"))))
      .select(col("abc_class"), col("n_parts"), col("revenue_x1e4"),
        expr("""CAST(CAST(revenue_x1e4 AS DECIMAL(38,0)) * 1000000
                div v_tot AS BIGINT)""").as("revenue_share_ppm"),
        expr("""CAST(CAST(n_parts AS DECIMAL(38,0)) * 1000000
                div n_parts_tot AS BIGINT)""").as("part_share_ppm"))
      .orderBy("abc_class")
  }

  /** Exact per-line revenue in 1e-4 dollars: cents × (100 − discount
    * points), both factors exact integers from the ≤2-decimal raw
    * columns (the q162 discipline) — so every aggregate over it is
    * order-invariant and engine-identical. */
  private def revX1e4: Column =
    expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)") *
      (lit(100L) - expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"))

  /** q201: incremental view maintenance for a JOIN-aggregate — the
    * delta-join algebra every streaming materialized view runs on:
    * with ΔL (new lineitems, key%7=0) and ΔO (new orders, key%10=0)
    * arriving against base tables, the updated revenue-by-priority
    * view is
    *
    *   (L∪ΔL)⋈(O∪ΔO) = L⋈O  +  ΔL⋈(O∪ΔO)  +  L⋈ΔO
    *
    * — the standing view plus two DELTA-SIZED join terms. The operator
    * emits all three terms and their sum; the oracle computes the
    * total from the FULL join directly, so the gate hash PROVES the
    * decomposition equals the direct recompute cross-engine (q110 did
    * this for a plain aggregate; this is the join case).
    *
    * Scale shape: the base term is the standing view (recomputed here
    * only to prove the algebra; production reads it back). Both delta
    * terms join a |Δ|-sized side — ΔO is broadcast into the big-table
    * probe, so maintenance cost is O(|Δ|), never O(|base|). */
  def qDeltaView(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
      .select(col("l_orderkey"), revX1e4.as("rev"),
        (col("l_orderkey") % 7 === 0).as("is_dl"))
    val ord = orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_orderkey") % 10 === 0).as("is_do"))
    def term(l: DataFrame, o: DataFrame, name: String,
        bcast: Boolean): DataFrame = {
      val os = if (bcast) broadcast(o) else o
      l.join(os, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(col("rev")).as(name), count(lit(1)).as(s"n_$name"))
    }
    val base = term(li.filter(!col("is_dl")), ord.filter(!col("is_do")),
      "rev_base", bcast = false)
    val d1 = term(li.filter(col("is_dl")), ord, "rev_new_lines",
      bcast = false)
    val d2 = term(li.filter(!col("is_dl")), ord.filter(col("is_do")),
      "rev_new_orders", bcast = true)
    base.join(d1, Seq("o_orderpriority"), "full")
      .join(d2, Seq("o_orderpriority"), "full")
      .select(col("o_orderpriority"),
        coalesce(col("rev_base"), lit(0L)).as("rev_base"),
        coalesce(col("rev_new_lines"), lit(0L)).as("rev_new_lines"),
        coalesce(col("rev_new_orders"), lit(0L)).as("rev_new_orders"),
        (coalesce(col("rev_base"), lit(0L)) +
          coalesce(col("rev_new_lines"), lit(0L)) +
          coalesce(col("rev_new_orders"), lit(0L))).as("rev_total"),
        (coalesce(col("n_rev_base"), lit(0L)) +
          coalesce(col("n_rev_new_lines"), lit(0L)) +
          coalesce(col("n_rev_new_orders"), lit(0L))).as("n_lines"))
  }

  /** q202: rolling 7-day distinct users per event type — the sliding
    * COUNT(DISTINCT) no engine supports as a window directly. Each
    * distinct (type, day, user) row is EXPLODED to the ≤7 window-end
    * days it contributes to (`sequence(day, day+6)` in-plan — the
    * contribution trick; no range join, bounded 7× fanout on the
    * day-deduped rows, not the raw events), semi-joined to observed
    * days, and de-duplicated per (type, end_day, user). The exact
    * small-window form; at 100 TB window lengths the q193 HLL daily
    * registers replace the 7× re-dedup with 7 register merges.
    *
    * Scale shape: dedup shuffle collapses map-side to (type, day,
    * user); the explode multiplies the DEDUPED frame only; one final
    * (type, end_day) count-distinct shuffle. */
  def qRollingDistinct(s: SparkSession, d: String): DataFrame = {
    val du = events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
      .distinct()
    val od = du.select(col("event_type"), col("day").as("end_day")).distinct()
    val contrib = du
      .select(col("event_type"), col("user_id"),
        explode(expr("sequence(day, date_add(day, 6))")).as("end_day"))
      .join(od, Seq("event_type", "end_day"), "left_semi")
    val today = du.groupBy(col("event_type"), col("day").as("end_day"))
      .agg(countDistinct(col("user_id")).as("n_users_today"))
    contrib.groupBy("event_type", "end_day")
      .agg(countDistinct(col("user_id")).as("rolling_users"))
      .join(today, Seq("event_type", "end_day"))
      .select(col("event_type"), col("end_day").cast("string").as("end_day"),
        col("rolling_users"), col("n_users_today"))
  }

  /** q203: join-consistent hash sample — debugging at scale: sampling
    * each table independently breaks every join (a 1% × 1% row sample
    * keeps ~0.01% of join pairs), so the correct primitive samples the
    * JOIN KEY: orders whose md5(okey) lands under the rate keep ALL
    * their lineitems, giving an unbiased sub-warehouse where every
    * join, FK edge, and per-order aggregate survives intact. The same
    * md5 rule applied in any table or engine selects the same keys —
    * the cross-run/cross-table coordination q142 uses for splits,
    * applied to sampling.
    *
    * Output: per-priority sampled/total order+line counts and exact
    * revenue, plus the scale-up ratio ×1e4 the sample implies —
    * integer counts and 1e-4-dollar revenue, one double ratio.
    *
    * Scale shape: the key filter pushes to both scans (md5 of the join
    * column, no join needed to DECIDE membership — lineitem carries
    * the key); one joined rollup for the sampled side vs a full-table
    * rollup, both ≤|priorities| rows. */
  def qJoinSample(s: SparkSession, d: String, pctBucket: Int = 5): DataFrame = {
    // deterministic ~pctBucket% of order keys: first byte of
    // md5('js:'||key) below ⌊pctBucket·256/100⌋ — a LEXICOGRAPHIC
    // compare on the fixed-width lowercase hex prefix, identical text
    // on both engines (no base conversion to disagree on)
    val cut = f"${pctBucket * 256 / 100}%02x"
    def keep(c: Column): Column =
      substring(md5(concat(lit("js:"), c.cast("string"))), 1, 2) < lit(cut)
    val ord = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    val li = lineitem(s, d).select(col("l_orderkey"), revX1e4.as("rev"))
    // ONE pass over the join, pre-aggregated to the ORDER grain first
    // (r12 OPTIMIZATION, guide §2.3 "aggregate before you shuffle"):
    // an order's lines collapse map-side onto l_orderkey before the
    // join, the join's probe side shrinks from line- to order-sized,
    // and — because each order carries exactly one priority — the two
    // countDistinct(o_orderkey) verbs become plain counts at the order
    // grain, removing the Expand that tripled every joined row through
    // the old aggregate. Inner-join semantics unchanged (an order
    // without lines never reached countDistinct either).
    val liAgg = li.groupBy("l_orderkey")
      .agg(count(lit(1)).as("nl"), sum(col("rev")).as("orev"))
    liAgg.join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("k", keep(col("o_orderkey")))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders_total"),
        sum(col("nl")).as("n_lines_total"),
        sum(col("orev")).as("rev_total_x1e4"),
        sum(when(col("k"), 1L).otherwise(0L)).as("n_orders_sampled"),
        sum(when(col("k"), col("nl")).otherwise(0L)).as("n_lines_sampled"),
        sum(when(col("k"), col("orev")).otherwise(0L)).as("rev_sampled_x1e4"))
      .withColumn("scale_ratio",
        round(when(col("rev_sampled_x1e4") > 0,
          col("rev_total_x1e4").cast("double") /
            col("rev_sampled_x1e4").cast("double")).otherwise(lit(0.0)), 6))
  }

  /** q204: MODE — the ordered-set aggregate the surface lacked (the
    * one holistic aggregate SQL names that neither percentile family
    * member covers): the modal dollar bucket of `value` per event
    * type, with the tie rule SPELLED OUT (smallest bucket wins) since
    * engines' built-in `mode()` leaves ties unspecified — the reason
    * this is a windowed formulation over explicit bucket counts, not a
    * call to either engine's nondeterministic native mode.
    *
    * Scale shape: the scan collapses onto (type, bucket) map-side —
    * domain-bounded groups — then a per-type top-1 over the bucket
    * rollup; nothing row-scaled crosses the wire twice. */
  def qMode(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .groupBy(col("event_type"),
        expr("CAST(FLOOR(value) AS BIGINT)").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("n").desc, col("bucket").asc)
    val all = Window.partitionBy("event_type")
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("modal_n", max(col("n")).over(all))
      .withColumn("n_ties",
        sum(when(col("n") === col("modal_n"), 1L).otherwise(0L)).over(all))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("bucket").as("modal_bucket"),
        col("n").as("modal_n"), col("n_ties"))
  }

  /** q205: ordered string aggregation (LISTAGG/string_agg) — the
    * order-sensitive collect verb: per nation, the first five customer
    * names alphabetically, concatenated. Determinism is the point:
    * collect_list's arrival order is partition-dependent, so the list
    * is SORTED in-plan before the slice/join — the only way a
    * string-agg is reproducible on any engine. The 5-cap bounds the
    * in-row array; an uncapped listagg over a hot group is the
    * scale-killer this formulation refuses.
    *
    * Scale shape: broadcast nation join, one nation-keyed shuffle of
    * (name) pairs, per-group sort of a group-sized list — with the
    * cap, a TakeOrdered-per-group at heavy cardinalities. */
  def qListAgg(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .join(broadcast(nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_customers"),
        array_join(slice(sort_array(collect_list(col("c_name"))), 1, 5), ",")
          .as("first5_names"))

  /** q206: RETRACTION-aware view maintenance — the delete half of
    * q201's insert algebra: when orders ΔD (key%13=0) are deleted with
    * their lineitems cascaded, the sum/count view updates by
    * SUBTRACTING the |ΔD|-sized retraction term, M' = M − agg(L⋈ΔD) —
    * never by rescanning the base. The oracle computes the after-state
    * DIRECTLY from the filtered join, so the gate hash proves
    * subtraction ≡ re-derivation cross-engine. (sum/count/avg retract;
    * min/max do NOT — a deleted minimum needs the q148 machinery to
    * re-derive, which is why production views keep retractable
    * aggregates only.)
    *
    * Scale shape: the deleted-key set is broadcast into the lineitem
    * probe; retraction cost is O(|ΔD| fanout), never O(|base|). */
  def qRetractionView(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey"), revX1e4.as("rev"))
    val ord = orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        (col("o_orderkey") % 13 === 0).as("is_del"))
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    val full = joined.groupBy("o_orderpriority")
      .agg(sum(col("rev")).as("rev_full"), count(lit(1)).as("n_full"))
    val retract = li
      .join(broadcast(ord.filter(col("is_del"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum(col("rev")).as("rev_retracted"), count(lit(1)).as("n_retracted"))
    full.join(retract, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("rev_full"),
        coalesce(col("rev_retracted"), lit(0L)).as("rev_retracted"),
        (col("rev_full") - coalesce(col("rev_retracted"), lit(0L)))
          .as("rev_after"),
        (col("n_full") - coalesce(col("n_retracted"), lit(0L)))
          .as("n_lines_after"))
  }

  /** q207: functional-dependency audit — the data-profiling primitive
    * (Metanome-family FD discovery, restricted to declared candidate
    * edges): for each LHS→RHS pair, how many LHS values exist, how
    * many map to MORE than one RHS (violations), and the worst fanout.
    * Key edges must hold (a violation = corruption, the q145
    * complement: FK audits membership, FD audits determinism);
    * non-key edges quantify how far an assumed "attribute of" really
    * is from functional. Every number is an exact integer count.
    *
    * Scale shape: one countDistinct-per-LHS aggregation per edge
    * (two-level dedup, map-side partials both levels), collapsed to a
    * single audit row each; at 100 TB one runs the handful of edges
    * that gate a pipeline, not all column pairs. */
  def qFdAudit(s: SparkSession, d: String): DataFrame = {
    def edge(name: String, tbl: DataFrame, lhs: String, rhs: String): DataFrame =
      tbl.select(col(lhs).cast("long").as("l"), col(rhs).cast("string").as("r"))
        .groupBy("l").agg(countDistinct(col("r")).as("nr"))
        .agg(lit(name).as("fd"), count(lit(1)).as("n_lhs"),
          sum(when(col("nr") > 1, 1L).otherwise(0L)).as("n_violating_lhs"),
          max(col("nr")).as("max_rhs_per_lhs"))
        .withColumn("fd_holds",
          when(col("n_violating_lhs") === 0, 1L).otherwise(0L))
    Seq(
      edge("o_orderkey->o_orderpriority", orders(s, d),
        "o_orderkey", "o_orderpriority"),
      edge("o_custkey->o_orderpriority", orders(s, d),
        "o_custkey", "o_orderpriority"),
      edge("c_custkey->c_nationkey", customer(s, d),
        "c_custkey", "c_nationkey"),
      edge("n_nationkey->n_regionkey", nation(s, d),
        "n_nationkey", "n_regionkey"),
      edge("l_orderkey->l_shipdate", lineitem(s, d),
        "l_orderkey", "l_shipdate"),
      edge("l_partkey->l_suppkey", lineitem(s, d),
        "l_partkey", "l_suppkey")
    ).reduce(_.union(_))
  }

  /** q219: share-of-total within group (RATIO_TO_REPORT) + in-group
    * ranking — the report verb pairing a partition-total window with
    * a rank over the same partition (one exchange serves both):
    * per-nation revenue as exact ppm of its region's total (integer
    * rev·10⁶ div region_total — no float share) and the nation's rank
    * inside the region (revenue desc, name tie-break — total order).
    *
    * Scale shape: the star join collapses to a (region, nation)
    * rollup first; both windows ride that ≤|nations| frame — the
    * window never sees fact-table rows. */
  def qRegionShare(s: SparkSession, d: String): DataFrame = {
    val rolled = lineitem(s, d).select(col("l_orderkey"), revX1e4.as("rev"))
      .join(orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev")).as("rev_x1e4"))
    val wTot = Window.partitionBy("r_name")
    val wRnk = Window.partitionBy("r_name")
      .orderBy(col("rev_x1e4").desc, col("n_name").asc)
    rolled
      .withColumn("region_total_x1e4", sum(col("rev_x1e4")).over(wTot))
      // decimal/HUGEINT ppm: rev·10⁶ tops BIGINT near nation revenues
      // of ~9e12 (ANSI overflow on one engine, silent wrap risk on the
      // other) — widen before the multiply on both
      .withColumn("share_ppm",
        expr("""CAST(CAST(rev_x1e4 AS DECIMAL(38,0)) * 1000000
                div CAST(region_total_x1e4 AS DECIMAL(38,0)) AS BIGINT)"""))
      .withColumn("rank_in_region", row_number().over(wRnk).cast("long"))
  }

  /** q209: TPC-H Q3 shape ("shipping priority") — the recognized
    * 3-table star probe: revenue of BUILDING-segment orders placed
    * before the pivot date with lines still unshipped after it, top
    * 10. The deterministic-top-k discipline applies: exact integer
    * revenue, ties broken by order key, so the LIMIT cut is
    * engine-identical (float revenue + bare LIMIT is how the official
    * benchmark run allows nondeterminism; the gate can't).
    *
    * Scale shape: both date filters and the segment filter push to
    * the scans; the segment-filtered customer side broadcasts into
    * orders, the date-filtered orders side hash-joins lineitem on its
    * key; top-10 is TakeOrdered (no global sort). */
  def qShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = orders(s, d).filter(col("o_orderdate") < lit("1998-06-01"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = lineitem(s, d).filter(col("l_shipdate") > lit("1998-06-01"))
      .select(col("l_orderkey"), revX1e4.as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue_x1e4"))
      .select(col("l_orderkey"),
        col("o_orderdate").cast("date").cast("string").as("o_orderdate"),
        col("o_orderpriority"), col("revenue_x1e4"))
      .orderBy(col("revenue_x1e4").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** q210: TPC-H Q10 shape ("returned items") — the lost-revenue
    * report: top 20 customers by revenue on RETURNED lines for orders
    * placed in 1997Q1, with their nation. Same determinism rules as
    * q209 (integer revenue, key tie-break).
    *
    * Scale shape: the quarter filter prunes orders at the scan; the
    * orderkey join carries only (key, rev); nation broadcasts; top-20
    * is TakeOrdered over the customer rollup. */
  def qReturnedItems(s: SparkSession, d: String): DataFrame = {
    val ord = orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
        col("o_orderdate") < lit("1997-04-01"))
      .select("o_orderkey", "o_custkey")
    val li = lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revX1e4.as("rev"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("lost_rev_x1e4"), count(lit(1)).as("n_ret_lines"))
      .join(customer(s, d).select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        col("lost_rev_x1e4"), col("n_ret_lines"))
      .orderBy(col("lost_rev_x1e4").desc, col("c_custkey").asc)
      .limit(20)
  }

  /** q211: TPC-H Q14 shape ("promotion effect") — conditional-share
    * aggregation over a dimension join: per ship month of 1997, the
    * fraction of revenue from PROMO-type parts. Exact integer
    * numerator/denominator carried separately; the share is the one
    * final double (q195's discipline).
    *
    * Scale shape: the year filter prunes the lineitem scan; part is
    * projected to (key, is_promo) and broadcast; the month rollup
    * collapses map-side onto ≤12 groups. */
  def qPromoShare(s: SparkSession, d: String): DataFrame = {
    val pt = part(s, d)
      .select(col("p_partkey"),
        (col("p_type") === "PROMO").cast("long").as("is_promo"))
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_partkey"), revX1e4.as("rev"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy("ship_month")
      .agg(sum(col("rev") * col("is_promo")).as("promo_x1e4"),
        sum(col("rev")).as("total_x1e4"))
      .withColumn("promo_share",
        round(col("promo_x1e4").cast("double") /
          col("total_x1e4").cast("double"), 6))
  }

  /** q226: TPC-H Q5 shape ("local supplier volume") — the 6-table
    * CYCLE join: revenue of 1996 orders where the CUSTOMER's nation
    * equals the SUPPLIER's nation inside one region, per nation. The
    * cycle constraint (c_nationkey = s_nationkey) is what
    * distinguishes this from a star — the supplier join carries an
    * extra non-key equality, so join order matters and the plan
    * declares it: facts flow through the two key joins first, then
    * the tiny supplier side applies both equalities at once.
    *
    * Scale shape: the year filter prunes orders at the scan; supplier
    * (|S| rows) and the region-filtered nation list broadcast; the
    * only data-sized shuffles are the two fact-key joins
    * (lineitem⋈orders on orderkey, ⋈customer on custkey). Exact
    * integer revenue (q162 discipline). */
  def qLocalSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val nat = nation(s, d)
      .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val ord = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"), revX1e4.as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("revenue_x1e4"),
        count(lit(1)).as("n_lines"))
  }

  /** q227: TPC-H Q21 shape ("suppliers who kept orders waiting"),
    * adapted to the fixture's columns: a line is LATE when it shipped
    * more than 60 days after the order was placed (the fixture has no
    * commit/receipt dates — l_shipdate vs o_orderdate is the lateness
    * the schema can express). A supplier kept finished ('F') order o
    * waiting iff it was late on o, o involved ≥2 suppliers (the
    * original EXISTS), and no OTHER supplier was late on o (the
    * original NOT EXISTS).
    *
    * The reference formulation is a double-correlated subquery pair;
    * the distributed rewrite here is EAGER AGGREGATION instead of two
    * lineitem self-joins: one per-order rollup computes
    * (distinct suppliers, distinct late suppliers), and the waiting
    * predicate becomes `late ∧ n_supp ≥ 2 ∧ n_late = 1` — when only
    * one supplier is late, a late supplier IS that supplier, so the
    * NOT-EXISTS collapses into the rollup. One orderkey-partitioned
    * shuffle replaces both EXISTS probes.
    *
    * Scale shape: the status filter pushes into the orders scan; the
    * rollup and the late-line dedup reuse the same orderkey
    * partitioning; supplier + nation broadcast; top-20 is
    * TakeOrdered with (count desc, name) total order. */
  def qWaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val lo = lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders(s, d).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
          .cast("long").as("late"))
    val perOrder = lo.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late") === 1L, col("l_suppkey"))).as("n_late"))
    lo.filter(col("late") === 1L)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(perOrder.filter(col("n_supp") >= 2 && col("n_late") === 1),
        Seq("l_orderkey"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_nationkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("s_name"), col("n_name"))
      .agg(count(lit(1)).as("wait_orders"))
      .orderBy(col("wait_orders").desc, col("s_name").asc)
      .limit(20)
  }

  /** q228: TPC-H Q2 shape ("minimum cost supplier") — the correlated
    * scalar-MIN subquery: per part shipped by any EUROPE supplier, the
    * supplier with the LOWEST account balance among that part's EUROPE
    * suppliers (the fixture has no partsupp/supplycost; s_acctbal
    * plays the cost role and distinct (l_partkey, l_suppkey) pairs
    * play partsupp). Top-100 by (acctbal desc, supplier, part) — Q2's
    * ordering, determinized.
    *
    * The correlated `= (SELECT min(..) WHERE p_partkey = ...)` becomes
    * one argmin rollup: the (cost, supplier) pair rides a single
    * packed BIGINT — (acctbal_cents + 100000)·10⁴ + suppkey, the shift
    * making the balance component nonnegative (TPC-H balances go to
    * −999.99; a plain % unpack would split negatives differently on
    * engines whose modulo follows the dividend sign) — so min(packed)
    * IS the lexicographic (balance, suppkey) argmin with the suppkey
    * tie-break built in.
    *
    * Scale shape: the pair dedup is the one fact-sized shuffle
    * (partkey-partitioned, reused by the rollup); supplier+nation+
    * region broadcast BEFORE the dedup so non-EUROPE pairs never
    * shuffle; the final name join broadcasts; top-100 is TakeOrdered. */
  def qMinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val eurSup = supplier(s, d)
      .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("bal_cents"))
    val best = lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(eurSup.select("s_suppkey", "bal_cents")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_partkey"),
        ((col("bal_cents") + lit(100000L)) * lit(10000L) + col("l_suppkey"))
          .as("packed"))
      .groupBy("l_partkey").agg(min(col("packed")).as("mn"))
      .select(col("l_partkey"),
        expr("mn % 10000").as("best_suppkey"),
        expr("mn div 10000 - 100000").as("best_bal_cents"))
    best
      .join(broadcast(eurSup.select(col("s_suppkey"), col("s_name"), col("n_name"))),
        col("best_suppkey") === col("s_suppkey"))
      .join(part(s, d).select("p_partkey", "p_brand", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_brand"), col("p_type"),
        col("best_suppkey"), col("s_name"), col("n_name"), col("best_bal_cents"))
      .orderBy(col("best_bal_cents").desc, col("best_suppkey").asc,
        col("p_partkey").asc)
      .limit(100)
  }

  /** Exact quantity in centi-units (the raw column is ≤2-decimal by
    * construction, so the cast is lossless — the q162 discipline). */
  private def qtyX100: Column =
    expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)")

  /** q235: TPC-H Q17 shape ("small-quantity-order revenue") — the
    * correlated scalar-AVG subquery: revenue lost to lines whose
    * quantity is below 20% of the PER-PART average, over one brand's
    * parts (brand-only, so the slice is non-empty at every fixture
    * scale factor). The correlated `< 0.2·(SELECT avg ...)` becomes
    * a per-part rollup joined back, and the fractional comparison is
    * CROSS-MULTIPLIED into integers (5·qty·n < Σqty — no float
    * average ever exists, so the predicate is engine-exact).
    *
    * Scale shape: the brand/type filter prunes at the part scan and
    * broadcasts; the lineitem scan is pruned by the broadcast-hash
    * semi shape; the per-part rollup (|parts in slice| rows)
    * broadcasts back — the fact table shuffles zero times. */
  def qSmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val pts = part(s, d)
      .filter(col("p_brand") === "Brand#1")
      .select("p_partkey")
    val li = lineitem(s, d)
      .select(col("l_partkey"), qtyX100.as("qty_c"), revX1e4.as("rev"))
      .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
    val perPart = li.groupBy("l_partkey")
      .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n_lines"))
    li.join(broadcast(perPart), Seq("l_partkey"))
      .filter(lit(5L) * col("qty_c") * col("n_lines") < col("sum_qty_c"))
      .agg(count(lit(1)).as("n_small_lines"),
        countDistinct(col("l_partkey")).as("n_parts"),
        sum(col("rev")).as("small_rev_x1e4"))
  }

  /** q236: TPC-H Q13 shape ("customer order distribution") — the
    * LEFT-OUTER-join histogram: how many customers placed exactly k
    * qualifying orders (urgent orders excluded, playing Q13's
    * comment-pattern exclusion), INCLUDING k=0 — the left join is the
    * point of the shape (an inner join cannot see the zero bucket).
    *
    * Scale shape: one custkey shuffle joins the filtered orders to
    * customers; the per-customer count collapses on the same
    * partitioning; the k-histogram is a ≤|max orders|-row rollup that
    * collapses map-side. */
  def qCustOrderDistribution(s: SparkSession, d: String): DataFrame = {
    val ord = orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    customer(s, d).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  /** q237: TPC-H Q11 shape ("important stock") — the HAVING-vs-global-
    * scalar pattern: per-part value (supplier balance over the
    * distinct (part, supplier) pairs — the fixture's partsupp, as in
    * q228) kept only where it exceeds 1.2× the all-parts MEAN value.
    * The original compares against `SUM(...)·fraction`; with no fixed
    * part count across scale factors the mean form is the
    * scale-stable statement of the same shape, and the comparison is
    * cross-multiplied into exact integers
    * (value·n_parts·10 > total·12 — no float threshold).
    *
    * Scale shape: the pair dedup is the one fact-sized shuffle
    * (partkey-partitioned, reused by the rollup); supplier broadcasts
    * before it; the global total is a scalar broadcast back onto the
    * parts rollup; top-100 is TakeOrdered under a (value, partkey)
    * total order. */
  def qImportantStock(s: SparkSession, d: String): DataFrame = {
    val pairs = lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
    val value = pairs
      .join(broadcast(supplier(s, d).select(col("s_suppkey"),
        expr("CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("bal_cents"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("bal_cents")).as("value_cents"),
        count(lit(1)).as("n_supp"))
    val tot = value.agg(sum(col("value_cents")).as("total_cents"),
      count(lit(1)).as("n_parts"))
    value.crossJoin(broadcast(tot))
      .filter(col("value_cents") * col("n_parts") * lit(10L) >
        col("total_cents") * lit(12L))
      .select(col("l_partkey"), col("value_cents"), col("n_supp"))
      .orderBy(col("value_cents").desc, col("l_partkey").asc)
      .limit(100)
  }

  /** q238: TPC-H Q22 shape ("global sales opportunity") — the
    * global-scalar filter + ANTI join: customers whose balance beats
    * the all-positive-balance average (the scalar subquery,
    * cross-multiplied to exact integers: bal·n > Σbal) but who placed
    * NO order since 2000 (the NOT EXISTS, as an anti join — dormant
    * high-value accounts), grouped by nation (playing Q22's
    * phone-prefix country code, which the fixture lacks).
    *
    * Scale shape: the scalar average is a one-row broadcast; the
    * recent-buyer list is custkey-deduped BEFORE the anti join so the
    * join probes |recent customers|, not |recent orders|; nation
    * broadcasts; the rollup collapses to ≤25 rows map-side. */
  def qDormantHighValue(s: SparkSession, d: String): DataFrame = {
    val bal = expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)")
    val posAvg = customer(s, d).filter(col("c_acctbal") > 0)
      .agg(sum(bal).as("pos_sum"), count(lit(1)).as("pos_n"))
    val recent = orders(s, d)
      .filter(col("o_orderdate") >= lit("2000-01-01"))
      .select("o_custkey").distinct()
    customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), bal.as("bal_cents"))
      .crossJoin(broadcast(posAvg))
      .filter(col("bal_cents") * col("pos_n") > col("pos_sum"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_dormant"), sum(col("bal_cents")).as("bal_sum_cents"))
  }

  /** q239: TPC-H Q18 shape ("large volume customer") — the IN-over-
    * grouped-HAVING pattern: orders whose total line quantity exceeds
    * 300 units, joined back to their customer. The `o_orderkey IN
    * (SELECT ... HAVING sum > t)` becomes EAGER AGGREGATION: the
    * per-order rollup collapses the fact table FIRST, the HAVING cuts
    * it to a handful of keys, and only those flow into the joins.
    *
    * Scale shape: one orderkey rollup (map-side partials); the
    * surviving key set is tiny by construction (the threshold sits in
    * the distribution's far tail) and BROADCASTS into orders, so
    * neither orders nor customer ever shuffles on a fact-sized key
    * set; top-100 is TakeOrdered under (qty desc, orderkey). */
  def qLargeVolumeCustomer(s: SparkSession, d: String): DataFrame = {
    val big = lineitem(s, d)
      .select(col("l_orderkey"), qtyX100.as("qty_c"))
      .groupBy("l_orderkey")
      .agg(sum(col("qty_c")).as("sum_qty_c"))
      .filter(col("sum_qty_c") > lit(30000L))
    big
      .join(orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(customer(s, d).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("sum_qty_c"))
      .orderBy(col("sum_qty_c").desc, col("o_orderkey").asc)
      .limit(100)
  }

  /** q240: TPC-H Q20 shape ("potential part promotion") — the nested
    * semi-join chain: suppliers who shipped the MAJORITY of some red
    * part's 1997 volume (the fixture has no availqty; `pair volume >
    * half the part's total volume` plays `availqty > 0.5·sum(qty)` —
    * the same agg-then-threshold comparison), rolled up per nation.
    * The original is part-LIKE ⊂ lineitem-agg ⊂ partsupp ⊂ supplier
    * nested INs; here each level is an explicit rollup or semi join.
    *
    * Scale shape: the name filter prunes parts and broadcasts; the
    * date filter prunes the lineitem scan; the pair rollup and the
    * part rollup share the partkey partitioning (one shuffle); the
    * dominant-pair set is supplier-deduped and the final supplier
    * join is a broadcast semi. Majority is cross-multiplied
    * (2·pair > total — exact). */
  def qExcessShippers(s: SparkSession, d: String): DataFrame = {
    val redParts = part(s, d).filter(col("p_name").startsWith("red"))
      .select("p_partkey")
    val li = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_partkey"), col("l_suppkey"), qtyX100.as("qty_c"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
    val perPair = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("qty_c")).as("pair_qty_c"))
    val wPart = Window.partitionBy("l_partkey")
    val dominant = perPair
      .withColumn("part_qty_c", sum(col("pair_qty_c")).over(wPart))
      .filter(lit(2L) * col("pair_qty_c") > col("part_qty_c"))
    dominant
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_dominated_parts"),
        sum(col("pair_qty_c")).as("dominated_qty_c"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation(s, d).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("n_dominated_parts")).as("n_dominated_parts"),
        sum(col("dominated_qty_c")).as("dominated_qty_c"))
  }

  /** q269: top-k WITH TIES — the `FETCH FIRST k ROWS WITH TIES`
    * semantics q09's plain top-k lacks: every part tied with the
    * k-th row survives, so the report never silently drops half a
    * tie group (the leaderboard-fairness rule).
    *
    * Scale shape: NO rank window over the catalog — the threshold is
    * read off a TakeOrdered head (the k-th value under (qty desc,
    * part)), broadcast back as a scalar, and the filter keeps
    * qty ≥ threshold; RANK() runs only over the ≤(k + ties) survivors.
    * Quantities are exact ×100 integers (the q18 decimal discipline). */
  def qTopKTies(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    val qty = lineitem(s, d)
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(expr("CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("qty_x100"))
    val thr = qty.orderBy(col("qty_x100").desc, col("part")).limit(k)
      .agg(min(col("qty_x100")).as("thr"))
    qty.crossJoin(broadcast(thr))
      .filter(col("qty_x100") >= col("thr"))
      .withColumn("rank", rank().over(
        Window.orderBy(col("qty_x100").desc)))
      .select(col("rank"), col("part"), col("qty_x100"))
  }

  /** q270: as-of join WITH TOLERANCE — q44's trading-style lookup
    * plus the staleness bound every real enrichment needs (a week-old
    * "most recent purchase" is not context, it is noise; kdb's
    * `wj`/DuckDB's ASOF+filter idiom): each non-purchase event takes
    * its user's most recent purchase amount ONLY if it happened within
    * `tolHours`, else NULL. (A same-domain self as-of — the orders
    * table lives years before the events fixture, so an orders
    * tolerance would be vacuously unmatched.) The right side
    * pre-dedupes to one row per (user, second) with max cents, so an
    * equal-timestamp pick is deterministic on both engines; the match
    * rides as ONE packed BIGINT (sec·10⁵ + cents) through the as-of
    * kernel and unpacks after.
    *
    * Scale shape: [[asofJoin]]'s union + one keyed window (ONE
    * shuffle, linear); tolerance and unpack are codegen'd
    * post-predicates. */
  def qAsofTolerance(s: SparkSession, d: String, tolHours: Int = 48): DataFrame = {
    val ev = events(s, d)
    val left = ev.filter(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purch = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"),
        unix_timestamp(col("ts")).as("p_sec"))
      .agg(max(expr("CAST(ROUND(value * 100, 0) AS BIGINT)")).as("cents"))
      .select(col("p_user"), col("p_sec"),
        (col("p_sec") * 100000L + col("cents")).as("packed"))
    val joined = asofJoin(left, "user_id", "ts",
      purch.withColumn("p_ts", col("p_sec").cast("timestamp")),
      "p_user", "p_ts", "packed")
    joined
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("e_sec"), col("asof_packed"))
      .select(col("event_id"), col("user_id"),
        when(col("asof_packed").isNotNull &&
          col("e_sec") - expr("asof_packed div 100000L") <= tolHours * 3600L,
          expr("asof_packed % 100000L")).as("last_purchase_cents"),
        when(col("asof_packed").isNotNull &&
          col("e_sec") - expr("asof_packed div 100000L") <= tolHours * 3600L,
          col("e_sec") - expr("asof_packed div 100000L")).as("age_sec"))
      .withColumn("matched", col("last_purchase_cents").isNotNull.cast("int"))
  }

  /** q276: interval-concurrency sweep — how much wall time the system
    * spends at each level of concurrent user sessions. Sessions (q74's
    * 30-minute gap rule) become [start, end] intervals; the classic
    * ±1 boundary sweep with a running sum gives instantaneous
    * concurrency, and grouping by level yields the exact µs-weighted
    * histogram — the capacity-planning primitive (peak concurrency =
    * the max level with nonzero time).
    *
    * Tie discipline that makes the result engine-invariant: the ±1
    * deltas at one instant collapse to a per-instant NET first (the
    * oracle's (t, delta DESC) + RANGE-frame peer-sharing gives every
    * instant's surviving row the full prefix through that instant —
    * identical to cumsum over per-instant nets), so the multiset of
    * (level, duration) rows is independent of any tie order by
    * construction.
    *
    * Scale (the r9 verdict's #4, implemented): the sweep runs over the
    * DISTINCT-instant table (≤ 2× sessions — data-scaled, so a global
    * ordered window was the flagged shape). The running sum is
    * range-partitioned: `repartitionByRange(t)` splits the timeline,
    * each partition cumsums locally under a (pid)-partitioned window —
    * parallel — and a bounded per-partition offset table (one row per
    * shuffle partition: the partition's total net, its first instant)
    * broadcasts back the prefix each partition starts from and the
    * next partition's first instant (the duration of each partition's
    * last slice). One extra bounded pass, no single-partition window;
    * PlanShapeSpec pins the shape. */
  def qConcurrencySweep(s: SparkSession, d: String,
      gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(byUser)
    val sess = events(s, d).select(col("user_id"), col("ts"))
      .withColumn("new_sess",
        when(prev.isNull ||
          col("ts") >= prev + expr(s"INTERVAL $gapMinutes minutes"), 1).otherwise(0))
      .withColumn("sess", sum("new_sess").over(cum))
      .groupBy("user_id", "sess")
      .agg(unix_micros(min("ts")).as("s_us"), unix_micros(max("ts")).as("e_us"))
    val pts = sess.select(col("s_us").as("t"), lit(1L).as("delta"))
      .unionAll(sess.select(col("e_us").as("t"), lit(-1L).as("delta")))
    // per-instant net change (map-side collapsing), then the
    // range-partitioned running sum with per-partition offsets
    val byT = pts.groupBy("t").agg(sum("delta").as("net"))
    val parts = byT.repartitionByRange(col("t"))
      .withColumn("pid", spark_partition_id())
    val pw = Window.orderBy("pid")
    val offs = parts.groupBy("pid")
      .agg(sum("net").as("pnet"), min("t").as("pmin"))
      .select(col("pid"),
        coalesce(sum("pnet").over(
          pw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"),
        lead("pmin", 1).over(pw).as("next_start"))
    val local = Window.partitionBy("pid").orderBy("t")
    parts.join(broadcast(offs), Seq("pid"))
      .withColumn("conc", col("off") + sum("net").over(
        local.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("dur_us",
        coalesce(lead(col("t"), 1).over(local), col("next_start")) - col("t"))
      .filter(col("dur_us").isNotNull && col("dur_us") > 0)
      .groupBy(col("conc").as("concurrency"))
      .agg(sum("dur_us").as("total_us"))
  }

  /** q277: decile gains table over customer spend — the model-eval
    * lift/gains primitive (score the population, cut into ten exact
    * deterministic deciles, report each decile's share): per spend
    * decile (0 = highest spenders), customer count, exact cents total,
    * and the running cumulative. Deciles come from ROW_NUMBER over
    * (spend DESC, custkey) — fully deterministic under ties, unlike
    * NTILE's engine-specific remainder placement — as
    * decile = ((rank−1)·10) div n.
    *
    * Scale (the r9 verdict's #4, implemented): ranks ride the
    * per-customer AGGREGATE, and the rank itself is RANGE-PARTITIONED
    * instead of a single-partition row_number: `repartitionByRange`
    * on (cents DESC, custkey) splits the ordered domain — the sort key
    * is unique (custkey tiebreak), so ranks are boundary-independent —
    * each partition row_numbers locally in parallel, and a bounded
    * offset table (one count per shuffle partition) broadcasts back
    * each partition's starting rank. n rides in-row from a broadcast
    * 1-row aggregate (no driver-side count job). The final windows run
    * over the ten-row decile table — bounded. PlanShapeSpec pins the
    * no-single-partition-rank shape. */
  def qDecileLift(s: SparkSession, d: String): DataFrame = {
    val spend = orders(s, d).groupBy("o_custkey").agg(
      sum(expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .as("cents"))
    val nTot = spend.agg(count(lit(1)).as("n_tot"))
    val parts = spend.repartitionByRange(col("cents").desc, col("o_custkey"))
      .withColumn("pid", spark_partition_id())
    val offs = parts.groupBy("pid").agg(count(lit(1)).as("pc"))
      .select(col("pid"),
        coalesce(sum("pc").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    val local = Window.partitionBy("pid")
      .orderBy(col("cents").desc, col("o_custkey"))
    parts.join(broadcast(offs), Seq("pid"))
      .withColumn("rk", col("off") + row_number().over(local).cast("long"))
      .crossJoin(broadcast(nTot))
      .withColumn("decile", expr("((rk - 1L) * 10L) div n_tot"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"), sum("cents").as("sum_cents"))
      .withColumn("cum_cents",
        sum("sum_cents").over(Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  // ───── the remaining TPC-H query shapes (q286–q294) ─────
  // With these nine, every one of the 22 classic shapes has a fixture
  // adaptation in the registry: Q1=q18 Q2=q228 Q3=q209 Q4=q286 Q5=q226
  // Q6=q287 Q7=q288 Q8=q289 Q9=q290 Q10=q210 Q11=q237 Q12=q291
  // Q13=q236 Q14=q211 Q15=q292 Q16=q293 Q17=q235 Q18=q239 Q19=q294
  // Q20=q240 Q21=q227 Q22=q238. Adaptations where the fixture lacks a
  // column follow the q227/q228 precedents: lateness = l_shipdate vs
  // o_orderdate (no commit/receipt dates), partsupp = distinct
  // (l_partkey, l_suppkey) pairs, l_returnflag plays l_shipmode,
  // s_acctbal plays supplycost/complaints.

  /** q286: TPC-H Q4 shape ("order priority checking") — the
    * EXISTS-decorrelation benchmark: orders placed in 1996-Q1 with at
    * least one LATE line (shipped > 30 days after the order date — the
    * q227 lateness convention at Q4's tighter bound), counted per
    * priority. The correlated EXISTS becomes a LEFT-SEMI join, the
    * canonical distributed rewrite: probe once per order, never fan
    * out on multi-line matches.
    *
    * Scale shape: the quarter filter prunes the orders scan (pushed
    * predicate); the semi join is the one fact-keyed shuffle and its
    * output is at most |quarter's orders|; the priority rollup
    * collapses map-side to ≤5 rows. */
  def qOrderPriorityCheck(s: SparkSession, d: String): DataFrame = {
    val ord = orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .select("o_orderkey", "o_orderpriority", "o_orderdate")
    ord.join(lineitem(s, d).select("l_orderkey", "l_shipdate"),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** q287: TPC-H Q6 shape ("forecast revenue change") — the pure
    * scan-filter-aggregate: potential extra revenue if discounts in
    * the 4–6 point band were eliminated on small-quantity 1997 lines.
    * No join at all — the shape exists to prove the scan is CLEAN:
    * the date range reaches the parquet reader as a pushed filter,
    * the projection reads four columns, and the whole thing is one
    * codegen stage with a map-side-total agg (PlanShapeSpec pins the
    * pushdown). Revenue delta = price_cents × discount_points, exact
    * ×1e-4 dollars (the q162 discipline); the discount band compares
    * exact integer points, never raw doubles.
    *
    * Scale shape: embarrassingly parallel — zero shuffles before the
    * single-row final agg. The 100 TB plan is the 1 GB plan. */
  def qForecastRevenue(s: SparkSession, d: String): DataFrame = {
    val discPts = expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)")
    val priceCents =
      expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") && col("l_quantity") < 24)
      .select(priceCents.as("pc"), discPts.as("dp"))
      .filter(col("dp").between(4L, 6L))
      .agg(sum(col("pc") * col("dp")).as("forecast_rev_x1e4"),
        count(lit(1)).as("n_lines"))
  }

  /** q288: TPC-H Q7 shape ("volume shipping") — the two-nation trade
    * flow: revenue shipped between NATION_1 and NATION_2 (either
    * direction — the disjunctive nation-pair predicate is the shape's
    * point) per supplier-nation/customer-nation/ship-year, 1996–1997.
    *
    * Scale shape: lineitem⋈orders and ⋈customer are the two fact-key
    * shuffles; supplier and both nation lookups broadcast; the
    * nation-pair filter applies as soon as BOTH sides' nations are
    * bound (supplier-side nation binds on the broadcast, so the
    * disjunction cuts the frame before the rollup); the rollup is
    * 2 pairs × 2 years. */
  def qVolumeShipping(s: SparkSession, d: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val supN = supplier(s, d)
      .join(broadcast(nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    val custN = customer(s, d)
      .join(broadcast(nation(s, d)
        .filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("cn_key"),
          col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey", "cust_nation")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"), revX1e4.as("rev"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .join(orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === pair.head &&
          col("cust_nation") === pair(1)) ||
        (col("supp_nation") === pair(1) && col("cust_nation") === pair.head))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).as("revenue_x1e4"), count(lit(1)).as("n_lines"))
  }

  /** q289: TPC-H Q8 shape ("national market share") — the
    * share-of-total with a CASE-sum numerator: within the ASIA-market
    * MEDIUM-part order volume of 1996–1997, NATION_5 suppliers' share
    * per order-year. The original emits the float ratio; this emits
    * the exact (nation, total) ×1e-4 pair — the ratio's sufficient
    * statistic, engine-identical (the q211 promo-share discipline).
    *
    * Scale shape: the type-filtered part list broadcasts into the
    * lineitem scan (semi shape — non-MEDIUM lines never shuffle); the
    * date filter prunes orders; customer is the one custkey shuffle;
    * region-filtered nation and supplier broadcast; the rollup is
    * 2 rows. */
  def qMarketShare(s: SparkSession, d: String): DataFrame = {
    val mediumParts = part(s, d).filter(col("p_type") === "MEDIUM")
      .select("p_partkey")
    val asiaCust = customer(s, d)
      .join(broadcast(nation(s, d)
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))),
        col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supN = supplier(s, d)
      .join(broadcast(nation(s, d)
        .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation")
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        revX1e4.as("rev"))
      .join(broadcast(mediumParts), col("l_partkey") === col("p_partkey"))
      .join(orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1998-01-01"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_5", col("rev"))
        .otherwise(lit(0L))).as("nation_rev_x1e4"),
        sum(col("rev")).as("total_rev_x1e4"))
  }

  /** q290: TPC-H Q9 shape ("product type profit") — profit per
    * supplier-nation per order-year over red-named parts. The fixture
    * has no partsupp/supplycost, so p_retailprice plays unit cost
    * (the q228 stand-in discipline): profit = revenue −
    * retail_cents × qty, both sides exact ×1e-4 dollars, so the sum
    * is engine-identical and MAY be negative — Q9's point is that the
    * measure is a derived arithmetic expression, not a raw column.
    *
    * Scale shape: the name filter prunes parts and broadcasts
    * (non-red lines never shuffle); orders joins on the one fact key;
    * supplier+nation broadcast; the rollup is 25 nations × 7 years. */
  def qProductProfit(s: SparkSession, d: String): DataFrame = {
    val redParts = part(s, d).filter(col("p_name").contains("red"))
      .select(col("p_partkey"),
        expr("CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
          .as("cost_cents"))
    val supN = supplier(s, d)
      .join(broadcast(nation(s, d)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        qtyX100.as("qty_c"), revX1e4.as("rev"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .join(orders(s, d).select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("rev") - col("cost_cents") * col("qty_c"))
        .as("profit_x1e4"), count(lit(1)).as("n_lines"))
  }

  /** q291: TPC-H Q12 shape ("shipping modes and order priority") —
    * the CASE-sum pivot over a join: among LATE 1997 lines (shipped
    * > 60 days after the order — the q227 convention; the fixture has
    * no commit/receipt dates), how many belong to critical-priority
    * orders vs not, per return flag (3 values, playing l_shipmode).
    * The shape's point is the conditional aggregation AFTER the join:
    * one pass, two complementary counters, no second scan.
    *
    * Scale shape: the ship-year filter prunes the lineitem scan; one
    * orderkey shuffle; the rollup collapses map-side to 3 rows. */
  def qShipmodePriority(s: SparkSession, d: String): DataFrame = {
    val critical = Seq("1-URGENT", "2-HIGH")
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .select("l_orderkey", "l_returnflag", "l_shipdate")
      .join(orders(s, d).select("o_orderkey", "o_orderdate",
        "o_orderpriority"), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(col("o_orderpriority").isin(critical: _*), 1L)
        .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin(critical: _*), 0L)
          .otherwise(1L)).as("low_line_count"))
  }

  /** q292: TPC-H Q15 shape ("top supplier") — the view-plus-scalar-max
    * pattern: per-supplier revenue over 1997-Q1, keeping exactly the
    * supplier(s) whose revenue EQUALS the maximum (ties all survive —
    * the WITH-TIES cousin of q269, and why the original uses a view +
    * scalar subquery instead of LIMIT 1).
    *
    * Scale shape: the quarter filter prunes the scan; one suppkey
    * rollup; the max is a 1-row broadcast back onto the rollup (never
    * a global sort); the name join broadcasts. */
  def qTopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .select(col("l_suppkey"), revX1e4.as("rev"))
      .groupBy("l_suppkey")
      .agg(sum(col("rev")).as("total_rev_x1e4"))
    val mx = rev.agg(max(col("total_rev_x1e4")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev_x1e4") === col("mx"))
      .join(broadcast(supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("l_suppkey").as("s_suppkey"), col("s_name"),
        col("total_rev_x1e4"))
      .orderBy(col("s_suppkey"))
  }

  /** q293: TPC-H Q16 shape ("parts/supplier relationship") — the
    * COUNT-DISTINCT-over-anti-join catalog query: distinct suppliers
    * per (brand, type, size) over the fixture's partsupp (distinct
    * lineitem pairs — the q228 stand-in), excluding one brand and the
    * PROMO type (the NOT-IN literals) and excluding negative-balance
    * suppliers (playing the complaints NOT IN subquery) via an ANTI
    * join. Top-100 under the (count desc, brand, type, size) total
    * order.
    *
    * Scale shape: the pair dedup is the one fact-sized shuffle
    * (partkey-partitioned, reused by the part join via the same key);
    * the excluded-supplier list broadcasts into the anti join BEFORE
    * the dedup so excluded pairs never shuffle twice; part joins on
    * partkey; the rollup is bounded by |brand×type×size| = 25·6·50. */
  def qPartSupplierRelation(s: SparkSession, d: String): DataFrame = {
    val excluded = supplier(s, d).filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    val pairs = lineitem(s, d).select("l_partkey", "l_suppkey")
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .distinct()
    pairs
      .join(part(s, d)
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
        .select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(100)
  }

  /** q294: TPC-H Q19 shape ("discounted revenue") — the
    * disjunction-of-conjunctions predicate: revenue over three
    * (brand, size-band, quantity-band) OR-blocks (p_size plays
    * p_container). The shape's point is that an OR across both join
    * sides must NOT break the equi-join: the partkey join stays a
    * hash join and the disjunction evaluates as a codegen'd
    * post-join filter — never a nested-loop fallback (PlanShapeSpec
    * pins no BroadcastNestedLoopJoin/CartesianProduct in the plan).
    * Quantities compare as exact centi-units.
    *
    * Scale shape: part carries only (key, brand, size) into the join;
    * a superset brand/size pre-filter prunes part rows BEFORE the
    * join (the per-block residual re-checks pairs), so the join probe
    * side is 3 brands' parts, not the catalog; one partkey shuffle;
    * single-row final agg. */
  def qDiscountedRevenue(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
        col("p_size").between(1, 15))
      .select("p_partkey", "p_brand", "p_size")
    lineitem(s, d)
      .select(col("l_partkey"), qtyX100.as("qty_c"), revX1e4.as("rev"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("qty_c").between(100L, 1100L)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("qty_c").between(1000L, 2000L)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("qty_c").between(2000L, 3000L)))
      .agg(sum(col("rev")).as("revenue_x1e4"), count(lit(1)).as("n_lines"))
  }

  /** q339: Herfindahl–Hirschman concentration per nation — the
    * market-structure number beside q160's Gini (Gini reads
    * inequality of the whole distribution; HHI = Σsᵢ² is the
    * antitrust concentration read, dominated by the largest firms)
    * and q289's share matrix: per supplier nation, supplier revenue
    * shares' HHI and the CR4 four-firm concentration ratio.
    *
    * Exactness: supplier revenues are exact ×1e-4-dollar BIGINTs;
    * HHI = Σvᵢ²/V² is one division of DECIMAL-widened integers, and
    * CR4 folds the top-4 revenues (rank window over the
    * supplier-aggregate, partitioned by nation) as exact integers
    * into a ppm floor.
    *
    * Scale shape: one suppkey rollup (fact-sized exchange), a
    * broadcast supplier→nation bind, then nation-partitioned windows
    * over the SUPPLIER AGGREGATE (suppliers per nation, not rows). */
  def qHhiConcentration(s: SparkSession, d: String): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val d2 = (c: Column) => c.cast("double")
    val rev = lineitem(s, d)
      .select(col("l_suppkey"), revX1e4.as("rev"))
      .groupBy("l_suppkey").agg(sum(col("rev")).as("v"))
    val nat = supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val ranked = rev.join(broadcast(nat), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").as("nation"), col("l_suppkey"), col("v"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("nation").orderBy(col("v").desc, col("l_suppkey"))))
    ranked.groupBy("nation")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("v")).as("v_total"),
        sum(dec(col("v")) * col("v")).as("sum_v_sq"),
        sum(when(col("rk") <= 4, col("v")).otherwise(lit(0L))).as("top4_v"))
      .select(col("nation").cast("long").as("nation"), col("n_suppliers"),
        col("v_total"),
        round(when(col("v_total") > 0,
          d2(col("sum_v_sq")) / d2(dec(col("v_total")) * col("v_total")))
          .otherwise(lit(0.0)), 6).as("hhi"),
        // DECIMAL-widened: top4_v·10⁶ overflows BIGINT already at the
        // 10× probe (caught by ScaleBench under ANSI, not by sf0.01)
        expr("CAST(CASE WHEN v_total > 0 THEN " +
          "CAST(top4_v AS DECIMAL(38,0)) * 1000000 div v_total " +
          "ELSE 0 END AS BIGINT)").as("cr4_ppm"))
      .orderBy("nation")
  }
}
