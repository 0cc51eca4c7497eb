package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.{Ingest, LagFeatures, Pivot}
import graft.model.Tables

/** The relational operator catalog — every "Oracle: yes" row of
  * SURVEY.md §2 as a named, DuckDB-checkable query over the driver
  * fixtures (FIXTURES.md §C role mapping).
  *
  * Determinism rules applied throughout:
  *  - every double aggregate is `round(..., k)` on BOTH sides so
  *    last-ulp summation-order differences can't flip the hash;
  *  - every query ends in a total ORDER BY on its key columns;
  *  - DuckDB integer SUMs are CAST to BIGINT (DuckDB widens to INT128,
  *    Spark sums to LongType).
  *
  * Scale notes are per-query: each one states why the plan survives a
  * 1000-executor / 100 TB run (broadcast choice, shuffle count,
  * pushdown) — the local fixtures only check semantics.
  */
object Relational {
  import Tables._

  def queries: Seq[GraftQuery] = Seq(
    q01LineitemAgg, q02EventsPivotDaily, q03LagJoinDaily, q04WindowLag,
    q05MultiJoinRevenue, q06TopKPerCustomer, q07DedupDistinct,
    q08DistinctCounts, q09RegexFilter, q10DateRange, q11HourBuckets,
    q12Weekday, q13DateDiff, q14NullFillJoin, q15MseJoin, q16UnionAll,
    q17Intersect, q18ExceptAnti, q19ColStats, q20MonthFilter, q21JsonProps)

  /** A2/A4 — multi-aggregate rollup (ref 流行音乐趋势预测.md:83-86,953).
    * One hash-aggregate, map-side partials, 2-col group key of tiny
    * cardinality: at 100 TB this shuffles only |groups|×partitions rows. */
  val q01LineitemAgg = GraftQuery(
    "q01_lineitem_agg",
    "group-by multi-SUM/AVG/COUNT rollup over lineitem",
    Some("""SELECT l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(AVG(l_discount), 6) AS avg_disc,
      COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""),
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus")))

  /** A3 — conditional-agg pivot of the event_type enum into counter
    * columns (ref 流行音乐趋势预测.md:75-86). No explode: one codegen'd
    * hash aggregate. */
  val q02EventsPivotDaily = GraftQuery(
    "q02_events_pivot_daily",
    "one-hot pivot of event_type into per-day counters",
    Some("""SELECT CAST(ts AS DATE) AS ds,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
      CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 2) AS value_sum
      FROM events GROUP BY 1 ORDER BY 1"""),
    (s, d) => events(s, d)
      .groupBy(to_date(col("ts")).as("ds"))
      .agg(
        Pivot.onehotSum(col("event_type"), "click", "clicks"),
        Pivot.onehotSum(col("event_type"), "view", "views"),
        Pivot.onehotSum(col("event_type"), "purchase", "purchases"),
        Pivot.onehotSum(col("event_type"), "signup", "signups"),
        Pivot.onehotSum(col("event_type"), "error", "errors"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col("ds")))

  /** §7.2 flagship slice: S1 scan → A5 dedup → A3 pivot → J5 1-day
    * shift-join → P9 zero-fill → O1 order (ref 流行音乐趋势预测.md:29-98
    * modernized). Both join sides derive from one aggregate with the same
    * (ds,user_id) partitioning, so AQE plans a single extra exchange. */
  val q03LagJoinDaily = GraftQuery(
    "q03_lag_join_daily",
    "dedup + pivot + date-shifted self-join lag features, zero-filled",
    Some("""WITH dedup AS (SELECT DISTINCT * FROM events),
      daily AS (
        SELECT CAST(ts AS DATE) AS ds, user_id,
          CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
          CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
          CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signups,
          CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors,
          COUNT(*) AS n_events,
          ROUND(SUM(value), 2) AS value_sum
        FROM dedup GROUP BY 1, 2)
      SELECT d.ds, d.user_id, d.clicks, d.views, d.purchases, d.signups,
        d.errors, d.n_events, d.value_sum,
        COALESCE(y.clicks, 0) AS clicks_y1,
        COALESCE(y.views, 0) AS views_y1,
        COALESCE(y.purchases, 0) AS purchases_y1
      FROM daily d
      LEFT JOIN (SELECT ds + 1 AS ds, user_id, clicks, views, purchases
                 FROM daily) y USING (ds, user_id)
      ORDER BY d.ds, d.user_id"""),
    (s, d) => {
      val daily = Pivot.dailyUserCounters(Ingest.dedup(events(s, d)))
      LagFeatures.shiftJoin(daily, "user_id", "ds", 1,
          Seq("clicks", "views", "purchases"), "_y1")
        .orderBy(col("ds"), col("user_id"))
    })

  /** W1 — window-form lag twin of q03 (SURVEY.md §2.5): one shuffle on
    * user_id serves every lag column. */
  val q04WindowLag = GraftQuery(
    "q04_window_lag",
    "lag() over (partition by user order by day) with zero-fill",
    Some("""WITH daily AS (
        SELECT CAST(ts AS DATE) AS ds, user_id,
          COUNT(*) AS n_events, ROUND(SUM(value), 2) AS value_sum
        FROM events GROUP BY 1, 2)
      SELECT ds, user_id, n_events, value_sum,
        COALESCE(LAG(n_events) OVER (PARTITION BY user_id ORDER BY ds), 0) AS n_events_prev,
        COALESCE(LAG(value_sum) OVER (PARTITION BY user_id ORDER BY ds), 0) AS value_sum_prev
      FROM daily ORDER BY ds, user_id"""),
    (s, d) => {
      val daily = events(s, d)
        .groupBy(to_date(col("ts")).as("ds"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
             round(sum(col("value")), 2).as("value_sum"))
      LagFeatures.windowLag(daily, "user_id", "ds", 1,
          Seq("n_events", "value_sum"), "_prev")
        .orderBy(col("ds"), col("user_id"))
    })

  /** J1/J4 — chained left-outer joins onto small dimensions
    * (ref 流行音乐趋势预测.md:92-94,945). Dims are broadcast explicitly:
    * at 100 TB the fact side streams, zero shuffle for the joins; the
    * only exchange is the final tiny group-by. */
  val q05MultiJoinRevenue = GraftQuery(
    "q05_multijoin_revenue",
    "orders⋈customer⋈nation⋈region broadcast chain + rollup",
    Some("""SELECT r.r_name, n.n_name,
      ROUND(SUM(o.o_totalprice), 2) AS revenue,
      COUNT(*) AS n_orders
      FROM orders o
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    (s, d) => orders(s, d)
      .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"), "left_outer")
      .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left_outer")
      .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"), "left_outer")
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name")))

  /** O4/W5 — per-group top-K via row_number (ref 豆瓣图书推荐.md:17-21,91).
    * Ties broken by o_orderkey for determinism. Single shuffle on the
    * partition key; no global sort of the fact table. */
  val q06TopKPerCustomer = GraftQuery(
    "q06_topk_per_customer",
    "top-3 orders per customer by totalprice (row_number window)",
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders)
      WHERE rk <= 3 ORDER BY o_custkey, rk"""),
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    })

  /** A5 — projection-level dedup (ref 流行音乐趋势预测.md:42). */
  val q07DedupDistinct = GraftQuery(
    "q07_dedup_distinct",
    "DISTINCT (user_id, event_type) pairs",
    Some("""SELECT DISTINCT user_id, event_type FROM events ORDER BY 1, 2"""),
    (s, d) => events(s, d)
      .select(col("user_id"), col("event_type"))
      .distinct()
      .orderBy(col("user_id"), col("event_type")))

  /** A6 — exact distinct counts (ref 豆瓣图书推荐.md:41-45). The 100 TB
    * twin is approx_count_distinct (see q-entry in TextQueries / tests) —
    * exact countDistinct expands to a two-phase aggregate. */
  val q08DistinctCounts = GraftQuery(
    "q08_distinct_counts",
    "countDistinct users/types + total rows, single row",
    Some("""SELECT COUNT(DISTINCT user_id) AS n_users,
      COUNT(DISTINCT event_type) AS n_types, COUNT(*) AS n_rows
      FROM events"""),
    (s, d) => events(s, d)
      .agg(countDistinct(col("user_id")).as("n_users"),
           countDistinct(col("event_type")).as("n_types"),
           count(lit(1)).as("n_rows")))

  /** P5 — regex predicate (ref 豆瓣图书推荐.md:33 numeric-id filter). */
  val q09RegexFilter = GraftQuery(
    "q09_regex_filter",
    "rlike predicate on p_brand (single-digit brands)",
    Some("""SELECT p_brand, COUNT(*) AS n_parts,
      ROUND(SUM(p_retailprice), 2) AS sum_price
      FROM part WHERE regexp_matches(p_brand, '#[0-9]$')
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => part(s, d)
      .filter(col("p_brand").rlike("#[0-9]$"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
           round(sum(col("p_retailprice")), 2).as("sum_price"))
      .orderBy(col("p_brand")))

  /** P6 — date-range predicate (ref 流行音乐趋势预测.md:643-644). The
    * filter pushes to the parquet scan (min/max row-group skip). */
  val q10DateRange = GraftQuery(
    "q10_date_range",
    "orders within [1996-01-01, 1997-01-01) per priority",
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
      ROUND(SUM(o_totalprice), 2) AS sum_price
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderpriority")))

  /** F10 — the reference's exact 4-bucket hour-of-day mapping, including
    * the hour==8→midnight-bucket quirk (ref 流行音乐趋势预测.md:908-919;
    * SURVEY.md §7.3). */
  val q11HourBuckets = GraftQuery(
    "q11_hour_buckets",
    "events per reference hour bucket ((8,12]=0,(12,18]=1,(18,23]=2,else 3)",
    Some("""SELECT CASE
        WHEN hour(ts) > 8 AND hour(ts) <= 12 THEN 0
        WHEN hour(ts) > 12 AND hour(ts) <= 18 THEN 1
        WHEN hour(ts) > 18 AND hour(ts) <= 23 THEN 2
        ELSE 3 END AS hour_bucket,
      COUNT(*) AS n, ROUND(SUM(value), 2) AS value_sum
      FROM events GROUP BY 1 ORDER BY 1"""),
    (s, d) => events(s, d)
      .groupBy(Pivot.hourBucket(hour(col("ts"))).as("hour_bucket"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value")), 2).as("value_sum"))
      .orderBy(col("hour_bucket")))

  /** F5 — day-of-week with the Calendar convention 1=Sunday…7=Saturday
    * (ref 流行音乐趋势预测.md:624-631). DuckDB dayofweek is 0=Sunday,
    * hence the +1 on the oracle side. */
  val q12Weekday = GraftQuery(
    "q12_weekday",
    "events per day-of-week (1=Sunday convention)",
    Some("""SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER) AS weekday,
      COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""),
    (s, d) => events(s, d)
      .groupBy(dayofweek(to_date(col("ts"))).as("weekday"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("weekday")))

  /** F8 — whole-days-between feature (ref 流行音乐趋势预测.md:899-906,949)
    * over an order⟕lineitem join. Join key is the natural shuffle key;
    * at scale both tables bucket on orderkey. */
  val q13DateDiff = GraftQuery(
    "q13_datediff",
    "avg days from order date to ship date per returnflag",
    Some("""SELECT l.l_returnflag,
      ROUND(AVG(date_diff('day', o.o_orderdate, l.l_shipdate)), 4) AS avg_ship_days,
      COUNT(*) AS n
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => lineitem(s, d)
      .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(round(avg(datediff(col("l_shipdate"), col("o_orderdate"))), 4)
             .as("avg_ship_days"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag")))

  /** P9/§1.3 — zero-fill after a deliberately partial left-outer join
    * (ref 流行音乐趋势预测.md:299,761 — intent: unmatched rows get 0,
    * not NULL). */
  val q14NullFillJoin = GraftQuery(
    "q14_null_fill_join",
    "orders ⟕ rich customers, missing acctbal zero-filled",
    Some("""SELECT o.o_orderkey,
      ROUND(COALESCE(c.c_acctbal, 0), 2) AS acctbal0
      FROM orders o
      LEFT JOIN (SELECT c_custkey, c_acctbal FROM customer
                 WHERE c_acctbal > 5000) c
        ON o.o_custkey = c.c_custkey
      ORDER BY o.o_orderkey"""),
    (s, d) => orders(s, d)
      .join(broadcast(customer(s, d).filter(col("c_acctbal") > 5000)
              .select(col("c_custkey"), col("c_acctbal"))),
            col("o_custkey") === col("c_custkey"), "left_outer")
      .select(col("o_orderkey"),
              round(coalesce(col("c_acctbal"), lit(0d)), 2).as("acctbal0"))
      .orderBy(col("o_orderkey")))

  /** A7 — global mean of a derived squared-error column
    * (ref 流行音乐趋势预测.md:377-381, 豆瓣图书推荐.md:78-82). */
  val q15MseJoin = GraftQuery(
    "q15_mse_join",
    "MSE between extendedprice and retailprice*quantity (join + pow + avg)",
    Some("""SELECT ROUND(AVG(POW(l.l_extendedprice - p.p_retailprice * l.l_quantity, 2)), 2) AS mse,
      COUNT(*) AS n
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey"""),
    (s, d) => lineitem(s, d)
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(avg(pow(col("l_extendedprice") - col("p_retailprice") * col("l_quantity"), 2)), 2)
             .as("mse"),
           count(lit(1)).as("n")))

  /** U1 — 4-way UNION ALL of filtered slices then re-aggregate
    * (ref 流行音乐趋势预测.md:1217). Catalyst collapses the union into
    * one scan-level filter; no duplicate reads at scale. */
  val q16UnionAll = GraftQuery(
    "q16_union_all",
    "union of per-type slices, re-aggregated",
    Some("""SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS value_sum
      FROM (
        SELECT * FROM events WHERE event_type = 'click'
        UNION ALL SELECT * FROM events WHERE event_type = 'view'
        UNION ALL SELECT * FROM events WHERE event_type = 'purchase'
        UNION ALL SELECT * FROM events WHERE event_type = 'signup')
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => {
      val ev = events(s, d)
      Seq("click", "view", "purchase", "signup")
        .map(t => ev.filter(col("event_type") === t))
        .reduce(_ unionAll _)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             round(sum(col("value")), 2).as("value_sum"))
        .orderBy(col("event_type"))
    })

  /** U2 — INTERSECT-distinct (ref 豆瓣图书推荐.md:97). */
  val q17Intersect = GraftQuery(
    "q17_intersect",
    "users who both clicked and purchased (INTERSECT)",
    Some("""SELECT user_id FROM events WHERE event_type = 'click'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'purchase'
      ORDER BY user_id"""),
    (s, d) => {
      val ev = events(s, d)
      ev.filter(col("event_type") === "click").select(col("user_id"))
        .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
        .orderBy(col("user_id"))
    })

  /** EXCEPT / anti-join — the "exclude already-read" semantics
    * (ref 豆瓣图书推荐.md:21; SURVEY.md §2.7). */
  val q18ExceptAnti = GraftQuery(
    "q18_except_anti",
    "(user, day) pairs with a signup but no purchase (EXCEPT)",
    Some("""SELECT user_id, CAST(ts AS DATE) AS ds
      FROM events WHERE event_type = 'signup'
      EXCEPT
      SELECT user_id, CAST(ts AS DATE) AS ds
      FROM events WHERE event_type = 'purchase'
      ORDER BY user_id, ds"""),
    (s, d) => {
      val ev = events(s, d)
      def slice(t: String) = ev.filter(col("event_type") === t)
        .select(col("user_id"), to_date(col("ts")).as("ds"))
      slice("signup").except(slice("purchase"))
        .orderBy(col("user_id"), col("ds"))
    })

  /** A8 — column statistics feeding the standardizer
    * (ref 流行音乐趋势预测.md:143-153; Statistics.colStats). */
  val q19ColStats = GraftQuery(
    "q19_col_stats",
    "mean + sample variance per numeric lineitem column, single row",
    Some("""SELECT ROUND(AVG(l_quantity), 4) AS qty_mean,
      ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
      ROUND(AVG(l_extendedprice), 2) AS price_mean,
      ROUND(VAR_SAMP(l_extendedprice), 2) AS price_var,
      ROUND(AVG(l_discount), 6) AS disc_mean
      FROM lineitem"""),
    (s, d) => lineitem(s, d)
      .agg(round(avg(col("l_quantity")), 4).as("qty_mean"),
           round(var_samp(col("l_quantity")), 4).as("qty_var"),
           round(avg(col("l_extendedprice")), 2).as("price_mean"),
           round(var_samp(col("l_extendedprice")), 2).as("price_var"),
           round(avg(col("l_discount")), 6).as("disc_mean")))

  /** P7 — month-of-date predicate, semantic rewrite of the charAt(5)
    * month test (ref 流行音乐趋势预测.md:1014,1130-1136). */
  val q20MonthFilter = GraftQuery(
    "q20_month_filter",
    "first-half-year orders per year (month(d) < 7)",
    Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, COUNT(*) AS n,
      ROUND(SUM(o_totalprice), 2) AS sum_price
      FROM orders WHERE month(o_orderdate) < 7
      GROUP BY 1 ORDER BY 1"""),
    (s, d) => orders(s, d)
      .filter(month(col("o_orderdate")) < 7)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("yr")))

  /** JSON property extraction from the events props column — the
    * schema-on-read edge the reference handles with string surgery
    * (SURVEY.md §2.8 F12), done with codegen'd json path extraction. */
  val q21JsonProps = GraftQuery(
    "q21_json_props",
    "sum of JSON props.k per event_type",
    Some("""SELECT event_type,
      CAST(SUM(CAST(props ->> 'k' AS BIGINT)) AS BIGINT) AS k_sum,
      COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY 1"""),
    (s, d) => events(s, d)
      .groupBy(col("event_type"))
      .agg(sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
           count(lit(1)).as("n"))
      .orderBy(col("event_type")))
}
