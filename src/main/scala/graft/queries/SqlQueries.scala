package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.Tables

/** SQL-text entry path (round-2 gap #1): the reference's primary API is
  * SQL strings over registered temp tables (music.md:36,42,45,83-86 and
  * the `%sql` paragraphs music.md:548-552,766-767). These catalog
  * entries register the fixture tables as temp views and run the query
  * as `spark.sql(...)` text — same Catalyst plan as the DataFrame twins
  * (q01/q02/q13/q44), proving a reference notebook ports verbatim.
  *
  * q50 additionally routes graft's native `top_k_by` aggregate through
  * SQL text via [[graft.functions.Registry]] — the library-call flavor
  * of the `GraftExtensions` builder-time path.
  */
object SqlQueries {

  def queries: Seq[GraftQuery] = Seq(
    q47SqlLineitemAgg, q48SqlEventsPivot, q49SqlDatediff, q50SqlTopK,
    q95SqlCorrelated, q96ArgMax)

  /** Register every fixture table as a temp view named after itself.
    * Idempotent (createOrReplace) and session-scoped; `events` goes
    * through the Tables loader so its nanos→micros ts rebuild applies
    * to SQL users too.
    */
  def registerViews(s: SparkSession, d: String): Unit =
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(s, d) else Tables.load(s, d, n)
      df.createOrReplaceTempView(n)
    }

  private def sqlQuery(name: String, doc: String, oracle: String,
                       sparkSql: String): GraftQuery =
    GraftQuery(name, doc, Some(oracle), (s, d) => {
      registerViews(s, d)
      graft.functions.Registry.registerAll(s)
      s.sql(sparkSql)
    })

  /** q01 twin through SQL text — identical result, identical single
    * hash-aggregate plan (Catalyst doesn't care which API declared it). */
  val q47SqlLineitemAgg: GraftQuery = sqlQuery(
    "q47_sql_lineitem_agg",
    "q01 rollup routed through spark.sql text over temp views",
    oracle = """SELECT l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(AVG(l_discount), 6) AS avg_disc,
      COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    sparkSql = """SELECT l_returnflag, l_linestatus,
      ROUND(SUM(l_quantity), 2) AS sum_qty,
      ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      ROUND(AVG(l_discount), 6) AS avg_disc,
      COUNT(*) AS cnt
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")

  /** q02 twin: the reference's conditional-sum pivot in literal SQL. */
  val q48SqlEventsPivot: GraftQuery = sqlQuery(
    "q48_sql_events_pivot",
    "q02 one-hot event pivot routed through spark.sql text",
    oracle = """SELECT CAST(ts AS DATE) AS ds,
      CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
      CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
      CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 2) AS value_sum
      FROM events GROUP BY 1 ORDER BY 1""",
    sparkSql = """SELECT CAST(ts AS DATE) AS ds,
      SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks,
      SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
      SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases,
      COUNT(*) AS n_events,
      ROUND(SUM(value), 2) AS value_sum
      FROM events GROUP BY 1 ORDER BY 1""")

  /** q13 twin: join + datediff + avg in literal SQL (Spark datediff
    * argument order is (end, start); DuckDB's is date_diff('day', start,
    * end)). */
  val q49SqlDatediff: GraftQuery = sqlQuery(
    "q49_sql_datediff",
    "q13 order→ship datediff routed through spark.sql text",
    oracle = """SELECT l.l_returnflag,
      ROUND(AVG(date_diff('day', o.o_orderdate, l.l_shipdate)), 4) AS avg_ship_days,
      COUNT(*) AS n
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1""",
    sparkSql = """SELECT l.l_returnflag,
      ROUND(AVG(datediff(l.l_shipdate, o.o_orderdate)), 4) AS avg_ship_days,
      COUNT(*) AS n
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1 ORDER BY 1""")

  /** q44 twin: the native bounded-heap top-K aggregate invoked from SQL
    * text (`top_k_by` resolved via the function registry). */
  val q50SqlTopK: GraftQuery = sqlQuery(
    "q50_sql_topk",
    "top-3 orders per customer via top_k_by() in spark.sql text",
    oracle = """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk
      FROM (SELECT o_custkey, o_orderkey, o_totalprice,
              ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders)
      WHERE rk <= 3 ORDER BY o_custkey, rk""",
    sparkSql = """SELECT o_custkey, t.payload AS o_orderkey,
        t.score AS o_totalprice, CAST(pos + 1 AS INT) AS rk
      FROM (SELECT o_custkey, top_k_by(o_totalprice, o_orderkey, 3) AS top
            FROM orders GROUP BY o_custkey)
      LATERAL VIEW posexplode(top) AS pos, t
      ORDER BY o_custkey, rk""")

  /** Correlated subquery forms through SQL text: a correlated scalar
    * subquery (per-nation average) + EXISTS (urgent order) — Catalyst
    * de-correlates both into joins (RewriteCorrelatedScalarSubquery /
    * RewritePredicateSubquery), so the executed plan is ordinary
    * aggregate+join shuffles, not a per-row re-execution. The porting
    * surface a SQL-first user hits right after plain aggregates.
    */
  val q95SqlCorrelated: GraftQuery = sqlQuery(
    "q95_sql_correlated",
    "correlated scalar + EXISTS subqueries (decorrelated to joins)",
    oracle = """SELECT c.c_nationkey, COUNT(*) AS n_above
      FROM customer c
      WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        AND EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1""",
    sparkSql = """SELECT c.c_nationkey, COUNT(*) AS n_above
      FROM customer c
      WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        AND EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      GROUP BY 1 ORDER BY 1""")

  /** max_by/min_by (argmax) — "the attribute of the extreme row" in
    * ONE aggregate, no self-join back to the max row and no window
    * sort. Keyed on the unique orderkey so ties cannot occur and both
    * engines agree deterministically.
    */
  val q96ArgMax: GraftQuery = sqlQuery(
    "q96_argmax",
    "per-customer priority of highest/lowest order via max_by/min_by",
    oracle = """SELECT o_custkey,
        arg_max(o_orderpriority, o_orderkey) AS last_prio,
        arg_min(o_orderpriority, o_orderkey) AS first_prio,
        COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1""",
    sparkSql = """SELECT o_custkey,
        max_by(o_orderpriority, o_orderkey) AS last_prio,
        min_by(o_orderpriority, o_orderkey) AS first_prio,
        COUNT(*) AS n
      FROM orders GROUP BY 1 ORDER BY 1""")
}
