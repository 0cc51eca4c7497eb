package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables._

/** Product-analytics wave over the events stream: gap-fill with
  * forward-fill (the time-series resample), ordered-stage funnel, and
  * cohort retention. All three are single-shuffle-on-user plans plus
  * broadcast-sized spines (date ranges, stage lists, offset lists) —
  * the shapes that keep them linear at 100 TB.
  */
object AnalyticsQueries {

  def queries: Seq[GraftQuery] = Seq(q85GapFill, q86Funnel, q87Retention)

  /** Time-series gap-fill: a user × day spine (dates from one
    * broadcast min/max row — never a driver collect), left-joined
    * daily sums, missing days carried forward with
    * `last(_, ignoreNulls)` over a rows-unbounded-preceding frame.
    * The window is user-partitioned; the spine explode is O(users ×
    * days) rows but zero bytes of input — at 100 TB the only real
    * cost is the one shuffle of daily aggregates on user_id.
    */
  val q85GapFill = GraftQuery(
    "q85_gap_fill",
    "user×day spine, daily sums gap-filled by forward-fill",
    Some("""WITH d AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
          ROUND(SUM(value), 2) AS v, COUNT(*) AS n
        FROM events GROUP BY 1, 2),
      b AS (SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
        FROM events),
      u AS (SELECT DISTINCT user_id FROM events),
      spine AS (
        SELECT u.user_id, CAST(unnest(generate_series(b.lo, b.hi,
          INTERVAL 1 DAY)) AS DATE) AS day FROM u, b),
      j AS (SELECT s.user_id, s.day, d.n, d.v
        FROM spine s LEFT JOIN d USING (user_id, day))
      SELECT user_id, day, COALESCE(CAST(n AS BIGINT), 0) AS n_events,
        ROUND(COALESCE(last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 2) AS ff_v
      FROM j ORDER BY 1, 2"""),
    (s, d) => {
      val ev = events(s, d)
      val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(round(sum(col("value")), 2).as("v"), count(lit(1)).as("n"))
      val bounds = ev.agg(min(to_date(col("ts"))).as("lo"),
        max(to_date(col("ts"))).as("hi"))
      val spine = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(bounds))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
            .as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          round(coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0)), 2)
            .as("ff_v"))
        .orderBy(col("user_id"), col("day"))
    })

  /** Ordered-stage funnel (signup → view → purchase): one conditional
    * aggregate per user gets each stage's FIRST timestamp; the funnel
    * counts require strict ts order between stages. Timestamps compare
    * as epoch-µs longs on both sides (events.parquet is
    * TIMESTAMP(NANOS); Spark reads it truncated to µs, so the oracle
    * must compare at µs too). One shuffle on user_id, 1-row result.
    */
  val q86Funnel = GraftQuery(
    "q86_funnel",
    "signup→view→purchase ordered funnel counts",
    Some("""WITH s AS (
        SELECT user_id,
          MIN(CASE WHEN event_type = 'signup'
            THEN epoch_us(ts) END) AS t_signup,
          MIN(CASE WHEN event_type = 'view'
            THEN epoch_us(ts) END) AS t_view,
          MIN(CASE WHEN event_type = 'purchase'
            THEN epoch_us(ts) END) AS t_purchase
        FROM events GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
        CAST(COUNT(t_signup) AS BIGINT) AS n_signup,
        CAST(SUM(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT)
          AS n_signup_view,
        CAST(SUM(CASE WHEN t_view > t_signup AND t_purchase > t_view
          THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
      FROM s"""),
    (s, d) => funnel(events(s, d)))

  /** The funnel aggregate over any (user_id, event_type, ts) frame —
    * reused by GraftProps for the monotonicity property. */
  def funnel(ev: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    ev.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "signup", unix_micros(col("ts"))))
          .as("t_signup"),
        min(when(col("event_type") === "view", unix_micros(col("ts"))))
          .as("t_view"),
        min(when(col("event_type") === "purchase", unix_micros(col("ts"))))
          .as("t_purchase"))
      .agg(count(lit(1)).as("n_users"),
        count(col("t_signup")).as("n_signup"),
        sum(when(col("t_view") > col("t_signup"), 1).otherwise(0))
          .as("n_signup_view"),
        sum(when(col("t_view") > col("t_signup") &&
          col("t_purchase") > col("t_view"), 1).otherwise(0))
          .as("n_full_funnel"))

  /** Cohort retention: users cohorted by first-seen day, checked for
    * activity at day offsets 0/7/14/21. The offset list is a 4-row
    * broadcast; activity is the distinct (user, day) set — the join
    * back is on (user_id, day), the same single shuffle key as
    * everything else in this wave.
    */
  val q87Retention = GraftQuery(
    "q87_retention",
    "cohort-by-first-day retention at offsets 0/7/14/21",
    Some("""WITH u AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
        FROM events GROUP BY 1),
      a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      x AS (SELECT u.user_id, u.cohort, o.off, u.cohort + o.off AS tday
        FROM u, (SELECT unnest([0, 7, 14, 21]) AS off) o)
      SELECT cohort, off, CAST(COUNT(*) AS BIGINT) AS n_cohort,
        CAST(COUNT(a.user_id) AS BIGINT) AS n_retained
      FROM x LEFT JOIN a ON a.user_id = x.user_id AND a.day = x.tday
      GROUP BY 1, 2 ORDER BY 1, 2"""),
    (s, d) => {
      import s.implicits._
      val ev = events(s, d)
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("cohort"))
      val active = ev
        .select(col("user_id").as("a_user"), to_date(col("ts")).as("a_day"))
        .distinct()
      val offsets = Seq(0, 7, 14, 21).toDF("off")
      cohorts.crossJoin(broadcast(offsets))
        .withColumn("tday", expr("date_add(cohort, off)"))
        .join(active,
          col("a_user") === col("user_id") && col("a_day") === col("tday"),
          "left")
        .groupBy(col("cohort"), col("off"))
        .agg(count(lit(1)).as("n_cohort"),
          count(col("a_user")).as("n_retained"))
        .orderBy(col("cohort"), col("off"))
    })
}
