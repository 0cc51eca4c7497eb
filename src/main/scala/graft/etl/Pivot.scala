package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conditional-aggregation pivots — SURVEY.md §2.4 A1–A4, A9.
  *
  * The reference one-hot-expands a low-cardinality enum into 0/1 counter
  * columns and SUMs them per (date, key) (ref 流行音乐趋势预测.md:75-77,
  * 83-86, 925-932). Spark-first form: `sum(when(col === v, 1))` — a single
  * hash aggregate with map-side partial aggregation, no explode, fully
  * inside whole-stage codegen. Scales linearly in input and shuffles only
  * the (key × enum-width) partial rows.
  */
object Pivot {

  /** One 0/1-summed counter column for one enum value (A3). */
  def onehotSum(col: Column, value: Any, as: String): Column =
    sum(when(col === lit(value), 1).otherwise(0)).as(as)

  /** A3 over the `events` fixture: per (ds, user_id) counters per
    * event_type, plus the value rollup — the modern twin of the per-song
    * daily play/download/collect rollup (ref 流行音乐趋势预测.md:83-86).
    */
  def dailyUserCounters(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("ds"), col("user_id"))
      .agg(
        onehotSum(col("event_type"), "click", "clicks"),
        onehotSum(col("event_type"), "view", "views"),
        onehotSum(col("event_type"), "purchase", "purchases"),
        onehotSum(col("event_type"), "signup", "signups"),
        onehotSum(col("event_type"), "error", "errors"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))

  /** A1 — plain group-by count per (ds, user_id, event_type)
    * (ref 流行音乐趋势预测.md:68). */
  def actionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(to_date(col("ts")).as("ds"), col("user_id"), col("event_type"))
      .count()

  /** F10 — the reference's 4 hour-of-day buckets with its exact boundary
    * behavior (ref 流行音乐趋势预测.md:908-919): (8,12]→0 morning,
    * (12,18]→1 afternoon, (18,23]→2 evening, everything else (including
    * hour==8 and hour==0..7) →3 midnight. hour==8 in bucket 3 is a
    * reference quirk preserved deliberately (SURVEY.md §7.3).
    */
  def hourBucket(hourCol: Column): Column =
    when(hourCol > 8 && hourCol <= 12, 0)
      .when(hourCol > 12 && hourCol <= 18, 1)
      .when(hourCol > 18 && hourCol <= 23, 2)
      .otherwise(3)
}
