package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Pivot

/** Structured-Streaming twin of the batch daily pivot — SURVEY.md §2.10.
  *
  * The reference is pure batch; its only streaming-shaped semantics is
  * the daily-grain incremental rollup (new day of logs → re-aggregate).
  * This is that rollup as an incremental query: 1-day tumbling window
  * keyed on user, watermarked for late events, same conditional-agg
  * pivot as the batch A3 (ref 流行音乐趋势预测.md:932 is the batch twin).
  * State is bounded by the watermark: each (window, user) group is
  * dropped once the watermark passes, so state size is
  * O(users × windows-in-flight), independent of stream length.
  */
object EventsStream {

  /** Works on both a streaming and a batch DataFrame with columns
    * (ts TIMESTAMP, user_id, event_type, value) — the batch run is the
    * oracle for the streaming test.
    */
  def dailyUserPivot(events: DataFrame, watermark: String = "1 day"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), "1 day").as("w"), col("user_id"))
      .agg(
        Pivot.onehotSum(col("event_type"), "click", "clicks"),
        Pivot.onehotSum(col("event_type"), "view", "views"),
        Pivot.onehotSum(col("event_type"), "purchase", "purchases"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(to_date(col("w.start")).as("ds"), col("user_id"),
        col("clicks"), col("views"), col("purchases"),
        col("n_events"), col("value_sum"))
  }

  /** Stream-static enrichment — the most common streaming join: each
    * micro-batch of events joins a STATIC dimension (no watermark, no
    * join state; the static side is planned per batch, broadcast when
    * small). Unmatched events keep flowing with a null segment (left
    * join), so a late dimension row never blocks the stream. Works on
    * both streaming and batch frames; the batch run is the spec's
    * oracle. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"),
        coalesce(col("segment"), lit("unknown")).as("segment"))
}
