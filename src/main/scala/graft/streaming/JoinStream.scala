package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution-shaped §2.10 operator:
  * match each click to its impression when the click lands within
  * `horizon` after the impression. Both sides carry watermarks, so
  * Spark bounds the join state on BOTH buffers: an impression is
  * dropped once the click watermark passes imp_ts + horizon, a click
  * once the impression watermark passes click_ts — state is
  * O(events-in-horizon), independent of stream length. The equi key
  * (imp_id) keeps the join hash-partitioned; the time bound is the
  * range residual (same as-of shape as batch q36).
  */
object JoinStream {

  /** Works on both streaming and batch frames:
    * impressions(imp_id, imp_ts), clicks(click_imp_id, click_ts).
    * The batch run is the oracle for the streaming spec.
    */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
                       horizon: String = "1 hour",
                       watermark: String = "2 hours"): DataFrame = {
    val imp = if (impressions.isStreaming)
      impressions.withWatermark("imp_ts", watermark) else impressions
    val clk = if (clicks.isStreaming)
      clicks.withWatermark("click_ts", watermark) else clicks
    imp.join(clk,
      expr(s"""imp_id = click_imp_id AND
               click_ts >= imp_ts AND
               click_ts <= imp_ts + INTERVAL $horizon"""))
      .select(col("imp_id"), col("imp_ts"), col("click_ts"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts")))
          .as("latency_s"))
  }

  /** LEFT OUTER stream-stream variant — the full attribution table:
    * matched impressions emit immediately; an UNMATCHED impression
    * emits (with null click) only once the click-side watermark passes
    * imp_ts + horizon, i.e. once a match has provably become
    * impossible. Same bounded state as the inner form — the null-row
    * emission is driven by the exact same state eviction, so "which
    * impressions never converted" costs nothing extra at 100 TB
    * (the alternative — joining the full impression log against
    * matched ids in batch — re-reads both streams from storage).
    */
  def clickAttributionOuter(impressions: DataFrame, clicks: DataFrame,
                            horizon: String = "1 hour",
                            watermark: String = "2 hours"): DataFrame = {
    val imp = if (impressions.isStreaming)
      impressions.withWatermark("imp_ts", watermark) else impressions
    val clk = if (clicks.isStreaming)
      clicks.withWatermark("click_ts", watermark) else clicks
    imp.join(clk,
      expr(s"""imp_id = click_imp_id AND
               click_ts >= imp_ts AND
               click_ts <= imp_ts + INTERVAL $horizon"""),
      "left_outer")
      .select(col("imp_id"), col("imp_ts"), col("click_ts"),
        (unix_timestamp(col("click_ts")) - unix_timestamp(col("imp_ts")))
          .as("latency_s"))
  }
}
