package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the incremental twin of the batch
  * `Ingest.dedup`/`Dedup.exactDupGroups` family (SURVEY.md §2.10 +
  * §7.6): a training-data ingest stream must drop replayed/duplicate
  * records on arrival, not in a nightly batch.
  *
  * `dropDuplicates` keyed on the stable id + event-time column with a
  * watermark bounds the dedup state: Spark keeps one entry per key only
  * until the watermark passes its event time, so state is
  * O(keys-in-flight), independent of stream length — the property that
  * matters when the stream is 100 TB/day. (Without the watermark the
  * state grows forever; with `dropDuplicatesWithinWatermark` the key
  * expiry is per-key arrival-relative instead — same bound, looser
  * semantics.)
  */
object DedupStream {

  /** Works on both streaming and batch DataFrames with (event_id, ts)
    * present — the batch run is the oracle for the streaming spec. */
  def dedupById(events: DataFrame, watermark: String = "1 day"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm.dropDuplicates("event_id", "ts")
  }

  /** Downstream rollup proving the deduped stream composes with the
    * windowed aggregates: events per day after dedup. */
  def dailyCounts(events: DataFrame, watermark: String = "1 day"): DataFrame =
    dedupById(events, watermark)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(to_date(col("w.start")).as("ds"), col("n_events"))
}
