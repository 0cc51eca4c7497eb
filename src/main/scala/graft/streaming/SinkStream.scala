package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming → table sink via `foreachBatch`: the aggregate runs in
  * complete mode, so every micro-batch hands the sink the FULL updated
  * result and the write is a whole-table overwrite — idempotent by
  * construction (a replayed batch rewrites the same content; no
  * dedup bookkeeping). This is the right shape for small rollup
  * tables; at 100 TB the same hook becomes partition-scoped
  * replaceWhere/MERGE against a table format, with the batchId as the
  * idempotency token — the contract (exactly-once visible state keyed
  * by batchId) is what this module pins.
  */
object SinkStream {

  /** Daily event counts continuously materialized as a parquet table. */
  def dailyCountsToParquet(events: DataFrame, dir: String): StreamingQuery =
    events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.coalesce(1).write.mode("overwrite").parquet(dir)
      }
      .start()
}
