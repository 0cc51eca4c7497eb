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

  /** Daily event counts continuously materialized as a parquet table.
    * Pass `checkpoint` to make the query RESTARTABLE: source offsets
    * and the aggregation state store live under it, so a stopped (or
    * crashed) query resumes exactly where it left off — committed
    * batches are not reprocessed and the running counts survive the
    * restart. Without it Spark uses a temp checkpoint and the state
    * dies with the query (fine for tests, never for production). */
  def dailyCountsToParquet(events: DataFrame, dir: String,
                           checkpoint: Option[String] = None): StreamingQuery = {
    val writer = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.coalesce(1).write.mode("overwrite").parquet(dir)
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c))
      .start()
  }
}
