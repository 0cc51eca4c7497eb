package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Running per-user totals as input rows arrive. */
case class UserTotals(user_id: Long, n: Long, total: Double)

/** `transformWithState` (the Spark 4 arbitrary-state API, successor to
  * `mapGroupsWithState`) keeping one `ValueState[UserTotals]` per user:
  * each micro-batch folds its rows into the stored totals and emits
  * the updated row. State is per-key and O(1); the state store is
  * RocksDB (the API requires it), so state size is bounded by disk,
  * not executor heap — the property that lets a 10⁹-key running
  * aggregate survive on a real cluster. TTL hooks
  * ([[TTLConfig]]) and event-time timers exist on the same handle for
  * expiring idle keys; the running-total contract here wants neither.
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, (Long, Double), UserTotals] {

  @transient private var state: ValueState[UserTotals] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserTotals](
      "totals", Encoders.product[UserTotals], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[UserTotals] = {
    val prev = Option(state.get()).getOrElse(UserTotals(key, 0L, 0.0))
    val updated = rows.foldLeft(prev) { case (acc, (_, v)) =>
      UserTotals(key, acc.n + 1, acc.total + v)
    }
    state.update(updated)
    Iterator.single(updated)
  }
}

object StateStream {

  /** (user_id, value) stream → running per-user totals, one updated
    * row per key per micro-batch. Works identically over a batch frame
    * in tests via the same groupByKey. */
  def runningTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
