package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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

/** A closed idle session: emitted ONLY when the event-time timer
  * fires, i.e. the watermark has passed last_event + gap. */
case class ClosedSession(user_id: Long, n: Long, first_us: Long, last_us: Long)

/** Event-time-timer sessionization on the transformWithState API: each
  * user's open session lives in a `ValueState`; every batch re-arms a
  * timer at `last_event + gap`, and [[handleExpiredTimer]] — driven by
  * the WATERMARK, not by data arrival — emits the closed session and
  * clears the state. This is the piece `mapGroupsWithState`
  * sessionization (SessionStream) approximates with timeouts; timers
  * make the close deterministic in event time, and state stays O(1)
  * per in-flight user with RocksDB holding it off-heap.
  */
class IdleSessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp), ClosedSession] {

  @transient private var open: ValueState[ClosedSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[ClosedSession](
      "open_session", Encoders.product[ClosedSession], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    // the input path must ALSO split on the gap: two events more than
    // `gap` apart can share a micro-batch (or arrive before the timer's
    // watermark), and blind min/max-merging would fuse their sessions —
    // the timer only covers the "stream went quiet" close
    val closed = Seq.newBuilder[ClosedSession]
    var cur = Option(open.get())
    rows.toSeq.sortBy(_._2.getTime).foreach { case (_, t) =>
      val us = t.getTime * 1000L
      cur match {
        case Some(s) if us > s.last_us + gapMs * 1000L =>
          closed += s
          cur = Some(ClosedSession(key, 1L, us, us))
        case Some(s) =>
          cur = Some(ClosedSession(key, s.n + 1,
            math.min(s.first_us, us), math.max(s.last_us, us)))
        case None =>
          cur = Some(ClosedSession(key, 1L, us, us))
      }
    }
    cur.foreach { s =>
      open.update(s)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(s.last_us / 1000L + gapMs)
    }
    closed.result().iterator
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    val out = Option(open.get()).toList
    open.clear()
    out.iterator
  }
}

object StateStream {

  /** (user_id, ts) stream with a watermark → closed-session summaries,
    * emitted only when the watermark passes last_event + gap. */
  def idleSessions(events: DataFrame, gap: String = "10 minutes",
                   watermark: String = "0 seconds"): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(gap))
    require(iv.months == 0,
      s"session gap must be day-or-smaller denominated, got '$gap' " +
        "(a month has no fixed millisecond length)")
    val ms = iv.days * 86400000L + iv.microseconds / 1000L
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new IdleSessionProcessor(ms),
        TimeMode.EventTime(), OutputMode.Append())
  }

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
