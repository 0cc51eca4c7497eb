package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the `flatMapGroupsWithState`
  * custom-state path (SURVEY.md §2.10 names this the one stateful
  * shape worth owning beyond windowed aggregation; the batch twin is
  * catalog query q37).
  *
  * State per user = the open session (id, bounds, count). An incoming
  * event either extends it or — if it arrives more than `gapSeconds`
  * later — closes it (the closed session is emitted downstream) and
  * opens the next. State is O(1) per user; emitted rows are final, so
  * the sink can be append-only. The open session is emitted only when
  * it closes — identical semantics to the batch query modulo the
  * still-open tail.
  */
object SessionStream {

  case class SEvent(user_id: Long, event_id: Long, ts: Timestamp)

  case class OpenSession(sessionId: Long, startSec: Long, lastSec: Long,
                         count: Long)

  case class ClosedSession(user_id: Long, session_id: Long, n_events: Long,
                           session_start: Timestamp, session_end: Timestamp)

  def sessionize(spark: SparkSession, events: Dataset[SEvent],
                 gapSeconds: Long = 14400L): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[SEvent], state: GroupState[OpenSession]) =>
          // within a micro-batch, order by event time (then id) — the
          // same tie-break as the batch query
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = Seq.newBuilder[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            open match {
              case Some(s) if sec - s.lastSec <= gapSeconds =>
                // min/max, not assignment: a LATE event from a later
                // micro-batch must widen the session toward its start,
                // never rewind lastSec (end < start + phantom splits)
                open = Some(s.copy(startSec = math.min(s.startSec, sec),
                  lastSec = math.max(s.lastSec, sec), count = s.count + 1))
              case Some(s) =>
                closed += ClosedSession(user, s.sessionId, s.count,
                  new Timestamp(s.startSec * 1000), new Timestamp(s.lastSec * 1000))
                open = Some(OpenSession(s.sessionId + 1, sec, sec, 1))
              case None =>
                open = Some(OpenSession(1, sec, sec, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }
}
