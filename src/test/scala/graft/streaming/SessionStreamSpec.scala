package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.streaming.SessionStream.SEvent

class SessionStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(user: Long, id: Long, s: String) = SEvent(user, id, Timestamp.valueOf(s))

  test("flatMapGroupsWithState closes sessions on gap, keeps tail open across batches") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = SessionStream.sessionize(spark, stream.toDS(), gapSeconds = 3600)
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try {
      // batch 1: user 1 has two events 10 min apart (one session, open)
      stream.addData(ev(1, 1, "2024-01-01 10:00:00"), ev(1, 2, "2024-01-01 10:10:00"))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() === 0, "open session not emitted")
      // batch 2: a 5-hour gap closes session 1; then two quick events
      stream.addData(ev(1, 3, "2024-01-01 15:10:00"), ev(1, 4, "2024-01-01 15:20:00"))
      q.processAllAvailable()
      val closed = spark.table("sessions_out")
        .as[SessionStream.ClosedSession].collect()
      assert(closed.length === 1)
      assert(closed.head.session_id === 1 && closed.head.n_events === 2)
      assert(closed.head.session_start.toString === "2024-01-01 10:00:00.0")
      assert(closed.head.session_end.toString === "2024-01-01 10:10:00.0")
      // batch 3: another user + another gap for user 1
      stream.addData(ev(2, 5, "2024-01-01 09:00:00"), ev(1, 6, "2024-01-02 09:00:00"))
      q.processAllAvailable()
      val all = spark.table("sessions_out")
        .as[SessionStream.ClosedSession].collect().sortBy(_.session_id)
      assert(all.length === 2) // user 1's second session closed; user 2 still open
      assert(all.map(_.session_id).toSeq === Seq(1, 2))
      assert(all(1).n_events === 2)
    } finally q.stop()
  }

  test("a late event widens the open session instead of rewinding it") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[SEvent]
    val q = SessionStream.sessionize(spark, stream.toDS(), gapSeconds = 3600)
      .writeStream.outputMode("append").format("memory")
      .queryName("late_sessions_out").start()
    try {
      stream.addData(ev(1, 1, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      // a LATE event (09:58, within gap) arrives in the next batch;
      // the buggy form assigned lastSec = 09:58 (end < start) and then
      // split spuriously — the session must instead widen to 09:58-10:00
      stream.addData(ev(1, 2, "2024-01-01 09:58:00"))
      q.processAllAvailable()
      stream.addData(ev(1, 3, "2024-01-02 10:00:00")) // gap: closes it
      q.processAllAvailable()
      val closed = spark.table("late_sessions_out")
        .as[SessionStream.ClosedSession].collect()
      assert(closed.length === 1)
      assert(closed.head.n_events === 2)
      assert(closed.head.session_start.toString === "2024-01-01 09:58:00.0")
      assert(closed.head.session_end.toString === "2024-01-01 10:00:00.0")
    } finally q.stop()
  }
}
