package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val data = Seq(
    Ev(ts("2024-01-01 09:00:00"), 1L, "click", 1.0),
    Ev(ts("2024-01-01 10:00:00"), 1L, "view", 2.0),
    Ev(ts("2024-01-02 09:00:00"), 1L, "purchase", 3.0),
    Ev(ts("2024-01-02 11:00:00"), 2L, "click", 4.0),
    // late event for day 1, arriving after day-2 data
    Ev(ts("2024-01-01 23:00:00"), 2L, "click", 5.0))

  test("streaming daily pivot == batch daily pivot on the same data") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = EventsStream.dailyUserPivot(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("daily_out").start()
    try {
      stream.addData(data.take(3))
      q.processAllAvailable()
      stream.addData(data.drop(3)) // includes the late day-1 event
      q.processAllAvailable()
      val streamed = spark.table("daily_out").collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      val batch = EventsStream.dailyUserPivot(data.toDF()).collect()
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      assert(streamed === batch)
      // the late event landed in its event-time day, not arrival day
      assert(streamed.exists(t => t._1 == "2024-01-01" && t._2 == 2L && t._3 == 1L))
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim") {
    implicit val sql = spark.sqlContext
    val dim = Seq((1L, "gold"), (3L, "silver")).toDF("user_id", "segment")
    val stream = MemoryStream[Ev]
    val q = EventsStream.enrichWithDim(stream.toDF(), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      stream.addData(data)
      q.processAllAvailable()
      val streamed = spark.table("enrich_out").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(4))).toSet
      val batch = EventsStream.enrichWithDim(data.toDF(), dim).collect()
        .map(r => (r.getLong(0), r.getString(2), r.getString(4))).toSet
      assert(streamed === batch)
      // matched users carry their segment; unmatched flow as 'unknown'
      assert(streamed.filter(_._1 == 1L).forall(_._3 == "gold"))
      assert(streamed.filter(_._1 == 2L).forall(_._3 == "unknown"))
    } finally q.stop()
  }
}
