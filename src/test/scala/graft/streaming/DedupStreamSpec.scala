package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class DupEv(event_id: Long, ts: Timestamp, value: Double)

class DedupStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val data = Seq(
    DupEv(1L, ts("2024-01-01 09:00:00"), 1.0),
    DupEv(2L, ts("2024-01-01 10:00:00"), 2.0),
    DupEv(1L, ts("2024-01-01 09:00:00"), 1.0), // replay of event 1
    DupEv(3L, ts("2024-01-02 09:00:00"), 3.0),
    DupEv(2L, ts("2024-01-01 10:00:00"), 2.0)) // replay across batches

  test("streaming dedup drops replayed events; rollup == batch rollup") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[DupEv]
    val q = DedupStream.dailyCounts(stream.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("dedup_out").start()
    try {
      stream.addData(data.take(3)) // includes same-batch replay
      q.processAllAvailable()
      stream.addData(data.drop(3)) // includes cross-batch replay
      q.processAllAvailable()
      val streamed = spark.table("dedup_out").collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      val batch = DedupStream.dailyCounts(data.toDF()).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(streamed === batch)
      assert(batch === Map("2024-01-01" -> 2L, "2024-01-02" -> 1L))
    } finally q.stop()
  }
}
