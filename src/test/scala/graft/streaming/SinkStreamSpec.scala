package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class SinkEv(event_id: Long, ts: Timestamp)

/** foreachBatch overwrite sink: the materialized parquet equals the
  * batch aggregate after every micro-batch — idempotent overwrite, no
  * duplicate accumulation across batches. */
class SinkStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming daily counts materialize as an idempotent parquet table") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val stream = MemoryStream[SinkEv]
    val q = SinkStream.dailyCountsToParquet(stream.toDF(), dir)
    val all = Seq(
      SinkEv(1, ts("2024-01-01 09:00:00")), SinkEv(2, ts("2024-01-01 10:00:00")),
      SinkEv(3, ts("2024-01-02 09:00:00")), SinkEv(4, ts("2024-01-02 11:00:00")),
      SinkEv(5, ts("2024-01-01 23:00:00")))
    try {
      stream.addData(all.take(2))
      q.processAllAvailable()
      val after1 = spark.read.parquet(dir).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(after1 === Map("2024-01-01" -> 2L))
      stream.addData(all.drop(2))
      q.processAllAvailable()
      val after2 = spark.read.parquet(dir).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      // full-table overwrite: day 1's count UPDATED (not appended to)
      assert(after2 === Map("2024-01-01" -> 3L, "2024-01-02" -> 2L))
    } finally q.stop()
  }

  test("restart from checkpoint resumes offsets AND aggregation state") {
    implicit val sql = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_sink_r").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val stream = MemoryStream[SinkEv]
    val q1 = SinkStream.dailyCountsToParquet(stream.toDF(), dir, Some(ckpt))
    try {
      stream.addData(SinkEv(1, ts("2024-01-01 09:00:00")),
        SinkEv(2, ts("2024-01-01 10:00:00")))
      q1.processAllAvailable()
    } finally q1.stop()
    // data arriving while the query is DOWN, then restart from the
    // same checkpoint: offsets committed before the stop must not be
    // reprocessed, and day 1's running count (2) must come back from
    // the recovered state store, not from re-reading batch 1
    stream.addData(SinkEv(3, ts("2024-01-01 23:00:00")),
      SinkEv(4, ts("2024-01-02 11:00:00")))
    val q2 = SinkStream.dailyCountsToParquet(stream.toDF(), dir, Some(ckpt))
    try {
      q2.processAllAvailable()
      val after = spark.read.parquet(dir).collect()
        .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      assert(after === Map("2024-01-01" -> 3L, "2024-01-02" -> 1L))
      // the restarted query ran exactly the one new batch: its last
      // progress must not have re-read the pre-restart rows
      assert(q2.lastProgress.numInputRows <= 2,
        s"restart reprocessed committed offsets: ${q2.lastProgress}")
    } finally q2.stop()
  }
}
