package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class Imp(imp_id: Long, imp_ts: Timestamp)
case class Clk(click_imp_id: Long, click_ts: Timestamp)

class JoinStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val imps = Seq(
    Imp(1L, ts("2024-01-01 09:00:00")),
    Imp(2L, ts("2024-01-01 09:30:00")),
    Imp(3L, ts("2024-01-01 10:00:00")))
  private val clks = Seq(
    Clk(1L, ts("2024-01-01 09:20:00")), // within 1h of imp 1 → match
    Clk(2L, ts("2024-01-01 11:00:00")), // 1.5h after imp 2 → no match
    Clk(3L, ts("2024-01-01 10:40:00")), // within 1h of imp 3 → match
    Clk(9L, ts("2024-01-01 10:00:00"))) // no such impression

  test("stream-stream interval join == batch interval join") {
    implicit val sql = spark.sqlContext
    val impStream = MemoryStream[Imp]
    val clkStream = MemoryStream[Clk]
    val q = JoinStream.clickAttribution(impStream.toDF(), clkStream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      impStream.addData(imps.take(2))
      clkStream.addData(clks.take(1))
      q.processAllAvailable()
      impStream.addData(imps.drop(2)) // imp 3 arrives after click batch 1
      clkStream.addData(clks.drop(1))
      q.processAllAvailable()
      val streamed = spark.table("attr_out").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      val batch = JoinStream.clickAttribution(imps.toDF(), clks.toDF())
        .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(streamed === batch)
      assert(batch === Set((1L, 1200L), (3L, 2400L)))
    } finally q.stop()
  }
}
