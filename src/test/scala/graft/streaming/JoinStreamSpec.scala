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

  test("left-outer stream-stream join emits unmatched imps only after watermark") {
    implicit val sql = spark.sqlContext
    val impStream = MemoryStream[Imp]
    val clkStream = MemoryStream[Clk]
    val q = JoinStream.clickAttributionOuter(impStream.toDF(), clkStream.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_outer").start()
    try {
      impStream.addData(imps)
      clkStream.addData(clks)
      q.processAllAvailable()
      // the JOIN watermark is min(imp wm 10:00−2h, click wm 11:00−2h)
      // = 08:00: imp 2's no-match verdict (needs 09:30+1h+2h = 12:30)
      // is not final, so nothing unmatched may emit yet
      val early = spark.table("attr_outer").collect()
        .filter(_.isNullAt(2)).map(_.getLong(0)).toSet
      assert(early === Set.empty[Long])
      // advance BOTH watermarks past every horizon (min policy), then
      // run one more batch: watermarks computed at batch end apply to
      // the NEXT batch, which performs the eviction-driven null emit
      impStream.addData(Imp(98L, ts("2024-01-01 23:00:00")))
      clkStream.addData(Clk(99L, ts("2024-01-01 23:00:00")))
      q.processAllAvailable()
      impStream.addData(Imp(97L, ts("2024-01-01 23:30:00")))
      clkStream.addData(Clk(96L, ts("2024-01-01 23:30:00")))
      q.processAllAvailable()
      val rows = spark.table("attr_outer").collect()
      val unmatched = rows.filter(_.isNullAt(2)).map(_.getLong(0)).toList
      assert(unmatched === List(2L))
      val matched = rows.filterNot(_.isNullAt(2))
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(matched === Set((1L, 1200L), (3L, 2400L)))
      // batch twin: plain left outer agrees on both partitions of rows
      val batch = JoinStream.clickAttributionOuter(imps.toDF(), clks.toDF())
      assert(batch.collect().filter(_.isNullAt(2)).map(_.getLong(0)).toList
        === List(2L))
    } finally q.stop()
  }
}
