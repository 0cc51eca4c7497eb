package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

case class ValEv(user_id: Long, value: Double)

/** transformWithState running totals: cross-batch state accumulation
  * must equal the batch groupBy over the full input. */
class StateStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val batch1 = Seq(ValEv(1, 1.0), ValEv(2, 2.0), ValEv(1, 3.0))
  private val batch2 = Seq(ValEv(2, 4.0), ValEv(3, 5.0), ValEv(1, 6.0))

  test("running totals accumulate across micro-batches (== batch rollup)") {
    val conf = spark.conf
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(key)
    // the transformWithState operator requires the RocksDB state store
    conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[ValEv]
    val q = StateStream.runningTotals(stream.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_out").start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
      // last emitted row per user = final running total
      val streamed = spark.table("totals_out").collect()
        .groupBy(_.getLong(0))
        .map { case (u, rows) => u -> rows.map(r => (r.getLong(1), r.getDouble(2))).maxBy(_._1) }
      val expected = (batch1 ++ batch2).groupBy(_.user_id)
        .map { case (u, evs) => u -> (evs.size.toLong, evs.map(_.value).sum) }
      assert(streamed === expected)
      assert(expected(1L) === ((3L, 10.0)))
    } finally {
      q.stop()
      saved match {
        case Some(v) => conf.set(key, v)
        case None => conf.unset(key)
      }
    }
  }
}
