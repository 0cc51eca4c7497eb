package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The Convert facade (SURVEY.md §2.8 F1–F11) against hand values. */
class ConvertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = to_date(lit(s))

  test("F1-F4 date shifts match the reference's directions") {
    val row = Seq(1).toDF("x").select(
      Convert.findYesterday(d("2015-03-01")).as("f1"),
      Convert.findDaysBefore(d("2015-03-01"), 10).as("f2"),
      Convert.findNextMonth(d("2015-03-31")).as("f3"),
      Convert.findTwoMonthAfter(d("2015-03-31")).as("f3b"),
      Convert.findBeforeMonth(d("2015-03-01")).as("f4")).head
    assert(row.getDate(0).toString === "2015-03-02") // +1 (onto next key)
    assert(row.getDate(1).toString === "2015-03-11") // +10
    assert(row.getDate(2).toString === "2015-03-01") // −30
    assert(row.getDate(3).toString === "2015-01-30") // −60
    assert(row.getDate(4).toString === "2015-03-31") // +30
  }

  test("F6/F7 timestamp conversions") {
    val row = Seq(1).toDF("x").select(
      Convert.timeStamp2Date(lit(1425168000L)).as("wall"), // 2015-03-01 00:00 UTC
      Convert.date2TimeStamp(lit("20150301")).as("ms")).head
    assert(row.getString(0) === "01/03/2015 00:00:00")
    assert(row.getLong(1) === 1425168000000L)
  }

  test("F9 two-bucket one-hot boundary at hour 8") {
    val rows = Seq(7, 8).toDF("h").select(
      col("h"),
      Convert.getTimesMorning(col("h")).as("m"),
      Convert.getTimesAfternoon(col("h")).as("a"))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(rows(7) === ((1, 0)))
    assert(rows(8) === ((0, 1)))
  }

  test("F11 normalize divides by variance (quirk)") {
    val got = Seq(1).toDF("x")
      .select(Convert.normalize(lit(10.0), lit(4.0), lit(3.0))).head.getDouble(0)
    assert(got === 2.0) // (10-4)/3, NOT /sqrt(3)
  }
}
