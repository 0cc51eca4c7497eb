package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's entire UDF surface — its `Convert` helper object
  * (ref 流行音乐趋势预测.md:53-62, 276-286, 567-632, 792-920) — as a
  * documentation facade over Catalyst built-ins (SURVEY.md §2.8 rule:
  * zero custom UDFs; every row maps to a codegen'd built-in, keeping
  * pushdown intact and every function DuckDB-expressible).
  *
  * Dates are real `DateType` columns here; `yyyyMMdd` strings only at
  * the edges (SURVEY.md §7.3) — the `*Str` variants take/return the
  * reference's 8-char string form.
  */
object Convert {

  /** F1 — `findYesterday`: +1 day (the name is the reference's own
    * misdirection: it shifts a row onto the NEXT day's key so it becomes
    * that day's "yesterday", ref 流行音乐趋势预测.md:53-62). */
  def findYesterday(d: Column): Column = date_add(d, 1)

  /** F2 — `find10/20/40dayBefore`: +n days (same shift-onto-future-key
    * trick, ref 流行音乐趋势预测.md:804-832). */
  def findDaysBefore(d: Column, n: Int): Column = date_add(d, n)

  /** F3 — `findNextMonth` / `findTwoMonthAfter`: −30/−60 days (shift
    * onto the PAST key to attach a future label,
    * ref 流行音乐趋势预测.md:584-602, 834-862). */
  def findNextMonth(d: Column): Column = date_sub(d, 30)
  def findTwoMonthAfter(d: Column): Column = date_sub(d, 60)

  /** F4 — `findBeforeMonth` / `find{One,Two}MonthAfterReal`: +30/+60
    * days (feature-date → forecast-date,
    * ref 流行音乐趋势预测.md:604-622, 844-872). */
  def findBeforeMonth(d: Column): Column = date_add(d, 30)
  def findOneMonthAfterReal(d: Column): Column = date_add(d, 30)
  def findTwoMonthAfterReal(d: Column): Column = date_add(d, 60)

  /** F5 — `findWeek`: Calendar.DAY_OF_WEEK, 1=Sunday…7=Saturday
    * (ref 流行音乐趋势预测.md:624-631); Spark's dayofweek shares the
    * convention. */
  def findWeek(d: Column): Column = dayofweek(d)

  /** F6 — `TimeStamp2Date`: unix-seconds → `dd/MM/yyyy HH:mm:ss`
    * wall-clock string (ref 流行音乐趋势预测.md:884-889). */
  def timeStamp2Date(unixSeconds: Column): Column =
    date_format(to_timestamp(unixSeconds.cast("long")), "dd/MM/yyyy HH:mm:ss")

  /** F7 — `date2TimeStamp`: `yyyyMMdd` string → epoch millis
    * (ref 流行音乐趋势预测.md:891-897). */
  def date2TimeStamp(yyyymmdd: Column): Column =
    unix_timestamp(to_date(yyyymmdd, "yyyyMMdd")) * 1000

  /** F8 — `getDay`: whole days between two dates (millis diff /
    * 86 400 000, ref 流行音乐趋势预测.md:899-906). */
  def getDay(now: Column, publish: Column): Column = datediff(now, publish)

  /** F9 — `getTimes`: 2-bucket one-hot, hour<8 → (morning=1,afternoon=0)
    * (ref 流行音乐趋势预测.md:113-119). */
  def getTimesMorning(hour: Column): Column = when(hour < 8, 1).otherwise(0)
  def getTimesAfternoon(hour: Column): Column = when(hour < 8, 0).otherwise(1)

  /** F10 — `getTime`: the 4-bucket mapping incl. the hour==8 quirk —
    * delegated to the single implementation in graft.etl.Pivot. */
  def getTime(hour: Column): Column = graft.etl.Pivot.hourBucket(hour)

  /** F11 — `normalize`: (x − mean) / **variance** (not stddev —
    * ref 流行音乐趋势预测.md:149-153, preserved quirk). */
  def normalize(x: Column, mean: Column, variance: Column): Column =
    graft.ml.FeaturePipe.varianceNormalize(x, mean, variance)
}
