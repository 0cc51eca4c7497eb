package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-shifted features — SURVEY.md §2.3 J5 and §2.5 W1–W4.
  *
  * The reference attaches "N-days-ago" features and "N-days-ahead" labels
  * by duplicating a daily table with its date key shifted and equi-joining
  * back on (entity, date) (ref 流行音乐趋势预测.md:72-94, 288-293, 656-668,
  * 962-993). Two rebuild forms, kept deliberately distinct (SURVEY.md §7.3):
  *
  *  - [[shiftJoin]]: the join form. Gap-exact: a missing calendar day
  *    yields NULL (zero-filled per §1.3), not the previous present row.
  *    Shuffles both sides on (key, ds) — at scale both sides share the
  *    same partitioning so consecutive shift-joins reuse one exchange.
  *  - [[windowLag]]: idiomatic `lag/lead over Window`. One shuffle on the
  *    entity key for any number of lag columns — cheaper when dates are
  *    dense — but steps over calendar gaps (lag(1) = previous *present*
  *    row). Equal to shiftJoin exactly on gap-free ranges (tested).
  */
object LagFeatures {

  /** J5 — attach `cols` from `days` days earlier, per `key`, zero-filled
    * where that earlier day is absent (§1.3 zero-fill, ref
    * 流行音乐趋势预测.md:299 `replace("null","0")` — intent, not the bug).
    * Positive `days` looks back (lag); negative looks forward (lead/label).
    */
  def shiftJoin(daily: DataFrame, key: String, dsCol: String,
                days: Int, cols: Seq[String], suffix: String): DataFrame = {
    val shifted = daily.select(
      date_add(col(dsCol), days).as(dsCol) +:
      col(key) +:
      cols.map(c => col(c).as(s"$c$suffix")): _*)
    daily
      .join(shifted, Seq(dsCol, key), "left_outer")
      .na.fill(0, cols.map(c => s"$c$suffix"))
  }

  /** W1–W3 — window-form lag/lead twin. */
  def windowLag(daily: DataFrame, key: String, dsCol: String,
                days: Int, cols: Seq[String], suffix: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(dsCol))
    cols.foldLeft(daily) { (df, c) =>
      val shifted = if (days >= 0) lag(col(c), days).over(w)
                    else lead(col(c), -days).over(w)
      df.withColumn(s"$c$suffix", coalesce(shifted, lit(0)))
    }
  }
}
