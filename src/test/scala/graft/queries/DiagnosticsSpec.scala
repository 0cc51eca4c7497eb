package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for the diagnostics wave (q268 skew report, q269 null
  * profile) — a planted hot key against a uniform one, and planted
  * nulls/duplicates the null-free fixture can't exercise.
  */
class DiagnosticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("q268: a hot key dominates every skew statistic") {
    // skewed: key 1 × 90 rows + keys 2..11 × 1 → n=100, keys=11,
    //   top1 = 0.9, max/avg = 90·11/100 = 9.9, top10 = 0.99
    // uniform: keys 1..20 × 5 → top1 = 0.05, max/avg = 1, top10 = 0.5
    val skewed = (Seq.fill(90)(1L) ++ (2L to 11L)).toDF("k")
    val uniform = (1L to 20L).flatMap(k => Seq.fill(5)(k)).toDF("k")
    val r = DiagnosticsQueries.skewReport(
      Seq(("hot", skewed), ("uni", uniform))).collect()
      .map(x => x.getString(0) -> x).toMap
    val hot = r("hot")
    assert((hot.getLong(1), hot.getLong(2), hot.getLong(3))
      === ((100L, 11L, 90L)))
    assert(hot.getDouble(4) === 0.9)
    assert(hot.getDouble(5) === 9.9)
    assert(hot.getDouble(6) === 0.99)
    val uni = r("uni")
    assert(uni.getDouble(4) === 0.05)
    assert(uni.getDouble(5) === 1.0)
    assert(uni.getDouble(6) === 0.5)
  }

  test("q269: planted nulls and duplicates are counted exactly") {
    val df = Seq(
      (Some(1), Some("a")), (Some(1), None),
      (None, Some("b")), (Some(3), Some("b")))
      .toDF("num", "txt")
    val r = DiagnosticsQueries.nullProfile(df, Seq("txt", "num"))
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4))).toMap
    assert(r("num") === ((4L, 1L, 0.25, 2L)))  // distinct ignores null
    assert(r("txt") === ((4L, 1L, 0.25, 2L)))
    // and the output is column-name ordered regardless of input order
    val names = DiagnosticsQueries.nullProfile(df, Seq("txt", "num"))
      .collect().map(_.getString(0)).toSeq
    assert(names === Seq("num", "txt"))
  }
}
