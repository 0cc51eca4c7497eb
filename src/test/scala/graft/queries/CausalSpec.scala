package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Planted regimes for the causal wave (q258 DiD, q259 stratified/IPW
  * ATE) — the fixture is a null experiment, so the specs plant the
  * confounded structures the estimators exist to correct: a level-
  * imbalanced panel with a common trend, and a covariate that drives
  * both treatment uptake and the outcome.
  */
class CausalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("did: recovers a planted effect under trend + level imbalance") {
    // 60 users; arm 0 sits 7 higher in BOTH periods (level imbalance),
    // everyone gains +5 + (u%3) across the cutoff (common trend,
    // arm-balanced), arm 0 gains +3 more (the true effect).
    val rows = (0L until 60L).flatMap { u =>
      val level = 10.0 + (u % 5) + (if (u % 2 == 0) 7.0 else 0.0)
      val post = level + 5.0 + (u % 3) + (if (u % 2 == 0) 3.0 else 0.0)
      Seq(("t", u, ts(10), level), ("t", u, ts(20), post))
    }
    val r = CausalQueries.diffInDiff(
      rows.toDF("event_type", "user_id", "ts", "value"),
      lit("2024-01-15")).collect().head
    assert(r.getLong(1) === 30 && r.getLong(2) === 30)
    assert(r.getDouble(3) === 7.0)   // pre_diff: the imbalance
    assert(r.getDouble(4) === 3.0)   // did: exactly the planted effect
    assert(r.getDouble(5) > 0)       // se from the u%3 within-arm spread
  }

  test("ipw/stratified: a confounded null lands on 0 while naive is fooled") {
    // cell 1 (y=100): 8 treated + 2 control; cell 2 (y=200): 2 + 8.
    // Outcome depends only on the cell → true effect 0. Naive mixes
    // the cells: 120 − 180 = −60. A third cell with treated rows only
    // violates positivity and must be dropped (counted, not silently).
    def rows(cell: Double, y: Double, nT: Int, nC: Int) =
      Seq.fill(nT)(("A", cell, 0.06, y)) ++ Seq.fill(nC)(("A", cell, 0.0, y))
    val li = (rows(1.0, 100.0, 8, 2) ++ rows(2.0, 200.0, 2, 8)
      ++ rows(3.0, 500.0, 4, 0))
      .toDF("l_returnflag", "l_quantity", "l_discount", "l_extendedprice")
    val r = CausalQueries.ipwAte(li).collect().head
    assert(r.getLong(1) === 20)        // kept rows
    assert(r.getLong(2) === 4)         // the positivity-violating cell
    assert(r.getDouble(3) === -60.0)   // naive is fooled
    assert(r.getDouble(4) === 0.0)     // stratified recovers the null
    // smoothed IPW pays a small shrinkage bias for its tamed weights
    // (hand: (800/0.75 − 200/0.25 + 400/0.25 − 1600/0.75)/20 = −40/3),
    // still 4.5× closer to the truth than naive; → 0 as cells grow
    assert(r.getDouble(5) === -13.3333)
  }
}
