package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces and planted regimes for the experimentation wave —
  * the semantics the fixture (a null experiment: user_id % 2 against
  * symmetric traffic) can't exercise: θ's pooled formula, the
  * perfect-covariate limit, mSPRT rejection under a real effect, and
  * the always-valid p's monotonicity.
  */
class ExperimentSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pre(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
  private def post(day: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  test("power: closed form on a two-point metric and the 1/mde² law") {
    // 20 users, half at 90, half at 110 → μ = 100, s² = 2000/19;
    // n(mde) = ceil(2·s²·(z.975+z.8)² / (100·mde)²) — replayed here
    // with the same double arithmetic; halving mde ≈ 4× the sample
    val rows = (0L until 20L).map(u =>
      ("t", u, pre(10), if (u % 2 == 0) 90.0 else 110.0))
    val r = ExperimentQueries.power(
      rows.toDF("event_type", "user_id", "ts", "value"),
      Seq(0.05, 0.10, 0.20)).collect()
    val s2 = 2000.0 / 19
    val zsum = 1.959963985 + 0.8416212336
    def n(mde: Double) =
      math.ceil(2 * s2 * math.pow(zsum, 2)
        / math.pow(100.0 * mde, 2)).toLong
    assert(r.map(x => (x.getDouble(1), x.getLong(4))).toSeq
      === Seq((0.05, n(0.05)), (0.10, n(0.10)), (0.20, n(0.20))))
    assert(r.head.getDouble(2) === 100.0)         // mu
    assert(n(0.05) >= 4 * n(0.10) - 3)            // the 1/mde² law
    assert(r.head.getDouble(5) === n(0.05) / 10.0) // x_current, 10/arm
  }

  test("cuped: hand theta on a 4-user frame") {
    // per-user (x, y): (0,1) (2,2) (4,2) (6,3) →
    // cov = 6/3 = 2, var(x) = 20/3 → θ = 0.3
    val rows = Seq(
      (0L, 0.0, 1.0), (1L, 2.0, 2.0), (2L, 4.0, 2.0), (3L, 6.0, 3.0))
      .flatMap { case (u, x, y) =>
        Seq(("t", u, pre(10), x), ("t", u, post(20), y)) }
    val r = ExperimentQueries.cuped(
      rows.toDF("event_type", "user_id", "ts", "value"),
      lit("2024-01-15")).collect().head
    assert(r.getDouble(3) === 0.3) // theta
    // raw diff: arms {0,2} mean y = 1.5, arms {1,3} mean y = 2.5 → -1
    assert(r.getDouble(4) === -1.0)
  }

  test("cuped: a perfect covariate removes all variance") {
    // y = x exactly → θ = 1, adjusted values all collapse to x̄,
    // var_reduction = 1 and the adjusted diff is 0
    val rows = (0L to 9L).flatMap { u =>
      val v = 10.0 + u
      Seq(("t", u, pre(10), v), ("t", u, post(20), v)) }
    val r = ExperimentQueries.cuped(
      rows.toDF("event_type", "user_id", "ts", "value"),
      lit("2024-01-15")).collect().head
    assert(r.getDouble(3) === 1.0)   // theta
    assert(r.getDouble(5) === 0.0)   // cuped_diff
    assert(r.getDouble(6) === 1.0)   // var_reduction
  }

  test("cuped: the adjustment corrects exactly the pre-period imbalance") {
    // equal true post behavior but arm 0 got luckier pre-period users:
    // raw diff picks up the imbalance through y's correlation with x;
    // CUPED with θ≈slope removes it — |cuped_diff| << |raw_diff|
    val rows = (0L to 99L).flatMap { u =>
      val luck = if (u % 2 == 0) 5.0 + (u % 7) else (u % 7).toDouble
      Seq(("t", u, pre(10), luck),
        ("t", u, post(20), 2.0 * luck + 1.0)) // y tracks x, no arm effect
    }
    val r = ExperimentQueries.cuped(
      rows.toDF("event_type", "user_id", "ts", "value"),
      lit("2024-01-15")).collect().head
    assert(math.abs(r.getDouble(4)) > 5, s"raw ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5)) < 1e-6, s"cuped ${r.getDouble(5)}")
    assert(r.getDouble(6) > 0.99) // y is a deterministic function of x
  }

  test("msprt: a real arm effect rejects and the null doesn't; p is monotone") {
    // 40 users × 30 days; arm 0 gets +3 — a decisive effect
    def frame(effect: Double) = (1 to 30).flatMap { d =>
      (0L to 39L).map { u =>
        val base = 10.0 + (u % 5) + (d % 3)
        ("t", u, pre(d), base + (if (u % 2 == 0) effect else 0.0)) }
    }.toDF("event_type", "user_id", "ts", "value")
    val hit = ExperimentQueries.msprt(frame(3.0)).collect()
    val ps = hit.map(_.getDouble(6))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a + 1e-12 },
      "always-valid p must be non-increasing")
    assert(hit.last.getInt(7) === 1, s"effect must reject (p ${ps.last})")
    val nul = ExperimentQueries.msprt(frame(0.0)).collect()
    assert(nul.map(_.getInt(7)).sum === 0,
      "the null experiment must never reject")
    val nps = nul.map(_.getDouble(6))
    assert(nps.zip(nps.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("bh fdr: planted effect days are discovered, the null family is quiet") {
    // 30 null days (arm-symmetric) + 5 effect days (+50 for arm 0);
    // 20 users/day. BH at q=.05 must find ≥ the 5 planted days and
    // nothing on the pure-null frame.
    def frame(effectDays: Set[Int]) = (1 to 35).flatMap { d =>
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1).atTime(12, 0))
      (0L to 19L).map { u =>
        val base = 10.0 + (u % 5)
        val eff = if (effectDays.contains(d) && u % 2 == 0) 50.0 else 0.0
        ("t", u, ts, base + eff)
      }
    }.toDF("event_type", "user_id", "ts", "value")
    val planted = ExperimentQueries.bhFdr(
      frame((31 to 35).toSet)).collect().head
    assert(planted.getLong(1) === 35)
    assert(planted.getLong(4) >= 5,  s"bh ${planted.getLong(4)}")
    assert(planted.getLong(3) >= 5,  "a +50 shift survives Bonferroni too")
    val nul = ExperimentQueries.bhFdr(frame(Set.empty)).collect().head
    assert(nul.getLong(4) === 0, s"null bh ${nul.getLong(4)}")
    assert(nul.getLong(3) === 0)
  }
}