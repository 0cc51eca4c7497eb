package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces and planted regimes for the time-series wave
  * (SeriesQueries) — the recurrence conventions the fixture oracle
  * verifies but can't isolate: Holt's init (l₁=v₁, b₁=0, f₁=v₁) and
  * coupled update, Page–Hinkley's running-mean deviation and min
  * tracking, and the rolling window's self-exclusion.
  */
class SeriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(day: Int, v: Double, typ: String = "x") =
    (typ, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), v)

  test("holt: hand trace of the coupled (l, b) recurrence") {
    // v = 10, 20, 30 with α=.5 β=.3:
    //   d1: l=10, b=0, f=10, err=0
    //   d2: f=10, l=.5·20+.5·10=15,    b=.3·5+.7·0=1.5,      err=10
    //   d3: f=16.5, l=.5·30+.5·16.5=23.25, b=.3·8.25+.7·1.5=3.525... no:
    //       b=.3·(23.25−15)+.7·1.5=2.475+1.05=3.525 → err=13.5
    val in = Seq(ev(1, 10), ev(2, 20), ev(3, 30))
      .toDF("event_type", "ts", "value")
    val rows = SeriesQueries.holtDaily(in).collect()
    assert(rows.map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6))).toSeq === Seq(
      (10.0, 0.0, 10.0, 0.0),
      (15.0, 1.5, 10.0, 10.0),
      (23.25, 3.525, 16.5, 13.5)))
  }

  test("holt: the trend state locks onto a linear ramp") {
    // v_t = 10t: the (l, b) fixpoint of the recurrence on a ramp is
    // b = slope; by day 40 the trend must sit within 0.2 of 10 and
    // the one-step forecast error within 0.5
    val in = (1 to 28).map(d => ev(d, 10.0 * d)) ++
      (1 to 12).map(d => (("x"),
        java.sql.Timestamp.valueOf(f"2024-02-$d%02d 12:00:00"),
        10.0 * (28 + d)))
    val last = SeriesQueries.holtDaily(
      in.toDF("event_type", "ts", "value")).collect().last
    assert(math.abs(last.getDouble(4) - 10.0) < 0.2,
      s"trend ${last.getDouble(4)}")
    assert(math.abs(last.getDouble(6)) < 0.5, s"err ${last.getDouble(6)}")
  }

  test("page-hinkley: a planted level shift alarms, the calm regime doesn't") {
    val calm = (1 to 28).map(d => ev(d, 100.0 + (d % 3)))
    val calmRows = SeriesQueries.pageHinkley(
      calm.toDF("event_type", "ts", "value")).collect()
    assert(calmRows.map(_.getInt(4)).sum === 0)
    // days 17-28 at +60: the running mean lags the shift, deviations
    // accumulate, ph = m − min(m) must cross λ=3 and stay alarmed
    val shifted = (1 to 16).map(d => ev(d, 100.0 + (d % 3))) ++
      (17 to 28).map(d => ev(d, 160.0 + (d % 3)))
    val rows = SeriesQueries.pageHinkley(
      shifted.toDF("event_type", "ts", "value")).collect()
    assert(rows.take(16).map(_.getInt(4)).sum === 0) // pre-shift quiet
    assert(rows.last.getInt(4) === 1)                // alarmed at the end
    assert(rows.map(_.getInt(4)).sum >= 3)           // and held, not a blip
  }

  test("page-hinkley: first-day convention m₁ = −δ") {
    // mean(z₁..z₁) = z₁ cancels the first deviation exactly
    val rows = SeriesQueries.pageHinkley(
      Seq(ev(1, 10), ev(2, 20), ev(3, 15))
        .toDF("event_type", "ts", "value")).collect()
    assert(rows.head.getDouble(2) === -0.05)
    assert(rows.head.getDouble(3) === 0.0) // ph₁ = m₁ − m₁
  }

  test("rolling z: a regime break is scored against the trailing window only") {
    // 14 calm days (100 ± 1), day 15 at 200: trailing mean ≈ 100 with
    // tiny sd → |z| >> 2; the spike never masks itself (self-excluded)
    val in = (1 to 14).map(d => ev(d, 100.0 + (d % 2))) :+ ev(15, 200.0)
    val rows = SeriesQueries.rollingZ(
      in.toDF("event_type", "ts", "value")).collect()
    assert(rows.take(14).map(_.getInt(7)).sum === 0)
    val spike = rows.last
    assert(spike.getInt(7) === 1)
    assert(spike.getDouble(6) > 50, s"z ${spike.getDouble(6)}")
    assert(spike.getLong(3) === 7) // the window caps at 7 trailing days
  }

  test("rolling z: needs 3 trailing days and positive sd") {
    // constant series → rsd = 0 → z NULL, never a division blowup
    val in = (1 to 10).map(d => ev(d, 100.0))
    val rows = SeriesQueries.rollingZ(
      in.toDF("event_type", "ts", "value")).collect()
    assert(rows.forall(_.isNullAt(6)))
    assert(rows.forall(_.getInt(7) === 0))
    // and the first 3 days can't score even with variance present
    val varied = (1 to 5).map(d => ev(d, 100.0 + d))
    val vr = SeriesQueries.rollingZ(
      varied.toDF("event_type", "ts", "value")).collect()
    assert(vr.take(3).forall(_.isNullAt(6)))
    assert(!vr.last.isNullAt(6))
  }

  test("mann-kendall: hand S with ties, variance and tau-b corrections") {
    // v = 1,2,2,3: S = +1+1+1+0+1+1 = 5; tie group t=2 →
    // tv = 2·1·9 = 18, tp = 1; var = (4·3·13 − 18)/18 = 7.666667
    // z = (5−1)/√7.6667 = 1.4446; tau_b = 5/√((6−1)·6) = 0.9129
    val in = Seq(ev(1, 1), ev(2, 2), ev(3, 2), ev(4, 3))
      .toDF("event_type", "ts", "value")
    val r = SeriesQueries.mannKendall(in).collect().head
    assert(r.getLong(2) === 5L)
    assert(r.getDouble(3) === 7.6667)
    assert(r.getDouble(4) === 0.9129)
    assert(r.getDouble(5) === 1.4446)
    assert(r.getInt(6) === 0)
  }

  test("binseg: localizes a planted step exactly, with the closed-form reduction") {
    // 10 days at 100 then 10 at 200: best split is day 10 with
    // reduction 10·10/20 · 100² = 50000, shift +100
    val in = ((1 to 10).map(d => ev(d, 100.0)) ++
      (11 to 20).map(d => ev(d, 200.0)))
      .toDF("event_type", "ts", "value")
    val r = SeriesQueries.binseg(in).collect().head
    assert(r.getLong(3) === 10L)                       // split_t
    assert(r.getDate(2).toString === "2024-01-10")     // split_ds
    assert(r.getDouble(4) === 100.0)                   // mean_left
    assert(r.getDouble(5) === 200.0)                   // mean_right
    assert(r.getDouble(6) === 100.0)                   // shift
    assert(r.getDouble(7) === 50000.0)                 // reduction
  }

  test("binseg: symmetric reductions tie to the earliest day") {
    // v = 100, 200, 100: t=1 and t=2 both reduce 1·2/3·50² — the
    // 9dp-rank tie must resolve to the earlier split
    val in = Seq(ev(1, 100), ev(2, 200), ev(3, 100))
      .toDF("event_type", "ts", "value")
    val r = SeriesQueries.binseg(in).collect().head
    assert(r.getLong(3) === 1L)
  }

  test("mann-kendall: a strict ramp is a certain trend with tau 1") {
    val in = (1 to 30).map(d => ev(d, 10.0 * d))
      .toDF("event_type", "ts", "value")
    val r = SeriesQueries.mannKendall(in).collect().head
    assert(r.getLong(2) === 435L)       // all 435 pairs concordant
    assert(r.getDouble(4) === 1.0)      // tau_b
    assert(r.getInt(6) === 1)           // |z| ≈ 7.74 > 1.96
  }

  /** Plain-Scala replay of the q261 Holt–Winters recurrence — the
    * strongest pin available: every output row of the Spark fold must
    * match the reference loop bit-for-bit before the 4dp round. */
  private def hwReference(vs: Seq[Double])
      : Seq[(Double, Double, Double, Double)] = {
    var l = vs.head; var b = 0.0; val sn = Array.fill(7)(0.0)
    (vs.head, 0.0, 0.0, vs.head) +: vs.zipWithIndex.tail.map {
      case (v, t) =>
        val slot = t % 7; val si = sn(slot)
        val f = l + b + si
        val l2 = 0.5 * (v - si) + 0.5 * (l + b)
        val b2 = 0.3 * (l2 - l) + 0.7 * b
        sn(slot) = 0.2 * (v - l2) + 0.8 * si
        l = l2; b = b2
        (l2, b2, si, f)
    }
  }

  test("holt-winters: the Spark fold replays the reference loop exactly") {
    val vs = Seq(10.0, 25.0, 14.0, 31.0, 8.0, 19.0, 22.0, 12.0, 27.0,
      16.0, 33.0, 10.0, 21.0, 24.0, 14.0, 29.0)
    val in = vs.zipWithIndex.map { case (v, i) => ev(i + 1, v) }
      .toDF("event_type", "ts", "value")
    val got = SeriesQueries.holtWinters(in).collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    val want = hwReference(vs).map { case (l, b, si, f) =>
      def r4(x: Double) = BigDecimal(x)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r4(l), r4(b), r4(si), r4(f))
    }
    assert(got.toSeq === want)
  }

  test("holt-winters: seasonal states absorb a planted weekly pattern") {
    // pure 7-periodic signal, no trend: after 20 cycles (γ=0.2 needs
    // ~a dozen per-slot updates to absorb a strong pattern) the
    // standing forecast must track the pattern 10x better than the
    // seasonal-blind first cycle did
    val pattern = Seq(50.0, 80.0, 20.0, 65.0, 35.0, 90.0, 10.0)
    val in = (0 until 140).map { t =>
      ("x", java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(t).atTime(12, 0)),
        pattern(t % 7))
    }.toDF("event_type", "ts", "value")
    val err = SeriesQueries.holtWinters(in).collect()
      .map(r => math.abs(r.getDouble(7)))
    val early = err.slice(1, 8).sum / 7
    val late = err.slice(133, 140).sum / 7
    assert(late < early / 10, s"late $late vs early $early")
  }

  test("q278 gumbel: MoM inversion and return-level ordering") {
    // one event/day, alternating 90/110 → daily maxima with
    // m̄ = 100 and s = stddev_samp; replay the closed form
    val in = (1 to 20).map(d => ev(d, if (d % 2 == 0) 110.0 else 90.0))
      .toDF("event_type", "ts", "value")
    val r = SeriesQueries.gumbel(in).collect().head
    val xs = (1 to 20).map(d => if (d % 2 == 0) 110.0 else 90.0)
    val mean = xs.sum / xs.size
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum
      / (xs.size - 1))
    val beta = sd * math.sqrt(6) / math.Pi
    val mu = mean - 0.5772156649015329 * beta
    def r4(x: Double) = math.round(x * 1e4) / 1e4
    assert(r.getLong(1) === 20)
    assert(r.getDouble(2) === r4(mu))
    assert(r.getDouble(3) === r4(beta))
    // longer horizons demand higher capacity
    assert(r.getDouble(5) > r.getDouble(4))
    assert(r.getDouble(4) > r.getDouble(2))
  }
}