package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Hand traces for the model-evaluation wave (EvalQueries) — the
  * arithmetic conventions the fixture oracle can't isolate: ECE's
  * bin-weighting, the sum-form Brier identity, conformal's
  * ⌈0.9(n+1)⌉ rank (including the k > n clamp), and MASE's gap-exact
  * lag joins.
  */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("calibration: hand ECE and Brier on two bins") {
    // bin 1: s=0.15,0.15 y=1,0  → conf .15, acc .5, gap .35
    // bin 8: s=0.85,0.85 y=1,1  → conf .85, acc 1,  gap .15
    // ECE = (2/4)*.35 + (2/4)*.15 = .25
    // Brier = ((.15-1)² + .15² + (.85-1)² + (.85-1)²)/4
    //       = (.7225 + .0225 + .0225 + .0225)/4 = .1975
    val base = Seq((0.15, 1), (0.15, 0), (0.85, 1), (0.85, 1)).toDF("s", "y")
    val rows = EvalQueries.calibration(base).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 8))
    val b1 = rows(0)
    assert(b1.getDouble(2) === 0.15) // conf
    assert(b1.getDouble(3) === 0.5)  // acc
    assert(b1.getDouble(4) === 0.35) // gap
    assert(b1.getDouble(5) === 0.25) // ece
    assert(b1.getDouble(6) === 0.1975) // brier (sum-form == row-form)
  }

  test("conformal: rank ⌈0.9(n+1)⌉ with the k > n_cal clamp") {
    // flag A: train mean = (100+200) div 2 = 150 cents
    // cal residuals (|cents-150|): 10,20,30,40,50 → n=5,
    //   k = ceil(0.9*6) = 6 > 5 → clamp → qhat = 50
    // test: residuals 45 (in), 60 (out) → coverage 0.5
    def r(flag: String, cents: Long, ok: Long, ln: Int, split: Int) =
      (flag, cents, ok, ln, split)
    val in = Seq(
      r("A", 100, 1, 1, 0), r("A", 200, 2, 1, 0),
      r("A", 160, 3, 1, 1), r("A", 170, 4, 1, 1), r("A", 180, 5, 1, 1),
      r("A", 190, 6, 1, 1), r("A", 200, 7, 1, 1),
      r("A", 195, 8, 1, 2), r("A", 210, 9, 1, 2))
      .toDF("flag", "cents", "ok", "ln", "split")
    val row = EvalQueries.conformal(in).collect().head
    assert(row.getLong(1) === 2L)   // n_train
    assert(row.getLong(2) === 5L)   // n_cal
    assert(row.getDouble(4) === 1.5)  // pred 150 cents
    assert(row.getDouble(5) === 0.5)  // qhat 50 cents (clamped to max)
    assert(row.getDouble(6) === 0.5)  // coverage

    // 9 cal points: k = ceil(0.9*10) = 9 → the 9th smallest, not max-1
    val in2 = Seq(
      r("B", 100, 1, 1, 0), r("B", 200, 2, 1, 0)) ++
      (1 to 9).map(i => r("B", 150 + 10L * i, 10L + i, 1, 1)) ++
      Seq(r("B", 235, 30, 1, 2), r("B", 245, 31, 1, 2))
    val row2 = EvalQueries.conformal(
      in2.toDF("flag", "cents", "ok", "ln", "split")).collect().head
    assert(row2.getDouble(5) === 0.9)  // 9th smallest residual = 90 cents
    assert(row2.getDouble(6) === 0.5)  // |235-150|=85 in, |245-150|=95 out
  }

  test("auc: midrank form equals the brute-force pairwise definition") {
    // pos scores {0.9, 0.7, 0.5}, neg {0.7, 0.3}: of the 6 pairs, 4
    // strictly ordered, 1 tie (0.7 vs 0.7 → half credit), 1 inverted
    // → AUC = 4.5/6 = 0.75 (fixture AUC is ≈0.5 — an honest null; the
    // discrimination semantics are pinned here instead)
    val base = Seq((0.9, 1), (0.7, 1), (0.5, 1), (0.7, 0), (0.3, 0))
      .toDF("s", "y")
    val row = EvalQueries.auc(base).collect().head
    assert(row.getLong(0) === 3L)
    assert(row.getLong(1) === 2L)
    assert(row.getDouble(2) === 0.75)
    assert(row.getDouble(3) === 0.5) // gini = 2·auc − 1
  }

  test("psi: zero on identical halves, large on a planted shift") {
    def ev(day: Int, v: Double) =
      ("x", java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), v)
    // identical value mix in both halves → p = q in every bin → PSI 0
    val same = ((1 to 10).map(d => ev(d, (d % 5).toDouble)) ++
      (16 to 25).map(d => ev(d, (d % 5).toDouble)))
      .toDF("event_type", "ts", "value")
    val psi0 = EvalQueries.psi(same).collect().head.getDouble(3)
    assert(psi0 === 0.0, s"identical halves psi $psi0")
    // second half shifted to the top of the range → PSI >> 0.25
    val shifted = ((1 to 10).map(d => ev(d, (d % 5).toDouble)) ++
      (16 to 25).map(d => ev(d, 100.0 + d)))
      .toDF("event_type", "ts", "value")
    val psi1 = EvalQueries.psi(shifted).collect().head.getDouble(3)
    assert(psi1 > 0.25, s"planted shift psi $psi1")
  }

  test("jackknife: hand leave-one-out ratios and the (k-1)/k factor") {
    // buckets (cents, qty): (10000, 10), (30000, 10):
    //   θ = 400/20 = 20 $/unit; loo = 30, 10; mean 20
    //   se = sqrt((2−1)/2 · (10² + 10²)) = 10 → CI 20 ± 19.6
    val in = Seq((0, 10000L, 10L), (1, 30000L, 10L))
      .toDF("bucket", "rev", "qty")
    val rows = EvalQueries.jackknifeRatio(in).collect()
    assert(rows.map(_.getDouble(2)).toSeq === Seq(30.0, 10.0))
    assert(rows.head.getDouble(3) === 20.0)  // theta
    assert(rows.head.getDouble(4) === 10.0)  // se
    assert(rows.head.getDouble(5) === 0.4)   // 20 − 19.6
    assert(rows.head.getDouble(6) === 39.6)  // 20 + 19.6
  }

  test("mad outliers: a planted spike crosses the Hampel fence, the base series doesn't") {
    def ev(day: Int, v: Double) =
      ("x", java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), v)
    val base = (1 to 15).map(d => ev(d, 100.0 + (d % 3))) // 100..102
    val calm = EvalQueries.madOutliers(
      base.toDF("event_type", "ts", "value")).collect().head
    assert(calm.getLong(4) === 0L)
    // day 16 at 10× the level: dev 900 >> 3·1.4826·MAD(≈1) → flagged
    val spiked = EvalQueries.madOutliers(
      (base :+ ev(16, 1000.0)).toDF("event_type", "ts", "value"))
      .collect().head
    assert(spiked.getLong(4) === 1L)
    assert(spiked.getDouble(2) === 101.0) // median barely moves (robust)
  }

  test("cv folds: LOO-sum predictor equals explicit out-of-fold retraining") {
    // one flag, folds 0/1 with cents {10, 20} / {40}:
    //   fold 0 trains on fold 1 → pred 40 → mse ((30²+20²)/2)/10⁴ = 0.065
    //   fold 1 trains on fold 0 → pred 15 → mse (25²/1)/10⁴ = 0.0625
    val in = Seq(("A", 10L, 0L), ("A", 20L, 0L), ("A", 40L, 1L))
      .toDF("flag", "cents", "fold")
    val rows = EvalQueries.cvFolds(in).collect()
    assert(rows.map(r => (r.getInt(0), r.getDouble(2))).toSeq ===
      Seq((0, 0.065), (1, 0.0625)))
    val mean = (0.065 + 0.0625) / 2
    assert(rows.head.getDouble(3) === math.rint(mean * 1e4) / 1e4)
  }

  test("learning curve: descends when small splits are genuinely noisy") {
    // flag A truth = 1000 cents; u<10 sees only one wild row (5000),
    // u<80 averages it away → held-out MAE must strictly improve
    val in = (Seq(("A", 5000L, 5L)) ++
      (0 until 60).map(i => ("A", 1000L, 10L + i)) ++
      (0 until 20).map(i => ("A", 1000L, 80L + i)))
      .toDF("flag", "cents", "u")
    val rows = EvalQueries.learningCurve(in).collect()
    val mae = rows.map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(mae(10) === 40.0)  // pred 5000, truth 1000 → 4000c = $40
    assert(mae(80) < 1.0, s"mae80 ${mae(80)}") // pred ≈ 1065.6 → $0.656
    assert(mae(10) > mae(20) && mae(20) > mae(40) && mae(40) > mae(80))
  }

  test("poisson bootstrap: weights match the Poisson(1) pmf and the CI brackets the point") {
    // the weight generator is the operator's statistical core: over
    // 200k draws the MINSTD-derived weights must match the exact
    // Poisson(1) pmf within binomial noise, and mean/var must sit at
    // 1. Rids are SPREAD like the fixture's orderkey·10+linenumber
    // keys (consecutive rids expose the congruential lattice — the
    // documented regime the generator is NOT used in).
    val in = (1L to 2000L).map(i => ("A", 100L + (i % 7), 1L, i * 104729L))
      .toDF("flag", "rev", "qty", "rid").localCheckpoint(true)
    val wt = in.select(col("rid"),
        explode(expr("sequence(0, 99)")).as("b"))
      .select(((col("rid") * 100 + col("b")) * 48271L % 2147483647L
        * 48271L % 2147483647L / 2147483647.0).as("u"))
      .select(
        when(col("u") < 0.36787944117144233, 0)
          .when(col("u") < 0.7357588823428847, 1)
          .when(col("u") < 0.9196986029286058, 2)
          .when(col("u") < 0.9810118431238462, 3)
          .when(col("u") < 0.9963401531726563, 4)
          .when(col("u") < 0.9994058151824183, 5)
          .when(col("u") < 0.9999167588507119, 6)
          .otherwise(7).as("w"))
      .localCheckpoint(true)
    val counts = wt.groupBy(col("w")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = 200000.0
    val pmf = Seq(0 -> 0.3679, 1 -> 0.3679, 2 -> 0.1839, 3 -> 0.0613)
    for ((k, p) <- pmf) {
      val got = counts(k) / n
      assert(math.abs(got - p) < 0.005, s"P(w=$k) $got vs $p")
    }
    val stats = wt.agg(avg(col("w")), variance(col("w"))).collect().head
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.01, s"mean ${stats.getDouble(0)}")
    assert(math.abs(stats.getDouble(1) - 1.0) < 0.03, s"var ${stats.getDouble(1)}")
    // and the full pipeline: CI must bracket the point estimate with
    // boot_mean ≈ point (rev/qty ≈ 103 cents → $1.03)
    val r = EvalQueries.poissonBootstrap(in, reps = 100).collect().head
    assert(r.getDouble(5) < r.getDouble(2) && r.getDouble(2) < r.getDouble(6),
      s"CI [${r.getDouble(5)}, ${r.getDouble(6)}] vs point ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - r.getDouble(2)) < 3 * r.getDouble(4))
  }

  test("mase: gap-exact lags and the ratio on a hand series") {
    // 9 consecutive days, values 10,20,10,20,10,20,10,20,10 → for the
    // two evaluable days (8,9): persistence errors |20-10|,|10-20| =
    // 10; seasonal (lag 7) errors |20-20|,|10-10| = 0... make seasonal
    // nonzero: day9 value 30: persist |30-20|=10, seasonal |30-10|=20
    val vals = Seq(10, 20, 10, 20, 10, 20, 10, 20, 30)
    val ev = vals.zipWithIndex.map { case (v, i) =>
      ("x", f"2024-01-${i + 1}%02d 12:00:00", v.toDouble)
    }.toDF("event_type", "ts", "value")
      .selectExpr("event_type", "cast(ts as timestamp) as ts", "value")
    val row = EvalQueries.mase(ev).collect().head
    assert(row.getLong(1) === 2L) // only days 8,9 have both lags
    assert(row.getDouble(2) === 10.0)          // persist MAE
    assert(row.getDouble(3) === 10.0)          // seasonal MAE (0+20)/2
    assert(row.getDouble(4) === 1.0)           // mase
    // gap-exactness: drop day 8 → day 9 loses its lag-1 row entirely
    // (date-shift join, NOT row-offset), leaving no evaluable day
    val gappy = ev.where("day(ts) <> 8")
    assert(EvalQueries.mase(gappy).collect().isEmpty)
  }
}
