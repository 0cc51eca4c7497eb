package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Tables._

/** Experimentation wave: the two operators that turn q124's one-shot
  * Welch t-test into how A/B testing is actually run — CUPED variance
  * reduction (pre-period covariate adjustment; the standard trick that
  * buys 30-60% smaller CIs for free) and the mSPRT always-valid
  * sequential test (peek every day without alpha-spending; the
  * always-valid p is a running minimum, monotone by construction).
  * The reference's probe-style evaluation (music.md:377-387) never
  * reaches either; a pipeline shipping models behind experiments
  * needs both.
  *
  * Shared design rule: everything is computed from per-unit or
  * per-day GROUP SUMS — per-user period sums rounded 2dp first (the
  * q226 convention) so both engines fold identical doubles; the
  * moment/LR arithmetic runs over user- or day-bounded tables, never
  * event rows past the first shuffle.
  */
object ExperimentQueries {

  def queries: Seq[GraftQuery] = Seq(q239Cuped, q240Msprt, q263Power,
    q280BhFdr)

  /** CUPED per event type: units are users, arm = user_id % 2 (the
    * q124 assignment), metric y = post-period (days 16+) per-user
    * value sum, covariate x = pre-period (days ≤ 15) sum, zero-filled
    * for users absent in the pre window (the §1.3 zero-fill quirk
    * applied where it belongs). θ = cov(x,y)/var(x) POOLED across
    * arms (the unbiased-under-the-null choice — per-arm θ leaks the
    * treatment into the adjustment), y' = y − θ(x − x̄). Reported:
    * raw and adjusted mean diffs (they differ only by pre-period
    * imbalance), θ, and the variance-reduction fraction ≈ ρ² that is
    * the method's whole sales pitch. Two passes over the per-user
    * table (θ, then adjusted moments), both broadcast-joined scalars.
    */
  val q239Cuped = GraftQuery(
    "q239_cuped",
    "CUPED pre-period adjustment per event type: theta, adjusted diff, variance reduction",
    Some("""WITH u AS (
        SELECT event_type, user_id, user_id % 2 AS arm,
          ROUND(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
            THEN value ELSE 0 END), 2) AS x,
          ROUND(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
            THEN value ELSE 0 END), 2) AS y
        FROM events GROUP BY 1, 2),
      th AS (
        SELECT event_type, covar_samp(x, y) / var_samp(x) AS theta,
          AVG(x) AS xbar
        FROM u GROUP BY 1),
      adj AS (
        SELECT u.event_type, arm, y,
          y - th.theta * (x - th.xbar) AS ya
        FROM u JOIN th ON u.event_type = th.event_type),
      s AS (
        SELECT adj.event_type,
          COUNT(CASE WHEN arm = 0 THEN 1 END) AS n_a,
          COUNT(CASE WHEN arm = 1 THEN 1 END) AS n_b,
          AVG(CASE WHEN arm = 0 THEN y END)
            - AVG(CASE WHEN arm = 1 THEN y END) AS raw_diff,
          AVG(CASE WHEN arm = 0 THEN ya END)
            - AVG(CASE WHEN arm = 1 THEN ya END) AS cuped_diff,
          var_samp(y) AS vy, var_samp(ya) AS vya
        FROM adj GROUP BY 1)
      SELECT s.event_type, CAST(n_a AS BIGINT) AS n_a,
        CAST(n_b AS BIGINT) AS n_b,
        ROUND(th.theta, 4) AS theta,
        ROUND(raw_diff, 4) AS raw_diff,
        ROUND(cuped_diff, 4) AS cuped_diff,
        ROUND(1 - vya / vy, 4) AS var_reduction
      FROM s JOIN th ON s.event_type = th.event_type ORDER BY 1"""),
    (s, d) => cuped(events(s, d), lit("2024-01-15")))

  /** The q239 pipeline over any (event_type, user_id, ts, value)
    * frame — ExperimentSpec hand-traces θ and pins the
    * perfect-covariate limit (x = y → var_reduction → 1). */
  def cuped(ev: DataFrame, cutoff: org.apache.spark.sql.Column)
      : DataFrame = {
    val u = ev
      .groupBy(col("event_type"), col("user_id"))
      .agg(
        round(sum(when(to_date(col("ts")) <= to_date(cutoff),
          col("value")).otherwise(0)), 2).as("x"),
        round(sum(when(to_date(col("ts")) > to_date(cutoff),
          col("value")).otherwise(0)), 2).as("y"))
      .withColumn("arm", col("user_id") % 2)
      .localCheckpoint(false) // feeds theta AND the adjusted moments
    val th = u.groupBy(col("event_type"))
      .agg((covar_samp(col("x"), col("y")) / var_samp(col("x")))
        .as("theta"), avg(col("x")).as("xbar"))
    val adj = u.join(broadcast(th), Seq("event_type"))
      .select(col("event_type"), col("arm"), col("y"),
        (col("y") - col("theta") * (col("x") - col("xbar"))).as("ya"))
    adj.groupBy(col("event_type"))
      .agg(
        count(when(col("arm") === 0, 1)).as("n_a"),
        count(when(col("arm") === 1, 1)).as("n_b"),
        (avg(when(col("arm") === 0, col("y")))
          - avg(when(col("arm") === 1, col("y")))).as("raw_diff"),
        (avg(when(col("arm") === 0, col("ya")))
          - avg(when(col("arm") === 1, col("ya")))).as("cuped_diff"),
        var_samp(col("y")).as("vy"), var_samp(col("ya")).as("vya"))
      .join(broadcast(th), Seq("event_type"))
      .select(col("event_type"), col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"),
        round(col("theta"), 4).as("theta"),
        round(col("raw_diff"), 4).as("raw_diff"),
        round(col("cuped_diff"), 4).as("cuped_diff"),
        round(lit(1) - col("vya") / col("vy"), 4).as("var_reduction"))
      .orderBy(col("event_type"))
  }

  /** mSPRT always-valid sequential test (normal mixture, τ² = 1) per
    * event type: for every day t, the cumulative per-arm counts/sums/
    * sum-of-squares give Welch-style Δ_t and V_t, the mixture
    * likelihood ratio in LOG form
    *   ln Λ_t = ½·ln(V/(V+τ²)) + Δ²τ² / (2V(V+τ²))
    * (log form so a decisive experiment saturates to p = 0 instead of
    * overflowing Λ), and the always-valid p_t = min_{s≤t} 1/Λ_s —
    * a running min, so peeking any day is licensed. Cumulative sums
    * and the running min are windows over the DAILY (type, arm) table
    * — calendar-bounded (q122/q201 argument); the corpus crosses one
    * (type, arm, day) shuffle.
    */
  val q240Msprt = GraftQuery(
    "q240_msprt",
    "mSPRT always-valid sequential A/B test (τ²=1) over cumulative daily sums",
    Some("""WITH daily AS (
        SELECT event_type, user_id % 2 AS arm, CAST(ts AS DATE) AS ds,
          COUNT(*) AS n, ROUND(SUM(value), 2) AS s1,
          ROUND(SUM(value * value), 2) AS s2
        FROM events GROUP BY 1, 2, 3),
      cum AS (
        SELECT event_type, arm, ds,
          SUM(n) OVER w AS cn, SUM(s1) OVER w AS cs1, SUM(s2) OVER w AS cs2
        FROM daily
        WINDOW w AS (PARTITION BY event_type, arm ORDER BY ds)),
      wide AS (
        SELECT a.event_type, a.ds,
          a.cn AS n_a, b.cn AS n_b,
          a.cs1 / a.cn - b.cs1 / b.cn AS delta,
          ((a.cs2 - a.cs1 * a.cs1 / a.cn) / (a.cn - 1)) / a.cn
            + ((b.cs2 - b.cs1 * b.cs1 / b.cn) / (b.cn - 1)) / b.cn AS v
        FROM cum a JOIN cum b
          ON a.event_type = b.event_type AND a.ds = b.ds
          AND a.arm = 0 AND b.arm = 1
        WHERE a.cn >= 2 AND b.cn >= 2),
      lr AS (
        SELECT event_type, ds, n_a, n_b, delta,
          0.5 * ln(v / (v + 1)) + delta * delta / (2 * v * (v + 1))
            AS log_lambda
        FROM wide),
      av AS (
        SELECT event_type, ds, n_a, n_b, delta, log_lambda,
          MIN(CASE WHEN log_lambda > 700 THEN 0.0
            ELSE LEAST(1.0, exp(-log_lambda)) END)
            OVER (PARTITION BY event_type ORDER BY ds) AS p
        FROM lr)
      SELECT event_type, ds, CAST(n_a AS BIGINT) AS n_a,
        CAST(n_b AS BIGINT) AS n_b, ROUND(delta, 4) AS delta,
        ROUND(log_lambda, 4) AS log_lambda, ROUND(p, 6) AS p,
        CAST(CASE WHEN p < 0.05 THEN 1 ELSE 0 END AS INTEGER) AS reject
      FROM av ORDER BY 1, 2"""),
    (s, d) => msprt(events(s, d)))

  /** The q240 pipeline over any (event_type, user_id, ts, value)
    * frame — ExperimentSpec pins p-monotonicity, the null staying
    * un-rejected, and a planted arm effect driving p to rejection. */
  def msprt(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("event_type"), (col("user_id") % 2).as("arm"),
        to_date(col("ts")).as("ds"), col("value"))
      .groupBy(col("event_type"), col("arm"), col("ds"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s1"),
        round(sum(col("value") * col("value")), 2).as("s2"))
    val w = Window.partitionBy(col("event_type"), col("arm"))
      .orderBy(col("ds"))
    val cum = daily.select(col("event_type"), col("arm"), col("ds"),
      sum(col("n")).over(w).as("cn"), sum(col("s1")).over(w).as("cs1"),
      sum(col("s2")).over(w).as("cs2"))
      .localCheckpoint(false) // feeds both arm sides of the day join
    val a = cum.where(col("arm") === 0)
      .select(col("event_type"), col("ds"), col("cn").as("na"),
        col("cs1").as("sa1"), col("cs2").as("sa2"))
    val b = cum.where(col("arm") === 1)
      .select(col("event_type"), col("ds"), col("cn").as("nb"),
        col("cs1").as("sb1"), col("cs2").as("sb2"))
    val wide = a.join(b, Seq("event_type", "ds"))
      .where(col("na") >= 2 && col("nb") >= 2)
      .select(col("event_type"), col("ds"), col("na"), col("nb"),
        (col("sa1") / col("na") - col("sb1") / col("nb")).as("delta"),
        (((col("sa2") - col("sa1") * col("sa1") / col("na"))
          / (col("na") - 1)) / col("na")
          + ((col("sb2") - col("sb1") * col("sb1") / col("nb"))
            / (col("nb") - 1)) / col("nb")).as("v"))
    val lr = wide.select(col("event_type"), col("ds"), col("na"),
      col("nb"), col("delta"),
      (lit(0.5) * log(col("v") / (col("v") + 1))
        + col("delta") * col("delta")
          / (lit(2) * col("v") * (col("v") + 1))).as("log_lambda"))
    val pw = Window.partitionBy(col("event_type")).orderBy(col("ds"))
    lr.select(col("event_type"), col("ds"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(col("delta"), 4).as("delta"),
        round(col("log_lambda"), 4).as("log_lambda"),
        min(when(col("log_lambda") > 700, 0.0)
          .otherwise(least(lit(1.0), exp(-col("log_lambda")))))
          .over(pw).as("p0"))
      .select(col("event_type"), col("ds"), col("n_a"), col("n_b"),
        col("delta"), col("log_lambda"), round(col("p0"), 6).as("p"),
        (col("p0") < 0.05).cast("int").as("reject"))
      .orderBy(col("event_type"), col("ds"))
  }

  /** Experiment power analysis per event type: from the observed
    * per-user metric moments (mean μ, variance σ² of 2dp-rounded user
    * sums — q239's unit), the two-sided-α=0.05 / power=0.8 sample
    * size per arm for a grid of relative MDEs:
    *   n = ⌈2σ²(z_{.975} + z_{.8})² / (μ·mde)²⌉
    * with the normal quantiles as shared literal constants
    * (1.959963985, 0.8416212336). `x_current` says how many times the
    * current per-arm sample the experiment needs — the go/no-go
    * number a platform shows before anyone launches an A/B test.
    * One per-user shuffle; the grid is a 3-element literal explode.
    */
  val q263Power = GraftQuery(
    "q263_power",
    "A/B sample-size per arm at α=0.05/power=0.8 for a 5/10/20% MDE grid",
    Some("""WITH u AS (
        SELECT event_type, user_id, ROUND(SUM(value), 2) AS y
        FROM events GROUP BY 1, 2),
      m AS (
        SELECT event_type, COUNT(*) * 1.0 AS n_users,
          AVG(y) AS mu, var_samp(y) AS s2
        FROM u GROUP BY 1),
      g AS (SELECT m.*, unnest([0.05, 0.10, 0.20]::DOUBLE[]) AS mde
            FROM m),
      p AS (
        SELECT event_type, mde, n_users, mu, s2,
          CAST(CEIL(2 * s2 * POW(1.959963985 + 0.8416212336, 2)
            / POW(mu * mde, 2)) AS BIGINT) AS n_per_arm
        FROM g)
      SELECT event_type, mde, ROUND(mu, 4) AS mu,
        ROUND(sqrt(s2), 4) AS sigma, n_per_arm,
        ROUND(n_per_arm / (n_users / 2), 4) AS x_current
      FROM p ORDER BY 1, 2"""),
    (s, d) => power(events(s, d), Seq(0.05, 0.10, 0.20)))

  /** The q263 pipeline — ExperimentSpec pins the closed form on a
    * two-point distribution and the 1/mde² scaling law. */
  def power(ev: DataFrame, mdes: Seq[Double]): DataFrame = {
    val u = ev.groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 2).as("y"))
    val m = u.groupBy(col("event_type"))
      .agg((count(lit(1)) * lit(1.0)).as("n_users"),
        avg(col("y")).as("mu"), var_samp(col("y")).as("s2"))
    val zsum = lit(1.959963985) + lit(0.8416212336)
    m.select(col("*"), explode(array(mdes.map(lit): _*)).as("mde"))
      .withColumn("n_per_arm",
        ceil(lit(2) * col("s2") * pow(zsum, 2)
          / pow(col("mu") * col("mde"), 2)).cast("long"))
      .select(col("event_type"), col("mde"), round(col("mu"), 4).as("mu"),
        round(sqrt(col("s2")), 4).as("sigma"), col("n_per_arm"),
        round(col("n_per_arm") / (col("n_users") / 2), 4).as("x_current"))
      .orderBy(col("event_type"), col("mde"))
  }

  /** Benjamini–Hochberg FDR screening over the per-(type, day) arm
    * z-tests — the multiple-testing correction an experiment platform
    * applies before anyone reads 150 daily test rows as discoveries:
    * Welch z per (event_type, day), two-sided p via the
    * Abramowitz–Stegun 7.1.26 normal-CDF polynomial (written
    * token-identically in both engines — no erf dependency), then the
    * BH step-up at q = 0.05 across the WHOLE family (rank p
    * ascending, reject ranks ≤ k* = max{i : p_(i) ≤ i·q/m}),
    * reported per type next to the naive p<0.05 count and
    * Bonferroni's p<q/m count. The global rank/threshold windows run
    * over the hypothesis table — |types|×|days|, calendar-bounded
    * (registered). On the null fixture all three columns stay ≈ 0;
    * the spec plants effect days BH recovers while Bonferroni's
    * conservatism shows.
    */
  val q280BhFdr = GraftQuery(
    "q280_bh_fdr",
    "BH/Bonferroni/naive discovery counts over per-(type, day) arm z-tests",
    Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS ds, user_id % 2 AS arm,
          COUNT(*) AS n, ROUND(SUM(value), 2) AS s1,
          ROUND(SUM(value * value), 2) AS s2
        FROM events GROUP BY 1, 2, 3),
      wide AS (
        SELECT a.event_type, a.ds,
          (a.s1 / a.n - b.s1 / b.n)
            / sqrt(((a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1)) / a.n
              + ((b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1)) / b.n) AS z
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.ds = b.ds
          AND a.arm = 0 AND b.arm = 1
        WHERE a.n >= 2 AND b.n >= 2),
      pv AS (
        SELECT event_type, ds,
          2 * (exp(-abs(z) * abs(z) / 2) / sqrt(2 * pi())
            * (0.319381530 * (1 / (1 + 0.2316419 * abs(z)))
              - 0.356563782 * pow(1 / (1 + 0.2316419 * abs(z)), 2)
              + 1.781477937 * pow(1 / (1 + 0.2316419 * abs(z)), 3)
              - 1.821255978 * pow(1 / (1 + 0.2316419 * abs(z)), 4)
              + 1.330274429 * pow(1 / (1 + 0.2316419 * abs(z)), 5)))
            AS p
        FROM wide),
      rk AS (
        SELECT event_type, ds, p,
          ROW_NUMBER() OVER (ORDER BY p, event_type, ds) AS r,
          COUNT(*) OVER () AS m
        FROM pv),
      kstar AS (
        SELECT *, MAX(CASE WHEN p <= r * 0.05 / m THEN r END) OVER ()
          AS ks
        FROM rk)
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_tests,
        CAST(SUM(CASE WHEN p < 0.05 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_naive,
        CAST(SUM(CASE WHEN p < 0.05 / m THEN 1 ELSE 0 END) AS BIGINT)
          AS n_bonferroni,
        CAST(SUM(CASE WHEN ks IS NOT NULL AND r <= ks
          THEN 1 ELSE 0 END) AS BIGINT) AS n_bh,
        ROUND(MIN(p), 6) AS min_p
      FROM kstar GROUP BY 1 ORDER BY 1"""),
    (s, d) => bhFdr(events(s, d)))

  /** The q280 pipeline — ExperimentSpec plants effect days and pins
    * BH recovering them at controlled FDR while Bonferroni stays
    * conservative and the null family reports zero discoveries. */
  def bhFdr(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("event_type"), (col("user_id") % 2).as("arm"),
        to_date(col("ts")).as("ds"), col("value"))
      .groupBy(col("event_type"), col("arm"), col("ds"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("s1"),
        round(sum(col("value") * col("value")), 2).as("s2"))
      .localCheckpoint(false) // feeds both arm sides of the day join
    val a = daily.where(col("arm") === 0)
      .select(col("event_type"), col("ds"), col("n").as("na"),
        col("s1").as("sa1"), col("s2").as("sa2"))
    val b = daily.where(col("arm") === 1)
      .select(col("event_type"), col("ds"), col("n").as("nb"),
        col("s1").as("sb1"), col("s2").as("sb2"))
    val z = (col("sa1") / col("na") - col("sb1") / col("nb")) /
      sqrt(((col("sa2") - col("sa1") * col("sa1") / col("na"))
        / (col("na") - 1)) / col("na")
        + ((col("sb2") - col("sb1") * col("sb1") / col("nb"))
          / (col("nb") - 1)) / col("nb"))
    val az = abs(col("z"))
    val t = lit(1) / (lit(1) + lit(0.2316419) * az)
    val p = lit(2) * (exp(-az * az / 2) / sqrt(lit(2) * lit(math.Pi))
      * (lit(0.319381530) * t - lit(0.356563782) * pow(t, 2)
        + lit(1.781477937) * pow(t, 3) - lit(1.821255978) * pow(t, 4)
        + lit(1.330274429) * pow(t, 5)))
    val pv = a.join(b, Seq("event_type", "ds"))
      .where(col("na") >= 2 && col("nb") >= 2)
      .withColumn("z", z)
      .select(col("event_type"), col("ds"), p.as("p"))
    val wr = Window.orderBy(col("p"), col("event_type"), col("ds"))
    val wAll = Window.partitionBy()
    val rk = pv.select(col("event_type"), col("ds"), col("p"),
      row_number().over(wr).as("r"), count(lit(1)).over(wAll).as("m"))
    val kstar = rk.withColumn("ks",
      max(when(col("p") <= col("r") * 0.05 / col("m"), col("r")))
        .over(wAll))
    kstar.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_tests"),
        sum(when(col("p") < 0.05, 1).otherwise(0)).as("n_naive"),
        sum(when(col("p") < lit(0.05) / col("m"), 1).otherwise(0))
          .as("n_bonferroni"),
        sum(when(col("ks").isNotNull && col("r") <= col("ks"), 1)
          .otherwise(0)).as("n_bh"),
        round(min(col("p")), 6).as("min_p"))
      .select(col("event_type"), col("n_tests").cast("long").as("n_tests"),
        col("n_naive").cast("long").as("n_naive"),
        col("n_bonferroni").cast("long").as("n_bonferroni"),
        col("n_bh").cast("long").as("n_bh"), col("min_p"))
      .orderBy(col("event_type"))
  }
}
