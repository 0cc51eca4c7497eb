package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Tables._

/** Causal-inference estimators — the observational half the
  * experimentation wave (q239 CUPED, q240 mSPRT) leaves open: when
  * assignment isn't randomized, the raw arm difference confounds.
  * Difference-in-differences (each unit as its own control across a
  * cutoff) and covariate adjustment (stratified direct adjustment +
  * inverse-propensity weighting with Laplace-smoothed cell
  * propensities). The reference's evaluation never goes beyond raw
  * differences (music.md:377-387); an engine reporting lift on
  * logged data needs the corrected estimators.
  *
  * Scale design: q258 reduces to the per-(type, user) delta table
  * (q239's exact per-user frame, rounded 2dp before arithmetic so
  * both engines fold identical doubles) — one shuffle, then scalar
  * moments per type. q259 reduces to a per-(flag, cell) histogram of
  * counts and sums — the estimator arithmetic runs entirely on that
  * ≤|flags|×|cells| table. No windows, no joins past broadcast
  * attaches.
  */
object CausalQueries {

  def queries: Seq[GraftQuery] = Seq(q258DiffInDiff, q259IpwAte)

  /** Difference-in-differences per event type: per-user pre/post value
    * sums around the 2024-01-15 cutoff (zero-filled; q239's frame),
    * per-user delta d = post − pre, DiD = mean(d | arm 0) −
    * mean(d | arm 1) with the Welch SE over deltas — algebraically
    * the interaction coefficient of the 2×2 panel regression, but
    * computed as a two-sample test on deltas (each user is their own
    * control, which is the method's entire point). `pre_diff` reports
    * the pre-period imbalance the naive post comparison would absorb.
    */
  val q258DiffInDiff = GraftQuery(
    "q258_diff_in_diff",
    "difference-in-differences per event type: per-user deltas, Welch SE, t",
    Some("""WITH u AS (
        SELECT event_type, user_id, user_id % 2 AS arm,
          ROUND(SUM(CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
            THEN value ELSE 0 END), 2) AS pre,
          ROUND(SUM(CASE WHEN CAST(ts AS DATE) > DATE '2024-01-15'
            THEN value ELSE 0 END), 2) AS post
        FROM events GROUP BY 1, 2),
      d AS (SELECT event_type, arm, pre, post - pre AS delta FROM u),
      s AS (
        SELECT event_type,
          COUNT(CASE WHEN arm = 0 THEN 1 END) AS n_t,
          COUNT(CASE WHEN arm = 1 THEN 1 END) AS n_c,
          AVG(CASE WHEN arm = 0 THEN pre END)
            - AVG(CASE WHEN arm = 1 THEN pre END) AS pre_diff,
          AVG(CASE WHEN arm = 0 THEN delta END)
            - AVG(CASE WHEN arm = 1 THEN delta END) AS did,
          var_samp(CASE WHEN arm = 0 THEN delta END) AS v_t,
          var_samp(CASE WHEN arm = 1 THEN delta END) AS v_c
        FROM d GROUP BY 1)
      SELECT event_type, CAST(n_t AS BIGINT) AS n_t,
        CAST(n_c AS BIGINT) AS n_c,
        ROUND(pre_diff, 4) AS pre_diff, ROUND(did, 4) AS did,
        ROUND(sqrt(v_t / n_t + v_c / n_c), 4) AS se,
        ROUND(did / sqrt(v_t / n_t + v_c / n_c), 4) AS t
      FROM s ORDER BY 1"""),
    (s, d) => diffInDiff(events(s, d), lit("2024-01-15")))

  /** The q258 pipeline — CausalSpec plants a treatment-only shift on
    * top of a shared trend and pins that DiD recovers the shift while
    * the naive post difference absorbs trend + baseline imbalance. */
  def diffInDiff(ev: DataFrame, cutoff: Column): DataFrame = {
    val u = ev.groupBy(col("event_type"), col("user_id"))
      .agg(
        round(sum(when(to_date(col("ts")) <= to_date(cutoff),
          col("value")).otherwise(0)), 2).as("pre"),
        round(sum(when(to_date(col("ts")) > to_date(cutoff),
          col("value")).otherwise(0)), 2).as("post"))
      .withColumn("arm", col("user_id") % 2)
      .withColumn("delta", col("post") - col("pre"))
    u.groupBy(col("event_type"))
      .agg(
        count(when(col("arm") === 0, 1)).as("n_t"),
        count(when(col("arm") === 1, 1)).as("n_c"),
        (avg(when(col("arm") === 0, col("pre")))
          - avg(when(col("arm") === 1, col("pre")))).as("pre_diff"),
        (avg(when(col("arm") === 0, col("delta")))
          - avg(when(col("arm") === 1, col("delta")))).as("did"),
        var_samp(when(col("arm") === 0, col("delta"))).as("v_t"),
        var_samp(when(col("arm") === 1, col("delta"))).as("v_c"))
      .select(col("event_type"), col("n_t").cast("long").as("n_t"),
        col("n_c").cast("long").as("n_c"),
        round(col("pre_diff"), 4).as("pre_diff"),
        round(col("did"), 4).as("did"),
        round(sqrt(col("v_t") / col("n_t") + col("v_c") / col("n_c")), 4)
          .as("se"),
        round(col("did")
          / sqrt(col("v_t") / col("n_t") + col("v_c") / col("n_c")), 4)
          .as("t"))
      .orderBy(col("event_type"))
  }

  /** Covariate-adjusted treatment effect of high discount
    * (l_discount ≥ 0.05) on extended price per return flag, with
    * l_quantity as the discrete confounder: the naive arm difference,
    * the stratified direct-adjustment ATE Σ (n_cell/N)(ȳ₁ − ȳ₀), and
    * IPW with Laplace-smoothed propensities ê = (n₁+1)/(n+2) (with
    * RAW empirical cell propensities IPW and stratification coincide
    * algebraically — smoothing is what tames extreme weights and is
    * why the two columns differ). Cells lacking either arm are
    * excluded everywhere (positivity), and their dropped row count is
    * reported. Everything past the one histogram pass is arithmetic
    * on the ≤|flags|×50 cell table.
    */
  val q259IpwAte = GraftQuery(
    "q259_ipw_ate",
    "stratified + smoothed-IPW ATE of high discount on price (quantity-adjusted)",
    Some("""WITH c AS (
        SELECT l_returnflag AS flag, l_quantity AS cell,
          COUNT(*) AS n,
          SUM(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS n1,
          SUM(CASE WHEN l_discount >= 0.05 THEN l_extendedprice
            ELSE 0 END) AS s1,
          SUM(CASE WHEN l_discount < 0.05 THEN l_extendedprice
            ELSE 0 END) AS s0
        FROM lineitem GROUP BY 1, 2),
      k AS (SELECT * FROM c WHERE n1 > 0 AND n1 < n),
      s AS (
        SELECT flag, SUM(n) AS nk,
          SUM(CAST(s1 AS DOUBLE)) / SUM(n1) - SUM(CAST(s0 AS DOUBLE)) / SUM(n - n1)
            AS naive,
          SUM(n * (s1 / (n1 * 1.0) - s0 / ((n - n1) * 1.0))) AS strat_num,
          SUM(s1 / ((n1 + 1.0) / (n + 2.0))
            - s0 / (1 - (n1 + 1.0) / (n + 2.0))) AS ipw_num
        FROM k GROUP BY 1),
      dropped AS (
        SELECT flag, COALESCE(SUM(CASE WHEN n1 = 0 OR n1 = n
          THEN n ELSE 0 END), 0) AS n_dropped
        FROM c GROUP BY 1)
      SELECT s.flag AS l_returnflag, CAST(nk AS BIGINT) AS n_kept,
        CAST(n_dropped AS BIGINT) AS n_dropped,
        ROUND(naive, 4) AS naive_diff,
        ROUND(strat_num / nk, 4) AS stratified_ate,
        ROUND(ipw_num / nk, 4) AS ipw_ate
      FROM s JOIN dropped ON s.flag = dropped.flag ORDER BY 1"""),
    (s, d) => ipwAte(lineitem(s, d)))

  /** The q259 pipeline — CausalSpec plants a confounded regime (cell
    * drives both treatment uptake and outcome; true effect 0) and
    * pins that the naive difference is fooled while stratification
    * lands on 0 exactly. */
  def ipwAte(li: DataFrame): DataFrame = {
    val treated = col("l_discount") >= 0.05
    val c = li.groupBy(col("l_returnflag").as("flag"),
        col("l_quantity").as("cell"))
      .agg(count(lit(1)).as("n"),
        sum(when(treated, 1).otherwise(0)).as("n1"),
        sum(when(treated, col("l_extendedprice")).otherwise(0)).as("s1"),
        sum(when(!treated, col("l_extendedprice")).otherwise(0)).as("s0"))
      .localCheckpoint(false) // feeds the kept estimators AND the drop count
    val k = c.filter(col("n1") > 0 && col("n1") < col("n"))
    val e = (col("n1") + 1.0) / (col("n") + 2.0)
    val s = k.groupBy(col("flag"))
      .agg(sum(col("n")).as("nk"),
        (sum(col("s1").cast("double")) / sum(col("n1"))
          - sum(col("s0").cast("double")) / sum(col("n") - col("n1")))
          .as("naive"),
        sum(col("n") * (col("s1") / (col("n1") * lit(1.0))
          - col("s0") / ((col("n") - col("n1")) * lit(1.0))))
          .as("strat_num"),
        sum(col("s1") / e - col("s0") / (lit(1) - e)).as("ipw_num"))
    val dropped = c.groupBy(col("flag"))
      .agg(coalesce(sum(when(col("n1") === 0 || col("n1") === col("n"),
        col("n")).otherwise(0)), lit(0L)).as("n_dropped"))
    s.join(dropped, Seq("flag"))
      .select(col("flag").as("l_returnflag"),
        col("nk").cast("long").as("n_kept"),
        col("n_dropped").cast("long").as("n_dropped"),
        round(col("naive"), 4).as("naive_diff"),
        round(col("strat_num") / col("nk"), 4).as("stratified_ate"),
        round(col("ipw_num") / col("nk"), 4).as("ipw_ate"))
      .orderBy(col("l_returnflag"))
  }
}
