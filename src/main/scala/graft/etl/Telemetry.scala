package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Scan-free pipeline telemetry via Spark's Observation API: named
  * aggregate metrics ride INSIDE an existing action's plan (an
  * `CollectMetrics` node evaluated as rows stream by), so a quality
  * gate costs zero extra scans — the production alternative to
  * re-counting a 100 TB input once per metric. The reference's
  * notebooks eyeball interim counts between stages (流行音乐趋势预测.md
  * cell boundaries); this is that feedback loop as an operator, priced
  * for scale.
  *
  * Usage: `val (df2, obs) = Telemetry.observeQuality(df, "ingest",
  * Seq("value"))`; run any ONE action on `df2` (write, count, …);
  * `obs.get` then yields the metrics map without touching the data
  * again.
  */
object Telemetry {

  /** Attach a named quality observation to `df`: row count, per-column
    * null counts, and per-numeric-column min/max/sum. Returns the
    * instrumented frame (plan-identical rows) and the Observation to
    * read after one action completes. */
  def observeQuality(df: DataFrame, name: String, numericCols: Seq[String])
      : (DataFrame, Observation) = {
    val obs = Observation(name)
    val base: Seq[Column] = Seq(count(lit(1)).as("n_rows")) ++
      df.columns.toSeq.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"n_null_$c"))
    val numeric: Seq[Column] = numericCols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      sum(col(c)).as(s"sum_$c")))
    val all = base ++ numeric
    (df.observe(obs, all.head, all.tail: _*), obs)
  }

  /** A batch quality GATE on observed metrics: fail fast (throw) when
    * the completed action's observation violates `maxNullFraction` on
    * any watched column. Returns the metrics for reporting. The check
    * runs on the driver against the handful of observed scalars —
    * the data itself is never re-read. */
  def assertQuality(obs: Observation, watched: Seq[String],
                    maxNullFraction: Double): Map[String, Any] = {
    val m = obs.get
    val n = m("n_rows").asInstanceOf[Long]
    watched.foreach { c =>
      val nulls = m(s"n_null_$c").asInstanceOf[Long]
      val frac = if (n == 0) 0.0 else nulls.toDouble / n
      require(frac <= maxNullFraction,
        f"quality gate: $c null fraction $frac%.4f exceeds $maxNullFraction")
    }
    m
  }
}
