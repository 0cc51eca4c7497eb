package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{IsotonicRegression, IsotonicRegressionModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (PAV) probability calibration — the model-side completion
  * of q217's calibration MEASUREMENT: q217 reports the reliability gap,
  * this learns the monotone map that closes it. Distributed PAV is one
  * of the few classically-sequential algorithms with a clean parallel
  * form, and `spark.ml`'s IsotonicRegression implements it (pool
  * adjacent violators per partition, then merge boundary violations) —
  * so the fit is a genuine cluster-scale operation, not a driver-side
  * sort: preference order (a) of the builder contract, nothing custom
  * needed. No RNG anywhere — PAV is deterministic given (score, label)
  * pairs — so MlSpec pins exact pooled values, not just shapes
  * (the M1–M9 spec-pin precedent, but tighter).
  */
object Calibrate {

  /** Fit score → P(label) with the monotone-increasing constraint.
    * Expects (scoreCol: numeric, labelCol: 0/1 numeric). */
  def fitIsotonic(df: DataFrame, scoreCol: String = "s",
                  labelCol: String = "y"): IsotonicRegressionModel =
    new IsotonicRegression()
      .setFeaturesCol("__iso_feat")
      .setLabelCol(labelCol)
      .setPredictionCol("s_cal")
      .fit(new VectorAssembler().setInputCols(Array(scoreCol))
        .setOutputCol("__iso_feat")
        .transform(df.select(col(scoreCol).cast("double").as(scoreCol),
          col(labelCol).cast("double").as(labelCol))))

  /** Apply a fitted calibrator: adds `s_cal` (the calibrated
    * probability) next to the raw score. */
  def apply(model: IsotonicRegressionModel, df: DataFrame,
            scoreCol: String = "s"): DataFrame =
    model.transform(new VectorAssembler().setInputCols(Array(scoreCol))
        .setOutputCol("__iso_feat")
        .transform(df.withColumn(scoreCol, col(scoreCol).cast("double"))))
      .drop("__iso_feat")
}
