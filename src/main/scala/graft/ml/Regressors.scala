package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorIndexer
import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression model surface — SURVEY.md §2.9 M3–M5, M10.
  *
  * Reference configs preserved as named constants; `maxIter` for GBT is
  * capped by default because 330 boosting rounds (ref
  * 流行音乐趋势预测.md:695) is a parity config, not a sane default
  * (SURVEY.md §7.4.4). All models are `spark.ml` estimators: fitting is
  * iterative distributed jobs, prediction is a DataFrame `transform`,
  * so nothing here collects to the driver.
  */
object Regressors {

  /** M3 — the reference's LinearRegressionWithSGD (10 000 iters, step
    * 1e-9, ref 流行音乐趋势预测.md:186-221) — SGD is gone in Spark 3+;
    * L-BFGS converges where SGD famously failed there.
    */
  def linear(featuresCol: String = "features", labelCol: String = "label"): LinearRegression =
    new LinearRegression()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setMaxIter(100).setRegParam(0.0)

  /** M4 — RandomForest.trainRegressor replica: 50 trees, depth 10,
    * bins 100, variance impurity (ref 流行音乐趋势预测.md:327-352). */
  def randomForest(featuresCol: String = "features", labelCol: String = "label",
                   seed: Long = 42L): RandomForestRegressor =
    new RandomForestRegressor()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setNumTrees(50).setMaxDepth(10).setMaxBins(100)
      .setImpurity("variance").setSeed(seed)

  /** Reference GBT boosting rounds (parity only — slow by construction). */
  val ReferenceGbtIters = 330

  /** M5 — GradientBoostedTrees replica: depth 5; iters default-capped
    * at 20 (ref config: 330, 流行音乐趋势预测.md:692-697). */
  def gbt(maxIter: Int = 20, featuresCol: String = "features",
          labelCol: String = "label", seed: Long = 42L): GBTRegressor =
    new GBTRegressor()
      .setFeaturesCol(featuresCol).setLabelCol(labelCol)
      .setMaxIter(maxIter).setMaxDepth(5).setSeed(seed)

  /** M5 categorical parity — the reference trains its GBDT with
    * `categoricalFeaturesInfo = {0:4, 1:8}`
    * (ref 流行音乐趋势预测.md:692-697,1016-1039), so splits on those
    * features are SUBSET splits, not threshold splits. spark.ml's
    * equivalent is a VectorIndexer stage: any feature with ≤
    * maxCategories distinct values is tagged categorical in the vector
    * metadata and the tree honors it. Plain [[gbt]] treats every
    * feature as continuous — wrong split semantics on enum features
    * (round-1 missing item #2).
    */
  def gbtWithCategoricals(maxCategories: Int = 8, maxIter: Int = 20,
                          maxDepth: Int = 5,
                          featuresCol: String = "features",
                          labelCol: String = "label",
                          seed: Long = 42L): Pipeline = {
    val indexer = new VectorIndexer()
      .setInputCol(featuresCol).setOutputCol("indexed_features")
      .setMaxCategories(maxCategories).setHandleInvalid("keep")
    val tree = new GBTRegressor()
      .setFeaturesCol("indexed_features").setLabelCol(labelCol)
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(seed)
    new Pipeline().setStages(Array(indexer, tree))
  }

  /** Hyperparameter search — the spark.ml expression of the
    * reference's manual attempt-1..5 loop (each "attempt" hand-tunes
    * params and re-trains, ref 流行音乐趋势预测.md throughout):
    * `CrossValidator` folds × grid fits run as independent distributed
    * jobs (`parallelism` fits concurrently), the avg metric picks the
    * winner, and the best model is refit on the full set — the same
    * search, but measured instead of eyeballed, and embarrassingly
    * parallel at cluster scale.
    */
  def tunedLinear(regParams: Seq[Double] = Seq(0.0, 0.1, 1.0),
                  folds: Int = 3, seed: Long = 42L,
                  featuresCol: String = "features", labelCol: String = "label")
      : org.apache.spark.ml.tuning.CrossValidator = {
    val lr = linear(featuresCol, labelCol)
    val grid = new org.apache.spark.ml.tuning.ParamGridBuilder()
      .addGrid(lr.regParam, regParams.toArray)
      .build()
    new org.apache.spark.ml.tuning.CrossValidator()
      .setEstimator(lr)
      .setEstimatorParamMaps(grid)
      .setEvaluator(new RegressionEvaluator()
        .setLabelCol(labelCol).setMetricName("mse"))
      .setNumFolds(folds).setParallelism(2).setSeed(seed)
  }

  /** M10 — MSE via the evaluator. */
  def mse(predictions: DataFrame, labelCol: String = "label",
          predictionCol: String = "prediction"): Double =
    new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol(predictionCol)
      .setMetricName("mse")
      .evaluate(predictions)

  /** M10 join-form twin (ref 豆瓣图书推荐.md:75-82 computes MSE through a
    * pair-RDD join) — one aggregate, no collect. */
  def mseFrame(predictions: DataFrame, labelCol: String = "label",
               predictionCol: String = "prediction"): DataFrame =
    predictions.agg(
      avg(pow(col(labelCol) - col(predictionCol), 2)).as("mse"),
      count(lit(1)).as("n"))
}
