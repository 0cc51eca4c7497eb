package graft.ml

import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature pipeline — SURVEY.md §2.9 M1/M2.
  *
  * The reference standardizes manually from `Statistics.colStats` and
  * divides by the **variance**, not the stddev (ref
  * 流行音乐趋势预测.md:143-153 — a quirk preserved here as
  * [[varianceNormalize]] with a column-level twin), then fits a 12→8 PCA
  * (ref 流行音乐趋势预测.md:164-184). The idiomatic rebuild is a
  * `Pipeline(VectorAssembler → StandardScaler → PCA)` — models are
  * Transformers, so application is a distributed DataFrame op.
  */
object FeaturePipe {

  def assembler(inputCols: Seq[String], out: String = "features_raw"): VectorAssembler =
    new VectorAssembler().setInputCols(inputCols.toArray).setOutputCol(out)

  /** M1 + M2 as one fitted pipeline: assemble → standardize (withMean,
    * the reference subtracts the mean) → PCA to `k` components.
    */
  def fit(df: DataFrame, featureCols: Seq[String], k: Int = 8,
          out: String = "features"): PipelineModel = {
    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features_std")
      .setWithMean(true).setWithStd(true)
    val pca = new PCA()
      .setInputCol("features_std").setOutputCol(out).setK(k)
    new Pipeline()
      .setStages(Array(assembler(featureCols), scaler, pca))
      .fit(df)
  }

  /** F11 exact-replica quirk: (x − mean) / **variance** (ref
    * 流行音乐趋势预测.md:149-153). `stats` must carry one row with
    * `<c>_mean` / `<c>_var` for each column — compute it with
    * [[colStats]] and cross-join (a 1-row broadcast, free at scale).
    */
  def varianceNormalize(x: Column, mean: Column, variance: Column): Column =
    (x - mean) / variance

  /** A8 — one-row mean/variance frame for the given columns. */
  def colStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      avg(col(c)).as(s"${c}_mean"), var_samp(col(c)).as(s"${c}_var")))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Apply the exact-replica normalize to every column in `cols`:
    * one aggregate + a broadcast cross-join, no collect.
    */
  def normalizeExact(df: DataFrame, cols: Seq[String]): DataFrame = {
    val joined = df.crossJoin(broadcast(colStats(df, cols)))
    cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"${c}_norm",
        varianceNormalize(col(c), col(s"${c}_mean"), col(s"${c}_var")))
    }.drop(cols.flatMap(c => Seq(s"${c}_mean", s"${c}_var")): _*)
  }
}
