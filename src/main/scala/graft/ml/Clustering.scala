package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.regression.GBTRegressor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clustering + cluster-conditioned ensemble — SURVEY.md §2.9 M6/M7.
  *
  * The reference clusters artists with KMeans(k=4) on 7 activity
  * features, then trains one GBDT per cluster and unions the per-cluster
  * predictions (ref 流行音乐趋势预测.md:1087-1152, 1189-1217). Spark 2+
  * dropped `runs`; a fixed seed keeps it deterministic.
  */
object Clustering {

  /** M6 — KMeans(k=4, 50 iters) replica (ref 流行音乐趋势预测.md:1098-1104). */
  def kmeans(k: Int = 4, featuresCol: String = "features",
             seed: Long = 42L): KMeans =
    new KMeans().setK(k).setMaxIter(50).setSeed(seed)
      .setFeaturesCol(featuresCol).setPredictionCol("cluster")

  /** `runs=20` equivalent (ref 流行音乐趋势预测.md:1098-1104): Spark 2+
    * dropped KMeans `runs`, so sweep `runs` seeds — each fit its own
    * distributed job over the (caller-cached) training set — and keep
    * the lowest-cost model. Deterministic: seeds are baseSeed+i.
    */
  def kmeansBestOfSeeds(train: DataFrame, k: Int = 4, runs: Int = 20,
                        maxIter: Int = 50, featuresCol: String = "features",
                        baseSeed: Long = 42L): KMeansModel =
    (0 until runs).map { i =>
      new KMeans().setK(k).setMaxIter(maxIter).setSeed(baseSeed + i)
        .setFeaturesCol(featuresCol).setPredictionCol("cluster")
        .fit(train)
    }.minBy(_.summary.trainingCost)

  /** M7 — cluster-conditioned ensemble: tag rows with their cluster,
    * fit one GBT per cluster on the tagged training slice, and predict
    * each slice with its own model, unioning the results. The per-slice
    * fits are sequential (fine: k is tiny); each fit and each transform
    * is itself a distributed job, and the final union is a pure plan
    * node — rows never leave the cluster. Returns (model per cluster,
    * train predictions unioned).
    */
  def clusterEnsemble(train: DataFrame, featuresCol: String = "features",
                      labelCol: String = "label", k: Int = 4,
                      gbtIters: Int = 20, seed: Long = 42L)
      : (Map[Int, Transformer], DataFrame) = {
    val km = kmeans(k, featuresCol, seed).fit(train)
    val tagged = km.transform(train).cache()
    // k-row aggregate: the only driver-side data is the cluster id list
    val present = tagged.groupBy(col("cluster")).count()
      .collect().map(_.getInt(0)).toSeq.sorted
    val models: Map[Int, Transformer] = present.map { c =>
      val slice = tagged.filter(col("cluster") === c)
      val gbt = new GBTRegressor()
        .setFeaturesCol(featuresCol).setLabelCol(labelCol)
        .setMaxIter(gbtIters).setMaxDepth(5).setSeed(seed + c)
      c -> gbt.fit(slice).asInstanceOf[Transformer]
    }.toMap
    val preds = present.map { c =>
      models(c).transform(tagged.filter(col("cluster") === c))
    }.reduce(_ unionByName _).cache()
    preds.count() // materialize while tagged is still hot…
    tagged.unpersist() // …then release the tagged copy (it would
    // otherwise stay pinned in the block manager for the session)
    (models, preds)
  }
}
