package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-step forecasting — SURVEY.md §2.9 M12/M13 (§7.4.1 redesign).
  *
  * The reference collects everything to the driver and loops row-by-row
  * with a PrintWriter (ref 流行音乐趋势预测.md:407-522). Here the
  * per-day step stays a distributed `transform`; only the *loop* runs
  * on the driver (30 small iterations), predictions feed back as the
  * next step's lag features, and `localCheckpoint` cuts the growing
  * lineage every few steps.
  */
object Forecast {

  /** M12 — autoregressive forecast. `head`: one row per key with the
    * last observed day — columns (key, ds, y, y_prev). Each step
    * predicts day ds+1 from features (y, y_prev), then the prediction
    * becomes the new head. Returns `steps` days of forecasts:
    * (key, ds, y).
    */
  def autoregressive(model: Transformer, head: DataFrame, steps: Int,
                     checkpointEvery: Int = 8): DataFrame = {
    val assembler = new VectorAssembler()
      .setInputCols(Array("y", "y_prev")).setOutputCol("features")
    var current = head.select(col("key"), col("ds"), col("y"), col("y_prev"))
    val outputs = Seq.newBuilder[DataFrame]
    for (step <- 1 to steps) {
      val predicted = model.transform(assembler.transform(current))
        .select(col("key"), date_add(col("ds"), 1).as("ds"),
          col("prediction").as("y"), col("y").as("y_prev"))
      current =
        if (step % checkpointEvery == 0) predicted.localCheckpoint(false)
        else predicted
      outputs += current.select(col("key"), col("ds"), col("y"))
    }
    outputs.result().reduce(_ unionByName _)
  }

  /** M13 — horizon ensemble: average two horizon models' forecasts per
    * (key, ds) (ref 流行音乐趋势预测.md:717-746 averages the 1-month and
    * 2-month GBDTs). */
  def horizonEnsemble(p1: DataFrame, p2: DataFrame): DataFrame =
    p1.select(col("key"), col("ds"), col("y").as("y1"))
      .join(p2.select(col("key"), col("ds"), col("y").as("y2")), Seq("key", "ds"))
      .select(col("key"), col("ds"), ((col("y1") + col("y2")) / 2).as("y"))
}
