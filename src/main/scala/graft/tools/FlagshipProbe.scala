package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.{Ingest, LagFeatures, Pivot}
import graft.ml.{Clustering, Forecast, Regressors}
import graft.model.Tables
import graft.sources.SourceLayout

/** Builder-side end-to-end scale probe for the attempt-5 flagship
  * (round-7 verdict #4): CrossoverBench amplifies single operators,
  * but nothing had ever run the WHOLE ingest → dedup → pivot → lag →
  * KMeans → per-cluster GBT → AR-forecast pipeline above sf0.1. This
  * tool amplifies the events fixture M× (each user spawns M variants
  * with deterministically jittered values — no RNG, reruns identical;
  * same day structure, so the per-user daily series keep their
  * shape), writes it once (_SUCCESS-marked), and runs the pipeline
  * stage-by-stage at 1× and M× with each stage forced and timed.
  *
  * Stage boundaries mirror [[graft.ml.FlagshipPipeline.run]]
  * composition-for-composition (the forcing between stages is what
  * run() deliberately does NOT do — attribution costs extra
  * materialization, so the probe also reports run()'s unforced
  * end-to-end wall time as the real number).
  *
  * Usage: runMain graft.tools.FlagshipProbe [baseSfDir] [M] [gbtIters]
  */
object FlagshipProbe {

  /** M variants per user: user_id and event_id re-keyed collision-free,
    * value jittered ±5% by a hash of (user, k), day structure kept. */
  def amplifyEvents(ev: DataFrame, m: Int): DataFrame =
    ev.withColumn("k", explode(sequence(lit(0), lit(m - 1))))
      .select(
        (col("event_id") * m + col("k")).as("event_id"),
        col("ts"),
        (col("user_id") * m + col("k")).as("user_id"),
        col("event_type"),
        (col("value") * (lit(1.0) +
          (pmod(xxhash64(col("user_id"), col("k")), lit(100)) - lit(50))
            / lit(1000.0))).as("value"),
        col("props"))

  def main(args: Array[String]): Unit = {
    val baseSfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.lift(1).map(_.toInt).getOrElse(10)
    val gbtIters = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ampDir = s"${SourceLayout.root("graft_flagship_amp", baseSfDir)}/m$m"
    SourceLayout.writeOnce(s"$ampDir/events.parquet") {
      amplifyEvents(Tables.events(spark, baseSfDir), m)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$ampDir/events.parquet")
    }

    def probe(tag: String, sfDir: String): Unit = {
      def timed[A](stage: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[probe] $tag $stage%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      // mirrors FlagshipPipeline.run stage-for-stage, forced
      val daily = timed("ingest+dedup+pivot") {
        val d = Pivot.dailyUserCounters(
          Ingest.dedup(Tables.events(spark, sfDir))).localCheckpoint(false)
        println(s"[probe] $tag   daily rows = ${d.count()}")
        d
      }
      val feat = timed("lag+assemble") {
        val lagged = LagFeatures.shiftJoin(
            LagFeatures.shiftJoin(daily, "user_id", "ds", 1,
              Seq("n_events", "clicks", "purchases"), "_y1"),
            "user_id", "ds", 2, Seq("n_events"), "_y2")
          .withColumn("weekday", dayofweek(col("ds")).cast("double"))
          .withColumn("label", col("n_events").cast("double"))
        val f = new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(Array("n_events_y1", "clicks_y1", "purchases_y1",
            "n_events_y2", "weekday"))
          .setOutputCol("features").transform(lagged).cache()
        f.count()
        f
      }
      val preds = timed("kmeans+per-cluster-gbt") {
        val (_, p) = Clustering.clusterEnsemble(feat, gbtIters = gbtIters)
        p
      }
      timed("train-mse") {
        println(f"[probe] $tag   train MSE = ${Regressors.mse(preds)}%.3f")
      }
      val (arModel, head) = timed("ar-train") {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ds"))
        val arBase = LagFeatures.windowLag(daily, "user_id", "ds", 1,
          Seq("n_events"), "_prev")
        val lastDay = daily
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("user_id")).orderBy(col("ds").desc)))
          .filter(col("rk") === 1)
        val head = arBase
          .join(lastDay.select(col("user_id"), col("ds")),
            Seq("user_id", "ds"), "left_semi")
          .select(col("user_id").as("key"), col("ds"),
            col("n_events").cast("double").as("y"),
            col("n_events_prev").cast("double").as("y_prev"))
        val arTrain = arBase
          .withColumn("label", lead(col("n_events"), 1).over(w).cast("double"))
          .where(col("label").isNotNull)
          .select(col("label"), col("n_events").cast("double").as("y"),
            col("n_events_prev").cast("double").as("y_prev"))
        val arFeat = new org.apache.spark.ml.feature.VectorAssembler()
          .setInputCols(Array("y", "y_prev")).setOutputCol("features")
          .transform(arTrain)
        (Regressors.gbt(maxIter = gbtIters).setLabelCol("label").fit(arFeat),
          head)
      }
      timed("forecast-7d") {
        println(s"[probe] $tag   forecast rows = " +
          Forecast.autoregressive(arModel, head, 7).count())
      }
      feat.unpersist()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      // the real unforced end-to-end number
      timed("run()-end-to-end") {
        val r = graft.ml.FlagshipPipeline.run(spark, sfDir, 7, gbtIters)
        println(s"[probe] $tag   e2e forecast rows = ${r.forecast.count()}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }

    probe("1x ", baseSfDir)
    probe(s"${m}x", ampDir)
    spark.stop()
  }
}
