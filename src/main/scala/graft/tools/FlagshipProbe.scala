package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
      // FlagshipPipeline's own stage builders, forced between stages
      val daily = timed("ingest+dedup+pivot") {
        val d = graft.ml.FlagshipPipeline.dailyOf(spark, sfDir)
          .localCheckpoint(false)
        println(s"[probe] $tag   daily rows = ${d.count()}")
        d
      }
      val feat = timed("lag+assemble") {
        val f = graft.ml.FlagshipPipeline.featuresOf(daily).cache()
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
        val (head, arFeat) = graft.ml.FlagshipPipeline.arParts(daily)
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
