package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.CorpusFunnelMaintainer
import graft.text.CorpusPipeline

/** Measured evidence for the streamed funnel's operational claim
  * (FunnelStream scaladoc): per-wave work is wave-proportional plus
  * ONE full-state epoch write. The probe feeds the sf corpus's
  * training docs through a [[CorpusFunnelMaintainer]] in equal waves
  * and times every `update` while the standing state grows — if
  * admission cost grew with the CORPUS (a rescan hiding somewhere),
  * the per-wave seconds would climb with the wave index well beyond
  * the epoch write's linear share; a flat-ish curve is the claim. A
  * replayed wave and a funnel read are timed at the end (the replay
  * must cost one anti-join, not an admission pass).
  *
  * Usage: runMain graft.tools.FunnelProbe <sfDir> <waves>
  */
object FunnelProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val waves = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val docs = graft.model.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .localCheckpoint(false)
    val training = CorpusPipeline.trainingSide(docs)
      .withColumn("w", pmod(col("doc_id"), lit(waves)))
      .localCheckpoint(false)
    val dir = java.nio.file.Files
      .createTempDirectory("funnel_probe").toString
    val m = new CorpusFunnelMaintainer(spark, dir,
      CorpusPipeline.evalSide(docs))

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    var standing = 0L
    (0 until waves).foreach { w =>
      val wave = training.filter(col("w") === w).drop("w")
      val n = wave.count()
      val (_, dt) = t(m.update(wave))
      standing += n
      println(f"[funnel] wave $w%2d: +$n%5d docs (standing $standing%6d) update $dt%6.2f s")
    }
    val (_, replayDt) = t(m.update(training.filter(col("w") === 0).drop("w")))
    val (rows, readDt) = t(m.funnel.collect())
    println(f"[funnel] replay of wave 0: $replayDt%.2f s (must be the anti-join, not an admission)")
    println(f"[funnel] funnel read: $readDt%.2f s, stages = " +
      rows.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
    // the stream's end state must equal the batch funnel on the whole corpus
    val batch = CorpusPipeline.funnel(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    println(s"[funnel] stream == batch after all waves: ${streamed == batch}")
    spark.stop()
  }
}
