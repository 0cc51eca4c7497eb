package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables
import graft.text.CorpusPipeline

/** The q284 funnel's streamed admission twin == the batch funnel over
  * the cumulative corpus AFTER EVERY WAVE (round-8 verdict #6's pin),
  * including replay suppression, exact-keeper displacement by a
  * longer late arrival, and restart recovery from the epoch chain.
  */
class FunnelStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, SparkTestSession.Sf0001)
    .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
    .localCheckpoint(false)
  private lazy val evalDocs = CorpusPipeline.evalSide(docs)
  private lazy val training = CorpusPipeline.trainingSide(docs)
    .orderBy(col("doc_id"))
    .as[(Long, String, String, Long)].collect()

  private def funnelRows(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streamed funnel == batch q284 frame after every wave; replays and displacement included") {
    val dir = java.nio.file.Files.createTempDirectory("funnelstream").toString
    val m = new CorpusFunnelMaintainer(spark, dir, evalDocs)

    // waves 1-2: the real fixture's training docs, split mid-corpus;
    // wave 3: crafted arrivals exercising the paths the fixture lacks
    // (CorpusPipelineSpec: sf0.001 has no exact-duplicate training
    // docs) — 9001 duplicates w1's first doc with MORE chars, so the
    // standing keeper is DISPLACED; 9002 duplicates it with fewer
    // chars and must lose on arrival; both join the incumbent's
    // near-dup component (identical text ⟹ jaccard 1).
    val (w1, w2) = training.splitAt(training.length / 2)
    val seed = w1.head
    val w3 = Seq((9001L, seed._2, seed._3, seed._4 + 100L),
      (9002L, seed._2, seed._3, math.max(1L, seed._4 - 1L)))

    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, String, String, Long)]
    val q = stream.toDF().toDF("doc_id", "source", "text", "n_chars")
      .writeStream.outputMode("append").foreachBatch(m.sink).start()
    try {
      var seen = Seq.empty[(Long, String, String, Long)]
      for ((wave, i) <- Seq(w1.toSeq, w2.toSeq, w3).zipWithIndex) {
        stream.addData(wave)
        q.processAllAvailable()
        seen ++= wave
        val cumulative = evalDocs.unionByName(
          seen.toDF("doc_id", "source", "text", "n_chars"))
        val batch = funnelRows(CorpusPipeline.funnel(cumulative))
        val streamed = funnelRows(m.funnel)
        assert(streamed === batch,
          s"wave ${i + 1}: streamed $streamed != batch $batch")
      }

      // the displacement actually happened: 9001 is the keeper of the
      // duplicated text, the wave-1 incumbent and 9002 are not
      val flags = m.flagFrame
        .select(col("doc_id"), col("f_ek"), col("f_nk")).collect()
        .map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
      assert(flags(9001L)._1, "9001 must displace the standing keeper")
      assert(!flags(seed._1)._1, "the displaced incumbent keeps no flag")
      assert(!flags(9002L)._1, "the shorter duplicate must lose on arrival")

      // replay suppression: re-sending wave 3 (plus an eval-side doc,
      // which the training filter drops) changes nothing
      val before = funnelRows(m.funnel)
      val anEval = evalDocs.as[(Long, String, String, Long)].head()
      stream.addData(w3 :+ anEval)
      q.processAllAvailable()
      assert(funnelRows(m.funnel) === before, "replayed wave must be a no-op")

      // restart recovery: a fresh maintainer over the same stateDir
      // reopens at the last complete epoch, not at the empty corpus
      val m2 = new CorpusFunnelMaintainer(spark, dir, evalDocs)
      assert(funnelRows(m2.funnel) === before,
        "restart must resume from the epoch chain")
    } finally q.stop()
  }
}
