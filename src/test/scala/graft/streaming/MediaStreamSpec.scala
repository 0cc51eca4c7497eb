package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.multimodal.Multimodal

case class MediaEv(id: Long, kind: String, payload: Array[Byte])

/** Decode-at-ingest: the multimodal PCM decode path is a stateless
  * typed flatMap, so it must run unchanged on a stream (the
  * production shape — features extracted as media lands, no batch
  * backfill). Pins that the SAME operator (no streaming fork of the
  * decode code) yields identical rows batch vs stream, across
  * multiple micro-batches, with non-audio rows filtered.
  */
class MediaStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int) = le16(v & 0xFFFF) ++ le16(v >>> 16)
  private def wav(samples: Seq[Int]) =
    "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(samples.length * 2) ++ samples.flatMap(le16).toArray

  private val data = Seq(
    MediaEv(1L, "audio", wav(1 to 100)),
    MediaEv(2L, "image", Array[Byte](1, 2, 3)),      // filtered out
    MediaEv(3L, "audio", wav(Seq(7, -7, 7, -7))),
    MediaEv(4L, "audio", wav(Seq.fill(64)(5) ++ Seq(9, 0))))

  test("streaming spectral decode == batch decode across micro-batches") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[MediaEv]
    val q = Multimodal.spectralWindows(spark, stream.toDF(), frame = 64)
      .writeStream.outputMode("append")
      .format("memory").queryName("media_out").start()
    try {
      stream.addData(data.take(2))
      q.processAllAvailable()
      stream.addData(data.drop(2))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1)) ->
          ((r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      val streamed = spark.table("media_out").collect().map(key).toMap
      val batch = Multimodal.spectralWindows(spark, data.toDF(), frame = 64)
        .collect().map(w => (w.id, w.win_idx) ->
          ((w.n_samples, w.dc, w.nyq_pow, w.quarter_pow))).toMap
      assert(streamed === batch)
      assert(!streamed.keySet.exists(_._1 == 2L)) // non-audio filtered
      assert(streamed((4L, 1)) === ((2, 9L, 81L, 81L))) // partial frame intact
    } finally q.stop()
  }
}
