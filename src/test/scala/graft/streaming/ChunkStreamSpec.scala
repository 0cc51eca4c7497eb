package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.text.Chunker

/** Chunk-at-ingest: RAG window chunking (q172's operator) is a
  * stateless scan-stage fan-out, so the SAME [[Chunker.chunks]] call
  * must run unchanged on a stream — documents are chunked as they
  * land, no batch backfill, and a document split across micro-batches
  * from its neighbors chunks identically to the one-shot batch run.
  */
class ChunkStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, (0 until 40).map(i => s"a$i").mkString(" ")), // 3 chunks
    (2L, "short doc"),                                 // 1 short chunk
    (3L, (0 until 16).map(i => s"c$i").mkString(" ")), // exactly 1 full
    (4L, (0 until 29).map(i => s"d$i").mkString(" "))) // 2 chunks

  test("streaming chunking == batch chunking across micro-batches") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = Chunker.chunks(stream.toDF().toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkSize = 16, stride = 12)
      .writeStream.outputMode("append")
      .format("memory").queryName("chunk_out").start()
    try {
      stream.addData(docs.take(2))
      q.processAllAvailable()
      stream.addData(docs.drop(2))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1)) ->
          ((r.getInt(2), r.getInt(3), r.getString(4)))
      val streamed = spark.table("chunk_out").collect().map(key).toMap
      val batch = Chunker.chunks(docs.toDF("doc_id", "text"),
          col("doc_id"), col("text"), chunkSize = 16, stride = 12)
        .collect().map(key).toMap
      assert(streamed === batch)
      assert(streamed.keySet.count(_._1 == 1L) === 3)
      assert(streamed((2L, 0))._1 === 0) // start_tok
    } finally q.stop()
  }
}
