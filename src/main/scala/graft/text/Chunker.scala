package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap — the RAG / context-window
  * packing primitive: every document becomes ⌈(n−C)/S⌉+1 windows of
  * C tokens advancing by stride S (< C for overlap), the last window
  * short. Pure map-side: one split per row, one `explode` over the
  * per-row chunk count, `slice` per chunk — no shuffle at any corpus
  * size, so 100 TB chunks at scan speed. Deliberately NOT a
  * `transform(sequence, …)` lambda (interpreted, and re-evaluates the
  * split per element — the round-1 shingling trap); `slice` with a
  * column offset is one codegen'd call per chunk.
  */
object Chunker {

  /** Chunk `textCol` of `docs` into windows of `chunkSize` tokens
    * advancing by `stride` tokens (`0 < stride <= chunkSize`).
    * Emits one row per (doc, chunk): `chunk_id` (0-based),
    * `start_tok` (0-based token offset), `n_toks` (≤ chunkSize,
    * short only for the last chunk), `chunk` (space-joined text).
    * Tokenization is the engine-wide lower/trim/\s+ split.
    */
  def chunks(docs: DataFrame, idCol: Column, textCol: Column,
             chunkSize: Int, stride: Int): DataFrame = {
    require(stride > 0 && stride <= chunkSize,
      s"stride must be in (0, chunkSize]: $stride / $chunkSize")
    val toks = docs.select(idCol.as("doc_id"),
        split(lower(trim(textCol)), "\\s+").as("t"))
      .withColumn("n", size(col("t")))
    val nChunks = when(col("n") <= chunkSize, lit(1))
      .otherwise(ceil((col("n") - chunkSize) / lit(stride.toDouble))
        .cast("int") + 1)
    toks
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * stride).as("start_tok"),
        least(lit(chunkSize), col("n") - col("chunk_id") * stride)
          .cast("int").as("n_toks"),
        concat_ws(" ",
          slice(col("t"), col("chunk_id") * stride + 1, lit(chunkSize)))
          .as("chunk"))
  }
}
