package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.Resolution

/** Streaming twin of q215's fuzzy entity matcher: dirty records arrive
  * as a stream and resolve against a STATIC clean index (the
  * production linkage shape — the reference corpus is curated offline,
  * new records trickle in).
  *
  * Shape argument: with a stream-static join, every candidate for a
  * dirty record materializes inside the micro-batch that carries the
  * record — the static side is complete, so no candidate can ever
  * arrive in a later batch. The per-record argmax therefore needs ZERO
  * cross-batch state, and the correct streaming form is foreachBatch
  * applying the batch operator per micro-batch — not a stateful
  * streaming aggregation, which would hold every did's state forever
  * (unbounded, and pure overhead for an aggregation that is already
  * batch-complete). This is the inverse of ComponentStream/
  * GraphSupportStream, where results genuinely depend on history and
  * transformWithState earns its state; the scaladoc-level rule the
  * two twins demonstrate together: carry streaming state exactly when
  * the answer crosses batches.
  *
  * LinkageStreamSpec pins stream == batch on a 3-batch split of the
  * q215-convention corpus.
  */
object LinkageStream {

  /** The per-batch operator — literally the batch pipeline. */
  def resolve(dirty: DataFrame, clean: DataFrame): DataFrame =
    Resolution.best(Resolution.scored(Resolution.candidates(clean, dirty)))

  /** Start the stream: each micro-batch of dirty records resolves
    * against the static clean index; `emit` receives the batch's
    * match rows (did, src, dname, cid, cname, jw9). */
  def run(dirtyStream: DataFrame, clean: DataFrame,
          emit: DataFrame => Unit): StreamingQuery =
    dirtyStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        emit(resolve(batch, clean))
      }
      .start()
}
