package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §7.6 north star.
  *
  * Media are opaque `binary` payloads with typed metadata; decode /
  * feature-extract / frame-sample run batch-wise over partitions
  * (`Dataset.mapPartitions` — the Scala analogue of arrow-batched
  * Python UDFs). The actual codec call is STUBBED with a deterministic
  * fake (no image/audio libs in this container); the Spark-side
  * plumbing — schema, partitioning, batch shape, output contract — is
  * real and tested, and a real decoder drops into [[decodeStub]]
  * without touching any plan.
  */
object Multimodal {

  /** (id, kind, payload BINARY, meta STRUCT<width,height,sample_rate>) */
  case class MediaRow(id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(id: Long, kind: String, features: Array[Float])

  case class Frame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic synthetic media table derived from `documents`
    * (payload = UTF-8 bytes; kind round-robins image/audio/video) —
    * stands in for a real binary column so the pipeline has data.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"),
      ((col("doc_id") % 8) * 64 + 64).cast("int").as("width"),
      ((col("doc_id") % 4) * 64 + 64).cast("int").as("height"),
      lit(16000).as("sample_rate"))

  /** STUB — where a real codec (JPEG decode, PCM resample, …) would
    * run, per payload, inside a partition batch. The fake is a
    * deterministic byte-histogram fold so tests can assert exact
    * values. Signature (bytes → float vector) is the real contract.
    */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc(java.lang.Byte.toUnsignedInt(payload(i)) % dim) += 1.0f
      i += 1
    }
    val n = math.max(payload.length, 1).toFloat
    var j = 0
    while (j < dim) { acc(j) /= n; j += 1 }
    acc
  }

  /** Feature extraction over partition batches: one pass per partition,
    * payload bytes never hit the driver. Partition count (and therefore
    * batch shape / parallelism) is preserved from the input — at scale,
    * repartition upstream to match executor memory to payload sizes.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("kind"), col("payload")).as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        MediaFeatures(id, kind, decodeStub(payload, dim))
      })
  }

  /** Resize stub: a real impl decodes, scales to (w, h) and re-encodes;
    * the fake deterministically re-samples the payload bytes to the
    * target pixel count (nearest-neighbor over byte positions) so the
    * OUTPUT CONTRACT — payload sized to the new dims, metadata columns
    * updated in the same row — is real and assertable. Runs inside the
    * same partition batch as decode would.
    */
  private[multimodal] def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val n = math.max(w * h, 1)
    val out = new Array[Byte](n)
    if (payload.nonEmpty) {
      var i = 0
      while (i < n) {
        out(i) = payload(((i.toLong * payload.length) / n).toInt)
        i += 1
      }
    }
    out
  }

  case class Resized(id: Long, kind: String, payload: Array[Byte],
                     width: Int, height: Int)

  /** Image resize over partition batches — payload AND metadata change
    * together, rows stay 1:1, partitioning preserved. */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int)
      : Dataset[Resized] = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("id"), col("kind"), col("payload")).as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        Resized(id, kind, resizeStub(payload, w, h), w, h)
      })
  }

  /** Frame sampling stub: every `stride` bytes becomes one "frame"
    * (a real impl would cut on container keyframes). Row-generating
    * (flatMap) — the output is (id, frame_idx, frame) with frames
    * ordered per id, ready for a per-frame decode stage.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int)
      : Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        payload.grouped(stride).zipWithIndex.map {
          case (chunk, idx) => Frame(id, idx, chunk)
        }
      }
  }
}
