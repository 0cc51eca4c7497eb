package graft.queries

import org.apache.spark.sql.functions._

import graft.model.Tables._
import graft.multimodal.{Multimodal, PngCodec}

/** The multimodal plumbing layer inside the driver's oracle gate.
  *
  * The synthetic media table ([[Multimodal.syntheticPngMedia]]) is
  * built so every payload's CONTENT is a pure function of the source
  * document row: image rasters are the document's UTF-8 bytes cycled
  * over doc_id-derived dims and then run through the REAL PNG encoder
  * (deflate, filters, CRCs); audio payloads carry a real RIFF/WAVE
  * header encoding doc_id-derived PCM fields; video payloads are the
  * raw text bytes. That makes the decode paths value-checkable by
  * DuckDB: the oracle replays the expected decode OUTPUT analytically
  * from `documents.text` and doc_id arithmetic, while the Spark side
  * actually decodes bytes — inflate + un-filter for pixels, the RIFF
  * chunk walk for audio, the frame cutter for video. A defect
  * anywhere in the codec or plumbing (filter choice, scanline
  * offsets, endianness, chunk boundaries) breaks a value pin.
  *
  * The corpus is ASCII, so DuckDB `ascii(char)` == UTF-8 byte (the
  * q29/q53 oracle precedent). All decoding runs inside partition
  * batches — payload bytes never hit the driver.
  */
object MultimodalQueries {

  def queries: Seq[GraftQuery] =
    Seq(q146MediaPixelStats, q147AudioHeader, q148FrameSample,
      q149AudioEnergy, q150ImageAhash, q153AudioSpectral,
      q155AudioQualityGate, q156ImageQualityGate, q158VideoQualityGate)

  /** Pixel path: decode each image payload (the full PNG codec) and
    * emit per-image pixel sum / mean / first / last. The oracle
    * replays the cycled-byte raster with cycle-count arithmetic: sum
    * = full_cycles·Σbytes + prefix, positional pins via index math. */
  val q146MediaPixelStats = GraftQuery(
    "q146_media_pixel_stats",
    "decode real PNG payloads; per-image pixel stats replayed from text",
    Some("""WITH img AS (
        SELECT doc_id,
          CAST(doc_id % 24 + 8 AS INT) AS w,
          CAST(doc_id % 12 + 8 AS INT) AS h,
          CAST(doc_id % 24 + 8 AS BIGINT) * (doc_id % 12 + 8) AS n,
          text, CAST(length(text) AS BIGINT) AS len
        FROM documents WHERE doc_id % 3 = 0),
      b AS (
        SELECT doc_id, w, h, n, len,
          CASE WHEN len = 0 THEN []
               ELSE list_transform(range(len), i -> ascii(text[i+1])) END
            AS bytes
        FROM img),
      stats AS (
        SELECT doc_id, w, h, n,
          CASE WHEN len = 0 THEN 0
               ELSE (n // len) * list_aggregate(bytes, 'sum')
                    + COALESCE(list_aggregate(
                        bytes[1:CAST(n % len AS INT)], 'sum'), 0) END AS px_sum,
          CASE WHEN len = 0 THEN 0 ELSE bytes[1] END AS px_first,
          CASE WHEN len = 0 THEN 0
               ELSE bytes[CAST((n - 1) % len AS INT) + 1] END AS px_last
        FROM b)
      SELECT doc_id, w, h,
        CAST(px_sum AS BIGINT) AS px_sum,
        CAST(ROUND(CAST(CAST(px_sum * 1.0 / n AS VARCHAR)
          AS DECIMAL(38,18)), 4) AS DOUBLE) AS px_mean,
        CAST(px_first AS INT) AS px_first,
        CAST(px_last AS INT) AS px_last
      FROM stats ORDER BY doc_id"""),
    (s, d) => {
      import s.implicits._
      Multimodal.syntheticPngMedia(s, documents(s, d))
        .filter(col("kind") === "image")
        .select(col("id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) =>
          // .get is deliberate: these are our own encoder's bytes — a
          // refusal here IS the correctness failure the gate exists for
          val img = PngCodec.decode(payload).get
          var sum = 0L
          var i = 0
          while (i < img.pixels.length) {
            sum += java.lang.Byte.toUnsignedInt(img.pixels(i)); i += 1
          }
          val first =
            if (img.pixels.isEmpty) 0
            else java.lang.Byte.toUnsignedInt(img.pixels(0))
          val last =
            if (img.pixels.isEmpty) 0
            else java.lang.Byte.toUnsignedInt(img.pixels(img.pixels.length - 1))
          (id, img.width, img.height, sum, first, last)
        })
        .toDF("doc_id", "w", "h", "px_sum", "px_first", "px_last")
        .select(col("doc_id"), col("w"), col("h"), col("px_sum"),
          round(col("px_sum") / (col("w") * col("h")), 4).as("px_mean"),
          col("px_first"), col("px_last"))
        .orderBy(col("doc_id"))
    })

  /** Image triage gate — q155's sibling over DECODED pixels: per
    * image, integer-exact Σpx and Σpx² plus three curation flags —
    * dim (mean below the corpus median 94.5: 2·Σpx < 189·n),
    * low_contrast (n²·variance below the median 892: n·Σpx² − (Σpx)²
    * < 892·n²) and tiny (n < 100 px). Thresholds are corpus-
    * calibrated so every flag SPLITS the fixture (the q155
    * discipline); the oracle replays the cycled-byte raster with
    * cycle arithmetic (q146's scheme) and the same integer
    * comparisons, so a decode defect flips a verdict. */
  val q156ImageQualityGate = GraftQuery(
    "q156_image_quality_gate",
    "per-image triage: pixel sum/sumsq + dim/low-contrast/tiny flags",
    Some("""WITH img AS (
        SELECT doc_id,
          CAST(doc_id % 24 + 8 AS INT) AS w,
          CAST(doc_id % 12 + 8 AS INT) AS h,
          CAST(doc_id % 24 + 8 AS BIGINT) * (doc_id % 12 + 8) AS n,
          text, CAST(length(text) AS BIGINT) AS len
        FROM documents WHERE doc_id % 3 = 0),
      b AS (
        SELECT doc_id, w, h, n, len,
          CASE WHEN len = 0 THEN []
               ELSE list_transform(range(len), i -> CAST(ascii(text[i+1]) AS BIGINT)) END
            AS bytes
        FROM img),
      s AS (
        SELECT doc_id, w, h, n,
          CASE WHEN len = 0 THEN 0
               ELSE (n // len) * list_aggregate(bytes, 'sum')
                    + COALESCE(list_aggregate(
                        bytes[1:CAST(n % len AS INT)], 'sum'), 0) END AS s1,
          CASE WHEN len = 0 THEN 0
               ELSE (n // len) * list_aggregate(
                      list_transform(bytes, x -> x * x), 'sum')
                    + COALESCE(list_aggregate(list_transform(
                        bytes[1:CAST(n % len AS INT)], x -> x * x), 'sum'), 0)
               END AS s2
        FROM b)
      SELECT doc_id, w, h,
        CAST(s1 AS BIGINT) AS px_sum, CAST(s2 AS BIGINT) AS px_sumsq,
        CAST(CASE WHEN 2 * s1 < 189 * n THEN 1 ELSE 0 END AS INT) AS dim,
        CAST(CASE WHEN n * s2 - s1 * s1 < 892 * n * n THEN 1 ELSE 0 END
          AS INT) AS low_contrast,
        CAST(CASE WHEN n < 100 THEN 1 ELSE 0 END AS INT) AS tiny
      FROM s ORDER BY doc_id"""),
    (s, d) => {
      import s.implicits._
      Multimodal.syntheticPngMedia(s, documents(s, d))
        .filter(col("kind") === "image")
        .select(col("id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) =>
          // .get is deliberate: these are our own encoder's bytes — a
          // refusal here IS the correctness failure the gate exists for
          val img = PngCodec.decode(payload).get
          var s1 = 0L; var s2 = 0L
          var i = 0
          while (i < img.pixels.length) {
            val v = java.lang.Byte.toUnsignedInt(img.pixels(i)).toLong
            s1 += v; s2 += v * v; i += 1
          }
          (id, img.width, img.height, s1, s2)
        })
        .toDF("doc_id", "w", "h", "px_sum", "px_sumsq")
        .select(col("doc_id"), col("w"), col("h"),
          col("px_sum"), col("px_sumsq"),
          (col("px_sum") * 2 < col("w") * col("h") * 189).cast("int")
            .as("dim"),
          (col("w") * col("h") * col("px_sumsq") -
            col("px_sum") * col("px_sum") <
            col("w") * col("h") * col("w") * col("h") * lit(892L))
            .cast("int").as("low_contrast"),
          (col("w") * col("h") < 100).cast("int").as("tiny"))
        .orderBy(col("doc_id"))
    })

  /** Audio path: walk each WAV payload's RIFF chunks
    * ([[Multimodal.audioInfo]]) and emit the parsed PCM fields. The
    * payload's header was BUILT from doc_id math, so the oracle is
    * that same math — a parse that falls back (format "raw") or reads
    * little-endian fields wrong mismatches immediately. */
  val q147AudioHeader = GraftQuery(
    "q147_audio_header",
    "RIFF/WAVE chunk-walk of audio payloads vs the doc_id-derived truth",
    Some("""SELECT doc_id, 'wav' AS format,
        CAST((doc_id % 3 + 1) * 8000 AS INT) AS sample_rate,
        1 AS channels, 16 AS bits
      FROM documents WHERE doc_id % 3 = 1 ORDER BY doc_id"""),
    (s, d) =>
      Multimodal.audioInfo(s, Multimodal.syntheticPngMedia(s, documents(s, d)))
        .select(col("id").as("doc_id"), col("format"), col("sample_rate"),
          col("channels"), col("bits"))
        .orderBy(col("doc_id")))

  /** PCM path: the audio payloads carry a REAL 16-bit LE data chunk
    * (one sample per text byte, value (byte−128)·256), and
    * [[Multimodal.pcmWindows]] chunk-walks to it and parses every
    * sample. The oracle replays per-window Σ sample² as
    * Σ (byte−128)²·65536 over 100-sample text slices — endianness or
    * sign-extension bugs in the sample parse break it immediately. */
  val q149AudioEnergy = GraftQuery(
    "q149_audio_energy",
    "windowed PCM energy from real 16-bit LE samples vs text replay",
    Some("""WITH aud AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
          list_transform(range(length(text)), i -> ascii(text[i+1]) - 128)
            AS s
        FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0),
      w AS (
        SELECT doc_id, n, s,
          unnest(range(CAST(ceil(n / 100.0) AS BIGINT))) AS k
        FROM aud)
      SELECT doc_id, CAST(k AS INT) AS win_idx,
        CAST(least(100, n - k * 100) AS INT) AS n_samples,
        CAST(list_aggregate(list_transform(
            s[CAST(k * 100 + 1 AS INT):CAST(least(n, (k + 1) * 100) AS INT)],
            x -> CAST(x AS BIGINT) * x * 65536), 'sum') AS BIGINT) AS energy
      FROM w ORDER BY doc_id, win_idx"""),
    (s, d) =>
      Multimodal.pcmWindows(
          s, Multimodal.syntheticPngMedia(s, documents(s, d)), window = 100)
        .select(col("id").as("doc_id"), col("win_idx"), col("n_samples"),
          col("energy"))
        .orderBy(col("doc_id"), col("win_idx")))

  /** Spectral triage over the same real PCM chunk q149 parses:
    * per-64-sample frame, the three integer-exact DFT bins (DC,
    * quarter band, Nyquist — twiddles in {0,±1}; see
    * [[Multimodal.spectralWindows]]). The oracle rebuilds each frame
    * from the doc text ((byte−128)·256 samples) and replays the
    * signed basis sums in BIGINT arithmetic — a framing, phase, or
    * sign-extension defect in the decode path breaks it exactly. */
  /** Shared oracle scaffold for q153/q155: text-derived samples →
    * 64-sample frames → the three integer-exact bin sums (`b` carries
    * per-frame ns/dc/ny/qc/qs). */
  private val spectralCte = """aud AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
          list_transform(range(length(text)),
            i -> CAST(ascii(text[i+1]) - 128 AS BIGINT) * 256) AS s
        FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0),
      w AS (
        SELECT doc_id, n, s,
          unnest(range(CAST(ceil(n / 64.0) AS BIGINT))) AS k
        FROM aud),
      f AS (
        SELECT doc_id, k,
          s[CAST(k * 64 + 1 AS INT):CAST(least(n, (k + 1) * 64) AS INT)] AS fr
        FROM w),
      b AS (
        SELECT doc_id, k, len(fr) AS ns,
          list_aggregate(fr, 'sum') AS dc,
          list_aggregate(list_transform(range(len(fr)),
            t -> CASE WHEN t % 2 = 0 THEN fr[t+1] ELSE -fr[t+1] END),
            'sum') AS ny,
          list_aggregate(list_transform(range(len(fr)),
            t -> CASE WHEN t % 4 = 0 THEN fr[t+1]
                      WHEN t % 4 = 2 THEN -fr[t+1] ELSE 0 END),
            'sum') AS qc,
          list_aggregate(list_transform(range(len(fr)),
            t -> CASE WHEN t % 4 = 1 THEN -fr[t+1]
                      WHEN t % 4 = 3 THEN fr[t+1] ELSE 0 END),
            'sum') AS qs
        FROM f)"""

  val q153AudioSpectral = GraftQuery(
    "q153_audio_spectral",
    "integer-exact DFT-bin triple (DC/quarter/Nyquist) per PCM frame",
    Some(s"""WITH $spectralCte
      SELECT doc_id, CAST(k AS INT) AS win_idx, CAST(ns AS INT) AS n_samples,
        CAST(dc AS BIGINT) AS dc,
        CAST(ny * ny AS BIGINT) AS nyq_pow,
        CAST(qc * qc + qs * qs AS BIGINT) AS quarter_pow
      FROM b ORDER BY doc_id, win_idx"""),
    (s, d) =>
      Multimodal.spectralWindows(
          s, Multimodal.syntheticPngMedia(s, documents(s, d)), frame = 64)
        .select(col("id").as("doc_id"), col("win_idx"), col("n_samples"),
          col("dc"), col("nyq_pow"), col("quarter_pow"))
        .orderBy(col("doc_id"), col("win_idx")))

  /** Audio triage gate — the curation rollup over q153's frames: one
    * row per audio doc with integer-exact totals and two flags, a DC
    * offset (mean sample offset beyond 33 byte-units: |Σdc| >
    * 8448·n_samples — 33 is the fixture corpus's median offset, so the
    * flag SPLITS the corpus; any gate threshold is corpus-calibrated,
    * what the oracle pins is the exact integer comparison) and an
    * alternation artifact (more Nyquist than quarter-band power — the
    * aliasing smell; splits ~⅓/⅔ here). The multimodal layer doesn't
    * just decode, it CURATES: q90's gate pattern on decoded media. */
  val q155AudioQualityGate = GraftQuery(
    "q155_audio_quality_gate",
    "per-doc audio triage: spectral totals + DC-offset/alternation flags",
    Some(s"""WITH $spectralCte,
      r AS (
        SELECT doc_id, COUNT(*) AS n_frames, SUM(ns) AS n_samples,
          SUM(dc) AS total_dc, SUM(ny * ny) AS nyq_tot,
          SUM(qc * qc + qs * qs) AS quarter_tot
        FROM b GROUP BY doc_id)
      SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        CAST(n_samples AS BIGINT) AS n_samples,
        CAST(total_dc AS BIGINT) AS total_dc,
        CAST(nyq_tot AS BIGINT) AS nyq_tot,
        CAST(quarter_tot AS BIGINT) AS quarter_tot,
        CAST(CASE WHEN abs(total_dc) > n_samples * 8448 THEN 1 ELSE 0 END
          AS INT) AS dc_offset,
        CAST(CASE WHEN nyq_tot > quarter_tot THEN 1 ELSE 0 END
          AS INT) AS alternation
      FROM r ORDER BY doc_id"""),
    (s, d) =>
      Multimodal.spectralWindows(
          s, Multimodal.syntheticPngMedia(s, documents(s, d)), frame = 64)
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("n_samples")).as("n_samples"),
          sum(col("dc")).as("total_dc"),
          sum(col("nyq_pow")).as("nyq_tot"),
          sum(col("quarter_pow")).as("quarter_tot"))
        .select(col("id").as("doc_id"), col("n_frames"), col("n_samples"),
          col("total_dc"), col("nyq_tot"), col("quarter_tot"),
          (abs(col("total_dc")) > col("n_samples") * 8448).cast("int")
            .as("dc_offset"),
          (col("nyq_tot") > col("quarter_tot")).cast("int").as("alternation"))
        .orderBy(col("doc_id")))

  /** Image near-dup fingerprint: average-hash (aHash) over DECODED
    * pixels — decode, 8×8 nearest-neighbor resample, threshold each
    * cell against the 64-cell mean (exact integer form px·64 ≥ Σ),
    * emit the 64-char bitstring plus its dup-group size. The oracle
    * replays the resample's index math and the threshold from `text`;
    * group sizes come from a keyed window on the hash (hash-
    * partitioned at scale, never a global window). */
  val q150ImageAhash = GraftQuery(
    "q150_image_ahash",
    "average-hash image fingerprint + dup-group size vs text replay",
    Some("""WITH img AS (
        SELECT doc_id,
          CAST(doc_id % 24 + 8 AS BIGINT) AS w,
          CAST(doc_id % 12 + 8 AS BIGINT) AS h,
          text, CAST(length(text) AS BIGINT) AS len
        FROM documents WHERE doc_id % 3 = 0),
      g AS (
        SELECT doc_id,
          list_transform(range(64), j ->
            CASE WHEN len = 0 THEN 0 ELSE ascii(text[
              CAST((least(h - 1, (j // 8) * h // 8) * w
                    + least(w - 1, (j % 8) * w // 8)) % len AS INT) + 1])
            END) AS px
        FROM img),
      hs AS (
        SELECT doc_id, px, list_aggregate(px, 'sum') AS s64 FROM g),
      hsh AS (
        SELECT doc_id,
          list_aggregate(list_transform(range(64), j ->
            CASE WHEN px[CAST(j AS INT) + 1] * 64 >= s64
                 THEN '1' ELSE '0' END), 'string_agg', '') AS ahash
        FROM hs)
      SELECT doc_id, ahash,
        CAST(COUNT(*) OVER (PARTITION BY ahash) AS BIGINT) AS group_size
      FROM hsh ORDER BY doc_id"""),
    (s, d) => {
      import s.implicits._
      Multimodal.syntheticPngMedia(s, documents(s, d))
        .filter(col("kind") === "image")
        .select(col("id"), col("payload")).as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, payload) =>
          val img = PngCodec.decode(payload).get
          val small = PngCodec.resizeNearest(img, 8, 8)
          var sum = 0
          small.pixels.foreach(b => sum += java.lang.Byte.toUnsignedInt(b))
          val bits = small.pixels.map(b =>
            if (java.lang.Byte.toUnsignedInt(b) * 64 >= sum) '1' else '0')
          (id, new String(bits))
        })
        .toDF("doc_id", "ahash")
        .withColumn("group_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("ahash"))))
        .orderBy(col("doc_id"))
    })

  /** Video path: the frame cutter ([[Multimodal.sampleFrames]], a
    * row-generating flatMap) at stride 32, pinned per frame — index,
    * length and byte sum — against DuckDB slicing the same text into
    * 32-byte windows. Chunk-boundary bugs (off-by-one, short final
    * frame) break the per-frame pins. */
  val q148FrameSample = GraftQuery(
    "q148_frame_sample",
    "per-frame length + byte sum of strided video frames vs text slices",
    Some("""WITH vid AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
          list_transform(range(length(text)), i -> ascii(text[i+1])) AS bytes
        FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0),
      f AS (
        SELECT doc_id, len, bytes,
          unnest(range(CAST(ceil(len / 32.0) AS BIGINT))) AS k
        FROM vid)
      SELECT doc_id, CAST(k AS INT) AS frame_idx,
        CAST(least(32, len - k * 32) AS INT) AS frame_len,
        CAST(list_aggregate(
          bytes[CAST(k * 32 + 1 AS INT):CAST(least(len, (k + 1) * 32) AS INT)],
          'sum') AS BIGINT) AS frame_sum
      FROM f ORDER BY doc_id, frame_idx"""),
    (s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
          s, Multimodal.syntheticPngMedia(s, documents(s, d)), stride = 32)
        .map { f =>
          var sum = 0L
          f.frame.foreach(b => sum += java.lang.Byte.toUnsignedInt(b))
          (f.id, f.frame_idx, f.frame.length, sum)
        }
        .toDF("doc_id", "frame_idx", "frame_len", "frame_sum")
        .orderBy(col("doc_id"), col("frame_idx"))
    })

  /** Video triage gate — the third modality's q155/q156 sibling, over
    * FULL frames only (the short tail frame would pollute the
    * frame-sum variance with a length artifact; sub-frame clips carry
    * no frame statistics and drop out, both sides): per video, the
    * frame-sum moments and two flags — static (inter-frame variance
    * below the corpus median 3695: m·Σf² − (Σf)² < 3695·m²; a
    * one-frame video is static by definition) and has_dim_frame
    * (dimmest full frame below the median sum 2923). Median-
    * calibrated so both flags split the fixture; every comparison is
    * integer-exact in the oracle. */
  val q158VideoQualityGate = GraftQuery(
    "q158_video_quality_gate",
    "per-video triage: full-frame sum moments + static/dim-frame flags",
    Some("""WITH vid AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
          list_transform(range(length(text)), i -> ascii(text[i+1])) AS bytes
        FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0),
      f AS (
        SELECT doc_id,
          unnest(range(CAST(len // 32 AS BIGINT))) AS k, bytes, len
        FROM vid),
      s AS (
        SELECT doc_id, CAST(list_aggregate(
            bytes[CAST(k * 32 + 1 AS INT):CAST((k + 1) * 32 AS INT)],
            'sum') AS BIGINT) AS fs
        FROM f),
      d AS (
        SELECT doc_id, COUNT(*) AS m, SUM(fs) AS s1, SUM(fs * fs) AS s2,
          MIN(fs) AS mn
        FROM s GROUP BY doc_id)
      SELECT doc_id, CAST(m AS BIGINT) AS n_full_frames,
        CAST(s1 AS BIGINT) AS frames_sum,
        CAST(s2 AS BIGINT) AS frames_sumsq,
        CAST(mn AS BIGINT) AS min_frame_sum,
        CAST(CASE WHEN m * s2 - s1 * s1 < 3695 * m * m THEN 1 ELSE 0 END
          AS INT) AS static,
        CAST(CASE WHEN mn < 2923 THEN 1 ELSE 0 END AS INT) AS has_dim_frame
      FROM d ORDER BY doc_id"""),
    (s, d) => {
      import s.implicits._
      Multimodal.sampleFrames(
          s, Multimodal.syntheticPngMedia(s, documents(s, d)), stride = 32)
        .filter(_.frame.length == 32)
        .map { f =>
          var sum = 0L
          f.frame.foreach(b => sum += java.lang.Byte.toUnsignedInt(b))
          (f.id, sum)
        }
        .toDF("doc_id", "frame_sum")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_full_frames"),
          sum(col("frame_sum")).as("frames_sum"),
          sum(col("frame_sum") * col("frame_sum")).as("frames_sumsq"),
          min(col("frame_sum")).as("min_frame_sum"))
        .select(col("doc_id"), col("n_full_frames"), col("frames_sum"),
          col("frames_sumsq"), col("min_frame_sum"),
          (col("n_full_frames") * col("frames_sumsq") -
            col("frames_sum") * col("frames_sum") <
            col("n_full_frames") * col("n_full_frames") * 3695)
            .cast("int").as("static"),
          (col("min_frame_sum") < 2923).cast("int").as("has_dim_frame"))
        .orderBy(col("doc_id"))
    })
}
