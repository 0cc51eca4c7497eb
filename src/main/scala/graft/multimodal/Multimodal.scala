package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing — SURVEY.md §7.6 north star.
  *
  * Media are opaque `binary` payloads with typed metadata; decode /
  * feature-extract / frame-sample run batch-wise over partitions
  * (`Dataset.mapPartitions` — the Scala analogue of arrow-batched
  * Python UDFs). Header decode is real ([[parseImageDims]] /
  * [[parseWavInfo]]), and the PIXEL path is real for BOTH image
  * codecs: [[PngCodec]] round-trips actual deflate-compressed,
  * scanline-filtered image data, and [[JpegCodec]] entropy-decodes
  * baseline-sequential JPEG (Huffman + dequant + IDCT + YCbCr), so
  * feature extraction histograms decoded pixels and resize is a true
  * 2-D nearest-neighbor resample with re-encode in the SOURCE format
  * ([[realImageFeatures]] / [[resizeImages]]; JPEG in → JPEG out via
  * [[JpegCodec.encode]], PNG in → PNG out).
  * Payloads neither codec accepts (progressive JPEG, malformed bytes)
  * fall back to the deterministic byte-level fakes, same contracts.
  */
object Multimodal {

  /** (id, kind, payload BINARY, meta STRUCT<width,height,sample_rate>) */
  case class MediaRow(id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(id: Long, kind: String, features: Array[Float])

  case class Frame(id: Long, frame_idx: Int, frame: Array[Byte])

  /** Deterministic synthetic media table derived from `documents`
    * (kind round-robins image/audio/video) — stands in for a real
    * binary column so the pipeline has data. Image payloads carry a
    * REAL PNG signature + IHDR chunk encoding the metadata dims, and
    * audio payloads a REAL RIFF/WAVE `fmt ` chunk encoding the
    * metadata sample rate (both built from codegen hex/concat
    * expressions, no UDF), so the header decode paths run against
    * genuine bytes; video stays raw UTF-8.
    */
  def syntheticMedia(docs: DataFrame): DataFrame = {
    val kind = element_at(array(lit("image"), lit("audio"), lit("video")),
      (col("doc_id") % 3 + 1).cast("int"))
    val w = ((col("doc_id") % 8) * 64 + 64).cast("int")
    val h = ((col("doc_id") % 4) * 64 + 64).cast("int")
    val rate = (((col("doc_id") % 3) + 1) * 8000).cast("int")
    // PNG signature, IHDR length (13) + type, then 4-byte big-endian
    // width/height (unhex of zero-padded hex IS big-endian), then
    // bit-depth/color-type/compression/filter/interlace
    val pngHeader = concat(
      unhex(lit("89504E470D0A1A0A0000000D49484452")),
      unhex(lpad(hex(w), 8, "0")),
      unhex(lpad(hex(h), 8, "0")),
      unhex(lit("0806000000")))
    // WAV fields are LITTLE-endian: swap the zero-padded hex's byte
    // pairs before unhex. RIFF size / data size are left zero (legal
    // for a header-only probe); fmt = PCM, mono, 16-bit.
    def le32(v: org.apache.spark.sql.Column) = {
      val hx = lpad(hex(v), 8, "0")
      unhex(concat(substring(hx, 7, 2), substring(hx, 5, 2),
        substring(hx, 3, 2), substring(hx, 1, 2)))
    }
    val wavHeader = concat(
      lit("RIFF").cast("binary"), unhex(lit("00000000")),
      lit("WAVE").cast("binary"),
      lit("fmt ").cast("binary"), unhex(lit("10000000")), // fmt size 16 LE
      unhex(lit("0100")), unhex(lit("0100")),             // PCM, 1 channel
      le32(rate),                                         // sample rate
      le32(rate * 2),                                     // byte rate
      unhex(lit("0200")), unhex(lit("1000")),             // align, 16 bit
      lit("data").cast("binary"), unhex(lit("00000000")))
    docs.select(
      col("doc_id").as("id"),
      kind.as("kind"),
      when(kind === "image", concat(pngHeader, col("text").cast("binary")))
        .when(kind === "audio", concat(wavHeader, col("text").cast("binary")))
        .otherwise(col("text").cast("binary")).as("payload"),
      w.as("width"),
      h.as("height"),
      rate.as("sample_rate"))
  }

  /** Deterministic synthetic media with REAL PNG image payloads:
    * pixels derive from the document text (bytes cycled over a
    * gray w×h raster) and run through the true encoder — deflate,
    * CRCs, filter bytes — so every pixel-path consumer downstream
    * exercises genuine image bytes. Dims are kept small (the doc-id
    * pattern mod 24 + 8) because the VALUE here is codec realism,
    * not raster size. Audio/video rows match [[syntheticMedia]].
    */
  /** The JVM twin of [[syntheticMedia]]'s SQL-built WAV header (PCM,
    * mono, 16-bit), so this generator's audio rows exercise
    * [[parseWavInfo]] the same way its image rows exercise the full
    * PNG decode — here with a real data chunk of `dataSize` bytes
    * following (the SQL twin stays header-only, documented there). */
  private def wavHeader(rate: Int, dataSize: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)          // PCM, 1 channel
      .putInt(rate).putInt(rate * 2)    // sample rate, byte rate
      .putShort(2).putShort(16)         // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    bb.array()
  }

  def syntheticPngMedia(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val kind = Seq("image", "audio", "video")((id % 3).toInt)
        val w = (id % 24 + 8).toInt
        val h = (id % 12 + 8).toInt
        val rate = ((id % 3 + 1) * 8000).toInt
        val payload = kind match {
          case "image" =>
            val tb = text.getBytes("UTF-8")
            val px = new Array[Byte](w * h)
            var i = 0
            while (i < px.length) {
              px(i) = if (tb.isEmpty) 0 else tb(i % tb.length); i += 1
            }
            PngCodec.encode(PngCodec.Image(w, h, 1, px))
          case "audio" =>
            // REAL PCM data chunk: one signed 16-bit LE sample per text
            // byte, value (byte − 128) · 256 — full decode surface
            // (chunk walk + sample parse), analytically replayable
            val tb = text.getBytes("UTF-8")
            val pcm = new Array[Byte](tb.length * 2)
            var i = 0
            while (i < tb.length) {
              pcm(2 * i) = 0 // LE low byte
              pcm(2 * i + 1) =
                (java.lang.Byte.toUnsignedInt(tb(i)) - 128).toByte
              i += 1
            }
            wavHeader(rate, pcm.length) ++ pcm
          case _ => text.getBytes("UTF-8")
        }
        MediaRow(id, kind, payload, w, h, rate)
      }).toDF()
  }

  /** Real image header decode (public formats, pure JVM):
    *  - PNG: 8-byte signature, then the mandatory-first IHDR chunk —
    *    width/height are 4-byte big-endian at offsets 16/20.
    *  - JPEG: FFD8 (SOI), then marker segments `FF xx len(2) …`; the
    *    frame header SOFn (0xC0–0xCF minus 0xC4/0xC8/0xCC) carries
    *    height/width big-endian after the 1-byte precision.
    * Returns (format, width, height); None for anything unparseable.
    */
  private[multimodal] def parseImageDims(p: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int) = java.lang.Byte.toUnsignedInt(p(i))
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int) = (u16(i).toLong << 16 | u16(i + 2)).toInt
    if (p.length >= 24 &&
        u8(0) == 0x89 && u8(1) == 0x50 && u8(2) == 0x4E && u8(3) == 0x47 &&
        u8(4) == 0x0D && u8(5) == 0x0A && u8(6) == 0x1A && u8(7) == 0x0A &&
        p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R')
      Some(("png", u32(16), u32(20)))
    else if (p.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      var i = 2
      while (i + 3 < p.length) {
        if (u8(i) != 0xFF) return None // marker desync: not a JPEG stream
        val marker = u8(i + 1)
        if (marker == 0xFF) i += 1 // fill byte
        else if ((marker >= 0xD0 && marker <= 0xD9)) i += 2 // RSTn/SOI/EOI: no payload
        else if (marker >= 0xC0 && marker <= 0xCF &&
                 marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          // SOFn: len(2) precision(1) height(2) width(2)
          return if (i + 8 < p.length) Some(("jpeg", u16(i + 7), u16(i + 5))) else None
        } else i += 2 + u16(i + 2)
      }
      None
    } else None
  }

  /** Real WAV header decode (public RIFF format, pure JVM): `RIFF`
    * sig + `WAVE`, then chunk-walk (id(4) + size(4 LE)) to `fmt `,
    * whose PCM fields are little-endian: channels at +2, sample rate
    * at +4, bits/sample at +14. Returns (sampleRate, channels, bits);
    * None for anything unparseable.
    */
  private[multimodal] def parseWavInfo(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = java.lang.Byte.toUnsignedInt(p(i))
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = (le16(i).toLong | (le16(i + 2).toLong << 16)).toInt
    def tag(i: Int, s: String) = p.length >= i + 4 &&
      s.zipWithIndex.forall { case (c, j) => p(i + j) == c.toByte }
    if (!(p.length >= 12 && tag(0, "RIFF") && tag(8, "WAVE"))) None
    else {
      // walk with a Long cursor: a malformed chunk size (negative after
      // the signed-int truncation, or huge) must fall through to None,
      // never spin the loop or index out of bounds — this decoder's
      // whole job is surviving untrusted bytes
      var i = 12L
      while (i + 8 <= p.length) {
        val size = le32(i.toInt + 4).toLong & 0xFFFFFFFFL
        if (tag(i.toInt, "fmt ")) {
          return if (i + 8 + 16 <= p.length && size >= 16)
            Some((le32(i.toInt + 12), le16(i.toInt + 10), le16(i.toInt + 22)))
          else None
        }
        i += 8 + size + (size & 1) // chunks are word-aligned
      }
      None
    }
  }

  /** Locate the PCM payload: walk RIFF chunks for BOTH `fmt ` (sample
    * rate) and `data` (offset + byte count). The data size is clamped
    * to the bytes actually present and rounded down to whole samples —
    * untrusted headers routinely overstate it. Returns
    * (sampleRate, dataOffset, dataBytes); None if either chunk is
    * missing or the stream is malformed. */
  private[multimodal] def parsePcm(p: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int) = java.lang.Byte.toUnsignedInt(p(i))
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = (le16(i).toLong | (le16(i + 2).toLong << 16)).toInt
    def tag(i: Int, s: String) = p.length >= i + 4 &&
      s.zipWithIndex.forall { case (c, j) => p(i + j) == c.toByte }
    if (!(p.length >= 12 && tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var rate = -1
    var i = 12L
    while (i + 8 <= p.length) {
      val size = le32(i.toInt + 4).toLong & 0xFFFFFFFFL
      if (tag(i.toInt, "fmt ")) {
        if (!(i + 8 + 16 <= p.length && size >= 16)) return None
        rate = le32(i.toInt + 12)
      } else if (tag(i.toInt, "data")) {
        if (rate <= 0) return None // fmt must precede data (spec order)
        val off = (i + 8).toInt
        val avail = math.min(size, (p.length - off).toLong).toInt
        return Some((rate, off, avail & ~1))
      }
      i += 8 + size + (size & 1)
    }
    None
  }

  case class PcmWindow(id: Long, win_idx: Int, n_samples: Int, energy: Long)

  /** Windowed PCM energy — the audio analogue of a quality filter:
    * parse the real 16-bit LE samples out of each WAV payload and emit
    * per-window sample count + Σ sample² (exact integer). Payloads
    * without a parseable PCM stream yield no rows (refusal, not
    * garbage). Row-generating flatMap over partition batches. */
  def pcmWindows(spark: SparkSession, media: DataFrame, window: Int = 100)
      : Dataset[PcmWindow] = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parsePcm(p) match {
          case Some((_, off, nBytes)) =>
            val n = nBytes / 2
            (0 until (n + window - 1) / window).iterator.map { k =>
              val start = k * window
              val end = math.min(n, start + window)
              var e = 0L
              var i = start
              while (i < end) {
                val lo = java.lang.Byte.toUnsignedInt(p(off + 2 * i))
                val hi = p(off + 2 * i + 1).toInt // sign-extends
                val s = (hi << 8) | lo
                e += s.toLong * s
                i += 1
              }
              PcmWindow(id, k, end - start, e)
            }
          case None => Iterator.empty
        }
      }
  }

  case class SpectralWindow(id: Long, win_idx: Int, n_samples: Int,
                            dc: Long, nyq_pow: Long, quarter_pow: Long)

  /** Per-frame spectral features at the three exactly-representable
    * DFT bins — k = 0 (DC), k = N/4 (quarter band) and k = N/2
    * (Nyquist), whose twiddle factors are all in {0, ±1}: the framed
    * decomposition stays pure 64-bit integer arithmetic end to end,
    * so the oracle replays it value-exactly (a general-bin DFT would
    * ride on floating-point sum order — un-oracle-able; these three
    * bins are the standard cheap triage for silence / DC offset /
    * alternation artifacts in audio curation). Frame phase is LOCAL
    * (t = position within the frame), matching a per-frame transform.
    * Same typed-flatMap batch shape as [[pcmWindows]]: one pass over
    * the payload bytes, no per-sample rows ever hit a shuffle.
    */
  def spectralWindows(spark: SparkSession, media: DataFrame,
                      frame: Int = 64): Dataset[SpectralWindow] = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        parsePcm(p) match {
          case Some((_, off, nBytes)) =>
            val n = nBytes / 2
            (0 until (n + frame - 1) / frame).iterator.map { k =>
              val start = k * frame
              val end = math.min(n, start + frame)
              var dc = 0L; var ny = 0L; var qc = 0L; var qs = 0L
              var t = 0
              while (start + t < end) {
                val i = start + t
                val lo = java.lang.Byte.toUnsignedInt(p(off + 2 * i))
                val hi = p(off + 2 * i + 1).toInt // sign-extends
                val s = ((hi << 8) | lo).toLong
                dc += s
                ny += (if ((t & 1) == 0) s else -s)
                (t & 3) match { // e^(-i·π·t/2): cos {1,0,-1,0}, -sin {0,-1,0,1}
                  case 0 => qc += s
                  case 1 => qs -= s
                  case 2 => qc -= s
                  case 3 => qs += s
                }
                t += 1
              }
              SpectralWindow(id, k, end - start, dc, ny * ny, qc * qc + qs * qs)
            }
          case None => Iterator.empty
        }
      }
  }

  case class AudioInfo(id: Long, format: String, sample_rate: Int,
                       channels: Int, bits: Int)

  /** Audio header decode over partition batches — the WAV sibling of
    * [[imageInfo]]; headerless payloads fall back to the metadata
    * sample rate with format "raw". */
  def audioInfo(spark: SparkSession, media: DataFrame): Dataset[AudioInfo] = {
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select(col("id"), col("payload"), col("sample_rate"))
      .as[(Long, Array[Byte], Int)]
      .mapPartitions(_.map { case (id, p, metaRate) =>
        parseWavInfo(p) match {
          case Some((rate, ch, bits)) => AudioInfo(id, "wav", rate, ch, bits)
          case None => AudioInfo(id, "raw", metaRate, 0, 0)
        }
      })
  }

  case class ImageInfo(id: Long, format: String, width: Int, height: Int)

  /** Header decode over partition batches: parse each image payload's
    * real container header; payloads without a recognizable header
    * fall back to the metadata columns with format "raw". Bytes never
    * hit the driver; partitioning is preserved.
    */
  def imageInfo(spark: SparkSession, media: DataFrame): Dataset[ImageInfo] = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("id"), col("payload"), col("width"), col("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, p, mw, mh) =>
        parseImageDims(p) match {
          case Some((fmt, w, h)) => ImageInfo(id, fmt, w, h)
          case None => ImageInfo(id, "raw", mw, mh)
        }
      })
  }

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

  /** REAL pixel features for a decoded image: the normalized
    * `dim`-bin intensity histogram over DECODED pixel values —
    * computed from bytes that actually went through inflate +
    * un-filtering, not from the compressed payload. */
  private[multimodal] def realImageFeatures(img: PngCodec.Image, dim: Int): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < img.pixels.length) {
      acc(java.lang.Byte.toUnsignedInt(img.pixels(i)) * dim / 256) += 1.0f
      i += 1
    }
    val n = math.max(img.pixels.length, 1).toFloat
    var j = 0
    while (j < dim) { acc(j) /= n; j += 1 }
    acc
  }

  /** Feature extraction over partition batches: one pass per partition,
    * payload bytes never hit the driver. Partition count (and therefore
    * batch shape / parallelism) is preserved from the input — at scale,
    * repartition upstream to match executor memory to payload sizes.
    * Images that decode as PNG or baseline JPEG get REAL pixel-
    * intensity histograms; everything else falls back to the
    * deterministic byte fold. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("id"), col("kind"), col("payload")).as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        val feats =
          if (kind == "image") PngCodec.decode(payload)
            .orElse(JpegCodec.decode(payload))
            .map(realImageFeatures(_, dim))
            .getOrElse(decodeStub(payload, dim))
          else decodeStub(payload, dim)
        MediaFeatures(id, kind, feats)
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
                     src_width: Int, src_height: Int, width: Int, height: Int)

  /** Image resize over partition batches — payload AND metadata change
    * together, rows stay 1:1, partitioning preserved. PNG and baseline
    * JPEG payloads take the REAL path: decode → 2-D nearest-neighbor
    * resample → re-encode IN THE SOURCE FORMAT, so the output payload
    * is itself a valid PNG or baseline JPEG at the target dims.
    * Unparseable payloads keep the byte-resample stub with
    * header-parsed (or metadata) source dims — same output contract. */
  def resizeImages(spark: SparkSession, media: DataFrame, w: Int, h: Int)
      : Dataset[Resized] = {
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select(col("id"), col("kind"), col("payload"), col("width"), col("height"))
      .as[(Long, String, Array[Byte], Int, Int)]
      .mapPartitions(_.map { case (id, kind, payload, mw, mh) =>
        PngCodec.decode(payload).map((_, false))
          .orElse(JpegCodec.decode(payload).map((_, true))) match {
          case Some((img, wasJpeg)) =>
            val resized = PngCodec.resizeNearest(img, w, h)
            val bytes =
              if (wasJpeg) JpegCodec.encode(resized)
              else PngCodec.encode(resized)
            Resized(id, kind, bytes, img.width, img.height, w, h)
          case None =>
            val (sw, sh) = parseImageDims(payload)
              .map(t => (t._2, t._3)).getOrElse((mw, mh))
            Resized(id, kind, resizeStub(payload, w, h), sw, sh, w, h)
        }
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
