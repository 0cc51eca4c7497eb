package graft.multimodal

import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // orderBy before limit: a bare limit() is only deterministic while
  // the scan stays single-partition, and it re-evaluates per action —
  // the fixture must pin WHICH 60 docs it means
  private def media = Multimodal.syntheticMedia(
    Tables.documents(spark, SparkTestSession.Sf0001)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")).limit(60))

  test("media schema carries an opaque binary payload + typed metadata") {
    val m = media
    assert(m.schema("payload").dataType === BinaryType)
    assert(Seq("id", "kind", "payload", "width", "height", "sample_rate")
      .forall(m.columns.contains))
    val kinds = m.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("extractFeatures runs per-partition, preserves partitioning, normalizes") {
    val parted = media.repartition(3)
    val feats = Multimodal.extractFeatures(spark, parted, dim = 8)
    assert(feats.rdd.getNumPartitions === 3, "batch shape = input partitioning")
    val rows = feats.collect()
    assert(rows.length === 60)
    rows.foreach { f =>
      assert(f.features.length === 8)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3, "histogram sums to 1")
    }
  }

  test("extractFeatures is deterministic (stub contract)") {
    val a = Multimodal.extractFeatures(spark, media, dim = 8)
      .collect().map(f => f.id -> f.features.toSeq).toMap
    val b = Multimodal.extractFeatures(spark, media, dim = 8)
      .collect().map(f => f.id -> f.features.toSeq).toMap
    assert(a === b)
  }

  test("sampleFrames cuts video payloads into ordered fixed-stride frames") {
    val frames = Multimodal.sampleFrames(spark, media, stride = 50).collect()
    val byId = frames.groupBy(_.id)
    assert(byId.nonEmpty)
    val videoSizes = media.filter(org.apache.spark.sql.functions.col("kind") === "video")
      .select("id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).length).toMap
    byId.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      assert(fs.map(_.frame.length).sum === videoSizes(id))
    }
  }

  test("resizeImages rewrites payload and metadata together, 1:1 rows") {
    val resized = Multimodal.resizeImages(spark, media, w = 32, h = 16).collect()
    val meta = media
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(resized.length === meta.size)
    resized.foreach { r =>
      assert(r.payload.length === 32 * 16, "payload sized to the new dims")
      assert(r.width === 32 && r.height === 16)
      // source dims decoded from the REAL PNG header, not the metadata
      assert((r.src_width, r.src_height) === meta(r.id), "header dims")
    }
    // deterministic stub: a rerun produces identical bytes
    val again = Multimodal.resizeImages(spark, media, w = 32, h = 16)
      .collect().map(r => r.id -> r.payload.toSeq).toMap
    assert(resized.map(r => r.id -> r.payload.toSeq).toMap === again)
  }

  test("parseImageDims reads real PNG IHDR and JPEG SOF0 headers") {
    // hand-assembled PNG: signature + IHDR(640x360)
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be32(13) ++ "IHDR".getBytes ++ be32(640) ++ be32(360) ++
      Array[Byte](8, 6, 0, 0, 0)
    assert(Multimodal.parseImageDims(png) === Some(("png", 640, 360)))
    // hand-assembled JPEG: SOI, APP0 (JFIF stub), DQT skipped by length,
    // then SOF0 with height=480 width=852 — the parser must WALK the
    // variable-length segments to find it
    def seg(marker: Int, body: Array[Byte]) =
      Array[Byte](0xFF.toByte, marker.toByte,
        ((body.length + 2) >>> 8).toByte, ((body.length + 2) & 0xFF).toByte) ++ body
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      seg(0xE0, "JFIF".getBytes ++ new Array[Byte](10)) ++
      seg(0xDB, new Array[Byte](65)) ++
      seg(0xC0, Array[Byte](8,
        (480 >>> 8).toByte, (480 & 0xFF).toByte,
        (852 >>> 8).toByte, (852 & 0xFF).toByte, 3))
    assert(Multimodal.parseImageDims(jpeg) === Some(("jpeg", 852, 480)))
    // garbage falls through to None (metadata fallback path)
    assert(Multimodal.parseImageDims("not an image".getBytes) === None)
    assert(Multimodal.parseImageDims(Array.emptyByteArray) === None)
  }

  test("parseWavInfo walks RIFF chunks to fmt and reads little-endian fields") {
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, (v >>> 8).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16(v >>> 16)
    // a LIST chunk before fmt forces the walk to skip by chunk size
    val wav = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(4) ++ "INFO".getBytes ++
      "fmt ".getBytes ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(44100 * 4) ++
      le16(4) ++ le16(16) ++
      "data".getBytes ++ le32(0)
    assert(Multimodal.parseWavInfo(wav) === Some((44100, 2, 16)))
    assert(Multimodal.parseWavInfo("RIFFxxxxNOPE".getBytes) === None)
    assert(Multimodal.parseWavInfo("not audio".getBytes) === None)
    // malformed chunk sizes must fall through to None, not hang/crash:
    // 0xFFFFFFF8 is -8 as a signed int (a frozen cursor if unguarded)
    val evil = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte) ++
      "junk".getBytes
    assert(Multimodal.parseWavInfo(evil) === None)
    val huge = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le32(0x7FFFFFF0) ++ "junk".getBytes
    assert(Multimodal.parseWavInfo(huge) === None)
  }

  test("spectralWindows: basis signals land in exactly one integer bin each") {
    import spark.implicits._
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16(v >>> 16)
    def wav(samples: Seq[Int]) =
      "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
        le32(16000) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(samples.length * 2) ++
        samples.flatMap(le16).toArray
    val m = Seq(
      (1L, "audio", wav(Seq(5, 5, 5, 5, 9, 0))),   // DC + a partial frame
      (2L, "audio", wav(Seq(7, -7, 7, -7))),       // Nyquist (alternation)
      (3L, "audio", wav(Seq(9, 0, -9, 0))),        // quarter-band cosine
      (4L, "image", Array[Byte](1, 2, 3)))         // filtered out
      .toDF("id", "kind", "payload")
    val out = Multimodal.spectralWindows(spark, m, frame = 4).collect()
      .map(w => (w.id, w.win_idx) -> ((w.n_samples, w.dc, w.nyq_pow, w.quarter_pow)))
      .toMap
    assert(out((1L, 0)) === ((4, 20L, 0L, 0L)))    // pure DC: other bins silent
    // partial frame restarts LOCAL phase: [9,0] -> dc 9, ny 9^2, q (9,0)
    assert(out((1L, 1)) === ((2, 9L, 81L, 81L)))
    assert(out((2L, 0)) === ((4, 0L, 784L, 0L)))   // alternation: Nyquist only
    assert(out((3L, 0)) === ((4, 0L, 0L, 324L)))   // period-4: quarter only
    assert(!out.keySet.exists(_._1 == 4L))         // non-audio rows filtered
  }

  test("audioInfo decodes every synthetic audio's WAV header to its metadata rate") {
    val infos = Multimodal.audioInfo(spark, media).collect()
    val meta = media
      .filter(org.apache.spark.sql.functions.col("kind") === "audio")
      .select("id", "sample_rate").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(infos.length === meta.size)
    infos.foreach { a =>
      assert(a.format === "wav", s"id ${a.id} should carry a real WAV header")
      assert(a.sample_rate === meta(a.id))
      assert(a.channels === 1 && a.bits === 16)
    }
  }

  test("imageInfo decodes every synthetic image's PNG header to its metadata dims") {
    val infos = Multimodal.imageInfo(spark, media).collect()
    val meta = media
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("id", "width", "height").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(infos.length === meta.size)
    infos.foreach { i =>
      assert(i.format === "png", s"id ${i.id} should carry a real PNG header")
      assert((i.width, i.height) === meta(i.id))
    }
  }

  test("extracted features feed the similarity stack (multimodal -> ANN)") {
    import org.apache.spark.sql.functions._
    // the composition contract: feature vectors from the media pipeline
    // are a drop-in corpus for the embedding similarity operators
    val feats = Multimodal.extractFeatures(spark, media, dim = 8)
      .toDF().select(col("id").as("vec_id"), col("features").as("embedding"))
    val topk = graft.text.Similarity
      .cosineTopK(feats, isQuery = col("vec_id") < 3, k = 2)
    val rows = topk.collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.keySet === Set(0L, 1L, 2L))
    perQuery.values.foreach(g => assert(g.length === 2))
  }

  // same deterministic-subset rule as `media` above
  private def pngMedia = Multimodal.syntheticPngMedia(spark,
    Tables.documents(spark, SparkTestSession.Sf0001)
      .orderBy(org.apache.spark.sql.functions.col("doc_id")).limit(60))

  test("syntheticPngMedia image payloads are complete, decodable PNGs") {
    val images = pngMedia
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .collect()
    assert(images.nonEmpty)
    images.foreach { r =>
      val decoded = PngCodec.decode(r.getAs[Array[Byte]]("payload"))
      assert(decoded.isDefined, s"id ${r.getLong(0)}: payload not a real PNG")
      assert(decoded.get.width === r.getInt(3) &&
        decoded.get.height === r.getInt(4),
        s"id ${r.getLong(0)}: decoded dims != metadata")
    }
  }

  test("extractFeatures histograms REAL decoded pixels for PNG payloads") {
    val m = pngMedia
    val feats = Multimodal.extractFeatures(spark, m, dim = 8)
      .collect().map(f => f.id -> f).toMap
    val images = m
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .collect()
    images.foreach { r =>
      val img = PngCodec.decode(r.getAs[Array[Byte]]("payload")).get
      // hand-computed pixel-intensity histogram must match exactly
      val expect = new Array[Float](8)
      img.pixels.foreach(b =>
        expect(java.lang.Byte.toUnsignedInt(b) * 8 / 256) += 1.0f)
      val n = img.pixels.length.toFloat
      val got = feats(r.getLong(0)).features
      expect.indices.foreach(i =>
        assert(math.abs(got(i) - expect(i) / n) < 1e-6f,
          s"id ${r.getLong(0)} bin $i: ${got(i)} vs ${expect(i) / n}"))
    }
  }

  test("resizeImages emits valid PNGs at target dims with true source dims") {
    val resized = Multimodal.resizeImages(spark, pngMedia, 6, 4).collect()
    val srcDims = pngMedia
      .filter(org.apache.spark.sql.functions.col("kind") === "image")
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(resized.length === srcDims.size)
    resized.foreach { r =>
      assert((r.src_width, r.src_height) === srcDims(r.id))
      val out = PngCodec.decode(r.payload)
      assert(out.isDefined, s"id ${r.id}: resized payload is not a valid PNG")
      assert(out.get.width === 6 && out.get.height === 4)
      // spot-check geometry: resized pixels are a nearest-neighbor
      // subsample of the decoded source
      val src = PngCodec.decode(
        pngMedia.filter(org.apache.spark.sql.functions.col("id") === r.id)
          .collect().head.getAs[Array[Byte]]("payload")).get
      val expect = PngCodec.resizeNearest(src, 6, 4)
      assert(out.get.pixels.toSeq === expect.pixels.toSeq)
    }
  }

  test("baseline JPEG payloads run the REAL pixel path; malformed falls back") {
    import spark.implicits._
    import JpegTestImages._
    // crafted baseline JPEG (8×8, every pixel 152) + a malformed
    // SOF2 stream (baseline-shaped scan header — illegal progressive)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", gray8x8Dc12(), 8, 8, 0),
      Multimodal.MediaRow(2L, "image", progressive8x8(), 8, 8, 0))
    val m = spark.createDataset(rows).toDF()
    val feats = Multimodal.extractFeatures(spark, m, dim = 8)
      .collect().map(f => f.id -> f.features).toMap
    // id 1 decodes: all 64 pixels = 152 → histogram bin 152·8/256 = 4
    val expect = new Array[Float](8); expect(4) = 1.0f
    assert(feats(1L).toSeq === expect.toSeq,
      "baseline JPEG must histogram DECODED pixels")
    // id 2 is refused by the codec → deterministic byte-fold fallback
    val p2 = rows(1).payload
    val stub = new Array[Float](8)
    p2.foreach(b => stub(java.lang.Byte.toUnsignedInt(b) % 8) += 1.0f)
    assert(feats(2L).toSeq === stub.map(_ / p2.length).toSeq,
      "malformed JPEG must take the refusal fallback")
    // resize re-encodes the baseline JPEG as a valid baseline JPEG at
    // the target dims (format-preserving, no PNG transcode)
    val resized = Multimodal.resizeImages(spark, m, 4, 4)
      .collect().map(r => r.id -> r).toMap
    assert(Multimodal.parseImageDims(resized(1L).payload)
      === Some(("jpeg", 4, 4)))
    val out = JpegCodec.decode(resized(1L).payload)
    assert(out.isDefined && out.get.width === 4 && out.get.height === 4)
    // a flat block survives quantization exactly: all pixels stay 152
    assert(out.get.pixels.forall(b => java.lang.Byte.toUnsignedInt(b) == 152))
    assert((resized(1L).src_width, resized(1L).src_height) === ((8, 8)))
  }
}
