package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import JpegTestImages._

/** Pixel-exact decode of hand-assembled baseline JPEGs (independent
  * encodings of known coefficients — see [[JpegTestImages]]) plus the
  * refusal contract on everything non-baseline/malformed. */
class JpegCodecSpec extends AnyFunSuite {

  /** Independent direct-form IDCT (T.81 A.3.3 verbatim, O(64²)) over
    * NATURAL-order dequantized coefficients — pins the decoder's
    * separable implementation. */
  private def refIdct(coef: Array[Int]): Array[Int] =
    (0 until 64).map { i =>
      val x = i % 8
      val y = i / 8
      val s = (for (u <- 0 until 8; v <- 0 until 8) yield {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        cu * cv * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }).sum / 4.0
      val p = math.round(s + 128.0).toInt
      math.max(0, math.min(255, p))
    }.toArray

  private def px(img: PngCodec.Image): Array[Int] =
    img.pixels.map(java.lang.Byte.toUnsignedInt)

  test("DC-only block decodes to the analytic flat value") {
    val img = JpegCodec.decode(gray8x8Dc12()).get
    assert(img.width === 8 && img.height === 8 && img.channels === 1)
    // DC coeff 12·16, IDCT of DC-only = coeff/8, +128 → 152 everywhere
    assert(px(img).toSeq === Seq.fill(64)(152))
  }

  test("second block decodes from the predicted DC") {
    val img = JpegCodec.decode(gray16x8DcPrediction()).get
    assert(img.width === 16 && img.height === 8)
    val p = px(img)
    for (y <- 0 until 8; x <- 0 until 16) {
      val want = if (x < 8) 152 else 142 // (12−5)·16/8 + 128
      assert(p(y * 16 + x) === want, s"($x,$y)")
    }
  }

  test("restart marker resets the DC predictor") {
    val img = JpegCodec.decode(gray16x8Restart()).get
    val p = px(img)
    // both blocks decode to 152; without the reset the second would be 176
    assert(p.toSeq === Seq.fill(128)(152))
  }

  test("AC coefficient runs through zigzag + dequant + the full IDCT") {
    val img = JpegCodec.decode(gray8x8WithAc()).get
    val coef = new Array[Int](64)
    coef(0) = 12 * 16 // DC
    coef(1) = 3 * 16  // zigzag k=1 → natural (v=0, u=1)
    assert(px(img).toSeq === refIdct(coef).toSeq)
    // and the value varies along x only (horizontal frequency)
    val p = px(img)
    for (y <- 1 until 8; x <- 0 until 8)
      assert(p(y * 8 + x) === p(x), s"row $y differs at $x")
  }

  test("4:4:4 color decodes through JFIF YCbCr with pinned RGB") {
    val img = JpegCodec.decode(color8x8()).get
    assert(img.channels === 3)
    val p = px(img)
    // Y=152, Cb=136, Cr=128 → R=152, G=149, B=166
    for (i <- 0 until 64) {
      assert(p(i * 3) === 152, s"R at $i")
      assert(p(i * 3 + 1) === 149, s"G at $i")
      assert(p(i * 3 + 2) === 166, s"B at $i")
    }
  }

  test("4:2:0 multi-block MCU + chroma upsampling decode to the same RGB") {
    val img = JpegCodec.decode(color16x16_420()).get
    assert(img.width === 16 && img.height === 16 && img.channels === 3)
    val p = px(img)
    for (i <- 0 until 256) {
      assert(p(i * 3) === 152 && p(i * 3 + 1) === 149 && p(i * 3 + 2) === 166,
        s"pixel $i")
    }
  }

  test("refusal contract: malformed scans, truncation, junk, 16-bit DQT") {
    // progressive8x8 is SOF2 with a baseline-shaped Ss=0..63 scan
    // header — an illegal progressive stream, refused even now that
    // well-formed SOF2 decodes
    assert(JpegCodec.decode(progressive8x8()).isEmpty,
      "malformed progressive scan header must be refused")
    val good = gray8x8Dc12()
    // truncate inside the entropy stream
    assert(JpegCodec.decode(good.dropRight(4)).isEmpty, "truncated stream")
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty, "junk")
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty, "empty")
    // 16-bit quant table (Pq=1) is not baseline
    val dqt16 = Soi ++ {
      val body = Array(0x10.toByte) ++ Array.fill(128)(0.toByte)
      Array(0xFF.toByte, 0xDB.toByte,
        ((body.length + 2) >> 8).toByte, ((body.length + 2) & 0xFF).toByte) ++ body
    } ++ good.drop(2 + 69)
    assert(JpegCodec.decode(dqt16).isEmpty, "Pq=1 DQT must be refused")
    // flipping a payload byte must never throw — None or a decode, both fine
    for (i <- good.indices) {
      val mut = good.clone(); mut(i) = (mut(i) ^ 0x55).toByte
      JpegCodec.decode(mut) // must not throw
    }
  }

  test("decoded JPEG feeds the shared pixel pipeline (resize + features)") {
    val img = JpegCodec.decode(gray8x8Dc12()).get
    val resized = PngCodec.resizeNearest(img, 4, 4)
    assert(resized.width === 4 && resized.height === 4)
    assert(px(resized).toSeq === Seq.fill(16)(152))
  }

  // ───────────────────────────── encoder ─────────────────────────────

  /** Deterministic textured gray test image (non-multiple-of-8 dims
    * exercise edge replication on encode and cropping on decode). */
  private def grayImage(w: Int, h: Int): PngCodec.Image = {
    val p = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      p(y * w + x) = ((x * 7 + y * 13 + (x * y) % 31) % 256).toByte
    PngCodec.Image(w, h, 1, p)
  }

  private def rgbImage(w: Int, h: Int): PngCodec.Image = {
    val p = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      p(i) = ((x * 11 + y * 3) % 256).toByte
      p(i + 1) = ((x * 5 + y * 17) % 256).toByte
      p(i + 2) = ((x + y * 29) % 256).toByte
    }
    PngCodec.Image(w, h, 3, p)
  }

  private def maxAbsErr(a: PngCodec.Image, b: PngCodec.Image): Int =
    a.pixels.zip(b.pixels).map { case (x, y) =>
      math.abs(java.lang.Byte.toUnsignedInt(x) - java.lang.Byte.toUnsignedInt(y))
    }.max

  test("encode → decode round-trips gray at quality 100 within DCT rounding") {
    val src = grayImage(23, 17)
    val bytes = JpegCodec.encode(src, quality = 100)
    assert(bytes.take(2).toSeq === Seq(0xFF.toByte, 0xD8.toByte))
    assert(bytes.takeRight(2).toSeq === Seq(0xFF.toByte, 0xD9.toByte))
    val back = JpegCodec.decode(bytes).get
    assert(back.width === 23 && back.height === 17 && back.channels === 1)
    // quality 100 = all-ones quant tables: the only loss is coefficient
    // rounding, whose worst-case pixel effect is Σ|ε·basis| ≤ 8
    assert(maxAbsErr(src, back) <= 8)
  }

  test("encode → decode round-trips RGB (4:4:4 YCbCr) at quality 100") {
    val src = rgbImage(20, 14)
    val back = JpegCodec.decode(JpegCodec.encode(src, quality = 100)).get
    assert(back.width === 20 && back.height === 14 && back.channels === 3)
    // per-plane DCT rounding (≤8) amplified by the YCbCr→RGB factors
    assert(maxAbsErr(src, back) <= 24)
    val mean = src.pixels.zip(back.pixels).map { case (x, y) =>
      math.abs(java.lang.Byte.toUnsignedInt(x) - java.lang.Byte.toUnsignedInt(y))
    }.sum.toDouble / src.pixels.length
    assert(mean <= 3.0, s"mean abs error $mean")
  }

  test("quality knob: lower quality → smaller stream, larger error") {
    val src = grayImage(64, 48)
    val hi = JpegCodec.encode(src, quality = 95)
    val lo = JpegCodec.encode(src, quality = 20)
    assert(lo.length < hi.length)
    val errHi = maxAbsErr(src, JpegCodec.decode(hi).get)
    val errLo = maxAbsErr(src, JpegCodec.decode(lo).get)
    assert(errHi <= errLo)
  }

  test("encoded headers parse with the shared container sniffing") {
    val bytes = JpegCodec.encode(grayImage(40, 24), quality = 75)
    assert(Multimodal.parseImageDims(bytes) === Some(("jpeg", 40, 24)))
  }

  test("DC prediction survives many blocks (wide image, varied DC)") {
    // 128×8 = 16 horizontal blocks whose means walk up and down —
    // any DC-prediction bug shows as a block staircase
    val w = 128; val h = 8
    val p = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      p(y * w + x) = (((x / 8) * 37) % 200 + 20).toByte
    val src = PngCodec.Image(w, h, 1, p)
    val back = JpegCodec.decode(JpegCodec.encode(src, quality = 100)).get
    assert(maxAbsErr(src, back) <= 8)
  }

  test("encode refuses unsupported inputs") {
    intercept[IllegalArgumentException] {
      JpegCodec.encode(PngCodec.Image(2, 2, 4, new Array[Byte](16)))
    }
    intercept[IllegalArgumentException] {
      JpegCodec.encode(PngCodec.Image(3, 3, 1, new Array[Byte](8)))
    }
  }

  // ─────────────────────── progressive decode ───────────────────────
  // Fixtures come from the JDK's own ImageIO JPEG writer (public API,
  // test-only): the same BufferedImage written baseline and
  // progressive at one quality carries the SAME quantized
  // coefficients, so both streams must decode pixel-identically
  // through this codec — an exact pin with the (already pixel-pinned)
  // baseline path as its own oracle.

  private def imageioJpeg(img: java.awt.image.BufferedImage,
                          progressive: Boolean,
                          quality: Float): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    p.setProgressiveMode(
      if (progressive) javax.imageio.ImageWriteParam.MODE_DEFAULT
      else javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    w.setOutput(mos)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    mos.flush()
    w.dispose()
    bos.toByteArray
  }

  private def grayBuffered(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 9 + y * 5 + (x * y) % 17) % 256)
    img
  }

  private def rgbBuffered(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth gradients: chroma upsampling filters differ between
      // decoders, so interop comparisons need edge-free chroma
      val r = (x * 255) / math.max(1, w - 1)
      val g = (y * 255) / math.max(1, h - 1)
      val b = ((x + y) * 255) / math.max(1, w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def sofMarker(p: Array[Byte]): Int = {
    var i = 2
    while (i + 3 < p.length) {
      val m = java.lang.Byte.toUnsignedInt(p(i + 1))
      if (m == 0xC0 || m == 0xC2) return m
      i += 2 + ((java.lang.Byte.toUnsignedInt(p(i + 2)) << 8) |
        java.lang.Byte.toUnsignedInt(p(i + 3)))
    }
    -1
  }

  test("progressive gray decodes identically to its baseline twin") {
    val src = grayBuffered(37, 29) // non-multiple-of-8, multi-MCU
    val base = imageioJpeg(src, progressive = false, 0.8f)
    val prog = imageioJpeg(src, progressive = true, 0.8f)
    assert(sofMarker(base) === 0xC0 && sofMarker(prog) === 0xC2,
      "fixture generator must emit SOF0 vs SOF2")
    val a = JpegCodec.decode(base).get
    val b = JpegCodec.decode(prog).get
    assert(b.width === 37 && b.height === 29 && b.channels === 1)
    assert(a.pixels.toSeq === b.pixels.toSeq,
      "same coefficients reordered into scans must decode pixel-identically")
  }

  test("progressive RGB (subsampled, multi-scan) matches its baseline twin") {
    val src = rgbBuffered(48, 32)
    val base = imageioJpeg(src, progressive = false, 0.75f)
    val prog = imageioJpeg(src, progressive = true, 0.75f)
    assert(sofMarker(prog) === 0xC2)
    val a = JpegCodec.decode(base).get
    val b = JpegCodec.decode(prog).get
    assert(b.channels === 3 && b.width === 48 && b.height === 32)
    assert(a.pixels.toSeq === b.pixels.toSeq)
  }

  test("progressive gray agrees with the JDK's own decoder (interop)") {
    val src = grayBuffered(24, 16)
    val prog = imageioJpeg(src, progressive = true, 0.9f)
    val mine = JpegCodec.decode(prog).get
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
    val maxErr = (for (y <- 0 until 16; x <- 0 until 24) yield math.abs(
      java.lang.Byte.toUnsignedInt(mine.pixels(y * 24 + x)) -
        ref.getRaster.getSample(x, y, 0)).toInt).max
    // independent IDCT implementations: off-by-rounding only
    assert(maxErr <= 2, s"interop max error $maxErr")
  }

  test("a crafted header claiming huge dims refuses instead of allocating") {
    // take a valid stream and rewrite SOF dims to 65535×65535: the
    // decoder must bail at the header, never attempt the multi-GB
    // coefficient/plane allocations (progressive EOB runs mean a tiny
    // file can otherwise legally claim a frame this large)
    for (prog <- Seq(false, true)) {
      val bytes = imageioJpeg(grayBuffered(16, 16), prog, 0.8f)
      var i = 2
      var done = false
      while (!done && i + 3 < bytes.length) {
        val m = java.lang.Byte.toUnsignedInt(bytes(i + 1))
        if (m == 0xC0 || m == 0xC2) {
          bytes(i + 5) = 0xFF.toByte; bytes(i + 6) = 0xFF.toByte // height
          bytes(i + 7) = 0xFF.toByte; bytes(i + 8) = 0xFF.toByte // width
          done = true
        } else i += 2 + ((java.lang.Byte.toUnsignedInt(bytes(i + 2)) << 8) |
          java.lang.Byte.toUnsignedInt(bytes(i + 3)))
      }
      assert(done, "fixture must contain a SOF marker")
      assert(JpegCodec.decode(bytes).isEmpty, s"progressive=$prog")
    }
  }

  test("progressive byte-flip fuzz never throws") {
    val prog = imageioJpeg(grayBuffered(16, 16), progressive = true, 0.8f)
    for (i <- prog.indices) {
      val mut = prog.clone(); mut(i) = (mut(i) ^ 0x55).toByte
      JpegCodec.decode(mut) // None or a decode, never an exception
    }
    // truncation at every length must also refuse or decode cleanly
    for (n <- 2 until prog.length by 7)
      JpegCodec.decode(prog.take(n))
  }

  test("our encoder's baseline output survives the JDK decoder (interop)") {
    val src = grayImage(33, 21)
    val bytes = JpegCodec.encode(src, quality = 95)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null && ref.getWidth === 33 && ref.getHeight === 21)
    val mine = JpegCodec.decode(bytes).get
    val maxErr = (for (y <- 0 until 21; x <- 0 until 33) yield math.abs(
      java.lang.Byte.toUnsignedInt(mine.pixels(y * 33 + x)) -
        ref.getRaster.getSample(x, y, 0)).toInt).max
    assert(maxErr <= 2, s"JDK reads our stream differently by $maxErr")
  }
}
