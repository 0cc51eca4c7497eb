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

  test("refusal contract: progressive, truncation, junk, 16-bit DQT") {
    assert(JpegCodec.decode(progressive8x8()).isEmpty, "SOF2 must be refused")
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
}
