package graft.multimodal

/** Hand-assembled baseline JPEG streams for the codec specs: markers,
  * canonical Huffman tables and the entropy bit stream are built byte
  * by byte from the T.81 spec, so the decoder is tested against an
  * INDEPENDENT encoding of known coefficients — never against itself.
  *
  * Huffman tables used throughout (canonical assignment):
  *  - DC: three 2-bit codes — cat 0 → 00, cat 3 → 01, cat 4 → 10
  *  - AC: EOB(0x00) → 0, (run 0, size 2)(0x02) → 10
  *
  * All quant tables are flat (every entry = q), supplied in zigzag
  * order as the DQT segment requires.
  */
object JpegTestImages {

  final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def bits(s: String): this.type = {
      s.foreach { c =>
        cur = (cur << 1) | (c - '0'); n += 1
        if (n == 8) { flushByte() }
      }
      this
    }
    private def flushByte(): Unit = {
      out.write(cur)
      if (cur == 0xFF) out.write(0x00) // byte stuffing
      cur = 0; n = 0
    }
    /** 1-pad to a byte boundary (T.81 F.1.2.3) and return the bytes. */
    def finish(): Array[Byte] = {
      while (n != 0) { cur = (cur << 1) | 1; n += 1; if (n == 8) flushByte() }
      out.toByteArray
    }
    /** Byte-align with 1-fill, then emit a raw marker (for RSTn). */
    def marker(m: Int): this.type = {
      while (n != 0) { cur = (cur << 1) | 1; n += 1; if (n == 8) flushByte() }
      out.write(0xFF); out.write(m)
      this
    }
  }

  /** DC category encodings used by the fixtures. */
  def dcDiff(v: Int): String = v match {
    case 0 => "00"
    case 12 => "10" + "1100"             // cat 4
    case -5 => "01" + "010"              // cat 3: -5 + 7 = 2 -> 010
    case 4 => "01" + "100"               // cat 3: 4 -> 100
    case other => sys.error(s"no fixture encoding for DC diff $other")
  }
  val AcEob = "0"
  /** AC (run 0, size 2) with value +3. */
  val Ac0v3 = "10" + "11"

  private def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
    val len = body.length + 2
    Array(0xFF.toByte, marker.toByte, (len >> 8).toByte, (len & 0xFF).toByte) ++ body
  }

  def dqt(tq: Int, q: Int): Array[Byte] =
    seg(0xDB, Array((tq & 0x0F).toByte) ++ Array.fill(64)(q.toByte))

  /** The shared DC/DHT tables (class `tc`, id `th`). */
  def dhtDc(th: Int): Array[Byte] = {
    val counts = Array.fill(16)(0); counts(1) = 3 // three 2-bit codes
    seg(0xC4, Array((0x00 | th).toByte) ++ counts.map(_.toByte) ++
      Array[Byte](0, 3, 4))
  }
  def dhtAc(th: Int): Array[Byte] = {
    val counts = Array.fill(16)(0); counts(0) = 1; counts(1) = 1
    seg(0xC4, Array((0x10 | th).toByte) ++ counts.map(_.toByte) ++
      Array[Byte](0x00, 0x02))
  }

  /** SOF0 for components (id, h, v, tq). */
  def sof0(w: Int, h: Int, comps: Seq[(Int, Int, Int, Int)]): Array[Byte] =
    seg(0xC0, Array[Byte](8, (h >> 8).toByte, (h & 0xFF).toByte,
      (w >> 8).toByte, (w & 0xFF).toByte, comps.length.toByte) ++
      comps.flatMap { case (id, ch, cv, tq) =>
        Array(id.toByte, ((ch << 4) | cv).toByte, tq.toByte) })

  def sos(comps: Seq[(Int, Int, Int)]): Array[Byte] =
    seg(0xDA, Array(comps.length.toByte) ++
      comps.flatMap { case (id, td, ta) =>
        Array(id.toByte, ((td << 4) | ta).toByte) } ++
      Array[Byte](0, 63, 0))

  def dri(interval: Int): Array[Byte] =
    seg(0xDD, Array((interval >> 8).toByte, (interval & 0xFF).toByte))

  val Soi = Array(0xFF.toByte, 0xD8.toByte)
  val Eoi = Array(0xFF.toByte, 0xD9.toByte)

  /** 8×8 grayscale, flat q=16, single DC-only block (diff 12):
    * every pixel = round(12·16/8) + 128 = 152. */
  def gray8x8Dc12(q: Int = 16): Array[Byte] =
    Soi ++ dqt(0, q) ++ dhtDc(0) ++ dhtAc(0) ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      new BitWriter().bits(dcDiff(12)).bits(AcEob).finish() ++ Eoi

  /** 16×8 grayscale, two blocks: DC diffs 12 then −5 → the second
    * block decodes from the PREDICTED DC (12 − 5 = 7). */
  def gray16x8DcPrediction(q: Int = 16): Array[Byte] =
    Soi ++ dqt(0, q) ++ dhtDc(0) ++ dhtAc(0) ++
      sof0(16, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      new BitWriter()
        .bits(dcDiff(12)).bits(AcEob)
        .bits(dcDiff(-5)).bits(AcEob)
        .finish() ++ Eoi

  /** 16×8 grayscale with DRI=1 and an RST0 between the two MCUs: the
    * second block's predictor RESETS, so diff 12 decodes to the same
    * 152 as the first (without the reset it would be 176). */
  def gray16x8Restart(q: Int = 16): Array[Byte] =
    Soi ++ dqt(0, q) ++ dhtDc(0) ++ dhtAc(0) ++ dri(1) ++
      sof0(16, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      new BitWriter()
        .bits(dcDiff(12)).bits(AcEob)
        .marker(0xD0)
        .bits(dcDiff(12)).bits(AcEob)
        .finish() ++ Eoi

  /** 8×8 grayscale with DC diff 12 and one AC coefficient
    * (zigzag k=1 → natural (v=0,u=1), value +3): exercises zigzag,
    * dequant and the full IDCT (spec pins against an independent
    * direct-form IDCT). */
  def gray8x8WithAc(q: Int = 16): Array[Byte] =
    Soi ++ dqt(0, q) ++ dhtDc(0) ++ dhtAc(0) ++
      sof0(8, 8, Seq((1, 1, 1, 0))) ++ sos(Seq((1, 0, 0))) ++
      new BitWriter().bits(dcDiff(12)).bits(Ac0v3).bits(AcEob).finish() ++ Eoi

  /** 8×8 YCbCr 4:4:4: Y diff 12 (→152), Cb diff 4 (→136), Cr diff 0
    * (→128). JFIF: R=152, G=round(152−0.344136·8)=149,
    * B=round(152+1.772·8)=166. */
  def color8x8(q: Int = 16): Array[Byte] =
    Soi ++ dqt(0, q) ++ dhtDc(0) ++ dhtAc(0) ++
      sof0(8, 8, Seq((1, 1, 1, 0), (2, 1, 1, 0), (3, 1, 1, 0))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++
      new BitWriter()
        .bits(dcDiff(12)).bits(AcEob)  // Y
        .bits(dcDiff(4)).bits(AcEob)   // Cb
        .bits(dcDiff(0)).bits(AcEob)   // Cr
        .finish() ++ Eoi

  /** 16×16 YCbCr 4:2:0 (Y h=v=2, chroma 1×1): one MCU of four Y
    * blocks (DC diffs 12,0,0,0 → all 152 via prediction) + one Cb
    * (diff 4) + one Cr (diff 0) — same per-pixel RGB as [[color8x8]],
    * through the multi-block MCU and chroma upsampling paths. */
  def color16x16_420(q: Int = 16): Array[Byte] =
    Soi ++ dqt(0, q) ++ dhtDc(0) ++ dhtAc(0) ++
      sof0(16, 16, Seq((1, 2, 2, 0), (2, 1, 1, 0), (3, 1, 1, 0))) ++
      sos(Seq((1, 0, 0), (2, 0, 0), (3, 0, 0))) ++
      new BitWriter()
        .bits(dcDiff(12)).bits(AcEob).bits(dcDiff(0)).bits(AcEob)
        .bits(dcDiff(0)).bits(AcEob).bits(dcDiff(0)).bits(AcEob)  // 4 Y
        .bits(dcDiff(4)).bits(AcEob)   // Cb
        .bits(dcDiff(0)).bits(AcEob)   // Cr
        .finish() ++ Eoi

  /** [[gray8x8Dc12]] with the frame marker flipped to SOF2
    * (progressive) — must be refused. */
  def progressive8x8(q: Int = 16): Array[Byte] = {
    val bytes = gray8x8Dc12(q)
    val out = bytes.clone()
    // find the FFC0 marker and flip to FFC2
    val idx = out.indices.dropRight(1)
      .find(i => (out(i) & 0xFF) == 0xFF && (out(i + 1) & 0xFF) == 0xC0).get
    out(idx + 1) = 0xC2.toByte
    out
  }
}
