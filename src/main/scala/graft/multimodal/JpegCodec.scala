package graft.multimodal

/** Baseline-sequential JPEG decoder, pure JVM, implemented from the
  * public ITU-T T.81 spec (round-5 verdict item #3 — the last fake in
  * the multimodal layer): marker walk (DQT/DHT/SOF0/DRI/SOS), Huffman
  * entropy decode with byte-stuffing and restart markers, DC
  * prediction, zigzag + dequantization, a double-precision IDCT, and
  * chroma upsampling + JFIF YCbCr→RGB for 3-component frames. Decodes
  * into [[PngCodec.Image]] (gray or interleaved RGB) so every
  * downstream pixel consumer (feature histograms, resize) takes the
  * same path PNG does.
  *
  * REFUSAL CONTRACT (returns None, never plausible garbage): anything
  * that is not a single-scan interleaved baseline frame — progressive
  * (SOF2) and every other non-SOF0 frame type, arithmetic coding
  * (DAC), 16-bit quant tables, precision ≠ 8, sampling factors
  * outside 1..2, missing tables, marker desync, or an entropy stream
  * that exhausts mid-MCU (truncation). Malformed bytes are the common
  * case for a 100 TB crawl corpus; the decoder's job is to survive
  * them.
  */
object JpegCodec {

  import PngCodec.Image

  /** Zigzag index → (row-major) natural index, T.81 figure A.6. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) · (u == 0 ? 1/√2 : 1), precomputed. */
  private val CosTable: Array[Double] = {
    val t = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      var x = 0
      while (x < 8) {
        t(u * 8 + x) = cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    t
  }

  private final class Huffman(counts: Array[Int], symbols: Array[Int]) {
    // canonical code assignment (T.81 annex C): codes of each length in
    // symbol order, code value incrementing, doubling per extra bit
    private val maxLen = 16
    // (len<<16|code) -> symbol; BOXED values so an absent key is null,
    // not an unboxed 0 that would masquerade as symbol 0
    private val codeFor = new java.util.HashMap[Integer, Integer]()
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= maxLen) {
        var i = 0
        while (i < counts(len - 1)) {
          codeFor.put(Int.box((len << 16) | code), Int.box(symbols(k)))
          code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
    }
    /** Decode one symbol; -1 on exhausted bits or no matching code. */
    def decode(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < maxLen) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        len += 1
        val s = codeFor.get(Int.box((len << 16) | code))
        if (s != null) return s.intValue()
      }
      -1
    }
  }

  /** Entropy-segment bit reader: un-stuffs FF00, stops at any other
    * FFxx marker (exposing it for the restart-interval walk). */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    var atMarker = false
    def bit(): Int = {
      if (nbits == 0) {
        if (atMarker || pos >= p.length) return -1
        val b = java.lang.Byte.toUnsignedInt(p(pos))
        if (b == 0xFF) {
          if (pos + 1 >= p.length) { atMarker = true; return -1 }
          val b2 = java.lang.Byte.toUnsignedInt(p(pos + 1))
          if (b2 == 0x00) { pos += 2; cur = 0xFF; nbits = 8 }
          else { atMarker = true; return -1 }
        } else { pos += 1; cur = b; nbits = 8 }
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return Int.MinValue
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** Byte-align and step over an expected RSTn marker. */
    def restart(n: Int): Boolean = {
      nbits = 0
      if (!atMarker) {
        // marker must be the immediate next bytes
        if (pos + 1 >= p.length || java.lang.Byte.toUnsignedInt(p(pos)) != 0xFF)
          return false
      }
      if (pos + 1 >= p.length) return false
      val m = java.lang.Byte.toUnsignedInt(p(pos + 1))
      if (m != 0xD0 + n) return false
      pos += 2
      atMarker = false
      true
    }
  }

  /** T.81 F.12 EXTEND: map a `t`-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0
    else if (v < (1 << (t - 1))) v - (1 << t) + 1
    else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int) {
    var dcTable: Huffman = _
    var acTable: Huffman = _
    var pred: Int = 0
  }

  def decode(p: Array[Byte]): Option[Image] = {
    def u8(i: Int) = java.lang.Byte.toUnsignedInt(p(i))
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u8(0) != 0xFF || u8(1) != 0xD8) return None

    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[Huffman](4)
    val acTables = new Array[Huffman](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0

    var i = 2
    while (i + 3 < p.length) {
      if (u8(i) != 0xFF) return None // marker desync
      val marker = u8(i + 1)
      if (marker == 0xFF) { i += 1 } // fill byte
      else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0xD9) return None // EOI before any scan
      else {
        if (i + 3 >= p.length) return None
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > p.length) return None
        val seg = i + 4
        val segEnd = i + 2 + len
        marker match {
          case 0xDB => // DQT: one or more tables
            var j = seg
            while (j < segEnd) {
              val pq = u8(j) >> 4
              val tq = u8(j) & 0x0F
              if (pq != 0 || tq > 3 || j + 65 > segEnd) return None // 16-bit tables: not baseline
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) { t(Zigzag(k)) = u8(j + 1 + k); k += 1 }
              quant(tq) = t
              j += 65
            }
            if (j != segEnd) return None
          case 0xC4 => // DHT: one or more tables
            var j = seg
            while (j < segEnd) {
              val tc = u8(j) >> 4
              val th = u8(j) & 0x0F
              if (tc > 1 || th > 3 || j + 17 > segEnd) return None
              val counts = (0 until 16).map(k => u8(j + 1 + k)).toArray
              val n = counts.sum
              if (n == 0 || n > 256 || j + 17 + n > segEnd) return None
              val syms = (0 until n).map(k => u8(j + 17 + k)).toArray
              val h = new Huffman(counts, syms)
              if (tc == 0) dcTables(th) = h else acTables(th) = h
              j += 17 + n
            }
            if (j != segEnd) return None
          case 0xC0 => // SOF0: baseline sequential
            if (comps != null) return None
            if (u8(seg) != 8) return None // precision must be 8
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = u8(seg + 5)
            if (width == 0 || height == 0) return None
            if (nc != 1 && nc != 3) return None
            if (len != 8 + 3 * nc) return None
            comps = (0 until nc).map { c =>
              val o = seg + 6 + 3 * c
              val comp = Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0F, u8(o + 2))
              if (comp.h < 1 || comp.h > 2 || comp.v < 1 || comp.v > 2 ||
                  comp.tq > 3) return None
              comp
            }.toArray
          case m if m >= 0xC1 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
            return None // progressive (C2), arithmetic (C9+), every non-baseline frame
          case 0xCC => return None // DAC: arithmetic conditioning
          case 0xDD => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xDA => // SOS: single interleaved scan, then entropy data
            if (comps == null) return None
            val ns = u8(seg)
            if (ns != comps.length || len != 6 + 2 * ns) return None
            var j = seg + 1
            (0 until ns).foreach { idx =>
              val cid = u8(j)
              // scan components must follow frame order (T.81 B.2.3) —
              // the MCU loop interleaves in frame order, so an
              // out-of-order scan would silently swap planes
              val comp = comps(idx)
              if (comp.id != cid) return None
              val td = u8(j + 1) >> 4
              val ta = u8(j + 1) & 0x0F
              if (td > 3 || ta > 3) return None
              comp.dcTable = dcTables(td)
              comp.acTable = acTables(ta)
              if (comp.dcTable == null || comp.acTable == null) return None
              j += 2
            }
            // spectral selection / approximation must be the baseline 0..63, 0
            if (u8(j) != 0 || u8(j + 1) != 63 || u8(j + 2) != 0) return None
            comps.foreach(c => if (quant(c.tq) == null) return None)
            return decodeScan(p, segEnd, comps, quant, width, height, restartInterval)
          case _ => () // APPn, COM, others: skip
        }
        i += 2 + len
      }
    }
    None // no scan found
  }

  private def decodeScan(p: Array[Byte], start: Int, comps: Array[Component],
                         quant: Array[Array[Int]], width: Int, height: Int,
                         restartInterval: Int): Option[Image] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcuW = 8 * hMax
    val mcuH = 8 * vMax
    val mcusX = (width + mcuW - 1) / mcuW
    val mcusY = (height + mcuH - 1) / mcuH
    // per-component plane at its natural (sub-sampled) resolution,
    // padded to whole MCUs
    val planes = comps.map(c =>
      new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8))
    val br = new BitReader(p, start)
    val block = new Array[Int](64)
    val pix = new Array[Double](64)
    var rstCount = 0
    var rstIndex = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && rstCount == restartInterval) {
          if (!br.restart(rstIndex)) return None
          rstIndex = (rstIndex + 1) & 7
          rstCount = 0
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = quant(c.tq)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(block, 0)
              // DC
              val t = c.dcTable.decode(br)
              if (t < 0 || t > 11) return None
              val diffBits = br.receive(t)
              if (diffBits == Int.MinValue) return None
              c.pred += extend(diffBits, t)
              block(0) = c.pred * q(0)
              // AC
              var k = 1
              while (k < 64) {
                val rs = c.acTable.decode(br)
                if (rs < 0) return None
                val r = rs >> 4
                val s = rs & 0x0F
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL
                  else k = 64 // EOB
                } else {
                  k += r
                  if (k > 63) return None
                  val vb = br.receive(s)
                  if (vb == Int.MinValue) return None
                  // q is stored in natural order (de-zigzagged at DQT)
                  val nat = Zigzag(k)
                  block(nat) = extend(vb, s) * q(nat)
                  k += 1
                }
              }
              idct(block, pix)
              // place the block into the component plane
              val planeW = mcusX * c.h * 8
              val ox = (mx * c.h + bx) * 8
              val oy = (my * c.v + by) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  val v = math.round(pix(y * 8 + x) + 128.0).toInt
                  planes(ci)((oy + y) * planeW + ox + x) =
                    if (v < 0) 0 else if (v > 255) 255 else v
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        rstCount += 1
        mx += 1
      }
      my += 1
    }
    // assemble output: crop padding, upsample chroma, color-convert
    if (comps.length == 1) {
      val planeW = mcusX * comps(0).h * 8
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          out(y * width + x) = planes(0)(y * planeW + x).toByte
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      val pw = comps.map(c => mcusX * c.h * 8)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          // nearest (replication) upsample per component
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hMax
            val sy = y * c.v / vMax
            planes(ci)(sy * pw(ci) + sx)
          }
          val yv = sample(0).toDouble
          val cb = sample(1).toDouble - 128.0
          val cr = sample(2).toDouble - 128.0
          // JFIF color conversion, rounded then clamped
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yv + 1.402 * cr)
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Some(Image(width, height, 3, out))
    }
  }

  /** 8×8 inverse DCT (T.81 A.3.3), separable, double precision:
    * tmp = Fᵀ-weighted row pass, then column pass; out is the spatial
    * block BEFORE the +128 level shift. */
  private def idct(in: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: for each row y of coefficients (v index), transform over u
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += CosTable(u * 8 + x) * in(v * 8 + u)
          u += 1
        }
        tmp(v * 8 + x) = s / 2.0
        x += 1
      }
      v += 1
    }
    // columns
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += CosTable(vv * 8 + y) * tmp(vv * 8 + x)
          vv += 1
        }
        out(y * 8 + x) = s / 2.0
        y += 1
      }
      x += 1
    }
  }
}
