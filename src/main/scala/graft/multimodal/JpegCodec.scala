package graft.multimodal

/** DCT-based JPEG codec, pure JVM, implemented from the public ITU-T
  * T.81 spec (round-5 verdict item #3 — the last fake in the
  * multimodal layer): marker walk (DQT/DHT/SOF/DRI/SOS), Huffman
  * entropy decode with byte-stuffing and restart markers, DC
  * prediction, zigzag + dequantization, a double-precision IDCT, and
  * chroma upsampling + JFIF YCbCr→RGB for 3-component frames. Both
  * baseline-sequential (SOF0) and progressive (SOF2 — spectral
  * selection + successive approximation with EOB-run and refinement
  * scans, T.81 annex G) frames decode. Decodes into
  * [[PngCodec.Image]] (gray or interleaved RGB) so every downstream
  * pixel consumer (feature histograms, resize) takes the same path
  * PNG does.
  *
  * [[encode]] is the matching writer — gray or 4:4:4 YCbCr baseline
  * frames with the spec's Annex K example quantization and Huffman
  * tables — so a JPEG-in resize can emit JPEG back out instead of
  * transcoding to PNG.
  *
  * REFUSAL CONTRACT (returns None, never plausible garbage):
  * arithmetic coding (SOF9+/DAC), hierarchical and lossless frame
  * types, 16-bit quant tables, precision ≠ 8, sampling factors
  * outside 1..2, missing tables, scan headers that violate the
  * frame's coding model (a baseline-shaped Ss=0..63 scan under SOF2,
  * progressive band/approximation bounds out of range), marker
  * desync, or an entropy stream that exhausts mid-MCU (truncation).
  * Malformed bytes are the common case for a 100 TB crawl corpus;
  * the decoder's job is to survive them.
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
    var progressive = false
    // progressive state: per-component DCT coefficients for the whole
    // frame, accumulated across scans, reconstructed at EOI
    var coefs: Array[Array[Int]] = null
    var scansSeen = 0

    var i = 2
    while (i + 1 < p.length) {
      if (u8(i) != 0xFF) return None // marker desync
      val marker = u8(i + 1)
      if (marker == 0xFF) { i += 1 } // fill byte
      else if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0xD9) {
        // EOI: for progressive, all scans are in — reconstruct
        return if (progressive && scansSeen > 0)
          reconstruct(comps, coefs, quant, width, height)
        else None
      }
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
          case 0xC0 | 0xC2 => // SOF0 baseline / SOF2 progressive
            if (comps != null) return None
            progressive = marker == 0xC2
            if (u8(seg) != 8) return None // precision must be 8
            height = u16(seg + 1)
            width = u16(seg + 3)
            val nc = u8(seg + 5)
            if (width == 0 || height == 0) return None
            // dims guard (the PngCodec IHDR precedent): a crafted
            // header claiming a huge frame must refuse, not OOM — with
            // progressive EOB runs a tiny file can legally claim one
            if (width.toLong * height > (1L << 26)) return None
            if (nc != 1 && nc != 3) return None
            if (len != 8 + 3 * nc) return None
            comps = (0 until nc).map { c =>
              val o = seg + 6 + 3 * c
              val comp = Component(u8(o), u8(o + 1) >> 4, u8(o + 1) & 0x0F, u8(o + 2))
              if (comp.h < 1 || comp.h > 2 || comp.v < 1 || comp.v > 2 ||
                  comp.tq > 3) return None
              comp
            }.toArray
          case m if m >= 0xC1 && m <= 0xCF && m != 0xC2 && m != 0xC4 &&
                    m != 0xC8 && m != 0xCC =>
            return None // arithmetic (C9+), hierarchical, lossless frames
          case 0xCC => return None // DAC: arithmetic conditioning
          case 0xDD => // DRI
            if (len != 4) return None
            restartInterval = u16(seg)
          case 0xDA if !progressive =>
            // baseline SOS: single interleaved scan, then entropy data
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
          case 0xDA => // progressive SOS: one of several partial scans
            if (comps == null) return None
            val hMax = comps.map(_.h).max
            val vMax = comps.map(_.v).max
            val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            if (coefs == null)
              coefs = comps.map(c =>
                new Array[Int](mcusX * c.h * mcusY * c.v * 64))
            val ns = u8(seg)
            if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
            // scan components: frame-relative ascending order (subsets ok)
            val scanCis = new Array[Int](ns)
            var j = seg + 1
            var lastCi = -1
            var si = 0
            while (si < ns) {
              val cid = u8(j)
              val ci = comps.indexWhere(_.id == cid)
              if (ci <= lastCi) return None // unknown id or out of order
              scanCis(si) = ci
              val td = u8(j + 1) >> 4
              val ta = u8(j + 1) & 0x0F
              if (td > 3 || ta > 3) return None
              comps(ci).dcTable = dcTables(td)
              comps(ci).acTable = acTables(ta)
              lastCi = ci
              si += 1
              j += 2
            }
            val ss = u8(j)
            val se = u8(j + 1)
            val ah = u8(j + 2) >> 4
            val al = u8(j + 2) & 0x0F
            // progressive scan-header contract (T.81 G.1.1.1): a DC scan
            // is exactly the 0..0 band; AC bands are non-interleaved;
            // point transforms stay in 0..13
            if (ss == 0 && se != 0) return None
            if (ss > 0 && (se < ss || se > 63 || ns != 1)) return None
            if (ah > 13 || al > 13 || (ah != 0 && ah != al + 1)) return None
            if (ss == 0 && ah == 0)
              scanCis.foreach(ci => if (comps(ci).dcTable == null) return None)
            if (ss > 0 && comps(scanCis(0)).acTable == null) return None
            progScan(p, segEnd, comps, scanCis, coefs, ss, se, ah, al,
                     restartInterval, mcusX, mcusY, hMax, vMax,
                     width, height) match {
              case Some(next) => scansSeen += 1; i = next
              case None => return None
            }
          case _ => () // APPn, COM, others: skip
        }
        if (marker != 0xDA) i += 2 + len
        // progressive SOS advanced i itself (past the entropy data)
      }
    }
    None // no scan found (or progressive stream missing its EOI)
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
    assemble(comps, planes, width, height, mcusX, hMax, vMax)
  }

  /** Crop MCU padding, replication-upsample chroma, and (for 3
    * components) JFIF YCbCr→RGB — shared by the baseline streaming
    * path and the progressive at-EOI reconstruction. */
  private def assemble(comps: Array[Component], planes: Array[Array[Int]],
                       width: Int, height: Int, mcusX: Int,
                       hMax: Int, vMax: Int): Option[Image] = {
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

  /** Decode one progressive scan (T.81 annex G) into the per-component
    * coefficient store: a DC scan (interleaved or not) or a single-
    * component AC band, either first-pass (Ah=0, values shifted left
    * by Al, EOB runs) or refinement (one correction bit per already-
    * nonzero coefficient, ±1<<Al for newly nonzero ones). Returns the
    * offset of the next marker after the scan's entropy data, or None
    * on any corruption. */
  private def progScan(p: Array[Byte], start: Int, comps: Array[Component],
                       scanCis: Array[Int], coefs: Array[Array[Int]],
                       ss: Int, se: Int, ah: Int, al: Int,
                       restartInterval: Int, mcusX: Int, mcusY: Int,
                       hMax: Int, vMax: Int,
                       width: Int, height: Int): Option[Int] = {
    val br = new BitReader(p, start)
    var eobrun = 0
    val preds = new Array[Int](comps.length)
    var rstCount = 0
    var rstIndex = 0

    /** Before each MCU/block: if the restart interval just elapsed,
      * consume the RSTn and reset predictors + EOB run. Checking
      * BEFORE the unit (as the baseline path does) matters — the final
      * interval of a scan is not followed by a marker. */
    def preUnit(): Boolean = {
      if (restartInterval > 0 && rstCount == restartInterval) {
        if (!br.restart(rstIndex)) return false
        rstIndex = (rstIndex + 1) & 7
        rstCount = 0
        eobrun = 0
        java.util.Arrays.fill(preds, 0)
      }
      true
    }

    /** First-pass AC band for one block (G.1.2.2): run/size symbols
      * with EOBn run lengths, new values scaled by 2^Al. */
    def acFirstBlock(coef: Array[Int], base: Int, ac: Huffman): Boolean = {
      if (eobrun > 0) { eobrun -= 1; return true }
      var k = ss
      while (k <= se) {
        val rs = ac.decode(br)
        if (rs < 0) return false
        val r = rs >> 4
        val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            eobrun = (1 << r) - 1
            if (r > 0) {
              val eb = br.receive(r)
              if (eb == Int.MinValue) return false
              eobrun += eb
            }
            return true
          }
        } else {
          k += r
          if (k > se) return false
          val vb = br.receive(s)
          if (vb == Int.MinValue) return false
          coef(base + Zigzag(k)) = extend(vb, s) << al
          k += 1
        }
      }
      true
    }

    /** Refinement AC band for one block (G.1.2.3): already-nonzero
      * coefficients each consume a correction bit; zero-history runs
      * position the at-most-one new ±2^Al value; blocks inside an EOB
      * run still consume correction bits for their nonzero band. */
    def acRefineBlock(coef: Array[Int], base: Int, ac: Huffman): Boolean = {
      val p1 = 1 << al
      val m1 = -(1 << al)
      def correct(nat: Int): Boolean = {
        val b = br.bit()
        if (b < 0) return false
        if (b == 1 && (coef(base + nat) & p1) == 0)
          coef(base + nat) += (if (coef(base + nat) >= 0) p1 else m1)
        true
      }
      var k = ss
      if (eobrun == 0) {
        var eob = false
        while (k <= se && !eob) {
          val rs = ac.decode(br)
          if (rs < 0) return false
          var r = rs >> 4
          val s = rs & 0x0F
          var newval = 0
          if (s == 0) {
            if (r != 15) {
              eobrun = 1 << r
              if (r > 0) {
                val eb = br.receive(r)
                if (eb == Int.MinValue) return false
                eobrun += eb
              }
              eob = true
            }
            // r == 15 (ZRL): skip 16 zero-history positions, no new value
          } else {
            if (s != 1) return false // new coefficients are always ±1
            val b = br.bit()
            if (b < 0) return false
            newval = if (b == 1) p1 else m1
          }
          if (!eob) {
            // advance over nonzero (correcting) and r zero-history slots
            var placed = false
            while (k <= se && !placed) {
              val nat = Zigzag(k)
              if (coef(base + nat) != 0) {
                if (!correct(nat)) return false
                k += 1
              } else if (r == 0) {
                if (newval != 0) coef(base + nat) = newval
                placed = true
                k += 1
              } else { r -= 1; k += 1 }
            }
            if (!placed && newval != 0) return false // ran off the band
          }
        }
      }
      if (eobrun > 0) {
        // remainder of the band: correction bits only
        while (k <= se) {
          if (coef(base + Zigzag(k)) != 0 && !correct(Zigzag(k))) return false
          k += 1
        }
        eobrun -= 1
      }
      true
    }

    def dcUnit(ci: Int, bIdx: Int): Boolean = {
      val c = comps(ci)
      if (ah == 0) {
        val t = c.dcTable.decode(br)
        if (t < 0 || t > 11) return false
        val diffBits = br.receive(t)
        if (diffBits == Int.MinValue) return false
        preds(ci) += extend(diffBits, t)
        coefs(ci)(bIdx * 64) = preds(ci) << al
      } else {
        val b = br.bit()
        if (b < 0) return false
        if (b == 1) coefs(ci)(bIdx * 64) |= (1 << al)
      }
      true
    }

    /** Walk a single component's REAL block grid (ceil of its scaled
      * dims — not the MCU-padded grid) in raster order, mapping into
      * the padded coefficient store; restart interval counts blocks. */
    def nonInterleavedWalk(ci: Int)(unit: Int => Boolean): Boolean = {
      val c = comps(ci)
      val compW = (width * c.h + hMax - 1) / hMax
      val compH = (height * c.v + vMax - 1) / vMax
      val wBlocks = (compW + 7) / 8
      val hBlocks = (compH + 7) / 8
      val blocksW = mcusX * c.h
      var by = 0
      while (by < hBlocks) {
        var bx = 0
        while (bx < wBlocks) {
          if (!preUnit()) return false
          if (!unit(by * blocksW + bx)) return false
          rstCount += 1
          bx += 1
        }
        by += 1
      }
      true
    }

    if (ss == 0) {
      // DC scan: MCU-interleaved when several components, else the
      // single component's own block grid
      val interleaved = scanCis.length > 1
      if (interleaved) {
        var my = 0
        while (my < mcusY) {
          var mx = 0
          while (mx < mcusX) {
            if (!preUnit()) return None
            var si = 0
            while (si < scanCis.length) {
              val ci = scanCis(si)
              val c = comps(ci)
              val blocksW = mcusX * c.h
              var by = 0
              while (by < c.v) {
                var bx = 0
                while (bx < c.h) {
                  val bIdx = (my * c.v + by) * blocksW + (mx * c.h + bx)
                  if (!dcUnit(ci, bIdx)) return None
                  bx += 1
                }
                by += 1
              }
              si += 1
            }
            rstCount += 1
            mx += 1
          }
          my += 1
        }
      } else {
        val ci = scanCis(0)
        if (!nonInterleavedWalk(ci)(bIdx => dcUnit(ci, bIdx))) return None
      }
    } else {
      // AC scan: always single-component, over its own block grid
      val ci = scanCis(0)
      val ac = comps(ci).acTable
      if (ac == null) return None
      if (!nonInterleavedWalk(ci) { bIdx =>
        if (ah == 0) acFirstBlock(coefs(ci), bIdx * 64, ac)
        else acRefineBlock(coefs(ci), bIdx * 64, ac)
      }) return None
    }

    // entropy data consumed; find the next marker (tolerating pad
    // bytes), which the caller's walk resumes from
    var j = br.pos
    while (j + 1 < p.length) {
      if (java.lang.Byte.toUnsignedInt(p(j)) == 0xFF &&
          java.lang.Byte.toUnsignedInt(p(j + 1)) != 0x00)
        return Some(j)
      j += 1
    }
    None // scan data ran to EOF with no trailing marker
  }

  /** Progressive reconstruction at EOI: dequantize + IDCT every block
    * of the accumulated coefficient store, then the same crop /
    * upsample / color-convert as baseline. */
  private def reconstruct(comps: Array[Component], coefs: Array[Array[Int]],
                          quant: Array[Array[Int]], width: Int,
                          height: Int): Option[Image] = {
    if (coefs == null) return None
    comps.foreach(c => if (quant(c.tq) == null) return None)
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    val planes = comps.map(c =>
      new Array[Int](mcusX * c.h * 8 * mcusY * c.v * 8))
    val block = new Array[Int](64)
    val pix = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = quant(c.tq)
      val blocksW = mcusX * c.h
      val blocksH = mcusY * c.v
      val planeW = blocksW * 8
      var by = 0
      while (by < blocksH) {
        var bx = 0
        while (bx < blocksW) {
          val base = (by * blocksW + bx) * 64
          var k = 0
          while (k < 64) {
            block(k) = coefs(ci)(base + k) * q(k)
            k += 1
          }
          idct(block, pix)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val v = math.round(pix(y * 8 + x) + 128.0).toInt
              planes(ci)((by * 8 + y) * planeW + bx * 8 + x) =
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
    assemble(comps, planes, width, height, mcusX, hMax, vMax)
  }

  // ──────────────────────────── encoder ────────────────────────────

  /** T.81 Annex K.1 luminance quantization table, natural order. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** T.81 Annex K.2 chrominance quantization table, natural order. */
  private val QChrom: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)

  /** T.81 Annex K.3 example Huffman specs: (bits per length 1..16,
    * symbol values). These are the tables every mainstream encoder
    * ships, so output is interoperable, not just self-round-trippable. */
  private val DcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumVals = (0 to 11).toArray
  private val DcChromBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromVals = (0 to 11).toArray
  private val AcLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)
  private val AcChromBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA)

  /** Canonical code assignment for WRITING — same Annex C walk as the
    * decoder's [[Huffman]], indexed symbol → (code, length). */
  private final class EncTable(bits: Array[Int], vals: Array[Int]) {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    locally {
      var c = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          code(vals(k)) = c
          len(vals(k)) = l
          c += 1; k += 1; i += 1
        }
        c <<= 1
        l += 1
      }
    }
  }
  private lazy val DcLumEnc = new EncTable(DcLumBits, DcLumVals)
  private lazy val AcLumEnc = new EncTable(AcLumBits, AcLumVals)
  private lazy val DcChromEnc = new EncTable(DcChromBits, DcChromVals)
  private lazy val AcChromEnc = new EncTable(AcChromBits, AcChromVals)

  /** Entropy-segment bit writer: FF bytes get a 00 stuffed after them
    * (the inverse of [[BitReader]]'s un-stuffing); [[flush]] pads the
    * final partial byte with 1-bits per T.81 F.1.2.3. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = (acc >>> (nbits - 8)) & 0xFF
        out.write(b)
        if (b == 0xFF) out.write(0x00)
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) put(0xFF, 8 - nbits)
  }

  /** Magnitude category: smallest t with |v| < 2^t (t = 0 for v = 0). */
  private def category(v: Int): Int =
    32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** The inverse of [[extend]]: the raw t-bit field for signed v. */
  private def rawBits(v: Int, t: Int): Int =
    if (v >= 0) v else v + (1 << t) - 1

  /** 8×8 forward DCT (T.81 A.3.3), the exact transpose of [[idct]]:
    * separable double-precision passes with the same cosine table, so
    * encode∘decode error is quantization + integer rounding only. */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    // rows: spatial row y → frequency u
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += CosTable(u * 8 + x) * in(y * 8 + x)
          x += 1
        }
        tmp(y * 8 + u) = s / 2.0
        u += 1
      }
      y += 1
    }
    // columns: spatial column y → frequency v
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          s += CosTable(v * 8 + yy) * tmp(yy * 8 + u)
          yy += 1
        }
        out(v * 8 + u) = s / 2.0
        v += 1
      }
      u += 1
    }
  }

  /** Scale a base quant table by JPEG quality (1..100, the public
    * IJG mapping): 50 = base table, 100 ≈ lossless (all 1s). */
  private def scaledQuant(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { v =>
      val s = (v * scale + 50) / 100
      if (s < 1) 1 else if (s > 255) 255 else s
    }
  }

  /** Encode one level-shifted 8×8 block: FDCT → quantize → DC-diff +
    * run-length AC, returning the new DC predictor. */
  private def encodeBlock(block: Array[Double], q: Array[Int], pred: Int,
                          dc: EncTable, ac: EncTable, bw: BitWriter): Int = {
    val freq = new Array[Double](64)
    fdct(block, freq)
    val coef = new Array[Int](64)
    var i = 0
    while (i < 64) {
      coef(i) = math.round(freq(i) / q(i)).toInt
      i += 1
    }
    // DC
    val diff = coef(0) - pred
    val t = category(diff)
    bw.put(dc.code(t), dc.len(t))
    if (t > 0) bw.put(rawBits(diff, t), t)
    // AC, zigzag order with run-lengths
    var run = 0
    var k = 1
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { bw.put(ac.code(0xF0), ac.len(0xF0)); run -= 16 } // ZRL
        val s = category(v)
        val rs = (run << 4) | s
        bw.put(ac.code(rs), ac.len(rs))
        bw.put(rawBits(v, s), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) bw.put(ac.code(0x00), ac.len(0x00)) // EOB
    coef(0)
  }

  /** Encode gray (1-channel) or RGB (3-channel, written as 4:4:4
    * YCbCr) pixels as a baseline-sequential JFIF JPEG that [[decode]]
    * — and any mainstream decoder — accepts. Edge blocks replicate
    * their last row/column (standard practice; those samples fall
    * outside the frame dims and are cropped on decode). */
  def encode(img: Image, quality: Int = 90): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3,
      s"unsupported channel count ${img.channels}")
    require(img.width > 0 && img.height > 0 && img.width <= 0xFFFF &&
      img.height <= 0xFFFF, s"bad dims ${img.width}x${img.height}")
    require(img.pixels.length == img.width * img.height * img.channels,
      s"pixel buffer ${img.pixels.length} != w*h*c")
    val w = img.width
    val h = img.height
    val gray = img.channels == 1
    val qLum = scaledQuant(QLum, quality)
    val qChrom = scaledQuant(QChrom, quality)

    // component planes, already level-shifted to [-128, 127]
    val planes: Array[Array[Double]] =
      if (gray) {
        val p = new Array[Double](w * h)
        var i = 0
        while (i < p.length) {
          p(i) = java.lang.Byte.toUnsignedInt(img.pixels(i)) - 128.0
          i += 1
        }
        Array(p)
      } else {
        val py = new Array[Double](w * h)
        val pcb = new Array[Double](w * h)
        val pcr = new Array[Double](w * h)
        var i = 0
        while (i < w * h) {
          val r = java.lang.Byte.toUnsignedInt(img.pixels(i * 3))
          val g = java.lang.Byte.toUnsignedInt(img.pixels(i * 3 + 1))
          val b = java.lang.Byte.toUnsignedInt(img.pixels(i * 3 + 2))
          // JFIF RGB→YCbCr (the inverse of decode's conversion)
          py(i) = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
          pcb(i) = -0.168736 * r - 0.331264 * g + 0.5 * b
          pcr(i) = 0.5 * r - 0.418688 * g - 0.081312 * b
          i += 1
        }
        Array(py, pcb, pcr)
      }

    val out = new java.io.ByteArrayOutputStream(1024 + w * h / 2)
    def u8(v: Int): Unit = out.write(v & 0xFF)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xFF); u8(m) }

    marker(0xD8) // SOI
    marker(0xE0) // APP0 / JFIF 1.01, no density, no thumbnail
    u16(16)
    out.write("JFIF".getBytes("US-ASCII")); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)

    marker(0xDB) // DQT (zigzag order on the wire)
    u16(2 + 65 * (if (gray) 1 else 2))
    u8(0x00)
    var zi = 0
    while (zi < 64) { u8(qLum(Zigzag(zi))); zi += 1 }
    if (!gray) {
      u8(0x01)
      zi = 0
      while (zi < 64) { u8(qChrom(Zigzag(zi))); zi += 1 }
    }

    marker(0xC0) // SOF0, all sampling factors 1×1 (4:4:4)
    val nc = if (gray) 1 else 3
    u16(8 + 3 * nc)
    u8(8); u16(h); u16(w); u8(nc)
    var c = 0
    while (c < nc) {
      u8(c + 1); u8(0x11); u8(if (c == 0) 0 else 1)
      c += 1
    }

    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xC4)
      u16(2 + 17 + vals.length)
      u8((tc << 4) | th)
      bits.foreach(u8)
      vals.foreach(u8)
    }
    dht(0, 0, DcLumBits, DcLumVals)
    dht(1, 0, AcLumBits, AcLumVals)
    if (!gray) {
      dht(0, 1, DcChromBits, DcChromVals)
      dht(1, 1, AcChromBits, AcChromVals)
    }

    marker(0xDA) // SOS
    u16(6 + 2 * nc)
    u8(nc)
    c = 0
    while (c < nc) {
      u8(c + 1); u8(if (c == 0) 0x00 else 0x11)
      c += 1
    }
    u8(0); u8(63); u8(0)

    val bw = new BitWriter(out)
    val preds = new Array[Int](nc)
    val block = new Array[Double](64)
    val mcusX = (w + 7) / 8
    val mcusY = (h + 7) / 8
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        c = 0
        while (c < nc) {
          val plane = planes(c)
          var y = 0
          while (y < 8) {
            val sy = math.min(h - 1, my * 8 + y)
            var x = 0
            while (x < 8) {
              val sx = math.min(w - 1, mx * 8 + x)
              block(y * 8 + x) = plane(sy * w + sx)
              x += 1
            }
            y += 1
          }
          preds(c) = encodeBlock(block, if (c == 0) qLum else qChrom, preds(c),
            if (c == 0) DcLumEnc else DcChromEnc,
            if (c == 0) AcLumEnc else AcChromEnc, bw)
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
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
