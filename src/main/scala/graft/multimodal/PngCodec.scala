package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** Minimal REAL PNG codec — pure JVM, public format knowledge only
  * (the PNG spec: 8-byte signature; length/type/data/CRC chunks;
  * IHDR; zlib-deflated IDAT of filter-prefixed scanlines; IEND).
  * This replaces the last fake in the multimodal layer: pixels now
  * genuinely round-trip through deflate + scanline filtering, so the
  * decode → feature-extract → resize pipeline operates on real image
  * bytes end-to-end.
  *
  * Scope: 8-bit depth, color types 0 (gray), 2 (RGB) and 6 (RGBA),
  * non-interlaced — the common case; anything else returns None (the
  * decoder's job on untrusted bytes is to refuse, never to throw).
  * The encoder writes filter-0 scanlines; the decoder un-filters all
  * five standard filters (None/Sub/Up/Average/Paeth), so payloads
  * from real encoders parse too.
  */
object PngCodec {

  final case class Image(width: Int, height: Int, channels: Int,
                         pixels: Array[Byte])

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    out.write(be32(data.length))
    val body = tpe.getBytes("US-ASCII") ++ data
    out.write(body)
    val crc = new CRC32(); crc.update(body)
    out.write(be32(crc.getValue.toInt))
    out.toByteArray
  }

  /** Encode `pixels` (row-major, `channels` interleaved bytes per
    * pixel: 1 = gray, 3 = RGB, 4 = RGBA) as a real PNG. */
  def encode(img: Image): Array[Byte] = {
    require(img.channels == 1 || img.channels == 3 || img.channels == 4,
      s"unsupported channel count ${img.channels}")
    require(img.pixels.length == img.width * img.height * img.channels,
      s"pixel buffer ${img.pixels.length} != w*h*c")
    val colorType = img.channels match {
      case 1 => 0; case 3 => 2; case 4 => 6
    }
    val ihdr = new Array[Byte](13)
    def putBe32(a: Array[Byte], off: Int, v: Int): Unit = {
      a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
      a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
    }
    putBe32(ihdr, 0, img.width); putBe32(ihdr, 4, img.height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8
    // 10..12 = compression/filter/interlace = 0
    val stride = img.width * img.channels
    val raw = new Array[Byte](img.height * (1 + stride))
    var y = 0
    while (y < img.height) {
      // filter byte 0 (None) + the scanline
      System.arraycopy(img.pixels, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](math.max(1024, raw.length + 64))
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Decode a PNG payload to raw interleaved pixels; None for
    * anything outside the supported profile or malformed (bad
    * signature, truncated chunks, inflate failure, interlacing,
    * sub-byte depths, palettes). Never throws on untrusted bytes. */
  def decode(p: Array[Byte]): Option[Image] = {
    def u8(i: Int) = java.lang.Byte.toUnsignedInt(p(i))
    def be32(i: Int): Long =
      (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length < Signature.length + 12 ||
        !Signature.indices.forall(i => p(i) == Signature(i))) return None
    var i = Signature.length
    var width, height, channels = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && i + 8 <= p.length) {
      val len = be32(i)
      if (len > Int.MaxValue - 12 || i + 12 + len > p.length) return None
      val tpe = new String(p, i + 4, 4, "US-ASCII")
      val dataOff = i + 8
      tpe match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(dataOff).toInt; height = be32(dataOff + 4).toInt
          val (depth, color) = (u8(dataOff + 8), u8(dataOff + 9))
          val interlace = u8(dataOff + 12)
          if (depth != 8 || interlace != 0) return None
          channels = color match {
            case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None
          }
          if (width <= 0 || height <= 0 ||
              width.toLong * height * channels > (1L << 28)) return None
        case "IDAT" => idat.write(p, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      i += 12 + len.toInt
    }
    if (!sawEnd || width < 0 || idat.size() == 0) return None
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // ANY zero-progress state is refusal: truncated stream
        // (needsInput), preset-dictionary stream (needsDictionary —
        // inflate() returns 0 forever without this check, an infinite
        // loop on a crafted FDICT zlib header), or any other stall
        if (n == 0 && !inflater.finished()) return None
        off += n
      }
      if (off != raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inflater.end()
    // refuse invalid filter types up front (spec §9 defines 0–4 only;
    // passing garbage through would decode to real-looking corruption)
    val rowLen = 1 + width * channels
    var y = 0
    while (y < height) {
      val f = java.lang.Byte.toUnsignedInt(raw(y * rowLen))
      if (f > 4) return None
      y += 1
    }
    Some(Image(width, height, channels, unfilter(raw, width, height, channels)))
  }

  /** Reverse the per-scanline PNG filters (spec §9: None/Sub/Up/
    * Average/Paeth). `raw` is height scanlines of (filterByte ++
    * stride bytes); returns the plain pixel buffer. */
  private def unfilter(raw: Array[Byte], width: Int, height: Int,
                       channels: Int): Array[Byte] = {
    val stride = width * channels
    val out = new Array[Byte](height * stride)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pa = math.abs(b - c); val pb = math.abs(a - c)
      val pc = math.abs(a + b - c - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < height) {
      val filter = java.lang.Byte.toUnsignedInt(raw(y * (1 + stride)))
      val rowIn = y * (1 + stride) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = java.lang.Byte.toUnsignedInt(raw(rowIn + x))
        val a = if (x >= channels)
          java.lang.Byte.toUnsignedInt(out(rowOut + x - channels)) else 0
        val b = if (y > 0)
          java.lang.Byte.toUnsignedInt(out(rowOut - stride + x)) else 0
        val c = if (y > 0 && x >= channels)
          java.lang.Byte.toUnsignedInt(out(rowOut - stride + x - channels))
        else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + (a + b) / 2
          case 4 => cur + paeth(a, b, c)
          case _ => cur // unreachable: decode() refuses filters > 4
        }
        out(rowOut + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize — the real pixel-space operation the
    * resize contract promises: 2-D coordinate mapping per channel
    * (NOT a byte-stream resample of the compressed payload). */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    val out = new Array[Byte](w * h * img.channels)
    var y = 0
    while (y < h) {
      val sy = math.min(img.height - 1, (y.toLong * img.height / h).toInt)
      var x = 0
      while (x < w) {
        val sx = math.min(img.width - 1, (x.toLong * img.width / w).toInt)
        var ch = 0
        while (ch < img.channels) {
          out((y * w + x) * img.channels + ch) =
            img.pixels((sy * img.width + sx) * img.channels + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, img.channels, out)
  }
}
