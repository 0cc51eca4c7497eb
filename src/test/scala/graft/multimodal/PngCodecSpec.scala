package graft.multimodal

import java.util.zip.{CRC32, Deflater}

import org.scalatest.funsuite.AnyFunSuite

import PngCodec.Image

/** Pins the real PNG codec: exact pixel round-trips through deflate +
  * filtering, spec-correct un-filtering of all five standard filters
  * (crafted byte-level payloads, not our own encoder's output), true
  * 2-D nearest-neighbor geometry, and refusal (not crash) on
  * malformed/unsupported payloads.
  */
class PngCodecSpec extends AnyFunSuite {

  private def pattern(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + seed * 97) % 256).toByte)

  test("gray / RGB / RGBA images round-trip exactly") {
    for ((channels, seed) <- Seq((1, 1), (3, 2), (4, 3))) {
      val (w, h) = (13, 7) // deliberately non-power-of-two
      val img = Image(w, h, channels, pattern(w * h * channels, seed))
      val decoded = PngCodec.decode(PngCodec.encode(img))
      assert(decoded.isDefined, s"channels=$channels failed to decode")
      val d = decoded.get
      assert(d.width === w && d.height === h && d.channels === channels)
      assert(d.pixels.toSeq === img.pixels.toSeq,
        s"channels=$channels pixels drifted")
    }
  }

  // -- a tiny independent PNG writer that can emit ANY filter type, to
  // -- prove the decoder implements the spec, not just our encoder
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def rawChunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val body = tpe.getBytes("US-ASCII") ++ data
    val crc = new CRC32(); crc.update(body)
    be32(data.length) ++ body ++ be32(crc.getValue.toInt)
  }

  /** Apply the FORWARD filter `ft` to pixels and package a 1-channel
    * PNG, one filter type for every scanline. */
  private def encodeWithFilter(w: Int, h: Int, px: Array[Byte], ft: Int): Array[Byte] = {
    def u(b: Byte) = java.lang.Byte.toUnsignedInt(b)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pa = math.abs(b - c); val pb = math.abs(a - c)
      val pc = math.abs(a + b - c - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte](h * (1 + w))
    for (y <- 0 until h) {
      raw(y * (1 + w)) = ft.toByte
      for (x <- 0 until w) {
        val cur = u(px(y * w + x))
        val a = if (x > 0) u(px(y * w + x - 1)) else 0
        val b = if (y > 0) u(px((y - 1) * w + x)) else 0
        val c = if (y > 0 && x > 0) u(px((y - 1) * w + x - 1)) else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 => cur - paeth(a, b, c)
          case _ => cur // out-of-spec filter id: raw data under a bad tag
        }
        raw(y * (1 + w) + 1 + x) = filtered.toByte
      }
    }
    val deflater = new Deflater(); deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 128)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 0, 0, 0, 0)
    sig ++ rawChunk("IHDR", ihdr) ++ rawChunk("IDAT", out.toByteArray) ++
      rawChunk("IEND", Array.emptyByteArray)
  }

  test("decoder un-filters all five standard scanline filters") {
    val (w, h) = (9, 5)
    val px = pattern(w * h, 11)
    for (ft <- 0 to 4) {
      val decoded = PngCodec.decode(encodeWithFilter(w, h, px, ft))
      assert(decoded.isDefined, s"filter $ft failed to decode")
      assert(decoded.get.pixels.toSeq === px.toSeq, s"filter $ft wrong pixels")
    }
  }

  test("decoder refuses malformed and unsupported payloads without throwing") {
    val good = PngCodec.encode(Image(4, 4, 1, pattern(16, 5)))
    assert(PngCodec.decode(good.take(10)).isEmpty, "truncated header")
    assert(PngCodec.decode(good.dropRight(6)).isEmpty, "missing IEND")
    assert(PngCodec.decode("not a png at all".getBytes).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    // interlaced flag set
    val interlaced = good.clone(); interlaced(8 + 4 + 4 + 12) = 1
    assert(PngCodec.decode(interlaced).isEmpty, "interlaced must be refused")
    // out-of-spec scanline filter id (spec §9 defines 0-4 only): must
    // refuse, never decode to real-looking garbage
    assert(PngCodec.decode(encodeWithFilter(4, 2, pattern(8, 6), 7)).isEmpty,
      "filter id 7 must be refused")
    // zlib FDICT stream: Inflater reports needsDictionary and makes no
    // progress — must refuse, never loop (the crafted header is
    // 0x78 0x20: deflate method, FDICT bit set, then a 4-byte DICTID)
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = be32(2) ++ be32(2) ++ Array[Byte](8, 0, 0, 0, 0)
    val fdictIdat = Array(0x78, 0x20, 1, 2, 3, 4, 5, 6, 7).map(_.toByte)
    val fdictPng = sig ++ rawChunk("IHDR", ihdr) ++
      rawChunk("IDAT", fdictIdat) ++ rawChunk("IEND", Array.emptyByteArray)
    assert(PngCodec.decode(fdictPng).isEmpty, "FDICT zlib must be refused")
    // deterministic fuzz: arbitrary byte soup, optionally with a valid
    // signature prefix, must return None or Some but never throw
    for (seed <- 0 until 50) {
      val junk = pattern(seed * 7 + 3, seed)
      PngCodec.decode(junk)
      PngCodec.decode(good.take(8) ++ junk)
    }
  }

  test("nearest-neighbor resize picks spec coordinates, channels intact") {
    // 4x4 gray ramp: downsample to 2x2 must pick pixels (0,0) (2,0)
    // (0,2) (2,2) under floor(x*sw/w) mapping
    val src = Image(4, 4, 1, Array.tabulate(16)(i => i.toByte))
    val down = PngCodec.resizeNearest(src, 2, 2)
    assert(down.pixels.toSeq === Seq[Byte](0, 2, 8, 10))
    // upsample replicates
    val up = PngCodec.resizeNearest(Image(2, 1, 1, Array[Byte](7, 9)), 4, 1)
    assert(up.pixels.toSeq === Seq[Byte](7, 7, 9, 9))
    // RGB pixels move together
    val rgb = Image(2, 1, 3, Array[Byte](1, 2, 3, 4, 5, 6))
    val r2 = PngCodec.resizeNearest(rgb, 1, 1)
    assert(r2.pixels.toSeq === Seq[Byte](1, 2, 3))
  }

  test("round-trip survives re-encode of a resized image") {
    val img = Image(16, 16, 1, pattern(256, 9))
    val resized = PngCodec.resizeNearest(img, 5, 3)
    val re = PngCodec.decode(PngCodec.encode(resized))
    assert(re.isDefined && re.get.pixels.toSeq === resized.pixels.toSeq)
  }

  test("property: any image round-trips exactly (arbitrary dims/channels/pixels)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.forAll
    val genImg = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 40)
      c <- Gen.oneOf(1, 3, 4)
      px <- Gen.containerOfN[Array, Byte](w * h * c, Gen.choose(-128, 127).map(_.toByte))
    } yield Image(w, h, c, px)
    val prop = forAll(genImg) { img =>
      PngCodec.decode(PngCodec.encode(img)) match {
        case Some(d) =>
          Prop(d.width == img.width && d.height == img.height &&
            d.channels == img.channels &&
            java.util.Arrays.equals(d.pixels, img.pixels))
        case None => Prop.falsified
      }
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
