package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** VP8L codec contract: exact decode∘encode identity on both encoder
  * paths (palette with sub-byte bundling, subtract-green literals), and
  * decoder fidelity for the spec surface the encoder does NOT emit —
  * backward references, color cache, meta prefix codes, predictor and
  * color transforms — proven against streams assembled bit-by-bit in
  * this spec from the published grammar (independent of the encoder's
  * choices). Corrupt streams must fail loudly. */
class Vp8lSpec extends AnyFlatSpec with Matchers {

  /** Deterministic pseudo-random RGB (LCG — no Math.random in tests). */
  private def lcgRgb(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = (s >>> 40).toByte
      i += 1
    }
    out
  }

  private def roundtrip(w: Int, h: Int, rgb: Array[Byte]): Unit = {
    val payload = Vp8l.encode(w, h, rgb)
    val (dw, dh, out) = Vp8l.decode(payload)
    (dw, dh) shouldBe (w, h)
    out shouldBe rgb
  }

  behavior of "Vp8l encoder/decoder roundtrip"

  it should "roundtrip 1x1 and tiny images" in {
    roundtrip(1, 1, Array[Byte](10, 20, 30))
    roundtrip(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    roundtrip(1, 3, Array[Byte](9, 8, 7, 6, 5, 4, 3, 2, 1))
  }

  it should "roundtrip palettes at every bundling width" in {
    // 2 colors -> 3 width bits (8 px/byte), 4 -> 2, 16 -> 1, 17 -> 0
    for ((nColors, w, h) <- Seq((2, 13, 5), (4, 9, 4), (16, 7, 7),
        (17, 6, 6), (256, 16, 16))) {
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val c = i % nColors
        rgb(3 * i) = c.toByte; rgb(3 * i + 1) = (c * 7).toByte
        rgb(3 * i + 2) = (255 - c).toByte
        i += 1
      }
      roundtrip(w, h, rgb)
    }
  }

  it should "roundtrip the literal (subtract-green) path past 256 colors" in {
    val w = 24; val h = 24
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) { // 576 distinct colors forces the literal path
      rgb(3 * i) = (i & 0xff).toByte
      rgb(3 * i + 1) = ((i >> 4) & 0xff).toByte
      rgb(3 * i + 2) = ((i * 31) & 0xff).toByte
      i += 1
    }
    roundtrip(w, h, rgb)
  }

  it should "roundtrip pseudo-random images, odd dims included" in {
    for ((w, h, seed) <- Seq((16, 16, 1L), (31, 7, 2L), (5, 29, 3L),
        (40, 40, 4L)))
      roundtrip(w, h, lcgRgb(w * h * 3, seed))
  }

  it should "preserve alpha exactly through the ARGB surface" in {
    val w = 9; val h = 5
    val argb = Array.tabulate(w * h)(i =>
      ((i * 37 & 0xff) << 24) | ((i * 11 & 0xff) << 16) |
        ((i * 5 & 0xff) << 8) | (i & 0xff))
    val (dw, dh, out) = Vp8l.decodeArgb(Vp8l.encodeArgb(w, h, argb))
    (dw, dh) shouldBe (w, h)
    out shouldBe argb
  }

  // ---------- hand-assembled streams: decoder-only spec surface ----------

  /** Start a payload: signature byte is prepended at the end; here we
    * just write the 32-bit header into a fresh writer. */
  private def header(w: Int, h: Int): Vp8l.BitWriter = {
    val bw = new Vp8l.BitWriter()
    bw.put(w - 1, 14); bw.put(h - 1, 14); bw.put(0, 1); bw.put(0, 3)
    bw
  }

  private def finish(bw: Vp8l.BitWriter): Array[Byte] = {
    val stream = bw.toBytes
    val out = new Array[Byte](stream.length + 1)
    out(0) = 0x2f
    System.arraycopy(stream, 0, out, 1, stream.length)
    out
  }

  private def argbOf(a: Int, r: Int, g: Int, b: Int): Int =
    (a << 24) | (r << 16) | (g << 8) | b

  it should "decode LZ77 backward references (linear distance)" in {
    // 4x1 image [A, B, B, B]: literal A, literal B, backref len=2 dist=1
    val A = argbOf(0xff, 1, 5, 9); val B = argbOf(0xff, 2, 6, 10)
    val bw = header(4, 1)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta prefix
    // green code over alphabet 280: {5:len1, 6:len2, 257:len2} (complete)
    val greenLens = new Array[Int](280)
    greenLens(5) = 1; greenLens(6) = 2; greenLens(257) = 2
    Vp8l.writePrefixCode(bw, greenLens)
    val greenCodes = Vp8l.canonicalCodes(greenLens)
    // red {1,2}, blue {9,10}, alpha {255} codes
    val redLens = new Array[Int](256); redLens(1) = 1; redLens(2) = 1
    val blueLens = new Array[Int](256); blueLens(9) = 1; blueLens(10) = 1
    val alphaLens = new Array[Int](256); alphaLens(255) = 1
    Vp8l.writePrefixCode(bw, redLens)
    Vp8l.writePrefixCode(bw, blueLens)
    Vp8l.writePrefixCode(bw, alphaLens)
    val redCodes = Vp8l.canonicalCodes(redLens)
    val blueCodes = Vp8l.canonicalCodes(blueLens)
    // distance code: single symbol 13 (0-bit)
    val distLens = new Array[Int](40); distLens(13) = 1
    Vp8l.writePrefixCode(bw, distLens)
    // literal A
    bw.put(greenCodes(5), 1); bw.put(redCodes(1), 1); bw.put(blueCodes(9), 1)
    // alpha single-symbol: 0 bits
    // literal B
    bw.put(greenCodes(6), 2); bw.put(redCodes(2), 1); bw.put(blueCodes(10), 1)
    // backref: green symbol 257 = length code 1 -> length 2 (no extra)
    bw.put(greenCodes(257), 2)
    // distance symbol 13 (0 bits) -> offset 96, 5 extra bits value 24
    // -> distance code 121 -> linear distance 1
    bw.put(24, 5)
    val (w, h, px) = Vp8l.decodeArgb(finish(bw))
    (w, h) shouldBe (4, 1)
    px shouldBe Array(A, B, B, B)
  }

  it should "decode the 2-D distance map (pixel above = plane code 1)" in {
    // 2x2 image [A, B, A, B] via: literals A, B then backref len=2 with
    // plane code 1 -> (x=0, y=1) -> distance = 1*xsize + 0 = 2
    val A = argbOf(0xff, 1, 5, 9); val B = argbOf(0xff, 2, 6, 10)
    val bw = header(2, 2)
    bw.put(0, 1); bw.put(0, 1); bw.put(0, 1)
    val greenLens = new Array[Int](280)
    greenLens(5) = 1; greenLens(6) = 2; greenLens(257) = 2
    Vp8l.writePrefixCode(bw, greenLens)
    val greenCodes = Vp8l.canonicalCodes(greenLens)
    val redLens = new Array[Int](256); redLens(1) = 1; redLens(2) = 1
    val blueLens = new Array[Int](256); blueLens(9) = 1; blueLens(10) = 1
    val alphaLens = new Array[Int](256); alphaLens(255) = 1
    Vp8l.writePrefixCode(bw, redLens)
    Vp8l.writePrefixCode(bw, blueLens)
    Vp8l.writePrefixCode(bw, alphaLens)
    val redCodes = Vp8l.canonicalCodes(redLens)
    val blueCodes = Vp8l.canonicalCodes(blueLens)
    // distance: single symbol 0 -> lz77 value 1 -> plane code 1
    val distLens = new Array[Int](40); distLens(0) = 1
    Vp8l.writePrefixCode(bw, distLens)
    bw.put(greenCodes(5), 1); bw.put(redCodes(1), 1); bw.put(blueCodes(9), 1)
    bw.put(greenCodes(6), 2); bw.put(redCodes(2), 1); bw.put(blueCodes(10), 1)
    bw.put(greenCodes(257), 2) // length 2; distance symbol is 0-bit
    val (_, _, px) = Vp8l.decodeArgb(finish(bw))
    px shouldBe Array(A, B, A, B)
  }

  it should "decode color-cache hits" in {
    // 3x1 [A, B, A]: literal A, literal B, cache hit of A. B chosen so
    // hash4(A)=0 != hash4(B)=2 — a colliding B would evict A.
    val A = argbOf(0xff, 1, 5, 9); val B = argbOf(0xff, 2, 6, 11)
    val cacheBits = 4
    val idxA = (0x1e35a7bd * A) >>> (32 - cacheBits)
    val bw = header(3, 1)
    bw.put(0, 1) // no transforms
    bw.put(1, 1); bw.put(cacheBits, 4) // color cache
    bw.put(0, 1) // no meta prefix
    val greenAlpha = 256 + 24 + (1 << cacheBits)
    val greenLens = new Array[Int](greenAlpha)
    greenLens(5) = 1; greenLens(6) = 2; greenLens(280 + idxA) = 2
    Vp8l.writePrefixCode(bw, greenLens)
    val greenCodes = Vp8l.canonicalCodes(greenLens)
    val redLens = new Array[Int](256); redLens(1) = 1; redLens(2) = 1
    val blueLens = new Array[Int](256); blueLens(9) = 1; blueLens(11) = 1
    val alphaLens = new Array[Int](256); alphaLens(255) = 1
    Vp8l.writePrefixCode(bw, redLens)
    Vp8l.writePrefixCode(bw, blueLens)
    Vp8l.writePrefixCode(bw, alphaLens)
    val redCodes = Vp8l.canonicalCodes(redLens)
    val blueCodes = Vp8l.canonicalCodes(blueLens)
    val distLens = new Array[Int](40); distLens(0) = 1
    Vp8l.writePrefixCode(bw, distLens)
    bw.put(greenCodes(5), 1); bw.put(redCodes(1), 1); bw.put(blueCodes(9), 1)
    bw.put(greenCodes(6), 2); bw.put(redCodes(2), 1); bw.put(blueCodes(11), 1)
    bw.put(greenCodes(280 + idxA), 2) // cache symbol — no channel reads
    val (_, _, px) = Vp8l.decodeArgb(finish(bw))
    px shouldBe Array(A, B, A)
  }

  it should "decode meta prefix codes (two entropy groups)" in {
    // 8x1, metaBits=2 (tile width 4): tiles -> groups 0 and 1, each with
    // all-single-symbol codes so the pixel section consumes no bits
    val c0 = argbOf(0xff, 3, 7, 11); val c1 = argbOf(0xff, 4, 8, 12)
    val bw = header(8, 1)
    bw.put(0, 1) // no transforms
    bw.put(0, 1) // no cache
    bw.put(1, 1); bw.put(0, 3) // meta prefix, metaBits = 2
    // entropy image 2x1 (non-level0 stream, own cache bit): green=groupIdx
    Vp8l.writePixelStream(bw,
      Array(argbOf(0, 0, 0, 0), argbOf(0, 0, 1, 0)))
    // group 0 codes: all single-symbol
    for (sym <- Seq(7, 3, 11, 255)) { // green, red, blue, alpha
      val lens = new Array[Int](if (sym == 7) 280 else 256)
      lens(sym) = 1
      Vp8l.writePrefixCode(bw, lens)
    }
    val d0 = new Array[Int](40); d0(0) = 1; Vp8l.writePrefixCode(bw, d0)
    // group 1 codes
    for (sym <- Seq(8, 4, 12, 255)) {
      val lens = new Array[Int](if (sym == 8) 280 else 256)
      lens(sym) = 1
      Vp8l.writePrefixCode(bw, lens)
    }
    val d1 = new Array[Int](40); d1(0) = 1; Vp8l.writePrefixCode(bw, d1)
    // pixels: 8 single-symbol literals, zero bits
    val (_, _, px) = Vp8l.decodeArgb(finish(bw))
    px shouldBe Array(c0, c0, c0, c0, c1, c1, c1, c1)
  }

  // ---- transforms the encoder never emits: forward-model in the test

  private def subPx(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8
    aa | rr | gg | (((a & 0xff) - (b & 0xff)) & 0xff)
  }

  private def avg2(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8
    aa | rr | gg | (((a & 0xff) + (b & 0xff)) >> 1)
  }

  private def clamp255(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v

  private def predict(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0 => 0xff000000
      case 1 => l
      case 2 => t
      case 3 => tr
      case 4 => tl
      case 5 => avg2(avg2(l, tr), t)
      case 6 => avg2(l, tl)
      case 7 => avg2(l, t)
      case 8 => avg2(tl, t)
      case 9 => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 =>
        val pa = (l >>> 24) + (t >>> 24) - (tl >>> 24)
        val pr = ((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)
        val pg = ((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)
        val pb = (l & 0xff) + (t & 0xff) - (tl & 0xff)
        val pL = math.abs(pa - (l >>> 24)) + math.abs(pr - ((l >> 16) & 0xff)) +
          math.abs(pg - ((l >> 8) & 0xff)) + math.abs(pb - (l & 0xff))
        val pT = math.abs(pa - (t >>> 24)) + math.abs(pr - ((t >> 16) & 0xff)) +
          math.abs(pg - ((t >> 8) & 0xff)) + math.abs(pb - (t & 0xff))
        if (pL < pT) l else t
      case 12 =>
        def ch(sa: Int, sb: Int, sc: Int) = clamp255(sa + sb - sc)
        (ch(l >>> 24, t >>> 24, tl >>> 24) << 24) |
          (ch((l >> 16) & 0xff, (t >> 16) & 0xff, (tl >> 16) & 0xff) << 16) |
          (ch((l >> 8) & 0xff, (t >> 8) & 0xff, (tl >> 8) & 0xff) << 8) |
          ch(l & 0xff, t & 0xff, tl & 0xff)
      case 13 =>
        val a = avg2(l, t); val b = tl
        def ch(sa: Int, sb: Int) = clamp255(sa + (sa - sb) / 2)
        (ch(a >>> 24, b >>> 24) << 24) |
          (ch((a >> 16) & 0xff, (b >> 16) & 0xff) << 16) |
          (ch((a >> 8) & 0xff, (b >> 8) & 0xff) << 8) |
          ch(a & 0xff, b & 0xff)
    }

  it should "invert all 14 predictor modes" in {
    val w = 8; val h = 6
    val src = Array.tabulate(w * h)(i =>
      argbOf(0xff, (i * 17) & 0xff, (i * 29) & 0xff, (i * 41) & 0xff))
    for (mode <- 0 until 14) {
      // forward-predict with one mode for the whole image (1 tile:
      // sizeBits=4 covers w,h <= 16), spec edge rules on row/col 0
      val res = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) src(i - 1)
          else if (x == 0) src(i - w)
          else predict(mode, src(i - 1), src(i - w), src(i - w - 1),
            src(i - w + 1)) // rightmost TR = leftmost of current row
        res(i) = subPx(src(i), pred)
      }
      val bw = header(w, h)
      bw.put(1, 1); bw.put(0, 2) // transform: PREDICTOR
      bw.put(2, 3)               // sizeBits = 4 -> one 16x16 tile
      Vp8l.writePixelStream(bw, Array(argbOf(0, 0, mode, 0)))
      bw.put(0, 1)               // no more transforms
      bw.put(0, 1); bw.put(0, 1) // no cache, no meta
      Vp8l.writeCodesAndPixels(bw, res)
      val (_, _, px) = Vp8l.decodeArgb(finish(bw))
      withClue(s"predictor mode $mode:") { px shouldBe src }
    }
  }

  it should "invert the color transform" in {
    val w = 8; val h = 4
    val src = Array.tabulate(w * h)(i =>
      argbOf(0xff, (i * 23) & 0xff, (i * 13) & 0xff, (i * 7) & 0xff))
    // one cte tile: g2r=-2 (0xfe), g2b=3, r2b=-1 (0xff)
    val g2r = 0xfe; val g2b = 0x03; val r2b = 0xff
    def delta(t: Int, c: Int): Int = (t.toByte.toInt * c.toByte.toInt) >> 5
    val res = src.map { v =>
      val g = (v >> 8) & 0xff
      val r = (v >> 16) & 0xff
      val b = v & 0xff
      val newR = (r - delta(g2r, g)) & 0xff
      val newB = (b - delta(g2b, g) - delta(r2b, r)) & 0xff
      (v & 0xff00ff00) | (newR << 16) | newB
    }
    val bw = header(w, h)
    bw.put(1, 1); bw.put(1, 2) // transform: COLOR
    bw.put(2, 3)               // sizeBits = 4 -> one tile
    Vp8l.writePixelStream(bw, Array((r2b << 16) | (g2b << 8) | g2r))
    bw.put(0, 1)
    bw.put(0, 1); bw.put(0, 1)
    Vp8l.writeCodesAndPixels(bw, res)
    val (_, _, px) = Vp8l.decodeArgb(finish(bw))
    px shouldBe src
  }

  it should "fail loudly on corrupt streams" in {
    val good = Vp8l.encode(4, 4, lcgRgb(48, 9L))
    an[IllegalArgumentException] should be thrownBy
      Vp8l.decode(Array[Byte](0x11, 0, 0, 0, 0))
    an[IllegalArgumentException] should be thrownBy
      Vp8l.decode(java.util.Arrays.copyOf(good, good.length - 1))
    // oversubscribed prefix code: three symbols all length 1
    an[IllegalArgumentException] should be thrownBy {
      val lens = new Array[Int](280)
      lens(0) = 1; lens(1) = 1; lens(2) = 1
      new Vp8l.PrefixCode(lens)
    }
    // incomplete code (two symbols, lengths 2 and 2 only)
    an[IllegalArgumentException] should be thrownBy {
      val lens = new Array[Int](280)
      lens(0) = 2; lens(1) = 2
      new Vp8l.PrefixCode(lens)
    }
  }

  behavior of "Webp lossless container integration"

  it should "roundtrip pixels through the RIFF container and parse as lossless" in {
    val w = 11; val h = 7
    val rgb = lcgRgb(w * h * 3, 42L)
    val blob = Webp.buildLosslessPixels(w, h, rgb)
    Webp.isWebp(blob) shouldBe true
    Webp.isLossless(blob) shouldBe true
    val m = Webp.parseMeta(blob)
    (m.format, m.width, m.height) shouldBe (("lossless", w, h))
    val (dw, dh, out) = Webp.decodeLossless(blob)
    (dw, dh) shouldBe (w, h)
    out shouldBe rgb
  }

  it should "route lossless WebP to real pixel features in Multimodal.decode" in {
    val w = 16; val h = 16
    val rgb = lcgRgb(w * h * 3, 77L)
    val blob = Webp.buildLosslessPixels(w, h, rgb)
    val feats = Multimodal.decode(blob)
    // must equal the direct grid-luminance features, not the byte-fold stub
    val cells = Codecs.gridLuminance(w, h, rgb, 4, 4)
    val expected = cells.map(c => (c.toDouble / (16 * 3 * 255)).toFloat)
    feats.toSeq shouldBe expected.toSeq
    // lossy VP8 still hits the (documented) stub path
    val lossy = Webp.buildLossy(8, 8)
    Multimodal.decode(lossy).toSeq shouldBe
      Multimodal.decodeStub(lossy).toSeq
  }

  it should "resize lossless WebP in real pixel space" in {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val w = 12; val h = 12
    val rgb = lcgRgb(w * h * 3, 99L)
    val blob = Webp.buildLosslessPixels(w, h, rgb)
    val media = Seq(MediaFile(1L, "image", blob,
      MediaMeta(w, h, 0L, "webp"))).toDS()
    val resized = Multimodal.resize(media, 6, 6).collect().head
    val (rw, rh, px) = Webp.decodeLossless(resized.content)
    (rw, rh) shouldBe (6, 6)
    px shouldBe Codecs.resizeNearest(w, h, rgb, 6, 6)
  }
}
