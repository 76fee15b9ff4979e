package graft.multimodal

/** VP8L — the WebP LOSSLESS bitstream — written against the public
  * "WebP Lossless Bitstream Specification" (RFC 9649 §3): the modern
  * crawl's most common image format, and until this codec the only
  * major one whose pixels the engine faked behind the documented stub.
  *
  * Decoder: the FULL spec surface a third-party file can use — LSB-first
  * bit reads, simple and full prefix codes (code-length codes with
  * 16/17/18 repeats and the max-symbol shortcut, the single-symbol
  * zero-bit special case), color cache, meta prefix codes via an entropy
  * image, LZ77 backward references through the 120-entry two-dimensional
  * distance map, and all four transforms inverted in reverse bitstream
  * order (predictor ×14 modes, color, subtract-green, color-indexing
  * with sub-byte pixel bundling). Every structural violation is a loud
  * error, never a best-effort pixel.
  *
  * Encoder: a compact-but-complete writer for the roundtrip proof and
  * the resize path — auto palette (color-indexing transform, bundled
  * sub-byte indices) when ≤256 distinct colors, else subtract-green +
  * per-channel literals; canonical length-limited prefix codes emitted
  * through the real code-length machinery (zero-run 17/18 codes), simple
  * codes for ≤2-symbol alphabets. No backward references or color cache
  * on the write side — compression is traded for simplicity, legality is
  * not: the output is a conforming stream any VP8L decoder reads.
  *
  * VP8L is lossless, so the contract is exact: decode(encode(px)) == px
  * bit-for-bit (the `webp_codec` contract query and WebpSpec prove it,
  * and the GIF/PNG oracle pattern applies unchanged).
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque binary + typed metadata (SURVEY §2 multimodal columns); this
  * codec feeds the same 4×4 grid-luminance features as PNG/JPEG/GIF.
  */
object Vp8l {

  // ----------------------------------------------------------- bit I/O

  /** LSB-first bit reader (VP8L convention: bits fill from the low end
    * of each byte). Bounds-checked; over-read is a loud error. */
  private[multimodal] final class BitReader(data: Array[Byte], start: Int) {
    private var bytePos = start
    private var bitPos = 0
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) {
        require(bytePos < data.length, "vp8l: truncated bitstream")
        v |= (((data(bytePos) >> bitPos) & 1) << i)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def bit(): Int = bits(1)
  }

  /** LSB-first bit writer. */
  private[multimodal] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Int, k: Int): Unit = {
      var i = 0
      while (i < k) {
        acc |= (((v >> i) & 1) << n)
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i += 1
      }
    }
    def toBytes: Array[Byte] = {
      val flushed = out.toByteArray
      if (n == 0) flushed
      else java.util.Arrays.copyOf(flushed, flushed.length + 1) match {
        case a => a(a.length - 1) = acc.toByte; a
      }
    }
  }

  // ----------------------------------------------------- prefix codes

  /** Canonical prefix-code decoder table: peek `maxLen` stream bits
    * (LSB-first), index → (symbol, length). The canonical assignment is
    * the DEFLATE one (by length, then symbol index) with each code's
    * bits appearing in the stream low-bit-first, hence the bit-reversed
    * fill. `lengths(sym) == 0` means absent. A code with exactly ONE
    * symbol is a ZERO-BIT code (the decoder returns it consuming
    * nothing) — the spec's single-symbol special case. Any other
    * incomplete or oversubscribed code is a loud error. */
  private[multimodal] final class PrefixCode(lengths: Array[Int]) {
    private var single = -1
    private var maxLen = 0
    private var table: Array[Int] = null // (sym << 4) | len

    locally {
      var nUsed = 0; var lastSym = -1
      var i = 0
      while (i < lengths.length) {
        require(lengths(i) >= 0 && lengths(i) <= 15,
          s"vp8l: code length ${lengths(i)} out of range")
        if (lengths(i) > 0) { nUsed += 1; lastSym = i
          if (lengths(i) > maxLen) maxLen = lengths(i) }
        i += 1
      }
      require(nUsed > 0, "vp8l: empty prefix code")
      if (nUsed == 1) single = lastSym
      else {
        // Kraft sum must be exactly 1 (complete code)
        var kraft = 0L
        i = 0
        while (i < lengths.length) {
          if (lengths(i) > 0) kraft += (1L << (15 - lengths(i)))
          i += 1
        }
        require(kraft == (1L << 15),
          s"vp8l: prefix code not complete (kraft=$kraft)")
        table = new Array[Int](1 << maxLen)
        // canonical codes: count per length, then first code per length
        val blCount = new Array[Int](16)
        i = 0
        while (i < lengths.length) {
          if (lengths(i) > 0) blCount(lengths(i)) += 1; i += 1
        }
        val nextCode = new Array[Int](16)
        var code = 0
        var l = 1
        while (l <= 15) {
          code = (code + blCount(l - 1)) << 1
          nextCode(l) = code
          l += 1
        }
        i = 0
        while (i < lengths.length) {
          val len = lengths(i)
          if (len > 0) {
            val c = nextCode(len); nextCode(len) += 1
            // reverse the len bits of c, then fill every table slot whose
            // low len bits equal the reversed code
            var rev = 0
            var b = 0
            while (b < len) { rev = (rev << 1) | ((c >> b) & 1); b += 1 }
            var slot = rev
            while (slot < table.length) {
              table(slot) = (i << 4) | len
              slot += (1 << len)
            }
          }
          i += 1
        }
      }
    }

    def read(br: BitReader): Int =
      if (single >= 0) single
      else {
        // peek bit-by-bit (reader has no unget): accumulate LSB-first and
        // match against the table progressively — table stores full-peek
        // entries, so walk by reading exactly `len` bits
        var acc = 0
        var got = 0
        while (true) {
          acc |= (br.bit() << got)
          got += 1
          require(got <= maxLen, "vp8l: invalid prefix code in stream")
          // candidate: the table entry this prefix would select
          val e = table(acc | (0 /* upper bits zero */))
          if ((e & 0xf) == got) return e >>> 4
        }
        -1 // unreachable
      }
  }

  /** Canonical (code, length) per symbol for the WRITER — the same
    * assignment [[PrefixCode]] decodes, bits emitted LSB-of-code-first. */
  private[multimodal] def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val blCount = new Array[Int](16)
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) blCount(lengths(i)) += 1; i += 1
    }
    val nextCode = new Array[Int](16)
    var code = 0
    var l = 1
    while (l <= 15) {
      code = (code + blCount(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    val out = new Array[Int](lengths.length)
    i = 0
    while (i < lengths.length) {
      val len = lengths(i)
      if (len > 0) {
        val c = nextCode(len); nextCode(len) += 1
        var rev = 0
        var b = 0
        while (b < len) { rev = (rev << 1) | ((c >> b) & 1); b += 1 }
        out(i) = rev
      }
      i += 1
    }
    out
  }

  /** Length-limited Huffman code lengths via package-merge — optimal
    * under the limit, always a COMPLETE code (Kraft == 1), which is what
    * both this decoder and libwebp's table builder require.
    *
    * Array-based: one sort of the base symbols, then each round MERGES
    * the (sorted) base with the (sorted) pairwise packages of the
    * previous round — pairwise sums of a sorted list are sorted, so no
    * per-round sort; packages carry child indices instead of symbol
    * lists and the final symbol counts come from one stack walk. This
    * is the encoder's hottest helper (4 codes per stream, 2 streams per
    * image on the palette path). */
  private[multimodal] def huffmanLengths(freq: Array[Long],
                                         limit: Int): Array[Int] = {
    val out = new Array[Int](freq.length)
    var n = 0
    var s = 0
    while (s < freq.length) { if (freq(s) > 0) n += 1; s += 1 }
    if (n == 0) return out
    val baseSym = new Array[Int](n)
    var i = 0
    s = 0
    while (s < freq.length) { if (freq(s) > 0) { baseSym(i) = s; i += 1 }; s += 1 }
    if (n == 1) { out(baseSym(0)) = 1; return out }
    require(n <= (1 << limit),
      s"vp8l: $n symbols cannot fit in $limit-bit codes")
    // base sorted by (freq, symbol)
    val order = baseSym.sortBy(sym => (freq(sym), sym))
    val baseW = order.map(freq)
    // rounds: item = symbol (idx < n -> order(idx)) or package of two
    // previous-round items (children stored per round)
    var prevW = baseW
    val rounds = new Array[(Array[Long], Array[Int], Boolean)](limit)
    rounds(0) = (baseW, null, true)
    var round = 1
    while (round < limit) {
      val m = prevW.length / 2
      val pkgW = new Array[Long](m)
      val pkgC = new Array[Int](m)
      i = 0
      while (i < m) { pkgW(i) = prevW(2 * i) + prevW(2 * i + 1); pkgC(i) = 2 * i; i += 1 }
      // merge sorted base with sorted packages; item encoding: idx < n
      // -> base symbol order(idx); else package (idx - n) of prev round
      val merged = new Array[Long](n + m)
      val kind = new Array[Int](n + m) // base idx or n + pkg idx
      var a = 0; var b = 0; var k = 0
      while (a < n || b < m) {
        val takeBase = b >= m || (a < n && baseW(a) <= pkgW(b))
        if (takeBase) { merged(k) = baseW(a); kind(k) = a; a += 1 }
        else { merged(k) = pkgW(b); kind(k) = n + b; b += 1 }
        k += 1
      }
      rounds(round) = (merged, kind, false)
      prevW = merged
      round += 1
    }
    // count symbol occurrences in the first 2(n-1) items of the last
    // round via an explicit (round, item) stack walk
    val stack = new Array[Int](2 * limit * n + 4) // (round<<20 | item) pairs
    var sp = 0
    val last = limit - 1
    i = 0
    val take = 2 * (n - 1)
    while (i < take) { stack(sp) = (last << 20) | i; sp += 1; i += 1 }
    while (sp > 0) {
      sp -= 1
      val r = stack(sp) >>> 20
      val it = stack(sp) & 0xfffff
      if (r == 0) out(order(it)) += 1
      else {
        val (_, kindR, _) = rounds(r)
        val kd = if (kindR == null) it else kindR(it)
        if (kd < n) out(order(kd)) += 1
        else { // package of prev-round items 2p and 2p+1
          val p = kd - n
          stack(sp) = ((r - 1) << 20) | (2 * p); sp += 1
          stack(sp) = ((r - 1) << 20) | (2 * p + 1); sp += 1
        }
      }
    }
    out
  }

  // ------------------------------------------------- spec constants

  /** Code-length-code transmission order (spec §3.5.2.2). */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  /** The 120-entry 2-D distance map (spec §3.4.2.2): the closest
    * neighbors of the current pixel, ordered by squared euclidean
    * distance, ties broken by larger y first then larger x first —
    * generated rather than transcribed so the ordering rule is the
    * documentation. Covers y ∈ 0..7 with x ∈ −7..8, minus the
    * non-causal y=0, x≤0 half-row; codes beyond 120 are linear
    * distances. */
  private val DistanceMap: Array[(Int, Int)] = {
    val pts = for {
      y <- 0 to 7
      x <- -7 to 8
      if y > 0 || x > 0
    } yield (x, y)
    pts.sortBy { case (x, y) => (x * x + y * y, -y, -x) }.toArray
  }
  require(DistanceMap.length == 120, "vp8l: distance map must have 120 entries")

  private def planeCodeToDistance(xsize: Int, code: Int): Int =
    if (code > 120) code - 120
    else {
      val (x, y) = DistanceMap(code - 1)
      math.max(1, y * xsize + x)
    }

  /** LZ77 length/distance prefix value (spec §3.4.2.1): 24 codes, the
    * first 4 literal, then exponentially growing extra-bit ranges. */
  private def lz77Value(br: BitReader, code: Int): Int =
    if (code < 4) code + 1
    else {
      val extra = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extra
      offset + br.bits(extra) + 1
    }

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // --------------------------------------------------------- decoder

  private final case class Transform(kind: Int, sizeBits: Int,
      data: Array[Int], palette: Array[Int])

  /** Decode a VP8L chunk payload (starting at the 0x2f signature) to
    * (width, height, interleaved RGB) — the [[Codecs]] pixel convention;
    * alpha is decoded exactly but dropped here (see [[decodeArgb]]). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
    val (w, h, argb) = decodeArgb(payload)
    val rgb = new Array[Byte]((w * h * 3))
    var i = 0
    while (i < argb.length) {
      rgb(3 * i) = ((argb(i) >> 16) & 0xff).toByte
      rgb(3 * i + 1) = ((argb(i) >> 8) & 0xff).toByte
      rgb(3 * i + 2) = (argb(i) & 0xff).toByte
      i += 1
    }
    (w, h, rgb)
  }

  /** Full ARGB decode (alpha preserved). */
  def decodeArgb(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    require(payload.length >= 5 && (payload(0) & 0xff) == 0x2f,
      "vp8l: bad signature")
    val br = new BitReader(payload, 1)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bit() // alpha-is-used hint
    require(br.bits(3) == 0, "vp8l: unknown version")
    val argb = decodeImageStream(br, w, h, isLevel0 = true)
    (w, h, argb)
  }

  /** One image stream (spec §3.7): transforms (level 0 only), color
    * cache, meta prefix codes, entropy-coded LZ77 pixels, then inverse
    * transforms in reverse read order. */
  private def decodeImageStream(br: BitReader, w0: Int, h0: Int,
                                isLevel0: Boolean): Array[Int] = {
    var w = w0
    val h = h0
    var transforms = List.empty[Transform]
    if (isLevel0) {
      var seen = Set.empty[Int]
      while (br.bit() == 1) {
        val kind = br.bits(2)
        require(!seen.contains(kind), s"vp8l: duplicate transform $kind")
        seen += kind
        kind match {
          case 0 | 1 => // PREDICTOR / COLOR: block-size + sub-image
            val sizeBits = br.bits(3) + 2
            val tw = subSize(w, sizeBits); val th = subSize(h, sizeBits)
            val img = decodeImageStream(br, tw, th, isLevel0 = false)
            transforms ::= Transform(kind, sizeBits, img, null)
          case 2 => // SUBTRACT_GREEN: no payload
            transforms ::= Transform(2, 0, null, null)
          case 3 => // COLOR_INDEXING: delta-coded palette, pixel bundling
            val nColors = br.bits(8) + 1
            val raw = decodeImageStream(br, nColors, 1, isLevel0 = false)
            val palette = new Array[Int](nColors)
            var acc = 0
            var i = 0
            while (i < nColors) { // per-channel running sum (mod 256)
              acc = addPixels(acc, raw(i)); palette(i) = acc; i += 1
            }
            val widthBits =
              if (nColors <= 2) 3 else if (nColors <= 4) 2
              else if (nColors <= 16) 1 else 0
            transforms ::= Transform(3, widthBits, null, palette)
            w = subSize(w, widthBits) // bundled width for the main image
        }
      }
    }
    val cacheBits = if (br.bit() == 1) {
      val b = br.bits(4)
      require(b >= 1 && b <= 11, s"vp8l: color cache bits $b out of range")
      b
    } else 0
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheBits > 0) new Array[Int](cacheSize) else null

    // meta prefix codes (ARGB image only)
    var metaBits = 0
    var metaImage: Array[Int] = null
    if (isLevel0 && br.bit() == 1) {
      metaBits = br.bits(3) + 2
      metaImage =
        decodeImageStream(br, subSize(w, metaBits), subSize(h, metaBits),
          isLevel0 = false)
    }
    val nGroups =
      if (metaImage == null) 1
      else {
        var mx = 0
        var i = 0
        while (i < metaImage.length) {
          val v = (metaImage(i) >> 8) & 0xffff
          if (v > mx) mx = v; i += 1
        }
        mx + 1
      }

    // per-group: green+len+cache, red, blue, alpha, distance
    val alphabetSizes =
      Array(256 + 24 + cacheSize, 256, 256, 256, 40)
    val groups = Array.ofDim[PrefixCode](nGroups, 5)
    var g = 0
    while (g < nGroups) {
      var c = 0
      while (c < 5) {
        groups(g)(c) = readPrefixCode(br, alphabetSizes(c))
        c += 1
      }
      g += 1
    }

    def groupAt(x: Int, y: Int): Array[PrefixCode] =
      if (metaImage == null) groups(0)
      else {
        val mw = subSize(w, metaBits)
        val m = metaImage((y >> metaBits) * mw + (x >> metaBits))
        val idx = (m >> 8) & 0xffff
        groups(idx)
      }

    val total = w * h
    val px = new Array[Int](total)
    var pos = 0
    while (pos < total) {
      val codes = groupAt(pos % w, pos / w)
      val s = codes(0).read(br)
      if (s < 256) {
        val red = codes(1).read(br)
        val blue = codes(2).read(br)
        val alpha = codes(3).read(br)
        val v = (alpha << 24) | (red << 16) | (s << 8) | blue
        px(pos) = v
        if (cache != null) cache(cacheHash(v, cacheBits)) = v
        pos += 1
      } else if (s < 256 + 24) {
        val len = lz77Value(br, s - 256)
        val distCode = codes(4).read(br)
        val dist = planeCodeToDistance(w, lz77Value(br, distCode))
        require(dist <= pos, s"vp8l: backref distance $dist at pixel $pos")
        require(pos + len <= total, "vp8l: backref overruns the image")
        var i = 0
        while (i < len) {
          val v = px(pos - dist)
          px(pos) = v
          if (cache != null) cache(cacheHash(v, cacheBits)) = v
          pos += 1; i += 1
        }
      } else {
        require(cache != null, "vp8l: cache symbol without a color cache")
        val idx = s - 256 - 24
        px(pos) = cache(idx)
        pos += 1
      }
    }

    // inverse transforms, reverse read order (list head = last read)
    var result = px
    var rw = w
    transforms.foreach { t =>
      t.kind match {
        case 3 =>
          result = inverseColorIndexing(result, rw, h, w0, t.sizeBits, t.palette)
          rw = w0
        case 2 => result = inverseSubtractGreen(result)
        case 1 => result = inverseColorTransform(result, rw, h, t.sizeBits, t.data)
        case 0 => result = inversePredictor(result, rw, h, t.sizeBits, t.data)
      }
    }
    result
  }

  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    val lengths = new Array[Int](alphabetSize)
    if (br.bit() == 1) { // simple code: 1-2 symbols, no length table
      val nSyms = br.bit() + 1
      val first = if (br.bit() == 1) br.bits(8) else br.bits(1)
      require(first < alphabetSize, s"vp8l: simple-code symbol $first")
      if (nSyms == 1) lengths(first) = 1 // becomes the 0-bit single case
      else {
        val second = br.bits(8)
        require(second < alphabetSize && second != first,
          s"vp8l: simple-code symbol pair $first/$second")
        lengths(first) = 1; lengths(second) = 1
      }
      new PrefixCode(lengths)
    } else {
      val numCl = br.bits(4) + 4
      require(numCl <= ClOrder.length, s"vp8l: $numCl code-length codes")
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLengths(ClOrder(i)) = br.bits(3); i += 1 }
      val clCode = new PrefixCode(clLengths)
      // optional max-symbol shortcut
      var maxSymbol =
        if (br.bit() == 1) {
          val lengthNBits = 2 + 2 * br.bits(3)
          val ms = 2 + br.bits(lengthNBits)
          require(ms <= alphabetSize, s"vp8l: max symbol $ms > $alphabetSize")
          ms
        } else alphabetSize
      var symbol = 0
      var prev = 8
      while (symbol < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = clCode.read(br)
        if (cl < 16) {
          lengths(symbol) = cl; symbol += 1
          if (cl != 0) prev = cl
        } else {
          val (repeat, value) = cl match {
            case 16 => (3 + br.bits(2), prev)
            case 17 => (3 + br.bits(3), 0)
            case 18 => (11 + br.bits(7), 0)
            case other =>
              throw new IllegalArgumentException(s"vp8l: cl symbol $other")
          }
          require(symbol + repeat <= alphabetSize,
            "vp8l: code-length repeat overruns the alphabet")
          var r = 0
          while (r < repeat) { lengths(symbol) = value; symbol += 1; r += 1 }
        }
      }
      new PrefixCode(lengths)
    }
  }

  // ------------------------------------------------ inverse transforms

  /** Per-channel byte-wise add (mod 256) — the palette delta coding and
    * predictor residual addition both use it. */
  private def addPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) + (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = (((a & 0xff) + (b & 0xff)) & 0xff)
    aa | rr | gg | bb
  }

  private def inverseSubtractGreen(px: Array[Int]): Array[Int] = {
    var i = 0
    while (i < px.length) {
      val v = px(i)
      val g = (v >> 8) & 0xff
      val r = (((v >> 16) & 0xff) + g) & 0xff
      val b = ((v & 0xff) + g) & 0xff
      px(i) = (v & 0xff00ff00) | (r << 16) | b
      i += 1
    }
    px
  }

  private def inverseColorIndexing(px: Array[Int], bundledW: Int, h: Int,
      realW: Int, widthBits: Int, palette: Array[Int]): Array[Int] = {
    if (widthBits == 0) {
      var i = 0
      while (i < px.length) {
        val idx = (px(i) >> 8) & 0xff
        require(idx < palette.length, s"vp8l: palette index $idx out of range")
        px(i) = palette(idx)
        i += 1
      }
      px
    } else {
      val out = new Array[Int](realW * h)
      val perByte = 1 << widthBits          // pixels packed per green byte
      val bpp = 8 >> widthBits              // bits per packed index
      val mask = (1 << bpp) - 1
      var y = 0
      while (y < h) {
        var x = 0
        while (x < realW) {
          val packed = (px(y * bundledW + (x >> widthBits)) >> 8) & 0xff
          val idx = (packed >> (bpp * (x & (perByte - 1)))) & mask
          require(idx < palette.length,
            s"vp8l: bundled palette index $idx out of range")
          out(y * realW + x) = palette(idx)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  private def inverseColorTransform(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, cti: Array[Int]): Array[Int] = {
    val tw = subSize(w, sizeBits)
    def delta(t: Int, c: Int): Int = ((t.toByte.toInt * c.toByte.toInt) >> 5)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val cte = cti((y >> sizeBits) * tw + (x >> sizeBits))
        val g2r = cte & 0xff
        val g2b = (cte >> 8) & 0xff
        val r2b = (cte >> 16) & 0xff
        val v = px(y * w + x)
        val g = (v >> 8) & 0xff
        val r = (((v >> 16) & 0xff) + delta(g2r, g)) & 0xff
        val b0 = (v & 0xff) + delta(g2b, g) + delta(r2b, r)
        val b = b0 & 0xff
        px(y * w + x) = (v & 0xff00ff00) | (r << 16) | b
        x += 1
      }
      y += 1
    }
    px
  }

  private def inversePredictor(px: Array[Int], w: Int, h: Int,
      sizeBits: Int, pi: Array[Int]): Array[Int] = {
    val tw = subSize(w, sizeBits)
    def avg2(a: Int, b: Int): Int = {
      val aa = (((a >>> 24) + (b >>> 24)) >> 1) << 24
      val rr = ((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) >> 1) << 16
      val gg = ((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) >> 1) << 8
      val bb = ((a & 0xff) + (b & 0xff)) >> 1
      aa | rr | gg | bb
    }
    def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
    def select(l: Int, t: Int, tl: Int): Int = {
      val pa = (l >>> 24) + (t >>> 24) - (tl >>> 24)
      val pr = ((l >> 16) & 0xff) + ((t >> 16) & 0xff) - ((tl >> 16) & 0xff)
      val pg = ((l >> 8) & 0xff) + ((t >> 8) & 0xff) - ((tl >> 8) & 0xff)
      val pb = (l & 0xff) + (t & 0xff) - (tl & 0xff)
      val pL = math.abs(pa - (l >>> 24)) + math.abs(pr - ((l >> 16) & 0xff)) +
        math.abs(pg - ((l >> 8) & 0xff)) + math.abs(pb - (l & 0xff))
      val pT = math.abs(pa - (t >>> 24)) + math.abs(pr - ((t >> 16) & 0xff)) +
        math.abs(pg - ((t >> 8) & 0xff)) + math.abs(pb - (t & 0xff))
      if (pL < pT) l else t
    }
    def casFull(a: Int, b: Int, c: Int): Int = {
      def ch(sa: Int, sb: Int, sc: Int) = clamp(sa + sb - sc)
      (ch(a >>> 24, b >>> 24, c >>> 24) << 24) |
        (ch((a >> 16) & 0xff, (b >> 16) & 0xff, (c >> 16) & 0xff) << 16) |
        (ch((a >> 8) & 0xff, (b >> 8) & 0xff, (c >> 8) & 0xff) << 8) |
        ch(a & 0xff, b & 0xff, c & 0xff)
    }
    def casHalf(a: Int, b: Int): Int = {
      def ch(sa: Int, sb: Int) = clamp(sa + (sa - sb) / 2)
      (ch(a >>> 24, b >>> 24) << 24) |
        (ch((a >> 16) & 0xff, (b >> 16) & 0xff) << 16) |
        (ch((a >> 8) & 0xff, (b >> 8) & 0xff) << 8) |
        ch(a & 0xff, b & 0xff)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) px(i - 1)      // top row: always L
          else if (x == 0) px(i - w)      // left column: always T
          else {
            val mode = (pi((y >> sizeBits) * tw + (x >> sizeBits)) >> 8) & 0xff
            require(mode < 14, s"vp8l: predictor mode $mode")
            val l = px(i - 1); val t = px(i - w)
            lazy val tl = px(i - w - 1)
            // rightmost column: TR is the leftmost pixel of the CURRENT
            // row (spec's exceptional addressing) — which in raster
            // memory is exactly px(i - w + 1) for every x
            lazy val tr = px(i - w + 1)
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
              case 11 => select(l, t, tl)
              case 12 => casFull(l, t, tl)
              case 13 => casHalf(avg2(l, t), tl)
            }
          }
        px(i) = addPixels(px(i), pred)
        x += 1
      }
      y += 1
    }
    px
  }

  // --------------------------------------------------------- encoder

  /** Encode interleaved RGB (alpha := 255) as a complete VP8L chunk
    * payload. Auto-selects the color-indexing transform when the image
    * has ≤256 distinct colors (with spec-mandated sub-byte bundling for
    * small palettes), else subtract-green + literals. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w >= 1 && w <= 0x4000 && h >= 1 && h <= 0x4000,
      s"vp8l: dims out of range ${w}x$h")
    require(rgb.length == w * h * 3,
      s"vp8l: need ${w * h * 3} bytes for ${w}x$h, got ${rgb.length}")
    val argb = new Array[Int](w * h)
    var i = 0
    while (i < argb.length) {
      argb(i) = 0xff000000 | ((rgb(3 * i) & 0xff) << 16) |
        ((rgb(3 * i + 1) & 0xff) << 8) | (rgb(3 * i + 2) & 0xff)
      i += 1
    }
    encodeArgb(w, h, argb)
  }

  /** Encode ARGB pixels as a complete VP8L chunk payload. */
  def encodeArgb(w: Int, h: Int, argb: Array[Int]): Array[Byte] = {
    val bw = new BitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    val hasAlpha = argb.exists(p => (p >>> 24) != 0xff)
    bw.put(if (hasAlpha) 1 else 0, 1)
    bw.put(0, 3) // version

    val distinct = scala.collection.mutable.LinkedHashSet.empty[Int]
    var i = 0
    while (i < argb.length && distinct.size <= 256) {
      distinct += argb(i); i += 1
    }

    if (distinct.size <= 256) {
      // ---- color-indexing path
      val palette = distinct.toArray
      val index = palette.zipWithIndex.toMap
      val nColors = palette.length
      bw.put(1, 1); bw.put(3, 2) // one transform: COLOR_INDEXING
      bw.put(nColors - 1, 8)
      // palette as a delta-coded 1×n image stream (non-level0)
      val deltas = new Array[Int](nColors)
      var prev = 0
      i = 0
      while (i < nColors) {
        deltas(i) = subPixels(palette(i), prev); prev = palette(i); i += 1
      }
      writePixelStream(bw, deltas)
      bw.put(0, 1) // no more transforms
      val widthBits =
        if (nColors <= 2) 3 else if (nColors <= 4) 2
        else if (nColors <= 16) 1 else 0
      // bundle indices into green-channel bytes
      val bw2 = subSize(w, widthBits)
      val bundled = new Array[Int](bw2 * h)
      val perByte = 1 << widthBits
      val bpp = 8 >> widthBits
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val idx = index(argb(y * w + x))
          val slot = y * bw2 + (x >> widthBits)
          bundled(slot) |= (idx << (bpp * (x & (perByte - 1)))) << 8
          x += 1
        }
        y += 1
      }
      // green carries the packed byte; fix alpha to 0 (decoder ignores
      // everything but green after unbundling)
      writeMainStream(bw, bundled)
    } else {
      // ---- subtract-green + literals path
      bw.put(1, 1); bw.put(2, 2) // one transform: SUBTRACT_GREEN
      bw.put(0, 1) // no more transforms
      val tx = new Array[Int](argb.length)
      i = 0
      while (i < argb.length) {
        val v = argb(i)
        val g = (v >> 8) & 0xff
        val r = (((v >> 16) & 0xff) - g) & 0xff
        val b = ((v & 0xff) - g) & 0xff
        tx(i) = (v & 0xff00ff00) | (r << 16) | b
        i += 1
      }
      writeMainStream(bw, tx)
    }

    val stream = bw.toBytes
    val out = new Array[Byte](stream.length + 1)
    out(0) = 0x2f
    System.arraycopy(stream, 0, out, 1, stream.length)
    out
  }

  private def subPixels(a: Int, b: Int): Int = {
    val aa = (((a >>> 24) - (b >>> 24)) & 0xff) << 24
    val rr = ((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16
    val gg = ((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8
    val bb = (((a & 0xff) - (b & 0xff)) & 0xff)
    aa | rr | gg | bb
  }

  /** Main (level-0-tail) stream: no color cache, no meta prefix, one
    * prefix-code group, pure literals. */
  private[multimodal] def writeMainStream(bw: BitWriter, px: Array[Int]): Unit = {
    bw.put(0, 1) // no color cache
    bw.put(0, 1) // no meta prefix codes
    writeCodesAndPixels(bw, px)
  }

  /** Non-level0 stream (palette / transform / entropy sub-images): its
    * own leading no-cache bit, then the tail grammar — no meta bit. */
  private[multimodal] def writePixelStream(bw: BitWriter, px: Array[Int]): Unit = {
    bw.put(0, 1) // no color cache
    writeCodesAndPixels(bw, px)
  }

  private[multimodal] def writeCodesAndPixels(bw: BitWriter, px: Array[Int]): Unit = {
    val greenF = new Array[Long](256 + 24)
    val redF = new Array[Long](256)
    val blueF = new Array[Long](256)
    val alphaF = new Array[Long](256)
    var i = 0
    while (i < px.length) {
      val v = px(i)
      greenF((v >> 8) & 0xff) += 1
      redF((v >> 16) & 0xff) += 1
      blueF(v & 0xff) += 1
      alphaF(v >>> 24) += 1
      i += 1
    }
    val codes = Array(greenF, redF, blueF, alphaF).map { f =>
      val lengths = huffmanLengths(f, 15)
      writePrefixCode(bw, lengths)
      // a single-used-symbol code is the decoder's ZERO-BIT case: the
      // pixel loop must then emit nothing for this channel
      val single = lengths.count(_ > 0) == 1
      (lengths, canonicalCodes(lengths), single)
    }
    // distance code: unused → 1-symbol simple code
    bw.put(1, 1) // simple
    bw.put(0, 1) // one symbol
    bw.put(0, 1) // 1-bit first symbol
    bw.put(0, 1) // symbol 0
    // unrolled hot loop: no per-pixel allocation, no tuple unpacking
    val (gl, gc, gs) = codes(0); val (rl, rc, rs) = codes(1)
    val (bl, bc, bs) = codes(2); val (al, ac, as_) = codes(3)
    i = 0
    while (i < px.length) {
      val v = px(i)
      if (!gs) { val sym = (v >> 8) & 0xff; bw.put(gc(sym), gl(sym)) }
      if (!rs) { val sym = (v >> 16) & 0xff; bw.put(rc(sym), rl(sym)) }
      if (!bs) { val sym = v & 0xff; bw.put(bc(sym), bl(sym)) }
      if (!as_) { val sym = v >>> 24; bw.put(ac(sym), al(sym)) }
      i += 1
    }
  }

  /** Emit one prefix code: simple form for ≤2 used symbols, else the
    * full code-length machinery (17/18 zero-run codes). No max-symbol
    * shortcut is used, so the decoder reads lengths for the WHOLE
    * alphabet — trailing zeros are emitted as explicit 17/18 runs, never
    * implied. If the code-length code itself collapses to a single
    * symbol (e.g. all 256 literals at length 8), both sides agree it is
    * the 0-bit special case, so nothing desynchronizes. */
  private[multimodal] def writePrefixCode(bw: BitWriter,
                                          lengths: Array[Int]): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.length <= 2) {
      bw.put(1, 1) // simple
      bw.put(used.length - 1, 1)
      val first = used.headOption.getOrElse(0)
      if (first <= 1) { bw.put(0, 1); bw.put(first, 1) }
      else { bw.put(1, 1); bw.put(first, 8) }
      if (used.length == 2) {
        require(used(1) <= 255, s"vp8l: simple-code symbol ${used(1)} > 255")
        bw.put(used(1), 8)
      }
      return
    }
    bw.put(0, 1) // full code-length form
    // CL symbol sequence with zero-run compression, covering the FULL
    // alphabet (the decoder reads until every symbol has a length)
    val seq = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    // (clSymbol, extraBits, extraValue)
    var iSym = 0
    while (iSym < lengths.length) {
      if (lengths(iSym) == 0) {
        var run = 0
        while (iSym + run < lengths.length && lengths(iSym + run) == 0) run += 1
        var left = run
        while (left > 0) {
          if (left >= 11) {
            val take = math.min(left, 138)
            seq += ((18, 7, take - 11)); left -= take
          } else if (left >= 3) {
            val take = math.min(left, 10)
            seq += ((17, 3, take - 3)); left -= take
          } else {
            seq += ((0, 0, 0)); left -= 1
          }
        }
        iSym += run
      } else {
        seq += ((lengths(iSym), 0, 0)); iSym += 1
      }
    }
    val clFreq = new Array[Long](19)
    seq.foreach { case (s, _, _) => clFreq(s) += 1 }
    val clLengths = huffmanLengths(clFreq, 7)
    // transmit CL lengths in spec order, minimal count ≥ 4
    var numCl = ClOrder.length
    while (numCl > 4 && clLengths(ClOrder(numCl - 1)) == 0) numCl -= 1
    bw.put(numCl - 4, 4)
    var k = 0
    while (k < numCl) { bw.put(clLengths(ClOrder(k)), 3); k += 1 }
    bw.put(0, 1) // no max-symbol shortcut
    val clCodes = canonicalCodes(clLengths)
    val clUsed = clLengths.count(_ > 0)
    seq.foreach { case (s, extraBits, extraValue) =>
      if (clUsed > 1) bw.put(clCodes(s), clLengths(s))
      // single-symbol CL code is 0 bits by the spec's special case
      if (extraBits > 0) bw.put(extraValue, extraBits)
    }
  }
}
