package graft.multimodal

/** REAL pure-JVM media codecs for the formats that need no external
  * library: binary PPM (P6) images, PNG (8-bit truecolor — zlib inflate
  * ships in the JDK), and RIFF/WAVE 16-bit PCM audio. These replace
  * [[Multimodal.decodeStub]] on the formats they cover — the stub remains
  * only for formats whose decoders genuinely aren't in this environment
  * (jpeg/mp4).
  *
  * Everything here is byte-exact and allocation-bounded: decoders walk the
  * container structure (PPM header tokens incl. comments; RIFF chunk list
  * incl. unknown chunks) and fail LOUDLY on malformed input rather than
  * returning garbage — a corrupt blob in a 100 TB lake should surface in
  * the task error, not silently skew features. All functions are
  * row-local (called from typed maps / mapPartitions); nothing here
  * touches Spark.
  */
object Codecs {

  /** True iff the blob is a binary-PPM candidate: `P6` followed by a
    * header character (whitespace or comment) — `P6` followed by
    * anything else is some other P-family or unrelated format. */
  def isPpm(bytes: Array[Byte]): Boolean =
    bytes.length >= 3 && bytes(0) == 'P' && bytes(1) == '6' &&
      (bytes(2) == ' ' || bytes(2) == '\t' || bytes(2) == '\n' ||
        bytes(2) == '\r' || bytes(2) == '#')

  /** True iff the blob is a RIFF container holding a WAVE form. RIFF
    * alone is NOT enough — WebP (`RIFF....WEBP`) and AVI (`RIFF....AVI `)
    * share the outer magic and must not be routed to the WAV decoder. */
  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  // ---------------------------------------------------------------- PPM

  /** Encode an interleaved-RGB pixel buffer as binary PPM (P6, maxval
    * 255): `P6\n<w> <h>\n255\n` + raw bytes. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(w > 0 && h > 0, s"ppm: bad dimensions ${w}x$h")
    require(rgb.length == w.toLong * h * 3, // Long: no overflow pass
      s"ppm: need ${w.toLong * h * 3} bytes for ${w}x$h, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode binary PPM (P6). Handles the full header grammar — any
    * whitespace between tokens and `#` comment lines anywhere a
    * whitespace may appear — and requires maxval <= 255 (1 byte/sample).
    * Returns (width, height, interleaved RGB). */
  def decodePpm(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "ppm: not a P6 file")
    var pos = 2
    def isWs(b: Byte) = b == ' ' || b == '\t' || b == '\n' || b == '\r'
    // one whitespace run, where any '#' starts a comment running to EOL
    def skipWs(): Unit = {
      var more = true
      while (more) {
        while (pos < bytes.length && isWs(bytes(pos))) pos += 1
        if (pos < bytes.length && bytes(pos) == '#') {
          while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        } else more = false
      }
    }
    def token(): Int = {
      skipWs()
      require(pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9',
        s"ppm: expected integer token at byte $pos")
      var v = 0
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1
      }
      v
    }
    val w = token(); val h = token(); val maxval = token()
    require(w > 0 && h > 0, s"ppm: bad dimensions ${w}x$h")
    require(maxval > 0 && maxval <= 255, s"ppm: unsupported maxval $maxval")
    // exactly ONE whitespace byte separates maxval from raster (spec);
    // a '#' here would be raster data, not a comment
    require(pos < bytes.length && isWs(bytes(pos)),
      "ppm: missing raster separator")
    pos += 1
    // Long math: a corrupt/hostile header like 65536x65536 overflows
    // w*h*3 in Int (to 0 here — the truncation check would pass and the
    // caller would crash out-of-contract later)
    val need = w.toLong * h * 3
    require(bytes.length - pos >= need,
      s"ppm: raster truncated (need $need, have ${bytes.length - pos})")
    val px = java.util.Arrays.copyOfRange(bytes, pos, pos + need.toInt)
    (w, h, px)
  }

  /** Nearest-neighbor resize of an interleaved-RGB buffer: output pixel
    * (r,c) samples input (r*h/oh, c*w/ow) — integer floor mapping, the
    * standard NN kernel. Row-local, O(ow*oh). */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
                    ow: Int, oh: Int): Array[Byte] = {
    require(rgb.length == w.toLong * h * 3,
      s"resize: need ${w.toLong * h * 3} bytes for ${w}x$h, got ${rgb.length}")
    require(ow > 0 && oh > 0 && ow.toLong * oh * 3 <= Int.MaxValue,
      s"resize: bad target ${ow}x$oh")
    val out = new Array[Byte](ow * oh * 3)
    var r = 0
    while (r < oh) {
      val sr = (r.toLong * h / oh).toInt
      var c = 0
      while (c < ow) {
        val sc = (c.toLong * w / ow).toInt
        val si = (sr * w + sc) * 3
        val di = (r * ow + c) * 3
        out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
        c += 1
      }
      r += 1
    }
    out
  }

  /** Per-cell luminance mass on a gw x gh grid: cell (gr,gc) sums R+G+B
    * (unsigned) over its pixel block — integer-exact, so cross-engine
    * checkable. Pixels map to cells by floor(r*gh/h), floor(c*gw/w);
    * cells are indexed row-major. Requires the grid to divide no finer
    * than the image. */
  def gridLuminance(w: Int, h: Int, rgb: Array[Byte],
                    gw: Int, gh: Int): Array[Long] = {
    require(rgb.length == w.toLong * h * 3,
      s"grid: need ${w.toLong * h * 3} bytes for ${w}x$h, got ${rgb.length}")
    require(gw > 0 && gw <= w && gh > 0 && gh <= h,
      s"grid: ${gw}x$gh does not fit ${w}x$h")
    val acc = new Array[Long](gw * gh)
    var r = 0
    while (r < h) {
      val gr = r * gh / h
      var c = 0
      while (c < w) {
        val cell = gr * gw + c * gw / w
        val i = (r * w + c) * 3
        acc(cell) += (rgb(i) & 0xff) + (rgb(i + 1) & 0xff) + (rgb(i + 2) & 0xff)
        c += 1
      }
      r += 1
    }
    acc
  }

  // ---------------------------------------------------------------- PNG

  /** The 8-byte PNG signature (\x89PNG\r\n\x1a\n). */
  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** True iff the blob starts with the full 8-byte PNG signature. */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == PngSig(i))

  /** Encode an interleaved-RGB pixel buffer as a standard PNG (8-bit
    * truecolor, non-interlaced): signature + IHDR + one zlib-deflated
    * IDAT + IEND, CRC32 per chunk. `filterOf(row)` picks the scanline
    * filter (0..4 — None/Sub/Up/Average/Paeth); the default cycles
    * through all five so a roundtrip exercises every unfilter path. Any
    * PNG reader decodes the output; filters only change the compressed
    * representation, never the pixels. */
  def encodePng(w: Int, h: Int, rgb: Array[Byte],
                filterOf: Int => Int = _ % 5): Array[Byte] = {
    require(w > 0 && h > 0, s"png: bad dimensions ${w}x$h")
    // the filtered buffer is h*(1+3w) bytes — one filter byte per row on
    // top of the pixels — so bound that, not just w*h*3 (w=1, h≈7e8
    // passes the pixel bound but overflows the row-prefixed one)
    require(h.toLong * (1 + 3L * w) <= Int.MaxValue,
      s"png: bad dimensions ${w}x$h")
    require(rgb.length == w.toLong * h * 3,
      s"png: need ${w.toLong * h * 3} bytes for ${w}x$h, got ${rgb.length}")
    val bpp = 3
    val stride = w * bpp
    // filter scanlines: each output row = filter byte + transformed bytes
    val raw = new Array[Byte](h * (1 + stride))
    var r = 0
    while (r < h) {
      val ft = filterOf(r)
      require(ft >= 0 && ft <= 4, s"png: bad filter type $ft for row $r")
      raw(r * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val x = rgb(r * stride + i) & 0xff
        val a = if (i >= bpp) rgb(r * stride + i - bpp) & 0xff else 0 // left
        val b = if (r > 0) rgb((r - 1) * stride + i) & 0xff else 0   // up
        val c = if (i >= bpp && r > 0)
          rgb((r - 1) * stride + i - bpp) & 0xff else 0              // up-left
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(r * (1 + stride) + 1 + i) = ((x - pred) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    // zlib-deflate the filtered stream (Deflater default = zlib wrapper)
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) buf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = buf.toByteArray
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor RGB
      .put(0.toByte)  // compression: deflate
      .put(0.toByte)  // filter method: adaptive (types 0-4)
      .put(0.toByte)  // interlace: none
      .array()
    val out = new java.io.ByteArrayOutputStream(
      8 + 25 + 12 + idat.length + 12)
    out.write(PngSig, 0, 8)
    writeChunk(out, "IHDR", ihdr)
    writeChunk(out, "IDAT", idat)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** The Paeth predictor (PNG spec §9, Paeth 1991): the neighbor closest
    * to the linear estimate a + b − c, ties left > up > up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeChunk(out: java.io.ByteArrayOutputStream, typ: String,
                         data: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    out.write(tb, 0, 4)
    out.write(data, 0, data.length)
    out.write(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array(), 0, 4)
  }

  /** Decode an 8-bit truecolor (color type 2) non-interlaced PNG by
    * WALKING THE CHUNK LIST — real PNGs carry tEXt/pHYs/gAMA chunks, so
    * ancillary chunks are skipped (with their CRCs verified), every IDAT
    * is concatenated into one zlib stream, and all five scanline filters
    * are reversed. Unsupported shapes (palette, alpha, 16-bit,
    * interlaced) and corrupt structure (bad CRC, truncated inflate) fail
    * LOUDLY. Returns (width, height, interleaved RGB). */
  def decodePng(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    require(isPng(bytes), "png: bad signature")
    val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
    var w = -1; var h = -1
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!seenIend) {
      require(bb.remaining() >= 12, "png: truncated chunk list")
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining() - 8,
        s"png: chunk overruns file (len $len, have ${bb.remaining() - 8})")
      val tb = new Array[Byte](4); bb.get(tb)
      val typ = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      val want = bb.getInt
      require(crc.getValue.toInt == want, s"png: bad CRC on chunk '$typ'")
      typ match {
        case "IHDR" =>
          require(!seenIhdr, "png: duplicate IHDR")
          require(len == 13, s"png: IHDR length $len")
          val hb = java.nio.ByteBuffer.wrap(data)
          w = hb.getInt; h = hb.getInt
          require(w > 0 && h > 0 && w.toLong * h * 3 <= Int.MaxValue - 16 &&
            h.toLong * (1 + 3L * w) <= Int.MaxValue, // filtered buf: +1B/row
            s"png: bad dimensions ${w}x$h")
          val (depth, color, comp, filt, inter) =
            (hb.get(), hb.get(), hb.get(), hb.get(), hb.get())
          require(depth == 8, s"png: only 8-bit supported, got $depth")
          require(color == 2, s"png: only truecolor RGB supported, got $color")
          require(comp == 0 && filt == 0, "png: bad compression/filter method")
          require(inter == 0, "png: interlaced not supported")
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "png: IDAT before IHDR")
          idat.write(data, 0, len)
        case "IEND" => seenIend = true
        case _ => // tEXt/pHYs/gAMA/...: ancillary, skip (CRC checked above)
      }
    }
    require(seenIhdr, "png: no IHDR chunk")
    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // FDICT streams return n=0 with needsInput=false forever — fail
      // loudly rather than spin the task
      require(!inflater.needsDictionary,
        "png: preset dictionary (FDICT) not supported")
      require(n > 0 || !inflater.needsInput, "png: truncated IDAT stream")
      off += n
    }
    inflater.end()
    require(off == raw.length,
      s"png: pixel data truncated (need ${raw.length}, got $off)")
    // reverse the per-scanline filters in place into the output buffer
    val bpp = 3
    val px = new Array[Byte](h * stride)
    var r = 0
    while (r < h) {
      val ft = raw(r * (1 + stride)) & 0xff
      require(ft <= 4, s"png: bad filter type $ft on row $r")
      var i = 0
      while (i < stride) {
        val v = raw(r * (1 + stride) + 1 + i) & 0xff
        val a = if (i >= bpp) px(r * stride + i - bpp) & 0xff else 0
        val b = if (r > 0) px((r - 1) * stride + i) & 0xff else 0
        val c = if (i >= bpp && r > 0)
          px((r - 1) * stride + i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        px(r * stride + i) = ((v + pred) & 0xff).toByte
        i += 1
      }
      r += 1
    }
    (w, h, px)
  }

  // ---------------------------------------------------------------- WAV

  /** Encode mono 16-bit PCM as a canonical RIFF/WAVE file (44-byte
    * header + little-endian samples). */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"wav: bad sample rate $sampleRate")
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** The same PCM content wrapped with a LIST(INFO) metadata chunk before
    * `data` — the "re-encoded duplicate" shape a crawl sees constantly
    * (identical audio, different tagging toolchain). Byte-level dedup
    * misses the pair; content-level dedup over the DECODED samples
    * ([[decodeWav]] skips the LIST chunk) must find it. */
  def encodeWavTagged(sampleRate: Int, samples: Array[Short],
                      comment: String): Array[Byte] = {
    require(sampleRate > 0, s"wav: bad sample rate $sampleRate")
    val c = comment.getBytes("US-ASCII")
    val icmtLen = c.length + 1 // NUL-terminated per INFO convention
    val icmtPad = icmtLen & 1
    val listLen = 4 + 8 + icmtLen + icmtPad // "INFO" + ICMT header + text
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 8 + listLen + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 24 + 8 + listLen + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
    bb.put("LIST".getBytes("US-ASCII")).putInt(listLen)
      .put("INFO".getBytes("US-ASCII"))
      .put("ICMT".getBytes("US-ASCII")).putInt(icmtLen)
      .put(c).put(0.toByte)
    if (icmtPad == 1) bb.put(0.toByte)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
    bb.array()
  }

  /** Decode a RIFF/WAVE 16-bit PCM mono file by WALKING THE CHUNK LIST —
    * real WAV files carry LIST/fact/cue chunks before `data`, so the
    * decoder must skip unknown chunks (word-aligned) rather than assume
    * the canonical 44-byte layout. Returns (sampleRate, samples). */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    require(bytes.length >= 12 && fourcc() == "RIFF", "wav: not a RIFF file")
    bb.getInt // riff payload size (unreliable in the wild; chunk walk instead)
    require(fourcc() == "WAVE", "wav: not a WAVE form")
    var sampleRate = -1
    var bitsPerSample = -1
    var channels = -1
    var samples: Array[Short] = null
    while (bb.remaining() >= 8 && samples == null) {
      val id = fourcc()
      val len = bb.getInt
      require(len >= 0 && len <= bb.remaining(),
        s"wav: chunk '$id' overruns file (len $len, have ${bb.remaining()})")
      id match {
        case "fmt " =>
          require(len >= 16, s"wav: fmt chunk too short ($len)")
          val fmt = bb.getShort
          require(fmt == 1, s"wav: only PCM supported, got format $fmt")
          channels = bb.getShort.toInt
          require(channels == 1, s"wav: only mono supported, got $channels")
          sampleRate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bitsPerSample = bb.getShort.toInt
          require(bitsPerSample == 16,
            s"wav: only 16-bit supported, got $bitsPerSample")
          bb.position(bb.position() + (len - 16) + (len & 1)) // ext + pad
        case "data" =>
          require(sampleRate > 0, "wav: data chunk before fmt chunk")
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = bb.getShort; i += 1 }
          samples = out
        case _ => // LIST/fact/cue/...: skip, chunks are word-aligned
          bb.position(bb.position() + len + (len & 1))
      }
    }
    require(samples != null, "wav: no data chunk")
    (sampleRate, samples)
  }

  /** Per-window absolute-amplitude mass: samples split into `nWindows`
    * contiguous equal windows (floor split, remainder in the last),
    * each summing |sample| as Long — integer-exact cross-engine. */
  def windowAbsSum(samples: Array[Short], nWindows: Int): Array[Long] = {
    require(nWindows > 0 && nWindows <= math.max(1, samples.length),
      s"wav: $nWindows windows over ${samples.length} samples")
    val acc = new Array[Long](nWindows)
    val per = math.max(1, samples.length / nWindows)
    var i = 0
    while (i < samples.length) {
      val w = math.min(i / per, nWindows - 1)
      acc(w) += math.abs(samples(i).toLong)
      i += 1
    }
    acc
  }
}
