package graft.multimodal

/** WebP container-metadata codec written against the public WebP
  * container spec (RIFF layout) and the VP8 (RFC 6386 §9.1) / VP8L
  * bitstream headers: the modern crawl's most common image format, so a
  * media lake's triage path must at least read its dimensions, alpha,
  * and animation flags without a full bitstream decoder.
  *
  * Builder: minimal-but-structurally-valid RIFF trees for all three
  * container shapes — simple lossy (`VP8 ` frame tag + start code +
  * dims), simple lossless (`VP8L` signature byte + 14-bit dims + alpha
  * bit), and extended (`VP8X` flags + 24-bit canvas, with either an
  * `ALPH` + `VP8 ` still or an `ANIM` + n×`ANMF` animation, each ANMF
  * embedding a VP8 frame). Parser: bounds-checked chunk walk that EARNS
  * format/width/height/alpha/animation/frame-count claims from the
  * bytes (start codes and signatures verified, never trusted from the
  * fourcc alone). SAMPLE decode is out of scope per the MP3/MP4
  * precedent ([[Multimodal.decodeStub]]): triage is the contract.
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque binary + typed metadata (SURVEY §2 multimodal columns).
  */
object Webp {

  /** RIFF....WEBP — WebP streams self-identify. */
  def isWebp(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'E' && bytes(10) == 'B' &&
      bytes(11) == 'P'

  final case class WebpMeta(format: String, width: Int, height: Int,
      hasAlpha: Boolean, animated: Boolean, nFrames: Int, nChunks: Int)

  // ------------------------------------------------------------- builder

  private def u24le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff)
  }
  private def u32le(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    u24le(out, v); out.write((v >>> 24) & 0xff)
  }
  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(fourcc.getBytes("US-ASCII"))
    u32le(out, payload.length)
    out.write(payload)
    if (payload.length % 2 == 1) out.write(0) // RIFF even padding
    out.toByteArray
  }

  /** `VP8 ` chunk payload: 3-byte frame tag (keyframe, version 0, show),
    * 3-byte start code 9D 01 2A, 14-bit dims — RFC 6386 §9.1. */
  private def vp8Payload(w: Int, h: Int, dataLen: Int): Array[Byte] = {
    require(w >= 1 && w <= 0x3fff && h >= 1 && h <= 0x3fff,
      s"webp: VP8 dims out of 14-bit range ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    // frame tag: bit0 = frame type (0 = key), bits 1-3 version,
    // bit4 show_frame, bits 5-23 first partition size (fake but nonzero)
    val partSize = math.max(1, dataLen)
    val tag = (partSize << 5) | (1 << 4)
    u24le(out, tag)
    out.write(0x9d); out.write(0x01); out.write(0x2a) // start code
    out.write(w & 0xff); out.write((w >> 8) & 0x3f)   // 14-bit w, scale 0
    out.write(h & 0xff); out.write((h >> 8) & 0x3f)
    var i = 0
    while (i < dataLen) { out.write(0); i += 1 }
    out.toByteArray
  }

  /** `VP8L` chunk payload: 0x2F signature then a 32-bit LE field of
    * 14-bit (w-1), 14-bit (h-1), 1 alpha bit, 3-bit version 0. */
  private def vp8lPayload(w: Int, h: Int, alpha: Boolean,
                          dataLen: Int): Array[Byte] = {
    require(w >= 1 && w <= 0x4000 && h >= 1 && h <= 0x4000,
      s"webp: VP8L dims out of range ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x2f)
    val bits = (w - 1) | ((h - 1) << 14) |
      ((if (alpha) 1 else 0) << 28) // version 0 in bits 29-31
    u32le(out, bits)
    var i = 0
    while (i < dataLen) { out.write(0); i += 1 }
    out.toByteArray
  }

  private def wrapRiff(chunks: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    u32le(out, 4 + chunks.length) // "WEBP" + chunks
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(chunks)
    out.toByteArray
  }

  /** Simple lossy still: RIFF("WEBP", VP8). */
  def buildLossy(w: Int, h: Int, dataLen: Int = 10): Array[Byte] =
    wrapRiff(chunk("VP8 ", vp8Payload(w, h, dataLen)))

  /** Simple lossless still: RIFF("WEBP", VP8L). */
  def buildLossless(w: Int, h: Int, alpha: Boolean,
                    dataLen: Int = 10): Array[Byte] =
    wrapRiff(chunk("VP8L", vp8lPayload(w, h, alpha, dataLen)))

  /** Simple lossless still with REAL pixels: RIFF("WEBP", VP8L) around a
    * complete [[Vp8l]] bitstream — decode(buildLosslessPixels(px)) == px
    * exactly (VP8L is lossless). */
  def buildLosslessPixels(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] =
    wrapRiff(chunk("VP8L", Vp8l.encode(w, h, rgb)))

  /** Decode the pixels of a lossless WebP: walk the container to the
    * VP8L chunk (simple or extended shape) and run the full [[Vp8l]]
    * decoder. Lossy (VP8) stills have no sample decoder here — loud
    * error, triage via [[parseMeta]] remains their contract. */
  def decodeLossless(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val meta = parseMeta(bytes) // full structural validation first
    val riffSize = u32leAt(bytes, 4)
    var p = 12
    val end = 8 + riffSize.toInt
    while (p + 8 <= end) {
      val fourcc = new String(bytes, p, 4, "US-ASCII")
      val len = u32leAt(bytes, p + 4).toInt
      if (fourcc == "VP8L")
        return Vp8l.decode(java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len))
      p += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException(
      s"webp: no VP8L chunk — '${meta.format}' has no sample decoder " +
        "(lossy VP8 is triage-only)")
  }

  /** True when the container's image payload is a VP8L lossless stream
    * (the shape [[decodeLossless]] can decode). */
  def isLossless(bytes: Array[Byte]): Boolean = {
    if (!isWebp(bytes)) return false
    val riffSize = u32leAt(bytes, 4)
    var p = 12
    val end = math.min(8 + riffSize.toInt, bytes.length)
    while (p + 8 <= end) {
      if (new String(bytes, p, 4, "US-ASCII") == "VP8L") return true
      val len = u32leAt(bytes, p + 4).toInt
      p += 8 + len + (len & 1)
    }
    false
  }

  /** Extended container: VP8X + (ALPH + VP8 still | ANIM + n ANMF). */
  def buildExtended(w: Int, h: Int, alpha: Boolean, animated: Boolean,
                    nFrames: Int = 1, dataLen: Int = 10): Array[Byte] = {
    require(w >= 1 && w <= (1 << 24) && h >= 1 && h <= (1 << 24),
      s"webp: VP8X canvas out of 24-bit range ${w}x$h")
    require(!animated || nFrames >= 1, "webp: animation needs >= 1 frame")
    val vp8x = new java.io.ByteArrayOutputStream()
    // flags byte, MSB first: Rsv(2) ICC Alpha EXIF XMP Anim Rsv
    var flags = 0
    if (alpha) flags |= 0x10
    if (animated) flags |= 0x02
    vp8x.write(flags)
    u24le(vp8x, 0) // reserved
    u24le(vp8x, w - 1); u24le(vp8x, h - 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(chunk("VP8X", vp8x.toByteArray))
    if (animated) {
      val anim = new java.io.ByteArrayOutputStream()
      u32le(anim, 0xffffffff) // background color (white, pre-multiplied)
      anim.write(0); anim.write(0) // loop count 0 = forever
      out.write(chunk("ANIM", anim.toByteArray))
      var f = 0
      while (f < nFrames) {
        val anmf = new java.io.ByteArrayOutputStream()
        u24le(anmf, 0); u24le(anmf, 0)         // frame x/2, y/2
        u24le(anmf, w - 1); u24le(anmf, h - 1) // frame dims - 1
        u24le(anmf, 40)                        // duration ms
        anmf.write(0)                          // blend + dispose flags
        anmf.write(chunk("VP8 ", vp8Payload(w, h, dataLen)))
        out.write(chunk("ANMF", anmf.toByteArray))
        f += 1
      }
    } else {
      if (alpha) {
        val alph = new java.io.ByteArrayOutputStream()
        alph.write(0) // preprocessing/filter/compression = none
        var i = 0
        while (i < dataLen) { alph.write(0xff); i += 1 }
        out.write(chunk("ALPH", alph.toByteArray))
      }
      out.write(chunk("VP8 ", vp8Payload(w, h, dataLen)))
    }
    wrapRiff(out.toByteArray)
  }

  // -------------------------------------------------------------- parser

  private def u24leAt(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) | ((b(at + 2) & 0xff) << 16)
  private def u32leAt(b: Array[Byte], at: Int): Long =
    (u24leAt(b, at) & 0xffffffL) | ((b(at + 3) & 0xffL) << 24)

  /** Bounds-checked top-level chunk walk. Claims are earned from the
    * bitstream headers (VP8 start code, VP8L signature), never inferred
    * from the fourcc alone; unknown chunks are skipped by size. */
  def parseMeta(bytes: Array[Byte]): WebpMeta = {
    require(isWebp(bytes), "webp: missing RIFF/WEBP signature")
    val riffSize = u32leAt(bytes, 4)
    require(riffSize + 8 <= bytes.length,
      s"webp: RIFF size $riffSize overruns ${bytes.length} bytes")
    var p = 12
    val end = 8 + riffSize.toInt
    var format: String = null
    var width = 0; var height = 0
    var alpha = false; var animated = false
    var nFrames = 0; var nChunks = 0

    def parseVp8(at: Int, len: Int): (Int, Int) = {
      require(len >= 10, "webp: VP8 chunk too short for a frame header")
      val tag = u24leAt(bytes, at)
      require((tag & 1) == 0, "webp: VP8 first frame must be a keyframe")
      require((bytes(at + 3) & 0xff) == 0x9d &&
        (bytes(at + 4) & 0xff) == 0x01 && (bytes(at + 5) & 0xff) == 0x2a,
        "webp: bad VP8 start code")
      val w = ((bytes(at + 6) & 0xff) | ((bytes(at + 7) & 0x3f) << 8))
      val h = ((bytes(at + 8) & 0xff) | ((bytes(at + 9) & 0x3f) << 8))
      require(w > 0 && h > 0, s"webp: bad VP8 dims ${w}x$h")
      (w, h)
    }

    while (p + 8 <= end) {
      val fourcc = new String(bytes, p, 4, "US-ASCII")
      val len = u32leAt(bytes, p + 4)
      val at = p + 8
      require(at + len <= end, s"webp: chunk $fourcc overruns the RIFF size")
      nChunks += 1
      fourcc match {
        case "VP8 " =>
          val (w, h) = parseVp8(at, len.toInt)
          if (format == null) { format = "lossy"; width = w; height = h }
          if (nFrames == 0) nFrames = 1
        case "VP8L" =>
          require(len >= 5, "webp: VP8L chunk too short")
          require((bytes(at) & 0xff) == 0x2f, "webp: bad VP8L signature")
          val bits = u32leAt(bytes, at + 1)
          require(((bits >> 29) & 0x7) == 0, "webp: unknown VP8L version")
          val w = (bits & 0x3fff).toInt + 1
          val h = ((bits >> 14) & 0x3fff).toInt + 1
          if (format == null) { format = "lossless"; width = w; height = h }
          if (((bits >> 28) & 1) == 1) alpha = true
          if (nFrames == 0) nFrames = 1
        case "VP8X" =>
          require(len >= 10, "webp: VP8X chunk too short")
          val flags = bytes(at) & 0xff
          require((flags & 0xc1) == 0, "webp: reserved VP8X flags set")
          format = "extended"
          alpha = (flags & 0x10) != 0
          animated = (flags & 0x02) != 0
          width = u24leAt(bytes, at + 4) + 1
          height = u24leAt(bytes, at + 7) + 1
        case "ANMF" =>
          // 16-byte frame header, then an embedded VP8/VP8L (optionally
          // ALPH-prefixed) chunk — verify its start code/signature like
          // any top-level frame, so a corrupt animation frame is a loud
          // error, not "valid metadata"
          require(len >= 16, "webp: ANMF chunk too short")
          var q = at + 16
          val frameEnd = at + len.toInt
          var sawFrame = false
          while (!sawFrame && q + 8 <= frameEnd) {
            val fc = new String(bytes, q, 4, "US-ASCII")
            val flen = u32leAt(bytes, q + 4)
            require(q + 8 + flen <= frameEnd,
              s"webp: ANMF sub-chunk $fc overruns the frame")
            fc match {
              case "VP8 " => parseVp8(q + 8, flen.toInt); sawFrame = true
              case "VP8L" =>
                require(flen >= 5 && (bytes(q + 8) & 0xff) == 0x2f,
                  "webp: bad VP8L signature inside ANMF")
                sawFrame = true
              case "ALPH" => // alpha plane precedes the frame chunk
              case other =>
                throw new IllegalArgumentException(
                  s"webp: unexpected chunk $other inside ANMF")
            }
            q += 8 + flen.toInt + (flen.toInt & 1)
          }
          require(sawFrame, "webp: ANMF frame carries no VP8/VP8L chunk")
          nFrames += 1
        case _ => // ANIM, ALPH, ICCP, EXIF, XMP, unknown: skip by size
      }
      p = at + len.toInt + (len.toInt & 1) // even padding
    }
    require(format != null, "webp: no VP8/VP8L/VP8X image chunk found")
    require(!animated || nFrames > 0, "webp: animated but no ANMF frames")
    WebpMeta(format, width, height, alpha, animated,
      math.max(nFrames, if (animated) 0 else 1), nChunks)
  }
}
