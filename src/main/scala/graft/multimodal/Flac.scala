package graft.multimodal

/** FLAC codec written against the public FLAC format specification
  * (RFC 9639) — the PCM-adjacent LOSSLESS audio format that completes
  * the audio story honestly: WAV covers raw PCM, FLAC covers the
  * compressed-lossless tier a crawl actually serves, and the lossy
  * psychoacoustic bitstreams (MP3, AAC) stay on the documented
  * triage-only side of the decode boundary.
  *
  * Decoder: the full frame surface a third-party encoder can emit —
  * MSB-first bit reads, STREAMINFO parsing, frame-header grammar
  * (block-size/sample-rate/sample-size codes incl. the end-of-header
  * 8/16-bit forms, UTF-8-style frame/sample numbers, CRC-8 verified),
  * all four subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC
  * any order with quantized coefficients and shift), wasted bits, Rice
  * residuals in both 4- and 5-bit parameter forms with partition
  * orders and the raw-escape code, all four channel assignments
  * (independent, left/side, right/side, mid/side), frame CRC-16
  * verified, and the STREAMINFO MD5 of the decoded PCM verified when
  * set — the strongest possible lossless check. Every structural
  * violation is a loud error, never a best-effort sample.
  *
  * Encoder: compact-but-complete for the roundtrip proof — 16-bit
  * mono/stereo (independent channels), one frame per 4096 samples,
  * per-subframe best FIXED predictor (orders 0-2 by absolute residual
  * mass), single-partition Rice residuals with the raw-escape fallback,
  * correct CRC-8/CRC-16 and the STREAMINFO MD5. FLAC is lossless, so
  * the contract is exact: decode(encode(pcm)) == pcm bit-for-bit (the
  * `flac_codec` contract query and FlacSpec prove it; hand-assembled
  * streams in FlacSpec cover the decoder-only surface — LPC, stereo
  * decorrelation, partitions, escapes — like the VP8L/GIF pattern).
  *
  * Reference behavior anchor: the reference pipeline treats media as
  * opaque binary + typed metadata (SURVEY §2 multimodal columns); this
  * codec feeds the same windowed |amplitude| features as WAV.
  */
object Flac {

  /** "fLaC" magic. */
  def isFlac(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C'

  final case class FlacMeta(sampleRate: Int, channels: Int, bps: Int,
                            totalSamples: Long, minBlock: Int, maxBlock: Int)

  // ----------------------------------------------------------- bit I/O

  /** MSB-first bit reader (the FLAC convention — opposite of VP8L). */
  private[multimodal] final class BitReader(data: Array[Byte], start: Int) {
    var bytePos = start
    private var bitPos = 0 // 0 = MSB next
    def bits(k: Int): Long = {
      var v = 0L; var i = 0
      while (i < k) {
        require(bytePos < data.length, "flac: truncated bitstream")
        v = (v << 1) | ((data(bytePos) >> (7 - bitPos)) & 1)
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        i += 1
      }
      v
    }
    def sbits(k: Int): Long = { // sign-extended
      val v = bits(k)
      if (k > 0 && (v & (1L << (k - 1))) != 0) v - (1L << k) else v
    }
    def unary(): Int = {
      var n = 0
      while (bits(1) == 0) n += 1
      n
    }
    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def aligned: Boolean = bitPos == 0
  }

  /** MSB-first bit writer. */
  private[multimodal] final class BitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(v: Long, k: Int): Unit = {
      var i = k - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1).toInt
        n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    def putUnary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def alignByte(): Unit = if (n != 0) put(0, 8 - n)
    def toBytes: Array[Byte] = { alignByte(); out.toByteArray }
  }

  // ------------------------------------------------------------- CRCs

  /** CRC-8, poly 0x07, init 0 (frame header). */
  private[multimodal] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff)
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 (whole frame). */
  private[multimodal] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** STREAMINFO MD5: interleaved samples, little-endian, bps/8 bytes. */
  private def pcmMd5(channels: Array[Array[Int]], bps: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = channels(0).length
    val bytes = bps / 8
    var i = 0
    while (i < n) {
      var c = 0
      while (c < channels.length) {
        var v = channels(c)(i)
        var k = 0
        while (k < bytes) { md.update((v & 0xff).toByte); v >>= 8; k += 1 }
        c += 1
      }
      i += 1
    }
    md.digest()
  }

  // ----------------------------------------------------------- decoder

  /** Decode a whole FLAC stream to (meta, per-channel samples). */
  def decode(bytes: Array[Byte]): (FlacMeta, Array[Array[Int]]) = {
    require(isFlac(bytes), "flac: bad magic")
    var p = 4
    var meta: FlacMeta = null
    var md5: Array[Byte] = null
    var last = false
    while (!last) {
      require(p + 4 <= bytes.length, "flac: truncated metadata header")
      val h = bytes(p) & 0xff
      last = (h & 0x80) != 0
      val typ = h & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      require(p + 4 + len <= bytes.length, s"flac: metadata block overruns")
      if (typ == 0) { // STREAMINFO
        require(len == 34, s"flac: STREAMINFO length $len, want 34")
        val br = new BitReader(bytes, p + 4)
        val minB = br.bits(16).toInt; val maxB = br.bits(16).toInt
        br.bits(24); br.bits(24) // min/max frame size (informational)
        val rate = br.bits(20).toInt
        val nch = br.bits(3).toInt + 1
        val bps = br.bits(5).toInt + 1
        val total = br.bits(36)
        require(rate > 0, "flac: sample rate 0")
        meta = FlacMeta(rate, nch, bps, total, minB, maxB)
        md5 = java.util.Arrays.copyOfRange(bytes, p + 4 + 18, p + 4 + 34)
      }
      require(typ != 127, "flac: invalid metadata block type 127")
      p += 4 + len
    }
    require(meta != null, "flac: no STREAMINFO block")
    val chans = Array.fill(meta.channels)(
      new scala.collection.mutable.ArrayBuffer[Int]())
    var got = 0L
    while (got < meta.totalSamples) {
      val (frame, consumed) = decodeFrame(bytes, p, meta)
      var c = 0
      while (c < meta.channels) { chans(c) ++= frame(c); c += 1 }
      got += frame(0).length
      p = consumed
    }
    require(got == meta.totalSamples,
      s"flac: decoded $got samples, STREAMINFO says ${meta.totalSamples}")
    val out = chans.map(_.toArray)
    if (md5.exists(_ != 0)) { // unset MD5 (all zero) is legal; else verify
      require(java.util.Arrays.equals(pcmMd5(out, meta.bps), md5),
        "flac: decoded PCM fails the STREAMINFO MD5 — corrupt stream")
    }
    (meta, out)
  }

  /** Convenience: decode to interleaved mono (averaging is NOT done —
    * single-channel streams only; multi-channel callers use [[decode]]). */
  def decodeMono(bytes: Array[Byte]): (Int, Array[Int]) = {
    val (m, ch) = decode(bytes)
    require(m.channels == 1, s"flac: ${m.channels} channels, want mono")
    (m.sampleRate, ch(0))
  }

  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  /** Decode one frame at byte offset `p`; returns (channel samples,
    * next byte offset). */
  private def decodeFrame(bytes: Array[Byte], p: Int,
                          meta: FlacMeta): (Array[Array[Int]], Int) = {
    val br = new BitReader(bytes, p)
    require(br.bits(14) == 0x3ffe, s"flac: lost frame sync at $p")
    require(br.bits(1) == 0, "flac: reserved frame bit set")
    br.bits(1) // blocking strategy (number semantics only)
    val bsCode = br.bits(4).toInt
    val srCode = br.bits(4).toInt
    val chanAsg = br.bits(4).toInt
    val ssCode = br.bits(3).toInt
    require(br.bits(1) == 0, "flac: reserved frame bit set")
    // UTF-8-style coded number (up to 7 bytes)
    val first = br.bits(8).toInt
    var extra = 0
    var f = first
    if ((first & 0x80) != 0) {
      while ((f & 0x40) != 0) { extra += 1; f <<= 1 }
      require(extra >= 1 && extra <= 6, "flac: bad coded frame number")
      var i = 0
      while (i < extra) {
        require((br.bits(8) & 0xc0) == 0x80, "flac: bad number continuation")
        i += 1
      }
    }
    val blockSize = bsCode match {
      case 0 => throw new IllegalArgumentException("flac: reserved block size")
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => br.bits(8).toInt + 1
      case 7 => br.bits(16).toInt + 1
      case n => 256 << (n - 8)
    }
    srCode match { // value only checked for grammar; STREAMINFO governs
      case 0 => // from STREAMINFO
      case 12 => br.bits(8)
      case 13 | 14 => br.bits(16)
      case 15 => throw new IllegalArgumentException("flac: invalid rate code")
      case _ => // table rate
    }
    val bps = ssCode match {
      case 0 => meta.bps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case _ => throw new IllegalArgumentException(
        s"flac: reserved sample-size code $ssCode")
    }
    // CRC-8 covers the header bytes read so far
    require(br.aligned, "flac: frame header must be byte-aligned")
    val headerEnd = br.bytePos
    val hcrc = br.bits(8).toInt
    require(crc8(bytes, p, headerEnd) == hcrc, "flac: frame header CRC-8 mismatch")

    val nch = if (chanAsg <= 7) chanAsg + 1 else 2
    require(nch == meta.channels,
      s"flac: frame has $nch channels, STREAMINFO says ${meta.channels}")
    val subs = new Array[Array[Int]](nch)
    var c = 0
    while (c < nch) {
      // side channel carries one extra bit
      val chBps = chanAsg match {
        case 8 => if (c == 1) bps + 1 else bps  // left/side
        case 9 => if (c == 0) bps + 1 else bps  // side/right
        case 10 => if (c == 1) bps + 1 else bps // mid/side
        case _ => bps
      }
      subs(c) = decodeSubframe(br, blockSize, chBps)
      c += 1
    }
    br.alignByte()
    val frameEnd = br.bytePos
    val fcrc = br.bits(16).toInt
    require(crc16(bytes, p, frameEnd) == fcrc, "flac: frame CRC-16 mismatch")
    // undo stereo decorrelation
    val out = chanAsg match {
      case 8 => // left/side: right = left - side
        val l = subs(0); val s = subs(1)
        Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
      case 9 => // side/right: left = right + side
        val s = subs(0); val r = subs(1)
        Array(Array.tabulate(blockSize)(i => r(i) + s(i)), r)
      case 10 => // mid/side
        val m = subs(0); val s = subs(1)
        val l = new Array[Int](blockSize); val r = new Array[Int](blockSize)
        var i = 0
        while (i < blockSize) {
          var mid = m(i) << 1
          mid |= (s(i) & 1) // bottom bit of side restores dropped LSB
          l(i) = (mid + s(i)) >> 1
          r(i) = (mid - s(i)) >> 1
          i += 1
        }
        Array(l, r)
      case n if n <= 7 => subs
      case n => throw new IllegalArgumentException(
        s"flac: reserved channel assignment $n")
    }
    (out, br.bytePos)
  }

  private def decodeSubframe(br: BitReader, blockSize: Int,
                             bps: Int): Array[Int] = {
    require(br.bits(1) == 0, "flac: subframe padding bit set")
    val typ = br.bits(6).toInt
    val wasted =
      if (br.bits(1) == 1) br.unary() + 1
      else 0
    val eb = bps - wasted
    require(eb >= 1, "flac: wasted bits exceed sample size")
    val out: Array[Int] =
      if (typ == 0) { // CONSTANT
        val v = br.sbits(eb).toInt
        Array.fill(blockSize)(v)
      } else if (typ == 1) { // VERBATIM
        Array.fill(blockSize)(br.sbits(eb).toInt)
      } else if ((typ & 0x38) == 0x08 && (typ & 7) <= 4) { // FIXED 001xxx
        val order = typ & 7
        val a = new Array[Int](blockSize)
        var i = 0
        while (i < order) { a(i) = br.sbits(eb).toInt; i += 1 }
        decodeResidual(br, a, blockSize, order)
        val cf = FixedCoefs(order)
        i = order
        while (i < blockSize) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += cf(j).toLong * a(i - 1 - j); j += 1 }
          a(i) = (a(i) + pred).toInt
          i += 1
        }
        a
      } else if ((typ & 0x20) != 0) { // LPC 1xxxxx, order = low5 + 1
        val order = (typ & 0x1f) + 1
        val a = new Array[Int](blockSize)
        var i = 0
        while (i < order) { a(i) = br.sbits(eb).toInt; i += 1 }
        val precision = br.bits(4).toInt + 1
        require(precision <= 15, "flac: invalid LPC precision 16")
        val shift = br.sbits(5).toInt
        require(shift >= 0, "flac: negative LPC shift")
        val coefs = Array.fill(order)(br.sbits(precision).toInt)
        decodeResidual(br, a, blockSize, order)
        i = order
        while (i < blockSize) {
          var pred = 0L
          var j = 0
          while (j < order) { pred += coefs(j).toLong * a(i - 1 - j); j += 1 }
          a(i) = (a(i) + (pred >> shift)).toInt
          i += 1
        }
        a
      } else throw new IllegalArgumentException(
        f"flac: reserved subframe type 0x$typ%02x")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) <<= wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual into a(order until blockSize) as RAW residuals
    * (prediction added by the caller). */
  private def decodeResidual(br: BitReader, a: Array[Int], blockSize: Int,
                             order: Int): Unit = {
    val method = br.bits(2).toInt
    require(method <= 1, s"flac: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = br.bits(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0,
      s"flac: block size $blockSize not divisible into $nParts partitions")
    val perPart = blockSize >> partOrder
    require(perPart > order || partOrder == 0,
      "flac: first partition has no samples")
    var i = order
    var part = 0
    while (part < nParts) {
      val count = (if (part == 0) perPart - order else perPart)
      val param = br.bits(pBits).toInt
      if (param == escape) {
        val raw = br.bits(5).toInt
        var k = 0
        while (k < count) {
          a(i) = if (raw == 0) 0 else br.sbits(raw).toInt
          i += 1; k += 1
        }
      } else {
        var k = 0
        while (k < count) {
          val q = br.unary()
          val r = br.bits(param)
          val u = (q.toLong << param) | r
          a(i) = ((u >> 1) ^ -(u & 1)).toInt // unzigzag
          i += 1; k += 1
        }
      }
      part += 1
    }
  }

  // ----------------------------------------------------------- encoder

  /** Encode 16-bit PCM (1 or 2 channels, non-empty, equal lengths) as a
    * complete FLAC stream: STREAMINFO (with the real PCM MD5) + frames
    * of up to 4096 samples, best FIXED predictor per subframe, Rice
    * residuals with raw-escape fallback. */
  def encode(sampleRate: Int, channels: Array[Array[Short]]): Array[Byte] = {
    require(channels.nonEmpty && channels.length <= 2,
      s"flac: encoder supports 1-2 channels, got ${channels.length}")
    require(channels(0).nonEmpty, "flac: empty input")
    require(channels.forall(_.length == channels(0).length),
      "flac: channel length mismatch")
    require(sampleRate > 0 && sampleRate < (1 << 20),
      s"flac: bad sample rate $sampleRate")
    val total = channels(0).length
    val intCh = channels.map(_.map(_.toInt))
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO (last metadata block)
    val si = new BitWriter()
    val maxB = math.min(4096, math.max(16, total))
    si.put(maxB, 16); si.put(maxB, 16)
    si.put(0, 24); si.put(0, 24) // frame sizes unknown
    si.put(sampleRate, 20)
    si.put(channels.length - 1, 3)
    si.put(15, 5) // bps 16
    si.put(total.toLong, 36)
    val siBytes = si.toBytes ++ pcmMd5(intCh, 16)
    out.write(0x80) // last-block | type 0
    out.write(0); out.write(0); out.write(siBytes.length & 0xff)
    out.write(siBytes)
    // frames
    var off = 0
    var frameNo = 0L
    while (off < total) {
      val bs = math.min(4096, total - off)
      out.write(encodeFrame(intCh, off, bs, frameNo, sampleRate, maxB))
      off += bs
      frameNo += 1
    }
    out.toByteArray
  }

  /** Pick the FIXED order (0-2) minimizing absolute residual mass. */
  private def bestFixedOrder(a: Array[Int], off: Int, bs: Int): Int = {
    var best = 0; var bestCost = Long.MaxValue
    var order = 0
    while (order <= math.min(2, bs - 1)) {
      val cf = FixedCoefs(order)
      var cost = 0L
      var i = off + order
      while (i < off + bs) {
        var pred = 0L
        var j = 0
        while (j < order) { pred += cf(j).toLong * a(i - 1 - j); j += 1 }
        cost += math.abs(a(i) - pred)
        i += 1
      }
      if (cost < bestCost) { bestCost = cost; best = order }
      order += 1
    }
    best
  }

  private def encodeFrame(ch: Array[Array[Int]], off: Int, bs: Int,
                          frameNo: Long, rate: Int, maxB: Int): Array[Byte] = {
    val bw = new BitWriter()
    bw.put(0x3ffe, 14); bw.put(0, 1); bw.put(0, 1) // sync, rsvd, fixed-size
    // block size: emit the 16-bit end-of-header form (code 7) — simplest
    // always-valid choice for a tail frame shorter than maxB
    bw.put(7, 4)
    bw.put(0, 4)  // sample rate from STREAMINFO
    bw.put(ch.length - 1, 4) // independent channels
    bw.put(4, 3)  // bps 16
    bw.put(0, 1)
    // UTF-8-coded frame number
    if (frameNo < 0x80) bw.put(frameNo, 8)
    else { // 2-byte form covers every realistic frame count here
      require(frameNo < 0x800, "flac: frame number too large for encoder")
      bw.put(0xc0 | (frameNo >> 6), 8)
      bw.put(0x80 | (frameNo & 0x3f), 8)
    }
    bw.put(bs - 1, 16)
    val headerBytes = bw.toBytes // aligned: 32 header bits + number + size
    val withCrc8 = headerBytes :+ crc8(headerBytes, 0, headerBytes.length).toByte
    val body = new BitWriter()
    var c = 0
    while (c < ch.length) {
      encodeSubframe(body, ch(c), off, bs)
      c += 1
    }
    val bodyBytes = body.toBytes // alignByte inside
    val frame = withCrc8 ++ bodyBytes
    val crc = crc16(frame, 0, frame.length)
    frame ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  private def encodeSubframe(bw: BitWriter, a: Array[Int], off: Int,
                             bs: Int): Unit = {
    val order = bestFixedOrder(a, off, bs)
    bw.put(0, 1)
    bw.put(0x08 | order, 6) // FIXED
    bw.put(0, 1) // no wasted bits
    var i = 0
    while (i < order) { bw.put(a(off + i).toLong & 0xffff, 16); i += 1 }
    // raw residuals
    val cf = FixedCoefs(order)
    val res = new Array[Int](bs - order)
    i = off + order
    while (i < off + bs) {
      var pred = 0L
      var j = 0
      while (j < order) { pred += cf(j).toLong * a(i - 1 - j); j += 1 }
      res(i - off - order) = (a(i) - pred).toInt
      i += 1
    }
    // single partition, 4-bit rice parameter chosen from the mean
    bw.put(0, 2) // method 0 (4-bit params)
    bw.put(0, 4) // partition order 0
    var sumAbs = 0L
    res.foreach(r => sumAbs += math.abs(r.toLong))
    val mean = if (res.isEmpty) 0L else sumAbs / math.max(1, res.length)
    var param = 0
    while (param < 14 && (1L << param) < mean) param += 1
    // escape to raw if rice would blow up (pathological residuals)
    val worstQ = res.foldLeft(0L)((m, r) => math.max(m,
      (((r.toLong << 1) ^ (r.toLong >> 63)) >>> param)))
    if (worstQ > 64) {
      bw.put(15, 4) // escape
      bw.put(18, 5) // 18 raw bits covers 16-bit order-2 residual range
      res.foreach(r => bw.put(r.toLong & 0x3ffff, 18))
    } else {
      bw.put(param, 4)
      res.foreach { r =>
        val u = (r.toLong << 1) ^ (r.toLong >> 63) // zigzag
        bw.putUnary((u >>> param).toInt)
        bw.put(u & ((1L << param) - 1), param)
      }
    }
  }
}
