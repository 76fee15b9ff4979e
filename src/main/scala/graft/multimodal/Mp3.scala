package graft.multimodal

/** MPEG-1 Layer III (MP3) frame-header walker, written against the
  * public ISO/IEC 11172-3 framing rules + the ID3v2 container spec: the
  * web's dominant audio container. Like [[Mp4]], this is metadata
  * triage — frame grammar, bitrate/samplerate, duration accounting —
  * not sample decode (the psychoacoustic bitstream is the documented
  * stub path).
  *
  * `build` emits a structurally valid CBR stream (optional ID3v2 tag +
  * N frames with correct sync/length accounting and zeroed payloads);
  * `parseMeta` skips an ID3v2 tag (syncsafe size), walks every frame
  * validating the sync word and header fields, and fails loudly on bad
  * sync, truncation, or free-format/reserved header values. */
object Mp3 {

  final case class Mp3Meta(frames: Long, bitrateKbps: Int, sampleRate: Int,
                           durationMs: Long, id3Bytes: Long)

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14. */
  private val Bitrates =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  /** MPEG-1 sample rates, index 0..2. */
  private val SampleRates = Array(44100, 48000, 32000)
  private val SamplesPerFrame = 1152

  /** ID3v2 tag or a raw frame sync at byte 0. */
  def isMp3(bytes: Array[Byte]): Boolean =
    (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') ||
      (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xe0) == 0xe0)

  private def frameLen(bitrateKbps: Int, sampleRate: Int, padding: Int): Int =
    144000 * bitrateKbps / sampleRate + padding

  /** Structurally valid CBR MPEG-1 Layer III stream: optional ID3v2.4
    * tag wrapping `tagText`, then `frames` frames whose payload bytes
    * cycle through `content` (zeroed when `content` is empty — the
    * metadata-triage staging default). The content fill makes the frame
    * payloads carry actual signal for [[frameEnergies]]: the same
    * `content` under different tags/bitrates yields the same per-frame
    * energy profile — the content-level handle audio dedup needs. */
  def build(frames: Int, bitrateIdx: Int, sampleRateIdx: Int,
            tagText: String = "", content: Array[Byte] = Array.empty): Array[Byte] = {
    require(frames > 0, s"mp3: need at least one frame, got $frames")
    require(bitrateIdx >= 1 && bitrateIdx <= 14,
      s"mp3: bitrate index must be 1..14, got $bitrateIdx")
    require(sampleRateIdx >= 0 && sampleRateIdx <= 2,
      s"mp3: sample-rate index must be 0..2, got $sampleRateIdx")
    val out = new java.io.ByteArrayOutputStream()
    if (tagText.nonEmpty) {
      val payload = tagText.getBytes("UTF-8")
      require(payload.length < (1 << 28), "mp3: tag too large")
      out.write("ID3".getBytes("US-ASCII"))
      out.write(4); out.write(0) // v2.4.0
      out.write(0) // flags
      // syncsafe 28-bit size (7 bits per byte)
      var i = 21
      while (i >= 0) { out.write((payload.length >> i) & 0x7f); i -= 7 }
      out.write(payload)
    }
    val len = frameLen(Bitrates(bitrateIdx), SampleRates(sampleRateIdx), 0)
    var f = 0
    var ci = 0 // content cursor: payloads cycle the content CONTIGUOUSLY
               // across frames, so frame f's bytes depend only on content
               // and position — not on tag presence or tag length
    while (f < frames) {
      out.write(0xff); out.write(0xfb) // sync + MPEG1 + Layer III + no CRC
      out.write((bitrateIdx << 4) | (sampleRateIdx << 2)) // no padding
      out.write(0x00) // stereo, no extras
      var j = 4
      while (j < len) {
        if (content.isEmpty) out.write(0)
        else { out.write(content(ci % content.length) & 0xff); ci += 1 }
        j += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Per-frame payload energy: sum of payload byte values per frame —
    * the coarse content fingerprint of the main-data bytes (a triage
    * proxy, NOT a synthesis filterbank; the docs of
    * [[graft.multimodal.Multimodal.decodeStub]] state the sample-decode
    * boundary). Tags are skipped, headers excluded, so the SAME content
    * under a different ID3 tag produces the IDENTICAL energy profile —
    * which is exactly what lets audio dedup work content-level. */
  def frameEnergies(bytes: Array[Byte]): Array[Long] = {
    val meta = parseMeta(bytes) // validates the whole stream
    var p = meta.id3Bytes.toInt
    val out = new Array[Long](meta.frames.toInt)
    var f = 0
    while (f < meta.frames) {
      val b2 = bytes(p + 2) & 0xff
      val len = frameLen(Bitrates(b2 >> 4), SampleRates((b2 >> 2) & 3),
        (b2 >> 1) & 1)
      var e = 0L
      var j = 4
      while (j < len) { e += (bytes(p + j) & 0xff); j += 1 }
      out(f) = e
      p += len
      f += 1
    }
    out
  }

  /** Walk the whole stream: ID3v2 skip + per-frame header validation.
    * CBR is asserted implicitly — every frame's fields are read, so a
    * mid-stream header change surfaces in the (bitrate, rate) checks. */
  def parseMeta(bytes: Array[Byte]): Mp3Meta = {
    require(isMp3(bytes), "mp3: neither ID3v2 tag nor frame sync at start")
    var p = 0
    var id3 = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      // syncsafe size EXCLUDES the 10-byte header
      var size = 0
      var i = 6
      while (i < 10) {
        require((bytes(i) & 0x80) == 0, "mp3: non-syncsafe ID3 size byte")
        size = (size << 7) | (bytes(i) & 0x7f); i += 1
      }
      id3 = 10L + size
      require(id3 <= bytes.length, "mp3: ID3 tag runs past the stream")
      p = id3.toInt
    }
    var frames = 0L
    var bitrate = -1
    var rate = -1
    while (p < bytes.length) {
      require(p + 4 <= bytes.length, s"mp3: truncated frame header at $p")
      require((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0,
        f"mp3: lost frame sync at offset $p (0x${bytes(p) & 0xff}%02x)")
      val b1 = bytes(p + 1) & 0xff
      require((b1 & 0x18) == 0x18, "mp3: only MPEG-1 supported")
      require((b1 & 0x06) == 0x02, "mp3: only Layer III supported")
      val b2 = bytes(p + 2) & 0xff
      val bIdx = b2 >> 4
      require(bIdx >= 1 && bIdx <= 14,
        if (bIdx == 0) "mp3: free-format bitrate not supported"
        else "mp3: reserved bitrate index")
      val rIdx = (b2 >> 2) & 3
      require(rIdx <= 2, "mp3: reserved sample-rate index")
      val pad = (b2 >> 1) & 1
      if (bitrate < 0) { bitrate = Bitrates(bIdx); rate = SampleRates(rIdx) }
      else require(bitrate == Bitrates(bIdx) && rate == SampleRates(rIdx),
        s"mp3: VBR stream (header change at frame $frames) — CBR walker")
      val len = frameLen(Bitrates(bIdx), SampleRates(rIdx), pad)
      require(p + len <= bytes.length,
        s"mp3: frame $frames truncated (need $len bytes at $p)")
      p += len
      frames += 1
    }
    require(frames > 0, "mp3: no frames after the ID3 tag")
    Mp3Meta(frames, bitrate, rate,
      frames * SamplesPerFrame * 1000L / rate, id3)
  }
}
