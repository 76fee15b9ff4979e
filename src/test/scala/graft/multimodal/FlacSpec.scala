package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** FLAC codec contract: exact decode∘encode identity on the encoder's
  * surface (constant/fixed subframes, Rice + escape residuals, mono and
  * stereo), and decoder fidelity for the surface the encoder does NOT
  * emit — LPC subframes, stereo decorrelation (left/side, right/side,
  * mid/side), Rice partitions, wasted bits — proven against streams
  * assembled bit-by-bit here from the published grammar (the VP8L/GIF
  * hand-assembly pattern). Corrupt streams (bad CRC, bad sync, MD5
  * mismatch) must fail loudly. */
class FlacSpec extends AnyFlatSpec with Matchers {

  private def lcgPcm(n: Int, seed: Long, amp: Int = 2000): Array[Short] = {
    val out = new Array[Short](n)
    var s = seed
    var i = 0
    while (i < n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out(i) = ((s >>> 40).toInt % amp).toShort
      i += 1
    }
    out
  }

  private def roundtrip(chs: Array[Array[Short]], rate: Int = 16000): Unit = {
    val blob = Flac.encode(rate, chs)
    val (m, out) = Flac.decode(blob)
    m.sampleRate shouldBe rate
    m.channels shouldBe chs.length
    m.bps shouldBe 16
    m.totalSamples shouldBe chs(0).length.toLong
    out.length shouldBe chs.length
    for (c <- chs.indices) out(c) shouldBe chs(c).map(_.toInt)
  }

  behavior of "Flac encoder/decoder roundtrip"

  it should "roundtrip constant, ramp and noise signals exactly" in {
    roundtrip(Array(Array.fill[Short](256)(0)))
    roundtrip(Array(Array.fill[Short](100)(1234)))
    roundtrip(Array(Array.tabulate[Short](500)(i => (i * 3 - 700).toShort)))
    roundtrip(Array(lcgPcm(256, 1L)))
    roundtrip(Array(lcgPcm(4099, 2L))) // spans two frames, short tail
  }

  it should "roundtrip full-scale pathological signals through the escape path" in {
    // alternating extremes: order-2 residuals near the 18-bit bound
    val wild = Array.tabulate[Short](300)(i =>
      if (i % 2 == 0) Short.MinValue else Short.MaxValue)
    roundtrip(Array(wild))
  }

  it should "roundtrip stereo with independent channels" in {
    roundtrip(Array(lcgPcm(257, 3L), lcgPcm(257, 4L)))
  }

  it should "roundtrip tiny inputs" in {
    roundtrip(Array(Array[Short](42)))
    roundtrip(Array(Array[Short](-1, 1)))
  }

  behavior of "Flac decoder hardening"

  it should "fail loudly on corrupted streams" in {
    val blob = Flac.encode(16000, Array(lcgPcm(256, 5L)))
    // flip one PCM-carrying bit near the end: frame CRC-16 (or the
    // STREAMINFO MD5) must catch it
    val bad = blob.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x10).toByte
    an[IllegalArgumentException] should be thrownBy Flac.decode(bad)
    // truncated stream
    an[IllegalArgumentException] should be thrownBy
      Flac.decode(java.util.Arrays.copyOf(blob, blob.length - 3))
    // bad magic
    val wrong = blob.clone(); wrong(0) = 'g'
    an[IllegalArgumentException] should be thrownBy Flac.decode(wrong)
  }

  // ------- hand-assembled streams: decoder-only spec surface ----------

  /** Build a stream byte-by-byte: STREAMINFO + raw frame bytes. MD5 is
    * left zeroed (legal: "unset"), so hand frames need no MD5 math. */
  private def container(rate: Int, nch: Int, bps: Int, total: Long,
                        frames: Array[Byte]): Array[Byte] = {
    val si = new Flac.BitWriter()
    si.put(16, 16); si.put(65535, 16)
    si.put(0, 24); si.put(0, 24)
    si.put(rate, 20); si.put(nch - 1, 3); si.put(bps - 1, 5)
    si.put(total, 36)
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    out.write(si.toBytes); out.write(new Array[Byte](16)) // zero MD5
    out.write(frames)
    out.toByteArray
  }

  /** Assemble one frame: header bits + CRC-8, body bits, pad, CRC-16. */
  private def frame(nch: Int, chanAsg: Int, blockSize: Int)
                   (body: Flac.BitWriter => Unit): Array[Byte] = {
    val h = new Flac.BitWriter()
    h.put(0x3ffe, 14); h.put(0, 1); h.put(0, 1)
    h.put(7, 4)       // 16-bit block size at end of header
    h.put(0, 4)       // rate from STREAMINFO
    h.put(chanAsg, 4)
    h.put(4, 3)       // bps 16
    h.put(0, 1)
    h.put(0, 8)       // frame number 0
    h.put(blockSize - 1, 16)
    val hb = h.toBytes
    val withCrc = hb :+ Flac.crc8(hb, 0, hb.length).toByte
    val b = new Flac.BitWriter()
    body(b)
    val fb = withCrc ++ b.toBytes
    val crc = Flac.crc16(fb, 0, fb.length)
    fb ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  private def putRice(b: Flac.BitWriter, res: Seq[Int], param: Int): Unit = {
    b.put(0, 2); b.put(0, 4) // method 0, one partition
    b.put(param, 4)
    res.foreach { r =>
      val u = (r.toLong << 1) ^ (r.toLong >> 63)
      b.putUnary((u >>> param).toInt)
      b.put(u & ((1L << param) - 1), param)
    }
  }

  it should "decode an LPC subframe the encoder never emits" in {
    // 8 samples, LPC order 2, coefs (3, -1), shift 1:
    // pred(i) = (3*a(i-1) - a(i-2)) >> 1
    val warm = Array(100, 104)
    val res = Array(3, -2, 5, 0, -4, 1)
    val expect = new Array[Int](8)
    expect(0) = warm(0); expect(1) = warm(1)
    for (i <- 2 until 8)
      expect(i) = res(i - 2) + ((3 * expect(i - 1) - expect(i - 2)) >> 1)
    val f = frame(1, 0, 8) { b =>
      b.put(0, 1)
      b.put(0x20 | (2 - 1), 6) // LPC order 2
      b.put(0, 1)              // no wasted bits
      b.put(warm(0).toLong & 0xffff, 16); b.put(warm(1).toLong & 0xffff, 16)
      b.put(4 - 1, 4)          // precision 4 bits
      b.put(1, 5)              // shift 1 (signed 5-bit)
      b.put(3L & 0xf, 4); b.put(-1L & 0xf, 4) // coefficients
      putRice(b, res, 2)
    }
    val (m, ch) = Flac.decode(container(16000, 1, 16, 8, f))
    m.totalSamples shouldBe 8
    ch(0) shouldBe expect
  }

  it should "decode all three stereo decorrelation modes" in {
    val left = Array(1000, -500, 250, 8)
    val right = Array(900, -480, 260, -8)
    def verbatim(b: Flac.BitWriter, vals: Seq[Int], bits: Int): Unit = {
      b.put(0, 1); b.put(1, 6); b.put(0, 1)
      vals.foreach(v => b.put(v.toLong & ((1L << bits) - 1), bits))
    }
    // LEFT/SIDE (8): ch0 = left (16 bit), ch1 = side = l - r (17 bit)
    val ls = frame(2, 8, 4) { b =>
      verbatim(b, left, 16)
      verbatim(b, left.zip(right).map { case (l, r) => l - r }, 17)
    }
    val (_, chLs) = Flac.decode(container(16000, 2, 16, 4, ls))
    chLs(0) shouldBe left
    chLs(1) shouldBe right
    // RIGHT/SIDE (9): ch0 = side (17 bit), ch1 = right
    val rs = frame(2, 9, 4) { b =>
      verbatim(b, left.zip(right).map { case (l, r) => l - r }, 17)
      verbatim(b, right, 16)
    }
    val (_, chRs) = Flac.decode(container(16000, 2, 16, 4, rs))
    chRs(0) shouldBe left
    chRs(1) shouldBe right
    // MID/SIDE (10): mid = (l+r)>>1, side = l-r (the libFLAC convention)
    val ms = frame(2, 10, 4) { b =>
      verbatim(b, left.zip(right).map { case (l, r) => (l + r) >> 1 }, 16)
      verbatim(b, left.zip(right).map { case (l, r) => l - r }, 17)
    }
    val (_, chMs) = Flac.decode(container(16000, 2, 16, 4, ms))
    chMs(0) shouldBe left
    chMs(1) shouldBe right
  }

  it should "decode multi-partition residuals and the raw escape" in {
    // 16 samples, FIXED order 0 (pure residuals), partition order 2 ->
    // 4 partitions of 4; partition 1 uses the 4-bit escape with 6 raw
    // bits, the rest Rice with different parameters
    val res = Array(1, -2, 3, -4, 20, -25, 30, -31, 0, 1, -1, 2, 7, -8, 9, -10)
    val f = frame(1, 0, 16) { b =>
      b.put(0, 1); b.put(0x08, 6); b.put(0, 1) // FIXED order 0
      b.put(0, 2)  // method 0
      b.put(2, 4)  // partition order 2
      // partition 0: rice p=1
      b.put(1, 4)
      res.slice(0, 4).foreach { r =>
        val u = (r.toLong << 1) ^ (r.toLong >> 63)
        b.putUnary((u >>> 1).toInt); b.put(u & 1, 1)
      }
      // partition 1: ESCAPE, 6 raw bits
      b.put(15, 4); b.put(6, 5)
      res.slice(4, 8).foreach(r => b.put(r.toLong & 0x3f, 6))
      // partition 2: rice p=0 (pure unary)
      b.put(0, 4)
      res.slice(8, 12).foreach { r =>
        val u = (r.toLong << 1) ^ (r.toLong >> 63)
        b.putUnary(u.toInt)
      }
      // partition 3: rice p=3
      b.put(3, 4)
      res.slice(12, 16).foreach { r =>
        val u = (r.toLong << 1) ^ (r.toLong >> 63)
        b.putUnary((u >>> 3).toInt); b.put(u & 7, 3)
      }
    }
    val (_, ch) = Flac.decode(container(16000, 1, 16, 16, f))
    ch(0) shouldBe res
  }

  it should "decode wasted bits" in {
    // all samples share 3 trailing zero bits: subframe codes them at
    // 13 effective bits with wasted=3 (unary-coded as 001)
    val vals = Array(8, -16, 24, 1000 * 8)
    val f = frame(1, 0, 4) { b =>
      b.put(0, 1); b.put(1, 6) // VERBATIM
      b.put(1, 1)              // wasted-bits flag
      b.put(1, 3)              // unary 2 zeros + 1 -> wasted = 3
      vals.foreach(v => b.put((v >> 3).toLong & 0x1fff, 13))
    }
    val (_, ch) = Flac.decode(container(16000, 1, 16, 4, f))
    ch(0) shouldBe vals
  }

  behavior of "Flac dispatch"

  it should "route FLAC blobs to real windowed-amplitude features" in {
    val pcm = lcgPcm(256, 9L, amp = 30000)
    val blob = Flac.encode(16000, Array(pcm))
    val feats = Multimodal.decode(blob)
    feats.length shouldBe Multimodal.featureDim
    // features must equal the WAV path's features for the same PCM —
    // the container changes, the samples cannot
    val wavFeats = Multimodal.decode(Codecs.encodeWav(16000, pcm))
    feats.toSeq shouldBe wavFeats.toSeq
    feats.toSeq should not be Multimodal.decodeStub(blob).toSeq
  }
}
