package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** WebP container contract: build→parse identity across all three
  * container shapes, bounds-checked failure on corrupt streams, and
  * dispatch integration (triage-accept + stub features). */
class WebpSpec extends AnyFlatSpec with Matchers {

  behavior of "Webp"

  it should "roundtrip a simple lossy (VP8) container" in {
    val blob = Webp.buildLossy(320, 240)
    Webp.isWebp(blob) shouldBe true
    val m = Webp.parseMeta(blob)
    m shouldBe Webp.WebpMeta("lossy", 320, 240,
      hasAlpha = false, animated = false, nFrames = 1, nChunks = 1)
  }

  it should "roundtrip a simple lossless (VP8L) container with the alpha bit" in {
    for (alpha <- Seq(true, false)) {
      val m = Webp.parseMeta(Webp.buildLossless(16383, 1, alpha))
      m.format shouldBe "lossless"
      (m.width, m.height) shouldBe (16383, 1)
      m.hasAlpha shouldBe alpha
      m.nChunks shouldBe 1
    }
  }

  it should "roundtrip an extended (VP8X) still with ALPH" in {
    val m = Webp.parseMeta(
      Webp.buildExtended(640, 480, alpha = true, animated = false))
    m shouldBe Webp.WebpMeta("extended", 640, 480,
      hasAlpha = true, animated = false, nFrames = 1, nChunks = 3)
  }

  it should "roundtrip an extended animation and count ANMF frames" in {
    val m = Webp.parseMeta(
      Webp.buildExtended(100, 50, alpha = false, animated = true, nFrames = 4))
    m shouldBe Webp.WebpMeta("extended", 100, 50,
      hasAlpha = false, animated = true, nFrames = 4, nChunks = 6)
  }

  it should "handle odd-size chunks via RIFF even padding" in {
    // odd dataLen makes the VP8 payload odd → pad byte in the container
    val m = Webp.parseMeta(Webp.buildLossy(33, 9, dataLen = 7))
    (m.width, m.height) shouldBe (33, 9)
    m.nChunks shouldBe 1
  }

  it should "fail loudly on corrupt streams, never misparse" in {
    an[IllegalArgumentException] should be thrownBy
      Webp.parseMeta("RIFF not a webp really".getBytes)
    // bad VP8 start code
    val blob = Webp.buildLossy(8, 8)
    val bad = blob.clone()
    bad(12 + 8 + 3) = 0x00 // clobber the 0x9d start byte
    an[IllegalArgumentException] should be thrownBy Webp.parseMeta(bad)
    // RIFF size overrunning the buffer
    val short = java.util.Arrays.copyOf(blob, blob.length - 4)
    an[IllegalArgumentException] should be thrownBy Webp.parseMeta(short)
    // reserved VP8X flags
    val ext = Webp.buildExtended(8, 8, alpha = false, animated = false)
    val flagged = ext.clone()
    flagged(12 + 8) = 0x80.toByte
    an[IllegalArgumentException] should be thrownBy Webp.parseMeta(flagged)
    // out-of-range builder geometry
    an[IllegalArgumentException] should be thrownBy Webp.buildLossy(0, 8)
    an[IllegalArgumentException] should be thrownBy Webp.buildLossy(16384, 8)
  }

  it should "verify the VP8 payload EMBEDDED in ANMF frames, not just its length" in {
    val anim = Webp.buildExtended(24, 16, alpha = false, animated = true,
      nFrames = 2)
    // locate the first ANMF chunk, clobber the embedded VP8 start code
    // (16-byte ANMF header, then the VP8 chunk: 8-byte header + 3-byte
    // frame tag before the 9D 01 2A start code)
    var p = 12
    var anmfAt = -1
    while (anmfAt < 0) {
      val fourcc = new String(anim, p, 4, "US-ASCII")
      val len = (anim(p + 4) & 0xff) | ((anim(p + 5) & 0xff) << 8) |
        ((anim(p + 6) & 0xff) << 16) | ((anim(p + 7) & 0xff) << 24)
      if (fourcc == "ANMF") anmfAt = p + 8 else p = p + 8 + len + (len & 1)
    }
    val bad = anim.clone()
    bad(anmfAt + 16 + 8 + 3) = 0x00 // embedded VP8 start byte 0x9d
    an[IllegalArgumentException] should be thrownBy Webp.parseMeta(bad)
    // and a frame whose payload is no chunk at all
    val noChunk = anim.clone()
    noChunk(anmfAt + 16) = 'X'; noChunk(anmfAt + 17) = 'X'
    an[IllegalArgumentException] should be thrownBy Webp.parseMeta(noChunk)
    // the untouched animation still parses
    Webp.parseMeta(anim).nFrames shouldBe 2
  }

  behavior of "Multimodal webp dispatch"

  it should "triage-accept WebP blobs and reject corrupt ones loudly" in {
    val blob = Webp.buildExtended(32, 32, alpha = false, animated = true,
      nFrames = 2)
    val feats = Multimodal.decode(blob)
    feats.length shouldBe Multimodal.featureDim
    // stub features are deterministic byte folds — same blob, same vector
    Multimodal.decode(blob).toSeq shouldBe feats.toSeq
    // a corrupt WebP must be a loud error, not silent stub features
    val bad = blob.clone()
    bad(12 + 8) = 0x80.toByte
    an[IllegalArgumentException] should be thrownBy Multimodal.decode(bad)
  }
}
