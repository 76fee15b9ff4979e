package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** MP3 frame-walker contract: exact build→parse roundtrip across the
  * bitrate/samplerate grid, ID3v2 syncsafe skip, and loud failures on
  * lost sync, truncation, free-format/reserved fields, and VBR. */
class Mp3Spec extends AnyFlatSpec with Matchers {
  import Mp3._

  behavior of "Mp3"

  it should "roundtrip frame counts, rates and duration across the header grid" in {
    for (b <- Seq(1, 7, 14); r <- Seq(0, 1, 2); n <- Seq(1, 13)) {
      val blob = build(n, b, r)
      isMp3(blob) shouldBe true
      val m = parseMeta(blob)
      m.frames shouldBe n
      m.bitrateKbps shouldBe Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
        160, 192, 224, 256, 320)(b)
      m.sampleRate shouldBe Seq(44100, 48000, 32000)(r)
      m.durationMs shouldBe n.toLong * 1152 * 1000 / m.sampleRate
      m.id3Bytes shouldBe 0L
    }
  }

  it should "skip an ID3v2 tag via its syncsafe size, including sizes past 7 bits" in {
    val tag = "artist=graft;" + ("x" * 300) // > 127 exercises multi-byte size
    val blob = build(5, 9, 0, tagText = tag)
    val m = parseMeta(blob)
    m.frames shouldBe 5
    m.id3Bytes shouldBe 10L + tag.getBytes("UTF-8").length
  }

  it should "fail loudly on malformed streams" in {
    val blob = build(3, 9, 0)
    an[IllegalArgumentException] should be thrownBy
      parseMeta("not an mp3".getBytes)
    an[IllegalArgumentException] should be thrownBy
      parseMeta(java.util.Arrays.copyOf(blob, blob.length - 7)) // truncated
    // corrupt the second frame's sync word
    val len = blob.length / 3
    val bad = blob.clone(); bad(len) = 0x00
    intercept[IllegalArgumentException](parseMeta(bad))
      .getMessage should include ("lost frame sync")
    // free-format bitrate (index 0) refused by name
    val free = blob.clone(); free(2) = ((free(2) & 0x0f)).toByte
    intercept[IllegalArgumentException](parseMeta(free))
      .getMessage should include ("free-format")
    // a VBR header change mid-stream is a loud error, not a wrong answer
    val vbr = blob.clone()
    vbr(len + 2) = ((0xa << 4) | (vbr(len + 2) & 0x0f)).toByte
    intercept[IllegalArgumentException](parseMeta(vbr))
      .getMessage should include ("VBR")
  }

  it should "reject invalid build parameters" in {
    an[IllegalArgumentException] should be thrownBy build(0, 9, 0)
    an[IllegalArgumentException] should be thrownBy build(1, 0, 0)
    an[IllegalArgumentException] should be thrownBy build(1, 15, 0)
    an[IllegalArgumentException] should be thrownBy build(1, 9, 3)
  }

  it should "fingerprint frame payload energy content-level, blind to tags" in {
    val content = Array.tabulate[Byte](300)(i => ((i * 31 + 7) % 256).toByte)
    val bare = build(6, 9, 0, content = content)
    val tagged = build(6, 9, 0, tagText = "Some Tagger 2.0 Wrote This",
      content = content)
    // different bytes (the ID3 tag), identical content fingerprint
    bare.length should not be tagged.length
    Mp3.frameEnergies(tagged).toSeq shouldBe Mp3.frameEnergies(bare).toSeq
    Mp3.frameEnergies(bare).length shouldBe 6
    // a content change MUST change the profile (no degenerate zeros)
    val other = build(6, 9, 0, content = content.map(b => (b ^ 0x55).toByte))
    Mp3.frameEnergies(other).toSeq should not be Mp3.frameEnergies(bare).toSeq
    Mp3.frameEnergies(bare).forall(_ > 0) shouldBe true
    // zero-filled staging default keeps its historical byte shape
    Mp3.frameEnergies(build(3, 9, 0)).toSeq shouldBe Seq(0L, 0L, 0L)
  }
}
