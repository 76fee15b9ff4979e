package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The re-tagged-duplicate WAV contract behind `audio_dedup_content`:
  * identical PCM under a LIST/INFO metadata chunk must decode to the
  * identical samples (content-level equality) while the blobs differ
  * byte-level. */
class WavTaggedSpec extends AnyFlatSpec with Matchers {

  behavior of "Codecs.encodeWavTagged"

  it should "carry identical PCM under different bytes" in {
    val samples = Array.tabulate[Short](256)(i => ((i * 123 - 9000)).toShort)
    val plain = Codecs.encodeWav(16000, samples)
    val tagged = Codecs.encodeWavTagged(16000, samples, "re-tagged by tool X")
    tagged.length should be > plain.length // the blobs really differ
    val (r1, s1) = Codecs.decodeWav(plain)
    val (r2, s2) = Codecs.decodeWav(tagged)
    r2 shouldBe r1
    s2.toSeq shouldBe s1.toSeq // content-level identity
    Codecs.windowAbsSum(s2, 16).toSeq shouldBe
      Codecs.windowAbsSum(s1, 16).toSeq
  }

  it should "word-align odd-length comments per RIFF" in {
    val samples = Array.tabulate[Short](32)(i => (i * 1000).toShort)
    for (c <- Seq("x", "xy", "odd-length!", "")) {
      val (_, s) = Codecs.decodeWav(Codecs.encodeWavTagged(8000, samples, c))
      s.toSeq shouldBe samples.toSeq
    }
  }
}
