package graft.multimodal

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** ISO BMFF metadata codec contract: exact build→parse roundtrip, 64-bit
  * box sizes, version-1 time fields, and loud failures on malformed
  * trees. */
class Mp4Spec extends AnyFlatSpec with Matchers {
  import Mp4.{Mp4Track, build, parseMeta}

  behavior of "Mp4"

  it should "roundtrip brand, timescale and per-track metadata exactly" in {
    val tracks = Seq(
      Mp4Track("vide", 640, 480, 90000L),
      Mp4Track("soun", 0, 0, 88200L))
    val blob = build("isom", 1000L, tracks)
    Mp4.isMp4(blob) shouldBe true
    val m = parseMeta(blob)
    m.brand shouldBe "isom"
    m.timescale shouldBe 1000L
    m.duration shouldBe 90000L // max track duration
    m.tracks shouldBe tracks
  }

  it should "parse 64-bit (largesize) boxes and unknown siblings" in {
    val blob = build("mp42", 600L, Seq(Mp4Track("vide", 1920, 1080, 3600L)))
    // re-encode the top-level moov as size==1 + 64-bit largesize, with a
    // free box appended (parsers must skip unknown siblings)
    val moovAt = blob.indexOfSlice("moov".getBytes) - 4
    val (head, moov) = blob.splitAt(moovAt)
    val out = new java.io.ByteArrayOutputStream()
    out.write(head)
    val size = ((moov(0) & 0xffL) << 24) | ((moov(1) & 0xffL) << 16) |
      ((moov(2) & 0xffL) << 8) | (moov(3) & 0xffL)
    out.write(Array[Byte](0, 0, 0, 1)) // size == 1 → largesize follows
    out.write("moov".getBytes)
    val ls = size + 8 // payload unchanged; header grows by 8
    (7 to 0 by -1).foreach(i => out.write(((ls >> (8 * i)) & 0xff).toInt))
    out.write(moov, 8, (size - 8).toInt)
    out.write(Array[Byte](0, 0, 0, 8)); out.write("free".getBytes)
    val m = parseMeta(out.toByteArray)
    m.tracks.head shouldBe Mp4Track("vide", 1920, 1080, 3600L)
  }

  it should "parse version-1 (64-bit time) movie and track headers" in {
    // hand-build a v1 mvhd + v1 tkhd skeleton
    def u32(o: java.io.ByteArrayOutputStream, v: Long): Unit =
      (3 to 0 by -1).foreach(i => o.write(((v >> (8 * i)) & 0xff).toInt))
    def u64(o: java.io.ByteArrayOutputStream, v: Long): Unit =
      (7 to 0 by -1).foreach(i => o.write(((v >> (8 * i)) & 0xff).toInt))
    def u16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >> 8) & 0xff); o.write(v & 0xff)
    }
    def bx(t: String, p: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      u32(o, 8L + p.length); o.write(t.getBytes); o.write(p); o.toByteArray
    }
    def full(t: String, v: Int, p: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(v); o.write(0); o.write(0); o.write(0); o.write(p)
      bx(t, o.toByteArray)
    }
    val unity = { val o = new java.io.ByteArrayOutputStream()
      Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
        .foreach(u32(o, _)); o.toByteArray }
    val ftyp = bx("ftyp", "isom".getBytes ++ Array[Byte](0,0,0,0) ++ "isom".getBytes)
    val mvhd = { val o = new java.io.ByteArrayOutputStream()
      u64(o, 0); u64(o, 0); u32(o, 48000L); u64(o, 1L << 33) // > u32 range
      u32(o, 0x00010000L); u16(o, 0x0100); u16(o, 0); u32(o, 0); u32(o, 0)
      o.write(unity); (0 until 6).foreach(_ => u32(o, 0)); u32(o, 2)
      full("mvhd", 1, o.toByteArray) }
    val tkhd = { val o = new java.io.ByteArrayOutputStream()
      u64(o, 0); u64(o, 0); u32(o, 1); u32(o, 0); u64(o, 1L << 33)
      u32(o, 0); u32(o, 0); u16(o, 0); u16(o, 0); u16(o, 0); u16(o, 0)
      o.write(unity); u32(o, 3840L << 16); u32(o, 2160L << 16)
      full("tkhd", 1, o.toByteArray) }
    val mdhd = { val o = new java.io.ByteArrayOutputStream()
      u64(o, 0); u64(o, 0); u32(o, 48000L); u64(o, 1L << 33)
      u16(o, 0x55c4); u16(o, 0); full("mdhd", 1, o.toByteArray) }
    val hdlr = { val o = new java.io.ByteArrayOutputStream()
      u32(o, 0); o.write("vide".getBytes); u32(o, 0); u32(o, 0); u32(o, 0)
      o.write(0); full("hdlr", 0, o.toByteArray) }
    val blob = ftyp ++ bx("moov",
      mvhd ++ bx("trak", tkhd ++ bx("mdia", mdhd ++ hdlr)))
    val m = parseMeta(blob)
    m.timescale shouldBe 48000L
    m.duration shouldBe (1L << 33) // survives past u32
    m.tracks shouldBe Seq(Mp4Track("vide", 3840, 2160, 1L << 33))
  }

  it should "fail loudly on malformed or non-BMFF streams" in {
    val blob = build("isom", 1000L, Seq(Mp4Track("vide", 16, 16, 100L)))
    an[IllegalArgumentException] should be thrownBy
      parseMeta("no ftyp here...".getBytes)
    an[IllegalArgumentException] should be thrownBy
      parseMeta(java.util.Arrays.copyOf(blob, blob.length - 5)) // truncated
    // corrupt a box size to run past the stream
    val bad = blob.clone()
    val moovAt = bad.indexOfSlice("moov".getBytes) - 4
    bad(moovAt) = 0x7f // absurd 2GB size
    val e = intercept[IllegalArgumentException](parseMeta(bad))
    e.getMessage should include ("out of bounds")
    // metadata-less stream: ftyp alone, no moov
    val ftypOnly = java.util.Arrays.copyOf(blob, moovAt)
    intercept[IllegalArgumentException](parseMeta(ftypOnly))
      .getMessage should include ("no moov")
  }

  it should "reject invalid build inputs" in {
    an[IllegalArgumentException] should be thrownBy
      build("toolong", 1000L, Seq(Mp4Track("vide", 1, 1, 1L)))
    an[IllegalArgumentException] should be thrownBy
      build("isom", 1000L, Nil)
    an[IllegalArgumentException] should be thrownBy
      build("isom", 1000L, Seq(Mp4Track("text", 1, 1, 1L)))
  }

  it should "fingerprint sample energies identically across a faststart remux" in {
    val samples = Seq(
      Array.tabulate[Byte](40)(i => (i * 3 + 1).toByte),
      Array.emptyByteArray, // zero-length sample must survive as energy 0
      Array.tabulate[Byte](25)(i => (200 - i).toByte))
    val tracks = Seq(Mp4Track("vide", 320, 240, 9000L),
      Mp4Track("soun", 0, 0, 8000L))
    val fast = Mp4.buildWithSamples("isom", 1000L, tracks, samples)
    val capture = Mp4.buildWithSamples("isom", 1000L, tracks, samples,
      moovFirst = false)
    // different layouts, byte-distinct blobs
    fast.toSeq should not be capture.toSeq
    // both parse as full metadata trees (the sample table rides along)
    parseMeta(fast).tracks.map(_.handler) shouldBe Seq("vide", "soun")
    parseMeta(capture).brand shouldBe "isom"
    // the content fingerprint is layout-blind and exact
    val ef = Mp4.sampleEnergies(fast)
    ef.toSeq shouldBe Mp4.sampleEnergies(capture).toSeq
    ef.length shouldBe 3
    ef(0) shouldBe samples(0).map(_ & 0xff).map(_.toLong).sum
    ef(1) shouldBe 0L
    ef(2) shouldBe samples(2).map(_ & 0xff).map(_.toLong).sum
    // content change MUST change the profile
    val other = Mp4.buildWithSamples("isom", 1000L, tracks,
      samples.updated(0, samples(0).map(b => (b + 1).toByte).array))
    Mp4.sampleEnergies(other).toSeq should not be ef.toSeq
    // a sample-table-less stream is a loud error, not an empty answer
    intercept[IllegalArgumentException](
      Mp4.sampleEnergies(build("isom", 1000L, tracks)))
      .getMessage should include ("no video sample table")
    // a truncated mdat (sample overruns the stream) is loud too
    intercept[IllegalArgumentException](
      Mp4.sampleEnergies(java.util.Arrays.copyOf(fast, fast.length - 10)))
  }
}
