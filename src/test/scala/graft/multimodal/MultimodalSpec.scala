package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int) = (0 until n).map { i =>
    MediaFile(i.toLong, if (i % 2 == 0) "image" else "video",
      Array.tabulate[Byte](100 + i)(b => ((b * 31 + i) % 251).toByte),
      MediaMeta(640, 480, durationMs = 1000L * (i + 1), format = "raw"))
  }.toDS()

  behavior of "Multimodal"

  it should "extract fixed-dim deterministic features per blob" in {
    val feats = Multimodal.extractFeatures(media(10), partitions = 4).collect()
    feats should have size 10
    all(feats.map(_.features.length)) shouldBe Multimodal.featureDim
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(media(10)).collect()
    feats.sortBy(_.media_id).zip(again.sortBy(_.media_id)).foreach {
      case (a, b) => a.features.toSeq shouldBe b.features.toSeq
    }
    // depends on content: different blobs → different features
    feats.map(_.features.toSeq).distinct.length should be > 1
  }

  it should "resize blobs and update metadata in lockstep" in {
    val out = Multimodal.resize(media(4), 8, 4).collect()
    all(out.map(_.content.length)) shouldBe 32
    all(out.map(_.meta.width)) shouldBe 8
    all(out.map(_.meta.height)) shouldBe 4
    all(out.map(_.meta.format)) shouldBe "raw" // untouched fields survive
  }

  it should "sample frames proportional to duration with row-local explode" in {
    val frames = Multimodal.sampleFrames(media(4), everyMs = 1000).collect()
    // media i has duration (i+1)s → i+1 frames at 1 fps
    frames.groupBy(_.media_id).view.mapValues(_.length).toMap shouldBe
      Map(0L -> 1, 1L -> 2, 2L -> 3, 3L -> 4)
    frames.filter(_.media_id == 3).map(_.frame_idx).sorted shouldBe Seq(0, 1, 2, 3)
  }

  behavior of "Codecs (real PPM/WAV)"

  it should "roundtrip PPM including the full header grammar" in {
    val rgb = Array.tabulate[Byte](6 * 4 * 3)(i => ((i * 37 + 5) % 256).toByte)
    val (w, h, px) = Codecs.decodePpm(Codecs.encodePpm(6, 4, rgb))
    (w, h) shouldBe ((6, 4))
    px.toSeq shouldBe rgb.toSeq
    // a header only the REAL grammar parses: comments between any tokens,
    // mixed whitespace runs — written by other tools, must still decode
    val hairy = ("P6 # comment after magic\n# full-line comment\n  6" +
      " \t# width done\n 4\r\n255\n").getBytes("US-ASCII") ++ rgb
    val (w2, h2, px2) = Codecs.decodePpm(hairy)
    (w2, h2) shouldBe ((6, 4))
    px2.toSeq shouldBe rgb.toSeq
    // malformed inputs fail LOUDLY, never return garbage
    intercept[IllegalArgumentException](Codecs.decodePpm("P5\n1 1\n255\n0".getBytes))
    intercept[IllegalArgumentException]( // 16-bit samples unsupported
      Codecs.decodePpm(("P6\n1 1\n65535\n" + "aaaaaa").getBytes))
    intercept[IllegalArgumentException]( // truncated raster
      Codecs.decodePpm("P6\n2 2\n255\nxyz".getBytes))
  }

  it should "resize by exact nearest-neighbor floor mapping" in {
    // 4x2 source with pixel (r,c) = value r*4+c in all channels;
    // 2x1 target must sample (0,0) and (0,2)
    val src = Array.tabulate[Byte](4 * 2 * 3)(i => (i / 3).toByte)
    val out = Codecs.resizeNearest(4, 2, src, 2, 1)
    out.toSeq shouldBe Seq[Byte](0, 0, 0, 2, 2, 2)
    // upscale replicates: 1x1 -> 3x3 all the same pixel
    val up = Codecs.resizeNearest(1, 1, Array[Byte](9, 8, 7), 3, 3)
    up.grouped(3).toSeq.foreach(_.toSeq shouldBe Seq[Byte](9, 8, 7))
  }

  it should "roundtrip WAV and walk unknown RIFF chunks" in {
    val samples = Array.tabulate[Short](300)(i => ((i * 991) % 65536 - 32768).toShort)
    val (rate, back) = Codecs.decodeWav(Codecs.encodeWav(22050, samples))
    rate shouldBe 22050
    back.toSeq shouldBe samples.toSeq
    // real-world file: a LIST chunk with ODD length (word-aligned pad
    // byte) sits between fmt and data — the decoder must skip both
    val canonical = Codecs.encodeWav(8000, samples)
    val bb = java.nio.ByteBuffer.allocate(canonical.length + 8 + 5 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(canonical, 0, 36) // RIFF..WAVE + fmt chunk
    bb.put("LIST".getBytes("US-ASCII")).putInt(5)
      .put("INFOx".getBytes("US-ASCII")).put(0.toByte) // odd len + pad
    bb.put(canonical, 36, canonical.length - 36) // data chunk
    val withList = bb.array()
    val (rate2, back2) = Codecs.decodeWav(withList)
    rate2 shouldBe 8000
    back2.toSeq shouldBe samples.toSeq
    // loud failures: not RIFF, float PCM, stereo
    intercept[IllegalArgumentException](Codecs.decodeWav("RIFX....".getBytes))
    val floatFmt = canonical.clone; floatFmt(20) = 3 // wFormatTag = IEEE float
    intercept[IllegalArgumentException](Codecs.decodeWav(floatFmt))
    val stereo = canonical.clone; stereo(22) = 2
    intercept[IllegalArgumentException](Codecs.decodeWav(stereo))
  }

  it should "sum grid luminance and window amplitude with exact integers" in {
    // 4x4 all-white image, 2x2 grid: each cell = 4 px * 3 ch * 255
    val white = Array.fill[Byte](4 * 4 * 3)(0xff.toByte)
    Codecs.gridLuminance(4, 4, white, 2, 2).toSeq shouldBe
      Seq.fill(4)(4L * 3 * 255)
    // Short.MinValue must not overflow abs()
    Codecs.windowAbsSum(Array[Short](Short.MinValue, 100, -100), 1)
      .toSeq shouldBe Seq(32768L + 200L)
  }

  it should "dispatch decode by magic bytes: real codec for PPM/WAV, stub otherwise" in {
    val rgb = Array.fill[Byte](16 * 16 * 3)(0xff.toByte)
    val img = Multimodal.decode(Codecs.encodePpm(16, 16, rgb))
    img should have length Multimodal.featureDim
    all(img.map(_.toDouble)) shouldBe 1.0 +- 1e-6 // white = max luminance
    val silent = Multimodal.decode(Codecs.encodeWav(16000, new Array[Short](256)))
    all(silent.map(_.toDouble)) shouldBe 0.0 +- 1e-9 // silence = no energy
    val loud = Multimodal.decode(Codecs.encodeWav(16000,
      Array.fill[Short](256)(Short.MinValue)))
    all(loud.map(_.toDouble)) shouldBe 1.0 +- 1e-6 // full-scale = 1
    // opaque bytes (no magic) take the deterministic stub path
    val blob = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    Multimodal.decode(blob).toSeq shouldBe Multimodal.decodeStub(blob).toSeq
    // RIFF-family NON-WAVE containers (WebP, AVI) must hit the stub, not
    // crash in the WAV decoder; same for P6-prefixed non-PPM bytes
    val webp = "RIFF\u0004\u0000\u0000\u0000WEBPVP8 ".getBytes("ISO-8859-1")
    Multimodal.decode(webp).toSeq shouldBe Multimodal.decodeStub(webp).toSeq
    val p6ish = "P6X not a ppm".getBytes("US-ASCII")
    Multimodal.decode(p6ish).toSeq shouldBe Multimodal.decodeStub(p6ish).toSeq
  }

  it should "reject overflow-sized PPM headers loudly instead of crashing out-of-contract" in {
    // 65536*65536*3 overflows Int to 0 — a naive length check would
    // accept an EMPTY raster for a claimed 4-gigapixel image
    val hostile = "P6\n65536 65536\n255\n".getBytes("US-ASCII")
    val e = intercept[IllegalArgumentException](Codecs.decodePpm(hostile))
    e.getMessage should include("truncated")
  }

  it should "really resample PPM blobs in resize (decodable at new dims)" in {
    val rgb = Array.tabulate[Byte](16 * 16 * 3)(i => (i % 251).toByte)
    val m = Seq(MediaFile(1L, "image", Codecs.encodePpm(16, 16, rgb),
      MediaMeta(16, 16, 0L, "ppm"))).toDS()
    val out = Multimodal.resize(m, 8, 8).collect().head
    out.meta.width shouldBe 8
    val (w, h, px) = Codecs.decodePpm(out.content) // still a valid PPM
    (w, h) shouldBe ((8, 8))
    px.toSeq shouldBe Codecs.resizeNearest(16, 16, rgb, 8, 8).toSeq
  }

  it should "profile metadata without touching the binary column" in {
    val prof = Multimodal.metaProfile(media(10).toDF())
    val rows = prof.collect()
    rows.map(_.getAs[Long]("n")).sum shouldBe 10
    // plan reads meta/kind only — binary column pruned from the projection
    val scanned = prof.queryExecution.optimizedPlan.toString
    scanned should not include "content"
  }
}
