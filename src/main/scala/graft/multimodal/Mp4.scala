package graft.multimodal

/** ISO BMFF (MP4) box-structure metadata codec, written against the
  * public ISO/IEC 14496-12 spec: the container walk a media lake runs on
  * every crawled video BEFORE deciding whether to spend decode cycles on
  * it — brand, movie timescale/duration, per-track handler + geometry.
  * Payload (sample) decoding is out of scope by design: codec bitstreams
  * (H.264 etc.) are the stub path ([[Multimodal.decodeStub]]), the
  * CONTAINER walk is real and loud.
  *
  * `build` emits a minimal-but-valid metadata skeleton (ftyp + moov with
  * mvhd and per-track trak/tkhd/mdia/mdhd/hdlr) that any BMFF reader
  * parses; `parseMeta` walks boxes with full bounds checking, 32- and
  * 64-bit box sizes, version-0 and version-1 time fields, and fails
  * loudly on truncated or malformed trees. */
object Mp4 {

  /** One track's metadata: handler is "vide" or "soun"; width/height in
    * pixels (0 for audio); duration in MOVIE-timescale units. */
  final case class Mp4Track(handler: String, width: Int, height: Int,
                            duration: Long)

  final case class Mp4Meta(brand: String, timescale: Long, duration: Long,
                           tracks: Seq[Mp4Track])

  /** `....ftyp` at offset 4 — the BMFF signature. */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(4) == 'f' && bytes(5) == 't' &&
      bytes(6) == 'y' && bytes(7) == 'p'

  // ------------------------------------------------------------- build

  private def u32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def u16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }
  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    u32(out, 8L + payload.length)
    out.write(typ.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }
  private def fullBox(typ: String, version: Int,
                      payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(version); out.write(0); out.write(0); out.write(0) // flags
    out.write(payload)
    box(typ, out.toByteArray)
  }
  private val UnityMatrix: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
      .foreach(u32(out, _))
    out.toByteArray
  }

  /** Minimal valid metadata skeleton: ftyp + moov(mvhd, trak*). Movie
    * duration is the max track duration; all times in `timescale`. */
  def build(brand: String, timescale: Long,
            tracks: Seq[Mp4Track]): Array[Byte] = {
    require(brand.length == 4, s"mp4: brand must be 4 chars, got '$brand'")
    require(timescale > 0 && timescale <= 0xffffffffL,
      s"mp4: bad timescale $timescale")
    require(tracks.nonEmpty, "mp4: at least one track required")
    val duration = tracks.map(_.duration).max
    val ftyp = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(brand.getBytes("US-ASCII")); u32(out, 0)
      out.write(brand.getBytes("US-ASCII"))
      box("ftyp", out.toByteArray)
    }
    val mvhd = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 0); u32(out, 0) // creation/modification
      u32(out, timescale); u32(out, duration)
      u32(out, 0x00010000L); u16(out, 0x0100); u16(out, 0) // rate/vol/rsvd
      u32(out, 0); u32(out, 0) // reserved
      out.write(UnityMatrix)
      (0 until 6).foreach(_ => u32(out, 0)) // pre_defined
      u32(out, tracks.length + 1L) // next_track_ID
      fullBox("mvhd", 0, out.toByteArray)
    }
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      trakBox(t, i, timescale, None)
    }
    val moov = box("moov", mvhd ++ traks.flatten.toArray)
    ftyp ++ moov
  }

  /** One trak box; when `stbl` is given it lands in mdia/minf (byte
    * layout with `None` is IDENTICAL to the pre-sample-table builder, so
    * `build`'s output — and the `mp4_meta` contract hashes — are
    * untouched). */
  private def trakBox(t: Mp4Track, i: Int, timescale: Long,
                      stbl: Option[Array[Byte]]): Array[Byte] = {
    require(t.handler == "vide" || t.handler == "soun",
      s"mp4: handler must be vide|soun, got '${t.handler}'")
    val tkhd = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 0); u32(out, 0); u32(out, i + 1L); u32(out, 0)
      u32(out, t.duration)
      u32(out, 0); u32(out, 0) // reserved
      u16(out, 0); u16(out, 0) // layer, alternate_group
      u16(out, if (t.handler == "soun") 0x0100 else 0); u16(out, 0)
      out.write(UnityMatrix)
      u32(out, t.width.toLong << 16)  // 16.16 fixed
      u32(out, t.height.toLong << 16)
      fullBox("tkhd", 0, out.toByteArray)
    }
    val mdhd = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 0); u32(out, 0); u32(out, timescale); u32(out, t.duration)
      u16(out, 0x55c4); u16(out, 0) // language 'und', pre_defined
      fullBox("mdhd", 0, out.toByteArray)
    }
    val hdlr = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 0) // pre_defined
      out.write(t.handler.getBytes("US-ASCII"))
      u32(out, 0); u32(out, 0); u32(out, 0) // reserved
      out.write(0) // empty null-terminated name
      fullBox("hdlr", 0, out.toByteArray)
    }
    val mdia = stbl match {
      case None     => box("mdia", mdhd ++ hdlr)
      case Some(st) => box("mdia", mdhd ++ hdlr ++ box("minf", st))
    }
    box("trak", tkhd ++ mdia)
  }

  /** The video track's sample table: single-chunk stsd/stts/stsc/stsz/
    * stco per ISO/IEC 14496-12 §8.5-8.7 (one 'raw ' sample entry, unit
    * deltas, all samples in chunk 1 at `chunkOffset`). */
  private def stblBox(sizes: Seq[Int], chunkOffset: Long): Array[Byte] = {
    val entry = { // minimal SampleEntry: 6 reserved + data_ref_index 1
      val out = new java.io.ByteArrayOutputStream()
      (0 until 6).foreach(_ => out.write(0)); u16(out, 1)
      box("raw ", out.toByteArray)
    }
    val stsd = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 1); out.write(entry)
      fullBox("stsd", 0, out.toByteArray)
    }
    val stts = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 1); u32(out, sizes.length.toLong); u32(out, 1)
      fullBox("stts", 0, out.toByteArray)
    }
    val stsc = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 1); u32(out, 1); u32(out, sizes.length.toLong); u32(out, 1)
      fullBox("stsc", 0, out.toByteArray)
    }
    val stsz = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 0); u32(out, sizes.length.toLong)
      sizes.foreach(s => u32(out, s.toLong))
      fullBox("stsz", 0, out.toByteArray)
    }
    val stco = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 1); u32(out, chunkOffset)
      fullBox("stco", 0, out.toByteArray)
    }
    box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
  }

  /** Build a PLAYER-SHAPED stream: the metadata skeleton PLUS a real
    * sample table and an mdat carrying `samples` for the FIRST video
    * track. `moovFirst = true` is the "faststart" web layout
    * (ftyp·moov·mdat); `false` is the streaming-capture layout
    * (ftyp·mdat·moov) — the canonical REMUX pair: identical samples,
    * different bytes, which is exactly what content-level video dedup
    * must see through ([[sampleEnergies]] reads stsz/stco, so it is
    * layout-blind by construction). */
  def buildWithSamples(brand: String, timescale: Long,
                       tracks: Seq[Mp4Track], samples: Seq[Array[Byte]],
                       moovFirst: Boolean = true): Array[Byte] = {
    require(brand.length == 4, s"mp4: brand must be 4 chars, got '$brand'")
    require(timescale > 0 && timescale <= 0xffffffffL,
      s"mp4: bad timescale $timescale")
    require(tracks.exists(_.handler == "vide"),
      "mp4: samples need a video track")
    val duration = tracks.map(_.duration).max
    val ftyp = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(brand.getBytes("US-ASCII")); u32(out, 0)
      out.write(brand.getBytes("US-ASCII"))
      box("ftyp", out.toByteArray)
    }
    val mvhd = {
      val out = new java.io.ByteArrayOutputStream()
      u32(out, 0); u32(out, 0)
      u32(out, timescale); u32(out, duration)
      u32(out, 0x00010000L); u16(out, 0x0100); u16(out, 0)
      u32(out, 0); u32(out, 0)
      out.write(UnityMatrix)
      (0 until 6).foreach(_ => u32(out, 0))
      u32(out, tracks.length + 1L)
      fullBox("mvhd", 0, out.toByteArray)
    }
    val mdat = box("mdat", samples.flatten.toArray)
    val sizes = samples.map(_.length)
    def moovAt(chunkOffset: Long): Array[Byte] = {
      var videDone = false
      val traks = tracks.zipWithIndex.map { case (t, i) =>
        val st = if (t.handler == "vide" && !videDone) {
          videDone = true; Some(stblBox(sizes, chunkOffset))
        } else None
        trakBox(t, i, timescale, st)
      }
      box("moov", mvhd ++ traks.flatten.toArray)
    }
    if (moovFirst) {
      // stco needs the mdat payload position, which depends on moov's
      // length — but the length is offset-VALUE independent (u32 fields),
      // so build once with 0 to measure, then with the real offset
      val moovLen = moovAt(0L).length
      val off = ftyp.length.toLong + moovLen + 8 // + mdat header
      ftyp ++ moovAt(off) ++ mdat
    } else {
      val off = ftyp.length.toLong + 8
      ftyp ++ mdat ++ moovAt(off)
    }
  }

  // ------------------------------------------------------------- parse

  private def rdU32(b: Array[Byte], at: Int): Long = {
    require(at + 4 <= b.length, s"mp4: truncated at offset $at")
    ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
      ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
  }
  private def rdU64(b: Array[Byte], at: Int): Long = {
    require(at + 8 <= b.length, s"mp4: truncated at offset $at")
    (rdU32(b, at) << 32) | rdU32(b, at + 4)
  }
  private def typ(b: Array[Byte], at: Int): String = {
    require(at + 4 <= b.length, s"mp4: truncated box type at $at")
    new String(b, at, 4, "US-ASCII")
  }

  /** Walk the top-level (or a container's) child boxes, invoking f with
    * (type, payloadStart, payloadEnd). Loud on malformed sizes. */
  private def walk(b: Array[Byte], from: Int, to: Int)
                  (f: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p < to) {
      require(p + 8 <= to, s"mp4: truncated box header at $p")
      var size = rdU32(b, p)
      val t = typ(b, p + 4)
      var payload = p + 8
      if (size == 1) { size = rdU64(b, p + 8); payload = p + 16 }
      else if (size == 0) size = (to - p).toLong // box extends to end
      require(size >= (payload - p) && p + size <= to,
        s"mp4: box '$t' size $size out of bounds at $p")
      f(t, payload, p + size.toInt)
      p += size.toInt
    }
  }

  /** Parse brand + movie header + per-track metadata. Fails loudly on a
    * non-BMFF stream, a missing moov/mvhd, or any malformed box. */
  def parseMeta(bytes: Array[Byte]): Mp4Meta = {
    require(isMp4(bytes), "mp4: missing ftyp signature")
    var brand = ""
    var timescale = -1L
    var duration = -1L
    val tracks = Seq.newBuilder[Mp4Track]
    walk(bytes, 0, bytes.length) {
      case ("ftyp", s, _) => brand = typ(bytes, s)
      case ("moov", ms, me) =>
        walk(bytes, ms, me) {
          case ("mvhd", s, _) =>
            val v = bytes(s) & 0xff
            if (v == 1) { timescale = rdU32(bytes, s + 20); duration = rdU64(bytes, s + 24) }
            else { timescale = rdU32(bytes, s + 12); duration = rdU32(bytes, s + 16) }
          case ("trak", ts, te) =>
            var w = 0; var h = 0; var tdur = -1L; var handler = ""
            walk(bytes, ts, te) {
              case ("tkhd", s, _) =>
                val v = bytes(s) & 0xff
                val base = if (v == 1) s + 36 else s + 24 // after duration
                tdur = if (v == 1) rdU64(bytes, s + 28) else rdU32(bytes, s + 20)
                val geo = base + 8 + 2 + 2 + 2 + 2 + 36 // rsvd+layer+alt+vol+rsvd+matrix
                w = (rdU32(bytes, geo) >> 16).toInt      // 16.16 fixed
                h = (rdU32(bytes, geo + 4) >> 16).toInt
              case ("mdia", ds, de) =>
                walk(bytes, ds, de) {
                  case ("hdlr", s, _) => handler = typ(bytes, s + 8)
                  case _ =>
                }
              case _ =>
            }
            require(tdur >= 0, "mp4: trak without tkhd")
            require(handler.nonEmpty, "mp4: trak without hdlr")
            tracks += Mp4Track(handler, w, h, tdur)
          case _ =>
        }
      case _ => // free/mdat/udta/...: skip
    }
    require(timescale > 0, "mp4: no moov/mvhd found")
    Mp4Meta(brand, timescale, duration, tracks.result())
  }

  /** Per-sample payload energy of the FIRST video track: walk moov →
    * trak(vide) → mdia/minf/stbl, read stsz sizes + the stco chunk
    * offset, then sum the mdat bytes of each sample. The walk keys on
    * the SAMPLE TABLE, never on box order, so a faststart remux
    * (ftyp·moov·mdat ↔ ftyp·mdat·moov) — different bytes, same samples —
    * produces the IDENTICAL energy profile. Same triage contract as
    * [[graft.multimodal.Mp3.frameEnergies]]: a coarse content
    * fingerprint, not a bitstream decoder. */
  def sampleEnergies(bytes: Array[Byte]): Array[Long] = {
    require(isMp4(bytes), "mp4: missing ftyp signature")
    var sizes: Array[Int] = null
    var chunkOff = -1L
    walk(bytes, 0, bytes.length) {
      case ("moov", ms, me) =>
        walk(bytes, ms, me) {
          case ("trak", ts, te) if sizes == null =>
            var handler = ""
            var sz: Array[Int] = null
            var off = -1L
            walk(bytes, ts, te) {
              case ("mdia", ds, de) =>
                walk(bytes, ds, de) {
                  case ("hdlr", s, _) => handler = typ(bytes, s + 8)
                  case ("minf", fs, fe) =>
                    walk(bytes, fs, fe) {
                      case ("stbl", ss, se) =>
                        walk(bytes, ss, se) {
                          case ("stsz", s, _) =>
                            require(rdU32(bytes, s + 4) == 0,
                              "mp4: constant-size stsz not supported")
                            val n = rdU32(bytes, s + 8).toInt
                            require(n >= 0 && s + 12 + 4L * n <= bytes.length,
                              "mp4: stsz table overruns the stream")
                            sz = Array.tabulate(n) { k =>
                              val v = rdU32(bytes, s + 12 + 4 * k)
                              // a 32-bit size past Int.MaxValue would
                              // truncate NEGATIVE and walk the cursor
                              // backwards — loud, never silently wrong
                              require(v <= Int.MaxValue,
                                s"mp4: stsz entry $k size $v out of range")
                              v.toInt
                            }
                          case ("stco", s, _) =>
                            require(rdU32(bytes, s + 4) == 1,
                              "mp4: single-chunk stco expected")
                            off = rdU32(bytes, s + 8)
                          case _ =>
                        }
                      case _ =>
                    }
                  case _ =>
                }
              case _ =>
            }
            if (handler == "vide" && sz != null) {
              require(off >= 0, "mp4: stsz without stco")
              sizes = sz; chunkOff = off
            }
          case _ =>
        }
      case _ =>
    }
    require(sizes != null, "mp4: no video sample table (stsz) found")
    val out = new Array[Long](sizes.length)
    var p = chunkOff
    var k = 0
    while (k < sizes.length) {
      require(p + sizes(k) <= bytes.length,
        s"mp4: sample $k overruns the stream")
      var e = 0L
      var j = 0
      while (j < sizes(k)) { e += (bytes((p + j).toInt) & 0xff); j += 1 }
      out(k) = e
      p += sizes(k)
      k += 1
    }
    out
  }
}
