package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array.fill[Byte](250)(7)),
    (2L, "short".getBytes("UTF-8")))
    .toDF("media_id", "media")

  test("extractMeta: typed metadata from binary columns, stable checksum") {
    val out = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out(0).n_bytes == 250 && out(1).n_bytes == 5)
    assert(out(0).width >= 16 && out(0).height >= 16)
    assert(out(0).checksum.matches("[0-9a-f]{32}"))
    // deterministic across runs
    val again = Multimodal.extractMeta(media).collect().sortBy(_.media_id)
    assert(out.map(_.checksum).toSeq == again.map(_.checksum).toSeq)
  }

  test("sampleFrames: one frame per 100 bytes, stride respected, fixed-width features") {
    val frames = Multimodal.sampleFrames(media, stride = 1).collect()
    assert(frames.count(_.media_id == 1L) == 2) // 250 bytes → 2 full frames
    assert(frames.count(_.media_id == 2L) == 0) // 5 bytes → none
    assert(frames.forall(_.feature.length == 4))
    val strided = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(strided.count(_.media_id == 1L) == 1)
  }

  // hand-built valid blobs: these formats are parseable with pure byte
  // arithmetic, so HeaderDecoder decodes them FOR REAL (no codec library)
  private def ppmBlob(w: Int, h: Int): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ Array.fill[Byte](w * h * 3)(100)

  private def bmpBlob(w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val bb = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)              // reserved, pixel-data offset
      .putInt(40).putInt(w).putInt(h)    // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    (0 until dataSize).foreach(i => bb.put((i % 251).toByte))
    bb.array()
  }

  private def wavBlob(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * 2 * channels
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRate).putInt(sampleRate * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
      .put("data".getBytes).putInt(dataSize)
    (0 until nSamples * channels).foreach(i =>
      bb.putShort((math.sin(i / 10.0) * 16384).toShort)) // a real sine wave
    bb.array()
  }

  test("HeaderDecoder: PPM/BMP/WAV decoded for real; junk falls back to fake") {
    val d = Multimodal.HeaderDecoder
    assert(d.decode(ppmBlob(20, 10)) == (("image/ppm", 20, 10)))
    assert(d.decode(bmpBlob(13, 7)) == (("image/bmp", 13, 7)))
    assert(d.decode(wavBlob(44100, 2, 500)) == (("audio/wav", 44100, 2)))
    // corrupt/unknown blobs must not throw — a 100 TB scrape has bad rows
    assert(d.decode("garbage".getBytes)._1.startsWith("img/fake"))
    assert(d.decode("P6\nnot numbers".getBytes)._1.startsWith("img/fake"))
    assert(d.decode(Array.empty[Byte])._1.startsWith("img/fake"))
    // truncated BMP (magic only) falls back instead of reading past the end
    assert(d.decode(Array[Byte]('B', 'M', 1, 2))._1.startsWith("img/fake"))
    // hostile BMP: negative pixel-data offset must fall back, not crash,
    // in BOTH halves of the Decoder contract
    val evil = bmpBlob(4, 4)
    evil(10) = 0; evil(11) = 0; evil(12) = 0; evil(13) = 0x80.toByte
    assert(d.decode(evil)._1.startsWith("img/fake"))
    assert(d.frameFeature(evil, 0).length == 4) // fake path, no AIOOBE
    // float WAV (format tag 3): real s16le interpretation would be garbage —
    // must be classified fake, and both halves must agree
    val floatWav = wavBlob(8000, 1, 100)
    floatWav(20) = 3
    assert(d.decode(floatWav)._1.startsWith("img/fake"))
    assert(d.frameFeature(floatWav, 0).toSeq ==
      Multimodal.FakeDecoder.frameFeature(floatWav, 0).toSeq)
    // unparseable PPM header: frameFeature mirrors decode()'s fake routing
    val badPpm = "P6\nnot numbers at all".getBytes("US-ASCII")
    assert(d.frameFeature(badPpm, 0).toSeq ==
      Multimodal.FakeDecoder.frameFeature(badPpm, 0).toSeq)
    // negative frame index on a valid blob: empty window, not a crash
    assert(d.frameFeature(ppmBlob(8, 8), -1).toSeq == Seq(0f, 0f, 0f, 0f))
    // 16-bit PPM (maxval > 255): 2-byte samples would be misread as bytes —
    // must route to the fake, in both halves of the contract
    val ppm16 = ("P6\n8 8\n65535\n" + "x" * 384).getBytes("US-ASCII")
    assert(d.decode(ppm16)._1.startsWith("img/fake"))
    assert(d.frameFeature(ppm16, 0).toSeq ==
      Multimodal.FakeDecoder.frameFeature(ppm16, 0).toSeq)
    // non-Windows / non-raw BMPs pass the magic but dims live at different
    // offsets (OS/2 core header) or the payload isn't raw bytes (RLE8,
    // 32bpp) — all must fall back rather than report wrong dims/features
    val os2 = bmpBlob(13, 7); os2(14) = 12            // BITMAPCOREHEADER
    val bpp32 = bmpBlob(13, 7); bpp32(28) = 32        // 32bpp
    val rle = bmpBlob(13, 7); rle(30) = 1             // BI_RLE8
    // zero-dimension BMP (valid DIB/bpp/compression, width field = 0):
    // decode falls back, and frameFeature must mirror that classification
    val wzero = bmpBlob(13, 7); wzero(18) = 0; wzero(19) = 0; wzero(20) = 0; wzero(21) = 0
    Seq(os2, bpp32, rle, wzero).foreach { b =>
      assert(d.decode(b)._1.startsWith("img/fake"))
      assert(d.frameFeature(b, 0).toSeq ==
        Multimodal.FakeDecoder.frameFeature(b, 0).toSeq)
    }
  }

  private def jpegBlob(w: Int, h: Int, nc: Int, comLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(xs: Int*): Unit = xs.foreach(x => out.write(x & 0xff))
    b(0xff, 0xd8)                                      // SOI
    b(0xff, 0xfe, (2 + comLen) >> 8, (2 + comLen) & 0xff) // COM, variable length
    (0 until comLen).foreach(_ => b('J'))
    b(0xff, 0xc0, 0, 8 + 3 * nc, 8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) // SOF0
    (1 to nc).foreach(c => b(c, 0x11, 0))
    b(0xff, 0xda, 0, 2)                                // SOS
    out.toByteArray
  }

  private def mp3Frame(bri: Int, sri: Int, pad: Int, mode: Int): Array[Byte] =
    Array(0xff, 0xfb, (bri << 4) | (sri << 2) | (pad << 1), mode << 6,
      0xde, 0xad, 0xbe, 0xef).map(_.toByte)

  private def id3Wrapped(tagLen: Int, frame: Array[Byte]): Array[Byte] =
    "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, tagLen.toByte) ++
      Array.fill[Byte](tagLen)(0) ++ frame

  test("HeaderDecoder: JPEG dims from SOF behind a marker walk; bad shapes fake") {
    val d = Multimodal.HeaderDecoder
    // SOF0 sits behind a variable-length COM chunk: the walk must skip it
    assert(d.decode(jpegBlob(640, 480, 3, 5)) == (("image/jpeg", 640, 480)))
    assert(d.decode(jpegBlob(31, 997, 1, 1)) == (("image/jpeg", 31, 997)))
    // SOS before any SOF: no parseable frame header → fake
    assert(d.decode(Array(0xff, 0xd8, 0xff, 0xda, 0, 2).map(_.toByte))._1
      .startsWith("img/fake"))
    // truncated: COM length runs past the end → fake, no AIOOBE
    assert(d.decode(Array(0xff, 0xd8, 0xff, 0xfe, 0x7f, 0x00).map(_.toByte))._1
      .startsWith("img/fake"))
    // 12-bit precision SOF is out of scope → fake
    val prec12 = jpegBlob(64, 64, 3, 2)
    prec12(2 + 4 + 2 + 4) = 12 // precision byte inside SOF0
    assert(d.decode(prec12)._1.startsWith("img/fake"))
    // metadata is real but frame features need the entropy decoder → fake
    val j = jpegBlob(64, 64, 3, 2)
    assert(d.frameFeature(j, 0).toSeq ==
      Multimodal.FakeDecoder.frameFeature(j, 0).toSeq)
  }

  test("HeaderDecoder: MP3 frame header incl. ID3v2 skip; reserved shapes fake") {
    val d = Multimodal.HeaderDecoder
    // raw MPEG-1 Layer III frames: sample-rate table + channel mode
    assert(d.decode(mp3Frame(9, 0, 0, 0)) == (("audio/mp3", 44100, 2)))
    assert(d.decode(mp3Frame(14, 1, 1, 3)) == (("audio/mp3", 48000, 1)))
    assert(d.decode(mp3Frame(1, 2, 0, 2)) == (("audio/mp3", 32000, 2)))
    // frame behind an ID3v2 tag (syncsafe size)
    assert(d.decode(id3Wrapped(17, mp3Frame(9, 2, 0, 3))) == (("audio/mp3", 32000, 1)))
    // free-format bitrate, reserved bitrate, reserved sample rate → fake
    assert(d.decode(mp3Frame(0, 0, 0, 0))._1.startsWith("img/fake"))
    assert(d.decode(mp3Frame(15, 0, 0, 0))._1.startsWith("img/fake"))
    assert(d.decode(mp3Frame(9, 3, 0, 0))._1.startsWith("img/fake"))
    // corrupt syncsafe size (bit 7 set) → fake, not a wild offset read
    val badSync = id3Wrapped(17, mp3Frame(9, 0, 0, 0))
    badSync(9) = 0x80.toByte
    assert(d.decode(badSync)._1.startsWith("img/fake"))
    // ID3 tag whose declared size runs past the end → fake, no AIOOBE
    assert(d.decode(id3Wrapped(100, Array.emptyByteArray))._1.startsWith("img/fake"))
    // MPEG-2 sync (version bits 10) is out of scope → fake
    val v2 = mp3Frame(9, 0, 0, 0); v2(1) = 0xf3.toByte
    assert(d.decode(v2)._1.startsWith("img/fake"))
  }

  test("HeaderDecoder: WAV data chunk found behind a LIST chunk") {
    val base = wavBlob(8000, 1, 100)
    // splice a LIST chunk (12 bytes: id + size + 4-byte payload) before data
    val bb = java.nio.ByteBuffer.allocate(base.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(base, 0, 36)                      // RIFF header + fmt chunk
      .put("LIST".getBytes).putInt(4).put("INFO".getBytes)
      .put(base, 36, base.length - 36)       // original data chunk
    val wav = bb.array()
    assert(Multimodal.HeaderDecoder.decode(wav) == (("audio/wav", 8000, 1)))
    // features come from the REAL data payload, matching the un-spliced file
    assert(Multimodal.HeaderDecoder.frameFeature(wav, 0).toSeq ==
      Multimodal.HeaderDecoder.frameFeature(base, 0).toSeq)
  }

  test("HeaderDecoder features: real PCM/pixel stats, normalized and deterministic") {
    val d = Multimodal.HeaderDecoder
    val wav = wavBlob(8000, 1, 1000)
    val f0 = d.frameFeature(wav, 0)
    assert(f0.length == 4 && f0.forall(v => v >= 0f && v <= 1f))
    // a ±0.5-amplitude sine: mean ~0.5 after [0,1] mapping, max > mean > min
    assert(math.abs(f0(0) - 0.5f) < 0.1f && f0(3) > f0(0) && f0(2) < f0(0))
    assert(f0.toSeq == d.frameFeature(wav, 0).toSeq) // deterministic
    val ppm = ppmBlob(16, 16)
    val pf = d.frameFeature(ppm, 0)
    // constant-100 pixels → mean = rms = min = max = 100/255
    assert(math.abs(pf(0) - 100f / 255f) < 1e-4 && pf.distinct.length == 1)
    // past-the-end frame index yields the empty-window zero vector
    assert(d.frameFeature(ppm, 1000).toSeq == Seq(0f, 0f, 0f, 0f))
  }

  test("HeaderDecoder composes with the Spark plumbing end to end") {
    val df = Seq((1L, ppmBlob(8, 8)), (2L, wavBlob(16000, 1, 400)), (3L, "x".getBytes))
      .toDF("media_id", "media")
    val meta = Multimodal.extractMeta(df, Multimodal.HeaderDecoder)
      .collect().sortBy(_.media_id)
    assert(meta(0).format == "image/ppm" && meta(0).width == 8)
    assert(meta(1).format == "audio/wav" && meta(1).width == 16000 && meta(1).height == 1)
    assert(meta(2).format.startsWith("img/fake"))
    val frames = Multimodal.sampleFrames(df, stride = 1, frameBytes = 100,
      decoder = Multimodal.HeaderDecoder).collect()
    assert(frames.nonEmpty && frames.forall(_.feature.length == 4))
  }

  // Builds a REAL PNG with the JDK Deflater (genuinely compressed stream,
  // not the stored blocks the x36 SQL builders use — so the decoder is
  // proven on both encodings) and real CRC-32s.
  private def pngBytes(
      w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filterType: Byte = 0, corruptCrc: Boolean = false): Array[Byte] = {
    val bpp = if (colorType == 2) 3 else 1
    val stride = 1 + w * bpp
    val raw = new Array[Byte](h * stride)
    for (r <- 0 until h) {
      raw(r * stride) = filterType
      System.arraycopy(pixels, r * w * bpp, raw, r * stride + 1, w * bpp)
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = defl.deflate(buf)
    defl.end()
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream()
    def chunk(tag: String, data: Array[Byte], corrupt: Boolean = false): Unit = {
      out.write(be32(data.length.toLong))
      val td = tag.getBytes("US-ASCII") ++ data
      out.write(td)
      val c = new java.util.zip.CRC32(); c.update(td)
      out.write(be32(c.getValue ^ (if (corrupt) 255L else 0L)))
    }
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk("IHDR", be32(w.toLong) ++ be32(h.toLong) ++ Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", buf.take(n), corrupt = corruptCrc)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("Png.decode: real inflate + unfilter round-trips gray and RGB pixels") {
    val gray = Array.tabulate[Byte](3 * 2)(i => (i * 40 + 5).toByte)
    Multimodal.Png.decode(pngBytes(3, 2, 0, gray)) match {
      case Some((w, h, d, ct, pix)) =>
        assert((w, h, d, ct) == (3, 2, 8, 0) && pix.toSeq == gray.toSeq)
      case None => fail("gray png did not decode")
    }
    val rgb = Array.tabulate[Byte](2 * 2 * 3)(i => (250 - i * 17).toByte)
    Multimodal.Png.decode(pngBytes(2, 2, 2, rgb)) match {
      case Some((w, h, d, ct, pix)) =>
        assert((w, h, d, ct) == (2, 2, 8, 2) && pix.toSeq == rgb.toSeq)
      case None => fail("rgb png did not decode")
    }
    assert(Multimodal.HeaderDecoder.decode(pngBytes(3, 2, 0, gray)) == ("image/png", 3, 2))
  }

  test("Png.decode: all four non-trivial filters reconstruct against a reference filterer") {
    // Forward-filter known pixels with each filter type (the ENCODER
    // direction, implemented here independently per RFC 2083 §6), then
    // assert the decoder's reconstruction inverts it exactly.
    for (ft <- 1 to 4; (ctype, bpp) <- Seq((0, 1), (2, 3))) {
      val w = 5; val h = 4
      val pix = Array.tabulate[Byte](w * h * bpp)(i => ((i * 37 + 11) % 256).toByte)
      val rowBytes = w * bpp
      val filtered = new Array[Byte](pix.length)
      for (r <- 0 until h; i <- 0 until rowBytes) {
        val x = pix(r * rowBytes + i) & 0xff
        val a = if (i >= bpp) pix(r * rowBytes + i - bpp) & 0xff else 0
        val b = if (r > 0) pix((r - 1) * rowBytes + i) & 0xff else 0
        val c = if (r > 0 && i >= bpp) pix((r - 1) * rowBytes + i - bpp) & 0xff else 0
        val pred = ft match {
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        filtered(r * rowBytes + i) = ((x - pred) & 0xff).toByte
      }
      Multimodal.Png.decode(pngBytes(w, h, ctype, filtered, filterType = ft.toByte)) match {
        case Some((dw, dh, _, dct, out)) =>
          assert((dw, dh, dct) == (w, h, ctype) && out.toSeq == pix.toSeq,
            s"filter $ft colorType $ctype")
        case None => fail(s"filter $ft colorType $ctype did not decode")
      }
    }
  }

  test("Png.decode: cross-validation against the JDK ImageIO codec (adaptive filters)") {
    // ImageIO's PNG writer picks filters adaptively per row; gradient rows
    // favor Sub/Up/Paeth, noise favors None — so round-tripping both
    // through ImageIO's ENCODER and comparing our decode against ImageIO's
    // own DECODER exercises whatever real filter mix a production encoder
    // emits, with no knowledge of which was chosen.
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 6) {
      val w = 9 + trial; val h = 7
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = trial % 3 match {
          case 0 => ((x * 28) << 16) | ((y * 36) << 8) | ((x + y) * 15) // gradient
          case 1 => rnd.nextInt(1 << 24)                               // noise
          case _ => if ((x + y) % 2 == 0) 0xffffff else 0              // checker
        }
        img.setRGB(x, y, rgb)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      val bytes = out.toByteArray
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      Multimodal.Png.decode(bytes) match {
        case Some((dw, dh, _, ctype, pix)) =>
          assert((dw, dh, ctype) == (w, h, 2), s"trial $trial header")
          for (y <- 0 until h; x <- 0 until w) {
            val rgb = ref.getRGB(x, y)
            val o = (y * w + x) * 3
            assert((pix(o) & 0xff) == ((rgb >> 16) & 0xff)
              && (pix(o + 1) & 0xff) == ((rgb >> 8) & 0xff)
              && (pix(o + 2) & 0xff) == (rgb & 0xff), s"trial $trial px ($x,$y)")
          }
        case None => fail(s"trial $trial: ImageIO-encoded png did not decode")
      }
    }
  }

  test("Png.decode: corrupt CRC, out-of-spec filter byte, and truncation all fall back, never throw") {
    val gray = Array.tabulate[Byte](3 * 2)(i => i.toByte)
    val good = pngBytes(3, 2, 0, gray)
    assert(Multimodal.Png.decode(pngBytes(3, 2, 0, gray, corruptCrc = true)).isEmpty)
    assert(Multimodal.Png.decode(pngBytes(3, 2, 0, gray, filterType = 5)).isEmpty)
    assert(Multimodal.Png.decode(good.take(20)).isEmpty)
    assert(Multimodal.Png.decode(good.take(40)).isEmpty)
    // bad zlib: flip a byte INSIDE the IDAT payload and fix up its CRC so
    // only the inflate/Adler layer can catch it
    val idatStart = 8 + 25
    val bad = good.clone()
    bad(idatStart + 8 + 2) = (bad(idatStart + 8 + 2) ^ 0x55).toByte
    val dataLen = ((bad(idatStart) & 0xff) << 24) | ((bad(idatStart + 1) & 0xff) << 16) |
      ((bad(idatStart + 2) & 0xff) << 8) | (bad(idatStart + 3) & 0xff)
    val c = new java.util.zip.CRC32(); c.update(bad, idatStart + 4, 4 + dataLen)
    val v = c.getValue
    bad(idatStart + 8 + dataLen) = ((v >> 24) & 0xff).toByte
    bad(idatStart + 9 + dataLen) = ((v >> 16) & 0xff).toByte
    bad(idatStart + 10 + dataLen) = ((v >> 8) & 0xff).toByte
    bad(idatStart + 11 + dataLen) = (v & 0xff).toByte
    assert(Multimodal.Png.decode(bad).isEmpty)
  }

  test("Png.decode: a valid-CRC header bomb (huge dims) degrades instead of overflowing/allocating") {
    // craft sig + IHDR(40000x40000, rgb) + IEND with CORRECT CRCs and no
    // IDAT — only the size cap can reject it, and it must return None
    // rather than throw NegativeArraySizeException or allocate ~4 GiB
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    for ((tag, data) <- Seq(
        "IHDR" -> (be32(40000L) ++ be32(40000L) ++ Array[Byte](8, 2, 0, 0, 0)),
        "IEND" -> Array.emptyByteArray)) {
      out.write(be32(data.length.toLong))
      val td = tag.getBytes("US-ASCII") ++ data
      out.write(td)
      val c = new java.util.zip.CRC32(); c.update(td)
      out.write(be32(c.getValue))
    }
    assert(Multimodal.Png.decode(out.toByteArray).isEmpty)
  }

  test("pngMeta: a null media blob degrades to the fake row, never an NPE") {
    val gray = Array.tabulate[Byte](2 * 2)(i => (i * 60).toByte)
    val df = Seq((1L, pngBytes(2, 2, 0, gray)), (2L, null: Array[Byte]))
      .toDF("media_id", "media")
    val out = Multimodal.pngMeta(df).collect().sortBy(_.media_id)
    assert(out(0).format == "image/png-gray")
    assert(out(1).format.startsWith("img/fake") && out(1).bit_depth.isEmpty)
  }

  test("pngMeta: real rows carry pixel hex, fallback rows carry fake dims + null depth") {
    val gray = Array.tabulate[Byte](2 * 2)(i => (i * 60).toByte)
    val df = Seq(
      (1L, pngBytes(2, 2, 0, gray)),
      (2L, pngBytes(2, 2, 0, gray, corruptCrc = true))).toDF("media_id", "media")
    val out = Multimodal.pngMeta(df).collect().sortBy(_.media_id)
    assert(out(0).format == "image/png-gray" && out(0).bit_depth.contains(8L))
    assert(out(0).pixel_hex.contains(gray.map("%02X".format(_)).mkString))
    assert(out(1).format.startsWith("img/fake") && out(1).bit_depth.isEmpty)
    assert(out(1).width == 25L && out(1).height == 32L) // FakeDecoder on 0x89,'P'
  }

  test("sliceFrames: exact byte windows, codegen-native plan (no mapPartitions)") {
    val bytes = (0 until 250).map(_.toByte).toArray
    val df = Seq((1L, bytes)).toDF("media_id", "media")
    val out = Multimodal.sliceFrames(df, 100).orderBy("frame_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Array[Byte]]("frame").toSeq == bytes.slice(0, 100).toSeq)
    assert(out(1).getAs[Array[Byte]]("frame").toSeq == bytes.slice(100, 200).toSeq)
    // stays inside whole-stage codegen: no SerializeFromObject / DeserializeToObject
    val plan = Multimodal.sliceFrames(df, 100).queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && plan.contains("Generate"), plan)
  }

  test("pcm16Samples: real two's-complement parse, LIST-chunk walk, classification parity") {
    val d = Multimodal.HeaderDecoder
    // known samples round-trip exactly, sign included
    val vals = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val bb = java.nio.ByteBuffer.allocate(44 + vals.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + vals.length * 2).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(vals.length * 2)
    vals.foreach(bb.putShort)
    val wav = bb.array()
    assert(d.pcm16Samples(wav).get.toSeq == vals.map(_.toInt).toSeq)
    // a data chunk behind a LIST chunk is still found (real chunk walk)
    val spliced = java.nio.ByteBuffer.allocate(wav.length + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(wav, 0, 36).put("LIST".getBytes).putInt(4).put("INFO".getBytes)
      .put(wav, 36, wav.length - 36).array()
    assert(d.pcm16Samples(spliced).get.toSeq == vals.map(_.toInt).toSeq)
    // a corrupt odd-length data chunk drops the trailing byte, never misreads
    val odd = wav.clone(); odd(40) = (vals.length * 2 - 1).toByte
    assert(d.pcm16Samples(odd).get.length == vals.length - 1)
    // classification parity with decode(): null / junk / non-PCM yield None
    assert(d.pcm16Samples(null).isEmpty)
    assert(d.pcm16Samples("junk".getBytes).isEmpty)
    val float32 = wav.clone(); float32(20) = 3 // IEEE-float format tag
    assert(d.pcm16Samples(float32).isEmpty)
  }

  test("pcmFeatures: integer-exact features, corrupt rows degrade to valid=false") {
    // samples chosen so every feature is hand-checkable:
    //   5, -3, 0, -3  →  sum_sq = 25+9+0+9 = 43, peak = 5,
    //   crossings at 5→-3, -3→0, and 0→-3 (0 counts as non-negative) = 3
    val vals = Array[Short](5, -3, 0, -3)
    val bb = java.nio.ByteBuffer.allocate(44 + vals.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + vals.length * 2).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(vals.length * 2)
    vals.foreach(bb.putShort)
    val df = Seq((1L, bb.array()), (2L, "nope".getBytes), (3L, null))
      .toDF("media_id", "media")
    val out = Multimodal.pcmFeatures(df).collect().sortBy(_.media_id)
    assert(out(0) == Multimodal.PcmFeatures(1L, valid = true, 4L, 43L, 5L, 3L))
    assert(out(1) == Multimodal.PcmFeatures(2L, valid = false, 0L, 0L, 0L, 0L))
    assert(out(2) == Multimodal.PcmFeatures(3L, valid = false, 0L, 0L, 0L, 0L))
  }
}
