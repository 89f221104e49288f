package graft.ops

import graft.SparkSpec

class Mp4SamplesSpec extends SparkSpec {

  // ——— spec-side container writer, independent of the walker ———
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  /** ftyp + moov/trak/mdia/minf/stbl{stsz,stco} + mdat holding `samples`.
    * perSampleChunks=false writes ONE stco entry (consecutive layout). */
  private def container(samples: Seq[Array[Byte]],
      perSampleChunks: Boolean): Array[Byte] = {
    val ftyp = box("ftyp", "mjpg".getBytes("US-ASCII") ++ be32(0))
    val stszPayload = be32(0) ++ be32(0) ++ be32(samples.length.toLong) ++
      samples.flatMap(s => be32(s.length.toLong)).toArray
    val stsz = box("stsz", stszPayload)
    // offsets depend on total moov size, which depends on stco size — fixed
    // point is easy since both layouts have known entry counts
    val nCo = if (perSampleChunks) samples.length else 1
    val stcoLen = 8 + 8 + 4 * nCo
    val stblLen = 8 + stsz.length + stcoLen
    val moovLen = 8 * 4 + stblLen // moov, trak, mdia, minf headers
    val mdatPayloadStart = ftyp.length + moovLen + 8
    val offsets = samples.scanLeft(mdatPayloadStart.toLong)(_ + _.length).init
    val stcoPayload = be32(0) ++
      (if (perSampleChunks) be32(nCo.toLong) ++ offsets.flatMap(be32)
       else be32(1L) ++ be32(offsets.head))
    val stco = box("stco", stcoPayload)
    val moov = box("moov", box("trak", box("mdia", box("minf",
      box("stbl", stsz ++ stco)))))
    val mdat = box("mdat", samples.flatten.toArray)
    ftyp ++ moov ++ mdat
  }

  private def realJpeg(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 16 + y * 4) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("locates samples in both chunk layouts and decodes real ImageIO JPEGs") {
    val jpegs = Seq(realJpeg(16, 8), realJpeg(8, 8))
    for (perSample <- Seq(true, false)) {
      val fs = Mp4Samples.frames(5L, container(jpegs, perSample))
      assert(fs.map(f => (f.sample_idx, f.decode_ok, f.width, f.height)) == Seq(
        (0L, true, Some(16L), Some(8L)), (1L, true, Some(8L), Some(8L))))
      assert(fs.map(_.sample_size) == jpegs.map(_.length.toLong))
      // offsets really locate the samples: re-slicing reproduces the bytes
      fs.zip(jpegs).foreach { case (f, j) =>
        val blob = container(jpegs, perSample)
        val got = blob.slice(f.sample_offset.toInt,
          (f.sample_offset + f.sample_size).toInt)
        assert(got.toSeq == j.toSeq)
      }
    }
  }

  test("a damaged sample flags its frame; the rest decode") {
    val good = realJpeg(8, 8)
    val bad = good.clone(); bad(0) = 0x00 // break SOI
    val fs = Mp4Samples.frames(0L, container(Seq(bad, good), perSampleChunks = true))
    assert(fs.map(f => (f.sample_idx, f.decode_ok)) == Seq((0L, false), (1L, true)))
  }

  test("an offset past the blob flags the frame instead of throwing") {
    val good = realJpeg(8, 8)
    val blob = container(Seq(good, good), perSampleChunks = true)
    val truncated = blob.dropRight(good.length) // second sample gone
    val fs = Mp4Samples.frames(0L, truncated)
    assert(fs.map(f => (f.sample_idx, f.decode_ok)) == Seq((0L, true), (1L, false)))
  }

  test("no sample table, truncated stsz, and unsupported stsc layouts yield zero rows") {
    assert(Mp4Samples.frames(0L, Array.emptyByteArray).isEmpty)
    val good = realJpeg(8, 8)
    val blob = container(Seq(good), perSampleChunks = true)
    // cut inside stsz payload
    val stszAt = blob.indexOfSlice("stsz".getBytes("US-ASCII"))
    assert(Mp4Samples.frames(0L, blob.take(stszAt + 8)).isEmpty)
    // stco with 2 entries for 1 sample: neither supported layout
    val twoCo = {
      val jpegs = Seq(good)
      val ftyp = box("ftyp", "mjpg".getBytes("US-ASCII") ++ be32(0))
      val stsz = box("stsz", be32(0) ++ be32(0) ++ be32(1L) ++ be32(good.length.toLong))
      val stco = box("stco", be32(0) ++ be32(2L) ++ be32(100L) ++ be32(200L))
      val moov = box("moov", box("trak", box("mdia", box("minf",
        box("stbl", stsz ++ stco)))))
      ftyp ++ moov ++ box("mdat", jpegs.flatten.toArray)
    }
    assert(Mp4Samples.frames(0L, twoCo).isEmpty)
  }

  test("multi-trak: stsz and stco are never spliced across traks") {
    val good = realJpeg(8, 8)
    // trak 1: stbl with ONLY an stsz (claims one sample of a bogus size);
    // trak 2: complete stsz+stco pair locating the real sample. Taking the
    // first stsz and first stco found ANYWHERE would pair trak 1's size
    // with trak 2's offset — a plausible-looking wrong slice.
    val ftyp = box("ftyp", "mjpg".getBytes("US-ASCII") ++ be32(0))
    val bogusStsz = box("stsz", be32(0) ++ be32(0) ++ be32(1L) ++ be32(7L))
    val trak1 = box("trak", box("mdia", box("minf", box("stbl", bogusStsz))))
    val realStsz = box("stsz", be32(0) ++ be32(0) ++ be32(1L) ++ be32(good.length.toLong))
    def moovWith(stco: Array[Byte]) = box("moov", trak1 ++
      box("trak", box("mdia", box("minf", box("stbl", realStsz ++ stco)))))
    // fixed point: mdat payload position depends only on sizes, not offset value
    val probe = moovWith(box("stco", be32(0) ++ be32(1L) ++ be32(0L)))
    val mdatStart = ftyp.length + probe.length + 8
    val moov = moovWith(box("stco", be32(0) ++ be32(1L) ++ be32(mdatStart.toLong)))
    val blob = ftyp ++ moov ++ box("mdat", good)
    val fs = Mp4Samples.frames(9L, blob)
    assert(fs.map(f => (f.sample_idx, f.sample_size, f.decode_ok, f.width)) ==
      Seq((0L, good.length.toLong, true, Some(8L))),
      "sizes must come from the SAME stbl as the offsets")
  }

  test("mjpegFrames() explodes blobs and survives null media") {
    import spark.implicits._
    val blob = container(Seq(realJpeg(8, 8)), perSampleChunks = false)
    val df = Seq((1L, Option(blob)), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = Mp4Samples.mjpegFrames(df).collect().toSeq
    assert(rows.map(f => (f.media_id, f.sample_idx, f.decode_ok)) == Seq((1L, 0L, true)))
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    val good = container(Seq(realJpeg(8, 8), realJpeg(16, 8)),
      perSampleChunks = true)
    def dec(b: Array[Byte]): Any = Mp4Samples.frames(0L, b)
    def probe(tag: String)(body: => Any): Unit =
      try { body; () } catch {
        case e: Throwable =>
          fail(s"$tag threw ${e.getClass.getName}: ${e.getMessage}")
      }
    for (cut <- 0 until good.length)
      probe(s"cut=$cut")(dec(java.util.Arrays.copyOf(good, cut)))
    for (i <- good.indices) {
      val mut = good.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      probe(s"flip=$i")(dec(mut))
    }
  }
}
