package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TiffDecoderSpec extends AnyFunSuite {

  // ——— manual container builder (spec-side reference, independent of both
  //     the decoder's parsing and x168's SQL hex assembly) ———
  private final class Writer(le: Boolean) {
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit =
      if (le) { u8(v); u8(v >> 8) } else { u8(v >> 8); u8(v) }
    def u32(v: Long): Unit =
      if (le) { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
      else { u8((v >> 24).toInt); u8((v >> 16).toInt); u8((v >> 8).toInt); u8(v.toInt) }
    def bytes(b: Array[Byte]): Unit = out.write(b)
    def result: Array[Byte] = out.toByteArray
  }

  /** entries: (tag, type, count, value) — value inline (left-justified)
    * when it fits, caller supplies trailing arrays/data itself. */
  private def tiff(
      le: Boolean,
      entries: Seq[(Int, Int, Long, Long)],
      tail: Array[Byte]): Array[Byte] = {
    val w = new Writer(le)
    if (le) { w.u8('I'); w.u8('I') } else { w.u8('M'); w.u8('M') }
    w.u16(42); w.u32(8)
    w.u16(entries.size)
    entries.foreach { case (tag, typ, cnt, value) =>
      w.u16(tag); w.u16(typ); w.u32(cnt)
      if (typ == 3 && cnt == 1) { w.u16(value.toInt); w.u16(0) }
      else w.u32(value)
    }
    w.u32(0)
    w.bytes(tail)
    w.result
  }

  private def grayEntries(wd: Int, ht: Int, comp: Int, rps: Int,
      dataOff: Long, count: Long): Seq[(Int, Int, Long, Long)] = Seq(
    (256, 3, 1L, wd.toLong), (257, 3, 1L, ht.toLong), (258, 3, 1L, 8L),
    (259, 3, 1L, comp.toLong), (262, 3, 1L, 1L), (273, 4, 1L, dataOff),
    (277, 3, 1L, 1L), (278, 3, 1L, rps.toLong), (279, 4, 1L, count))

  // 9 entries → data starts at 8 + 2 + 108 + 4 = 122
  private val DataOff = 122L

  private def px(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  private def sums(pixels: Array[Byte]): (Long, Long) = {
    var s = 0L; var ws = 0L
    pixels.zipWithIndex.foreach { case (p, i) =>
      s += (p & 0xff); ws += (p & 0xff).toLong * (i + 1)
    }
    (s, ws)
  }

  test("uncompressed, both byte orders, identical stats") {
    val pixels = px(6, 4)((x, y) => (x * 40 + y * 7) % 256)
    val (s, ws) = sums(pixels)
    for (le <- Seq(true, false)) {
      val img = tiff(le, grayEntries(6, 4, 1, 4, DataOff, 24), pixels)
      val d = TiffDecoder.decode(1, img).get
      assert(d.byte_order === (if (le) "II" else "MM"))
      assert((d.width, d.height, d.compression, d.n_strips) === ((6, 4, 1, 1)))
      assert((d.sum_px, d.wsum_px) === ((s, ws)))
    }
  }

  test("PackBits: literal, run, and -128 noop opcodes (the gate never sends noop)") {
    // rows of w=4, h=2: row0 literal [10,20,30,40], row1 run 4×200, with a
    // noop (-128) injected between them
    val data = Array[Byte](
      3, 10, 20, 30, 40, // literal 4
      -128, // noop
      -3, 200.toByte) // run of 4
    val img = tiff(le = true, grayEntries(4, 2, 32773, 2, DataOff, data.length),
      data)
    val d = TiffDecoder.decode(1, img).get
    val expect = Array[Byte](10, 20, 30, 40, 200.toByte, 200.toByte, 200.toByte, 200.toByte)
    val (s, ws) = sums(expect)
    assert((d.sum_px, d.wsum_px) === ((s, ws)))
  }

  test("multi-strip big-endian with offset-stored strip arrays") {
    // 4×4, RowsPerStrip 2 → 2 strips of 8 bytes; arrays after the IFD
    val pixels = px(4, 4)((x, y) => x + y * 16)
    val (s, ws) = sums(pixels)
    // IFD ends at 122; offsets array 122..129, counts array 130..137, data 138
    val entries = Seq(
      (256, 3, 1L, 4L), (257, 3, 1L, 4L), (258, 3, 1L, 8L),
      (259, 3, 1L, 1L), (262, 3, 1L, 1L), (273, 4, 2L, 122L),
      (277, 3, 1L, 1L), (278, 3, 1L, 2L), (279, 4, 2L, 130L))
    val w = new Writer(false)
    w.u32(138); w.u32(146) // strip offsets
    w.u32(8); w.u32(8) // strip byte counts
    w.bytes(pixels)
    val img = tiff(le = false, entries, w.result)
    val d = TiffDecoder.decode(1, img).get
    assert(d.n_strips === 2)
    assert((d.sum_px, d.wsum_px) === ((s, ws)))
  }

  test("degrade routes: bad magic, bad version, truncated IFD, strip out of bounds, short strip, PackBits overrun, unsupported bps/compression") {
    val good = tiff(le = true, grayEntries(4, 2, 1, 2, DataOff, 8),
      px(4, 2)((x, y) => x + y))
    assert(TiffDecoder.decode(1, good).isDefined)
    assert(TiffDecoder.decode(1, "XX".getBytes ++ good.drop(2)).isEmpty)
    val badVer = good.clone(); badVer(2) = 43; assert(TiffDecoder.decode(1, badVer).isEmpty)
    assert(TiffDecoder.decode(1, good.take(20)).isEmpty)
    // strip offset beyond EOF
    val far = tiff(le = true, grayEntries(4, 2, 1, 2, 100000L, 8), Array[Byte]())
    assert(TiffDecoder.decode(1, far).isEmpty)
    // uncompressed byte count != rows*width
    val short = tiff(le = true, grayEntries(4, 2, 1, 2, DataOff, 7),
      px(4, 2)((x, y) => x))
    assert(TiffDecoder.decode(1, short).isEmpty)
    // PackBits that overruns the declared output
    val over = tiff(le = true, grayEntries(4, 2, 32773, 2, DataOff, 2L),
      Array[Byte](-9, 5)) // run of 10 > 8 pixels
    assert(TiffDecoder.decode(1, over).isEmpty)
    // 16-bit samples routed
    val deep = tiff(le = true, grayEntries(4, 2, 1, 2, DataOff, 8)
      .map { case (258, t, c, _) => (258, t, c, 16L); case e => e },
      px(4, 2)((x, y) => x))
    assert(TiffDecoder.decode(1, deep).isEmpty)
    // LZW (5) not in baseline scope → routed
    val lzw = tiff(le = true, grayEntries(4, 2, 5, 2, DataOff, 8),
      px(4, 2)((x, y) => x))
    assert(TiffDecoder.decode(1, lzw).isEmpty)
  }

  test("cross-validation: javax.imageio TIFF writer round-trips through the decoder") {
    val wd = 23; val ht = 11
    val bi = new java.awt.image.BufferedImage(wd, ht,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = bi.getRaster
    for (y <- 0 until ht; x <- 0 until wd) raster.setSample(x, y, 0, (x * 13 + y * 31) % 256)
    val expected = px(wd, ht)((x, y) => (x * 13 + y * 31) % 256)
    val (s, ws) = sums(expected)
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    assume(writers.hasNext, "JDK TIFF writer unavailable")
    val writer = writers.next()
    for (comp <- Seq(None, Some("PackBits"))) {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      comp.foreach { c =>
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionType(c)
      }
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
      ios.close()
      val d = TiffDecoder.decode(7, bos.toByteArray)
      assert(d.isDefined, s"JDK TIFF (${comp.getOrElse("none")}) should decode")
      assert((d.get.width, d.get.height) === ((wd, ht)))
      assert((d.get.sum_px, d.get.wsum_px) === ((s, ws)),
        s"pixel checksums under ${comp.getOrElse("none")}")
    }
    writer.dispose()
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    val pixels = px(4, 3)((x, y) => x + y * 16)
    val good = tiff(le = true, grayEntries(4, 3, 1, 3, DataOff, 12), pixels)
    def dec(b: Array[Byte]): Any = TiffDecoder.decode(0L, b)
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
    // and the big-endian twin's header region
    val goodBe = tiff(le = false, grayEntries(4, 3, 1, 3, DataOff, 12), pixels)
    for (i <- goodBe.indices) {
      val mut = goodBe.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      probe(s"be flip=$i")(TiffDecoder.decode(0L, mut))
    }
  }
}
