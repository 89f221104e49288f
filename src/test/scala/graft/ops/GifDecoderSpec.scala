package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class GifDecoderSpec extends AnyFunSuite {

  // ——— manual container builder (spec-side reference, independent of the
  //     decoder's parsing) ———
  private def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def gif(
      w: Int, h: Int, gctBits: Int, palette: Array[Int], lzwData: Array[Byte],
      minCodeSize: Int = 2, interlace: Boolean = false, withExtension: Boolean = false,
      subBlockSplit: Int = 0, dropTerminator: Boolean = false,
      localColorTable: Boolean = false, localPalette: Array[Int] = null,
      noGlobalTable: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le16(w)); out.write(le16(h))
    if (noGlobalTable) { out.write(0x70); out.write(0); out.write(0) }
    else {
      out.write(0x80 | 0x70 | (gctBits - 1)); out.write(0); out.write(0)
      palette.foreach { rgb =>
        out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
      }
    }
    if (withExtension) { // Graphic Control Extension: label F9, 4 data bytes
      out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 0, 0, 0, 0))
    }
    out.write(0x2c)
    out.write(le16(0)); out.write(le16(0)); out.write(le16(w)); out.write(le16(h))
    val lctBits = if (localPalette != null) {
      var b = 1; while ((2 << (b - 1)) < localPalette.length) b += 1; b
    } else 1
    out.write((if (interlace) 0x40 else 0) |
      (if (localColorTable || localPalette != null) 0x80 | (lctBits - 1) else 0))
    if (localPalette != null) {
      // pad to the declared 2^lctBits entries
      val full = localPalette ++ Array.fill((2 << (lctBits - 1)) - localPalette.length)(0)
      full.foreach { rgb =>
        out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
      }
    }
    out.write(minCodeSize)
    if (subBlockSplit > 0 && subBlockSplit < lzwData.length) {
      out.write(subBlockSplit); out.write(lzwData, 0, subBlockSplit)
      out.write(lzwData.length - subBlockSplit)
      out.write(lzwData, subBlockSplit, lzwData.length - subBlockSplit)
    } else {
      out.write(lzwData.length); out.write(lzwData, 0, lzwData.length)
    }
    if (!dropTerminator) out.write(0)
    out.write(0x3b)
    out.toByteArray
  }

  // Reference LZW bit-packer: codes with explicit widths, LSB-first.
  private def pack(codes: Seq[(Int, Int)]): Array[Byte] = {
    val bits = codes.flatMap { case (v, width) => (0 until width).map(t => (v >> t) & 1) }
    bits.grouped(8).map(g => g.zipWithIndex.map { case (b, t) => b << t }.sum.toByte).toArray
  }

  private val pal4 = Array(0x000000, 0x5511aa, 0xaa5511, 0xffee33)

  test("literal stream with interleaved clears decodes; extension and sub-block split are transparent") {
    // CLEAR p0 CLEAR p1 ... CLEAR p7 EOI, all 3-bit (clears stop dict growth)
    val pixels = Array.tabulate(8)(i => (i * 5 + 3) % 4)
    val codes = pixels.flatMap(p => Seq((4, 3), (p, 3))) :+ ((5, 3))
    val data = pack(codes.toIndexedSeq)
    for ((split, ext) <- Seq((0, false), (4, true))) {
      GifDecoder.decode(gif(4, 2, 2, pal4, data, subBlockSplit = split, withExtension = ext)) match {
        case Some(g) =>
          assert((g.width, g.height, g.nColors) == (4, 2, 4))
          assert(g.indexes.map(_ & 0xff).toSeq == pixels.toSeq, s"split=$split")
          assert(g.palette.toSeq == pal4.toSeq)
        case None => fail(s"split=$split ext=$ext did not decode")
      }
    }
  }

  test("KwKwK growth run with a back-reference and a code-width bump decodes") {
    // CLEAR v 6 7 6 EOI — 6 arrives as the not-yet-defined next code (KwKwK),
    // 7 likewise, then the dictionary hits 8 entries so the width bumps to 4
    // bits and the SECOND 6 is a back-reference read at the new width.
    // Expansion: [v] [v,v] [v,v,v] [v,v] = 8 copies of v.
    for (v <- 0 until 4) {
      val codes = Seq((4, 3), (v, 3), (6, 3), (7, 3), (6, 4), (5, 4))
      GifDecoder.decode(gif(8, 1, 2, pal4, pack(codes))) match {
        case Some(g) =>
          assert((g.width, g.height) == (8, 1))
          assert(g.indexes.map(_ & 0xff).toSeq == Seq.fill(8)(v), s"v=$v")
        case None => fail(s"v=$v did not decode")
      }
    }
  }

  test("interlaced stream lands rows at their four-pass positions") {
    // 2×5 image: stream row order under GIF89a appendix E is [0, 4, 2, 1, 3].
    // Stream pixel pair for stream-row k is (k, k+1) mod 4, so each decoded
    // row identifies which stream row it came from.
    val streamPixels = (0 until 5).flatMap(k => Seq(k % 4, (k + 1) % 4))
    val codes = streamPixels.flatMap(p => Seq((4, 3), (p, 3))) :+ ((5, 3))
    GifDecoder.decode(gif(2, 5, 2, pal4, pack(codes), interlace = true)) match {
      case Some(g) =>
        val rows = g.indexes.map(_ & 0xff).grouped(2).toSeq
        val expectRow = Map(0 -> 0, 4 -> 1, 2 -> 2, 1 -> 3, 3 -> 4) // y -> stream k
        for (y <- 0 until 5) {
          val k = expectRow(y)
          assert(rows(y).toSeq == Seq(k % 4, (k + 1) % 4), s"row $y")
        }
      case None => fail("interlaced gif did not decode")
    }
  }

  test("cross-validation against the JDK ImageIO GIF codec (real encoder streams)") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 6) {
      val w = 17 + trial * 3; val h = 11 + trial
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = trial % 3 match {
          case 0 => ((x * 28) << 16) | ((y * 36) << 8) | ((x + y) * 15) // gradient → long runs
          case 1 => rnd.nextInt(1 << 24)                               // noise → literal-heavy
          case _ => if (x < w / 2) 0xff0000 else 0x0000ff              // two runs per row
        }
        img.setRGB(x, y, rgb)
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", out), "no JDK gif writer")
      val bytes = out.toByteArray
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      GifDecoder.decode(bytes) match {
        case Some(g) =>
          assert((g.width, g.height) == (w, h), s"trial $trial header")
          for (y <- 0 until h; x <- 0 until w) {
            val idx = g.indexes(y * w + x) & 0xff
            assert((g.palette(idx) | 0xff000000) == ref.getRGB(x, y), s"trial $trial px ($x,$y)")
          }
        case None => fail(s"trial $trial: ImageIO-encoded gif did not decode")
      }
    }
  }

  test("a local color table overrides the global; no-global + local decodes") {
    val pixels = Array.tabulate(8)(i => i % 4)
    val codes = pixels.flatMap(p => Seq((4, 3), (p, 3))) :+ ((5, 3))
    val data = pack(codes.toIndexedSeq)
    val localPal = Array(0x101010, 0x202020, 0x303030, 0x404040)
    // global table present but the image's LOCAL table must win
    val withBoth = gif(4, 2, 2, pal4, data, localPalette = localPal)
    val d1 = GifDecoder.decode(withBoth).get
    assert(d1.palette.toSeq == localPal.toSeq && d1.nColors == 4)
    assert(d1.indexes.map(_.toInt).toSeq == pixels.toSeq)
    // no global table at all: decodes via the local one (a real scraped-GIF
    // population the global-only scope used to route to the fake decoder)
    val localOnly = gif(4, 2, 2, pal4, data, localPalette = localPal,
      noGlobalTable = true)
    val d2 = GifDecoder.decode(localOnly).get
    assert(d2.palette.toSeq == localPal.toSeq)
    assert(d2.indexes.map(_.toInt).toSeq == pixels.toSeq)
    // no global AND no local: colorless — None
    val colorless = gif(4, 2, 2, pal4, data, noGlobalTable = true)
    assert(GifDecoder.decode(colorless).isEmpty)
    // cross-validation: the JDK ImageIO reader resolves the same RGB pixels
    // from the hand-built local-table stream
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(withBoth))
    assert(img != null)
    val got = for (y <- 0 until 2; x <- 0 until 4)
      yield img.getRGB(x, y) & 0xffffff
    assert(got == pixels.map(localPal).toSeq)
  }

  test("violations degrade to None, never throw") {
    val pixels = Array.tabulate(8)(i => i % 4)
    val codes = pixels.flatMap(p => Seq((4, 3), (p, 3))) :+ ((5, 3))
    val data = pack(codes.toIndexedSeq)
    val good = gif(4, 2, 2, pal4, data)
    assert(GifDecoder.decode(good).nonEmpty)
    assert(GifDecoder.decode(good.take(10)).isEmpty)                  // truncated header
    assert(GifDecoder.decode(good.take(good.length - 6)).isEmpty)     // truncated stream
    // local-table flag set but blob ends before the declared table
    val flagged = gif(4, 2, 2, pal4, Array.emptyByteArray, localColorTable = true)
    val cut = flagged.take(flagged.indexOf(0x2c.toByte) + 10 + 3) // mid-table
    assert(GifDecoder.decode(cut).isEmpty)
    assert(GifDecoder.decode(gif(4, 2, 2, pal4, data, dropTerminator = true)).isEmpty)
    // truncated mid-stream: plane under-filled even though codes parse
    val shortCodes = pixels.take(4).flatMap(p => Seq((4, 3), (p, 3))) :+ ((5, 3))
    assert(GifDecoder.decode(gif(4, 2, 2, pal4, pack(shortCodes.toIndexedSeq))).isEmpty)
    // reference beyond the dictionary (code 9 was never defined)
    val wild = Seq((4, 3), (1, 3), (6, 3), (7, 3), (9, 4), (5, 4))
    assert(GifDecoder.decode(gif(9, 1, 2, pal4, pack(wild))).isEmpty)
    // palette overrun: a 2-color table with an index-3 literal
    val pal2 = Array(0x000000, 0xffffff)
    val over = Seq((4, 3), (3, 3), (5, 3))
    assert(GifDecoder.decode(gif(1, 1, 1, pal2, pack(over))).isEmpty)
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    // the DecoderFuzzSpec discipline: corruption may reject or still
    // decode, but must RETURN, never throw
    val pixels = Array.tabulate(8)(i => (i * 5 + 3) % 4)
    val codes = pixels.flatMap(p => Seq((4, 3), (p, 3))) :+ ((5, 3))
    val good = gif(4, 2, 2, pal4, pack(codes.toIndexedSeq),
      subBlockSplit = 4, withExtension = true)
    def dec(b: Array[Byte]): Any = GifDecoder.decode(b)
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
