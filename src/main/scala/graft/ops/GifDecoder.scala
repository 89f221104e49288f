package graft.ops

/** Pure-Scala GIF (87a/89a) decoder — the LZW entropy-coding companion to
  * [[JpegDecoder]] (Huffman) and [[Multimodal.Png]] (DEFLATE via the JDK):
  * variable-width little-endian code reading, dictionary growth with the
  * KwKwK (code == next-free) special case, clear-code resets, the 12-bit
  * code-size ceiling with deferred-clear tolerance, and data sub-block
  * reassembly are all implemented from the GIF89a specification (no codec
  * library exists for this in the JDK below javax.imageio, which the spec
  * suite uses only as a CROSS-VALIDATOR).
  *
  * Scope mirrors the other real decoders: first image block decoded,
  * extensions skipped (sub-block walk), four-pass interlace supported (the
  * JDK's own GIF writer interlaces by default), global AND local color
  * tables (a local table overrides the global for its image; a GIF with no
  * global table decodes when its image carries a local one — a real
  * population in scraped corpora), full-frame image only. Anything else —
  * and any stream-level violation (truncated codes, reference past the
  * dictionary, output overrun/underrun, index outside the palette) —
  * returns None so a caller routes to [[Multimodal.FakeDecoder]]: one bad
  * blob in a 100 TB scrape must degrade, not kill the stage.
  *
  * Reference behavior coverage: `/root/reference` stores media only as
  * opaque ids (no decode path); this operator exists for the engine's
  * multimodal north star, not reference parity.
  */
object GifDecoder {

  /** `palette(i)` is 0xRRGGBB; `indexes` is the row-major color-index
    * plane (one byte per pixel). */
  final case class Decoded(
      width: Int, height: Int, nColors: Int,
      palette: Array[Int], indexes: Array[Byte])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && {
      val s = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      s == "GIF89a" || s == "GIF87a"
    }

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (!isGif(bytes) || bytes.length < 13) return None
    val sw = le16(bytes, 6); val sh = le16(bytes, 8)
    val packed = u8(bytes, 10)
    // Global color table is OPTIONAL when the image carries a local one.
    val hasGlobal = (packed & 0x80) != 0
    val nGlobal = if (hasGlobal) 2 << (packed & 7) else 0
    if (13 + nGlobal * 3 > bytes.length) return None
    val globalPalette: Array[Int] =
      if (hasGlobal) Array.tabulate(nGlobal)(k =>
        (u8(bytes, 13 + k * 3) << 16) | (u8(bytes, 14 + k * 3) << 8) | u8(bytes, 15 + k * 3))
      else null
    var i = 13 + nGlobal * 3
    // Block walk: skip extensions, decode the first image descriptor.
    while (i < bytes.length) {
      u8(bytes, i) match {
        case 0x21 => // extension introducer: label byte + data sub-blocks
          i += 2
          while (i < bytes.length && u8(bytes, i) != 0) i += 1 + u8(bytes, i)
          if (i >= bytes.length) return None
          i += 1 // block terminator
        case 0x2c =>
          if (i + 10 > bytes.length) return None
          val ix = le16(bytes, i + 1); val iy = le16(bytes, i + 3)
          val iw = le16(bytes, i + 5); val ih = le16(bytes, i + 7)
          val ipacked = u8(bytes, i + 9)
          if (ix != 0 || iy != 0 || iw != sw || ih != sh) return None // sub-frame out of scope
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26)) return None // size cap
          // A local color table (GIF89a §20) overrides the global for this
          // image and sits between the descriptor and the LZW data.
          val hasLocal = (ipacked & 0x80) != 0
          val nLocal = if (hasLocal) 2 << (ipacked & 7) else 0
          if (i + 10 + nLocal * 3 > bytes.length) return None
          val palette: Array[Int] =
            if (hasLocal) Array.tabulate(nLocal)(k =>
              (u8(bytes, i + 10 + k * 3) << 16) | (u8(bytes, i + 11 + k * 3) << 8) |
                u8(bytes, i + 12 + k * 3))
            else globalPalette
          if (palette == null) return None // neither table: indexes are colorless
          val nColors = if (hasLocal) nLocal else nGlobal
          return lzw(bytes, i + 10 + nLocal * 3, iw, ih, nColors).map { ind =>
            val plane = if ((ipacked & 0x40) != 0) deinterlace(ind, iw, ih) else ind
            Decoded(iw, ih, nColors, palette, plane)
          }
        case 0x3b => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** GIF89a appendix E four-pass interlace: stream rows arrive in pass
    * order (every 8th from 0, every 8th from 4, every 4th from 2, every
    * 2nd from 1) and land at their true y. */
  private def deinterlace(ind: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](ind.length)
    var src = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(ind, src * w, out, y * w, w)
        src += 1; y += step
      }
    }
    out
  }

  /** LZW decode starting at the min-code-size byte; returns exactly
    * `w*h` color indexes or None on any stream violation. */
  private def lzw(bytes: Array[Byte], start: Int, w: Int, h: Int, nColors: Int): Option[Array[Byte]] = {
    if (start >= bytes.length) return None
    val minCode = u8(bytes, start)
    if (minCode < 2 || minCode > 8) return None
    // reassemble data sub-blocks (len byte + payload, 0 terminates)
    val data = new java.io.ByteArrayOutputStream()
    var j = start + 1
    while (j < bytes.length && u8(bytes, j) != 0) {
      val n = u8(bytes, j)
      if (j + 1 + n > bytes.length) return None
      data.write(bytes, j + 1, n)
      j += 1 + n
    }
    if (j >= bytes.length) return None // missing terminator
    val d = data.toByteArray

    val clear = 1 << minCode; val eoi = clear + 1
    val maxCodes = 4096
    val prefix = new Array[Int](maxCodes)
    val suffix = new Array[Byte](maxCodes)
    val codeLen = new Array[Int](maxCodes)
    def resetDict(): Int = {
      var c = 0
      while (c < clear) { prefix(c) = -1; suffix(c) = c.toByte; codeLen(c) = 1; c += 1 }
      clear + 2
    }
    def firstByte(c0: Int): Byte = {
      var c = c0
      while (prefix(c) >= 0) c = prefix(c)
      suffix(c)
    }
    val nPix = w * h
    val out = new Array[Byte](nPix)
    var outPos = 0
    def emit(code: Int): Boolean = {
      val len = codeLen(code)
      if (outPos + len > nPix) return false
      var c = code; var k = outPos + len - 1
      while (c >= 0) { out(k) = suffix(c); k -= 1; c = prefix(c) }
      outPos += len
      true
    }
    var nextFree = resetDict()
    var codeSize = minCode + 1
    var bitPos = 0
    val nBits = d.length * 8
    var prev = -1
    var done = false
    while (!done) {
      if (bitPos + codeSize > nBits) return None // truncated stream
      // little-endian bit order: LSB of each byte first
      var code = 0; var t = 0
      while (t < codeSize) {
        val bi = bitPos + t
        if (((d(bi >> 3) >> (bi & 7)) & 1) != 0) code |= 1 << t
        t += 1
      }
      bitPos += codeSize
      if (code == clear) {
        nextFree = resetDict(); codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) return None // first code after reset must be a literal
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > nextFree || (code >= clear && code < clear + 2)) return None
        if (code < nextFree) {
          if (nextFree < maxCodes) {
            prefix(nextFree) = prev; suffix(nextFree) = firstByte(code)
            codeLen(nextFree) = codeLen(prev) + 1
            nextFree += 1
          } // dict full: deferred-clear convention, keep decoding
          if (!emit(code)) return None
          prev = code
        } else { // code == nextFree: the KwKwK case — entry defined by itself
          if (nextFree >= maxCodes) return None
          prefix(nextFree) = prev; suffix(nextFree) = firstByte(prev)
          codeLen(nextFree) = codeLen(prev) + 1
          nextFree += 1
          if (!emit(nextFree - 1)) return None
          prev = nextFree - 1
        }
        if (nextFree == (1 << codeSize) && codeSize < 12) codeSize += 1
      }
    }
    if (outPos != nPix) return None // under-filled plane
    var k = 0
    while (k < nPix) { if ((out(k) & 0xff) >= nColors) return None; k += 1 }
    Some(out)
  }
}
