package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala baseline-TIFF decoder — the IFD-walking companion to
  * [[GifDecoder]] (LZW) and [[JpegDecoder]] (Huffman): BOTH byte orders
  * ("II" little- and "MM" big-endian — TIFF is the one legacy image format
  * where endianness is data, not convention), the tag directory walk with
  * inline vs offset-stored values (a count-1 SHORT/LONG lives in the value
  * field itself; arrays live behind a file offset), multi-strip layout via
  * RowsPerStrip, and the two baseline grayscale compressions: none (1) and
  * PackBits (32773, the TIFF-6 run-length scheme: header n in [0,127]
  * copies n+1 literals, n in [-127,-1] repeats the next byte 1-n times,
  * -128 is a noop). Implemented from the public TIFF 6.0 specification.
  *
  * Scope mirrors the other real decoders: 8-bit single-sample grayscale
  * (SamplesPerPixel 1, BitsPerSample 8), first IFD only. Anything else —
  * and any structural violation (bad magic, entry or strip out of bounds,
  * PackBits output overrun/underrun, missing required tag) — returns None
  * so a caller routes to [[Multimodal.FakeDecoder]]: one bad blob in a
  * 100 TB scrape must degrade, not kill the stage.
  *
  * Reference behavior coverage: `/root/reference` stores media only as
  * opaque ids (no decode path); this operator exists for the engine's
  * multimodal north star, not reference parity.
  */
object TiffDecoder {

  /** Decoded stats row: pixel checksums rather than the plane itself (the
    * catalog consumers aggregate; byte_order/compression expose which
    * decode path ran). `wsum_px` is the position-weighted checksum
    * sum(px_i * (i+1)) over the row-major plane — any re-ordering,
    * dropped strip, or mis-decoded run changes it. */
  final case class TiffImage(
      media_id: Long, byte_order: String, width: Int, height: Int,
      compression: Int, n_strips: Int, sum_px: Long, wsum_px: Long)

  private final class Reader(b: Array[Byte], le: Boolean) {
    def u8(i: Int): Int = b(i) & 0xff
    def u16(i: Int): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (le) (u8(i).toLong) | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) |
        (u8(i + 2).toLong << 8) | u8(i + 3).toLong
  }

  def decode(mediaId: Long, bytes: Array[Byte]): Option[TiffImage] = {
    if (bytes == null || bytes.length < 8) return None
    val le = bytes(0) == 'I' && bytes(1) == 'I'
    val be = bytes(0) == 'M' && bytes(1) == 'M'
    if (!le && !be) return None
    val r = new Reader(bytes, le)
    if (r.u16(2) != 42) return None
    val ifd = r.u32(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = r.u16(ifd.toInt)
    val entriesEnd = ifd + 2 + n * 12L
    if (entriesEnd + 4 > bytes.length) return None

    var width, height = -1
    var bps = -1 // BitsPerSample is required below
    var spp = 1 // SamplesPerPixel defaults to 1 per TIFF 6.0
    var compression = 1
    var rowsPerStrip = -1
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null

    // A value that fits 4 bytes is inline (left-justified in the value
    // field, regardless of byte order); larger arrays sit behind an offset.
    def values(entry: Int): Option[Array[Long]] = {
      val typ = r.u16(entry + 2)
      val cnt = r.u32(entry + 4)
      if (cnt < 1 || cnt > 65535) return None
      val w = typ match { case 3 => 2; case 4 => 4; case _ => return None }
      val total = w * cnt
      val base = if (total <= 4) entry + 8L else r.u32(entry + 8)
      if (base < 0 || base + total > bytes.length) return None
      Some(Array.tabulate(cnt.toInt) { i =>
        val at = (base + i.toLong * w).toInt
        if (typ == 3) r.u16(at).toLong else r.u32(at)
      })
    }

    var i = 0
    while (i < n) {
      val e = (ifd + 2 + i * 12L).toInt
      val tag = r.u16(e)
      def one: Option[Long] = values(e).flatMap(_.headOption)
      tag match {
        case 256 => width = one.getOrElse(-1L).toInt
        case 257 => height = one.getOrElse(-1L).toInt
        case 258 => bps = one.getOrElse(-1L).toInt
        case 259 => compression = one.getOrElse(-1L).toInt
        case 273 => stripOffsets = values(e).orNull
        case 277 => spp = one.getOrElse(-1L).toInt
        case 278 => rowsPerStrip = one.getOrElse(-1L).toInt
        case 279 => stripCounts = values(e).orNull
        case _   => () // photometric, resolution, etc. — not needed for stats
      }
      i += 1
    }

    if (width <= 0 || height <= 0 || bps != 8 || spp != 1) return None
    if (compression != 1 && compression != 32773) return None
    if (stripOffsets == null || stripCounts == null ||
      stripOffsets.length != stripCounts.length) return None
    if (rowsPerStrip <= 0) rowsPerStrip = height
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    if (stripOffsets.length != nStrips) return None

    var sum = 0L
    var wsum = 0L
    var pixelIdx = 0L
    var strip = 0
    while (strip < nStrips) {
      val off = stripOffsets(strip)
      val len = stripCounts(strip)
      if (off < 0 || len < 0 || off + len > bytes.length) return None
      val rows = math.min(rowsPerStrip, height - strip * rowsPerStrip)
      val expect = rows.toLong * width
      if (compression == 1) {
        if (len != expect) return None
        var j = 0
        while (j < len) {
          val px = r.u8((off + j).toInt)
          sum += px; pixelIdx += 1; wsum += px * pixelIdx
          j += 1
        }
      } else { // PackBits
        var in = off
        val end = off + len
        var outn = 0L
        while (in < end && outn < expect) {
          val h = bytes(in.toInt) // SIGNED header byte
          in += 1
          if (h >= 0) {
            val cnt = h + 1
            if (in + cnt > end || outn + cnt > expect) return None
            var j = 0
            while (j < cnt) {
              val px = r.u8((in + j).toInt)
              sum += px; pixelIdx += 1; wsum += px * pixelIdx
              j += 1
            }
            in += cnt; outn += cnt
          } else if (h != -128) {
            val cnt = 1 - h
            if (in >= end || outn + cnt > expect) return None
            val px = r.u8(in.toInt)
            in += 1
            var j = 0
            while (j < cnt) {
              sum += px; pixelIdx += 1; wsum += px * pixelIdx
              j += 1
            }
            outn += cnt
          } // -128: noop
        }
        if (outn != expect) return None
      }
      strip += 1
    }

    Some(TiffImage(mediaId, if (le) "II" else "MM", width, height,
      compression, nStrips, sum, wsum))
  }

  /** DataFrame plumbing: (media_id, media BINARY) → decoded stats rows;
    * undecodable blobs degrade to no row. */
  def images(media: DataFrame): Dataset[TiffImage] = {
    implicit val enc = Encoders.product[TiffImage]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(row.getLong(0), bytes)
        }
      }
  }
}
