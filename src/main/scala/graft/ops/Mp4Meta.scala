package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** MP4 / ISO-BMFF (ISO/IEC 14496-12) container metadata — the video leg of
  * the multimodal plumbing: a scraped .mp4 is an opaque binary column, and
  * the first thing a curation pipeline needs is its brand, timescale,
  * duration, and payload size WITHOUT decoding any codec stream. All of
  * that lives in the box structure — length-prefixed big-endian boxes
  * (`size(4) type(4)`, `size == 1` → 64-bit largesize follows, the >4 GiB
  * form) — so extraction is pure byte arithmetic, the same real-decode
  * posture as the PPM/BMP/WAV/TAR paths.
  *
  * Parsed surface: top-level box walk; `ftyp` → major brand; `moov` →
  * child walk to `mvhd` (BOTH version 0 with 32-bit and version 1 with
  * 64-bit creation/modification/duration fields); `mdat` → payload byte
  * count (header excluded, largesize-aware). A malformed size (< 8 and not
  * the 64-bit escape) or a truncated box stops the walk with
  * `valid = false`, keeping whatever parsed before the damage — one bad
  * tail in a 100 TB scrape degrades that row, never the stage.
  *
  * Scale shape: narrow per-row flatMap-free map; rows parallelize
  * perfectly and nothing shuffles until the caller aggregates.
  */
object Mp4Meta {

  final case class Meta(
      media_id: Long,
      brand: String,
      timescale: Long,
      duration: Long,
      duration_ms: Long,
      n_top_boxes: Long,
      mdat_bytes: Long,
      valid: Boolean)

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def u64(b: Array[Byte], i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** mvhd: version byte selects 32- vs 64-bit time fields. Returns
    * (timescale, duration) or None on truncation. */
  private def mvhd(b: Array[Byte], off: Int, end: Int): Option[(Long, Long)] = {
    if (off + 4 > end) return None
    val version = b(off) & 0xff
    if (version == 1) {
      // ver+flags(4) creation(8) modification(8) timescale(4) duration(8)
      if (off + 32 > end) None
      else Some((u32(b, off + 20), u64(b, off + 24)))
    } else {
      // ver+flags(4) creation(4) modification(4) timescale(4) duration(4)
      if (off + 20 > end) None
      else Some((u32(b, off + 12), u32(b, off + 16)))
    }
  }

  def parse(id: Long, bytes: Array[Byte]): Meta = {
    var off = 0L
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var nTop = 0L
    var mdatBytes = 0L
    var valid = true
    var done = false
    val n = bytes.length.toLong
    while (!done && off < n) {
      if (off + 8 > n) { valid = false; done = true }
      else {
        val size32 = u32(bytes, off.toInt)
        val typ = fourcc(bytes, off.toInt + 4)
        val (size, hdr) =
          if (size32 == 1L) {
            if (off + 16 > n) { valid = false; done = true; (0L, 0L) }
            else (u64(bytes, off.toInt + 8), 16L)
          } else if (size32 == 0L) (n - off, 8L) // box extends to EOF
          else (size32, 8L)
        if (!done) {
          if (size < hdr || off + size > n) { valid = false; done = true }
          else {
            nTop += 1
            typ match {
              case "ftyp" if size >= hdr + 4 =>
                brand = fourcc(bytes, (off + hdr).toInt)
              case "moov" =>
                // child walk for mvhd
                var c = off + hdr
                val end = off + size
                var cdone = false
                while (!cdone && c + 8 <= end) {
                  val csz = u32(bytes, c.toInt)
                  val ctyp = fourcc(bytes, c.toInt + 4)
                  if (csz < 8 || c + csz > end) { valid = false; cdone = true }
                  else {
                    if (ctyp == "mvhd") mvhd(bytes, c.toInt + 8, (c + csz).toInt) match {
                      case Some((ts, dur)) => timescale = ts; duration = dur
                      case None            => valid = false
                    }
                    c += csz
                  }
                }
              case "mdat" => mdatBytes += size - hdr
              case _      => () // skip unknown boxes by size
            }
            off += size
          }
        }
      }
    }
    val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
    Meta(id, brand, timescale, duration, durMs, nTop, mdatBytes, valid)
  }

  /** DataFrame plumbing: (media_id, media BINARY) → one metadata row each.
    * Null blobs parse as empty (0 boxes, valid — nothing was malformed). */
  def meta(media: DataFrame): Dataset[Meta] = {
    implicit val enc = Encoders.product[Meta]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          parse(r.getLong(0), bytes)
        }
      }
  }
}
