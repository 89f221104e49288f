package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Perceptual image hashing for near-duplicate image detection — the
  * image-side twin of the text near-dup family (x01–x06): images whose
  * pixels differ slightly (re-encode, metadata strip, single-pixel edits)
  * collapse onto the same 64-bit difference hash, so corpus-level image
  * dedup is a hash-groupBy exactly like x01.
  *
  * dHash definition (all-integer, so cross-engine bit-exact):
  *  - sample a 9×8 luminance grid by NEAREST NEIGHBOR: the source pixel of
  *    grid cell (gx, gy) is (⌊gx·w/9⌋, ⌊gy·h/8⌋). Nearest-neighbor rather
  *    than block averaging keeps every intermediate an exact integer (no
  *    rounding-mode drift between engines) while preserving the hash's
  *    tolerance to off-grid pixel noise;
  *  - luminance = (299·R + 587·G + 114·B) div 1000 (integer BT.601);
  *  - bit (gy·8 + gx) is set iff lum(gx+1, gy) > lum(gx, gy);
  *  - rendered as 16 lowercase hex chars (two's-complement unsigned).
  *
  * Scale: one narrow mapPartitions over the blobs (the [[Multimodal]]
  * decode posture) — per-image work is O(72) byte reads regardless of
  * image size, and the downstream dedup is a hash aggregate.
  */
object ImageHash {

  final case class ImageDHash(media_id: Long, valid: Boolean, dhash: String)

  /** 9×8 nearest-neighbor dHash of a binary P6 PPM (maxval ≤ 255);
    * None when the blob is not such a PPM or is truncated. */
  def dhashPpm(b: Array[Byte]): Option[String] = {
    if (b == null || b.length < 2 || b(0) != 'P' || b(1) != '6') return None
    Multimodal.HeaderDecoder.ppmHeader(b).flatMap { case (w, h, off) =>
      if (b.length < off + w * h * 3) None
      else {
        def lum(x: Int, y: Int): Int = {
          val p = off + (y * w + x) * 3
          (299 * (b(p) & 0xff) + 587 * (b(p + 1) & 0xff) + 114 * (b(p + 2) & 0xff)) / 1000
        }
        var hash = 0L
        var gy = 0
        while (gy < 8) {
          val sy = gy * h / 8
          var gx = 0
          while (gx < 8) {
            if (lum((gx + 1) * w / 9, sy) > lum(gx * w / 9, sy))
              hash |= 1L << (gy * 8 + gx)
            gx += 1
          }
          gy += 1
        }
        Some(f"$hash%016x")
      }
    }
  }

  /** (media_id, media) → (media_id, valid, dhash). Undecodable blobs yield
    * valid=false with an empty hash instead of throwing — the 100 TB
    * corrupt-row posture of [[Multimodal.PcmFeatures]]. */
  def dhashes(media: DataFrame): Dataset[ImageDHash] = {
    implicit val enc = Encoders.product[ImageDHash]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val id = r.getLong(0)
          dhashPpm(r.getAs[Array[Byte]](1)) match {
            case Some(hx) => ImageDHash(id, valid = true, hx)
            case None     => ImageDHash(id, valid = false, "")
          }
        }
      }
  }
}
