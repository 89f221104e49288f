package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala OGG (RFC 3533) page walker — the audio CONTAINER leg next to
  * the payload decoders ([[FlacFrames]], [[Mp3Frames]]): capture-pattern
  * scan, the 27-byte page header (version 0, header-type flags
  * continued/BOS/EOS, 64-bit granule position, serial, sequence), the
  * lacing-value segment table (255 = packet continues, <255 terminates),
  * and the page CRC — CRC-32 with polynomial 0x04C11DB7, init 0, NO
  * reflection, NO final xor (OGG's variant differs from zlib's crc32 in
  * all three), computed over the whole page with the CRC field zeroed.
  *
  * Scope mirrors the other container walks: pages are validated and
  * summarized (flags, granule, packet count, payload checksum) — payload
  * CODEC decode belongs to the payload decoders. A page with a bad capture
  * pattern, version, CRC, or truncated segment table is SKIPPED (the walk
  * resyncs on the next capture pattern): one damaged page in a 100 TB
  * scrape must degrade to its own loss, not kill the stream's remaining
  * pages.
  *
  * Reference behavior coverage: `/root/reference` stores media only as
  * opaque ids (no decode path); this operator exists for the engine's
  * multimodal north star, not reference parity.
  */
object OggPages {

  final case class OggPage(
      media_id: Long, page_seq: Long, serial: Long, granule: Long,
      is_bos: Boolean, is_eos: Boolean, is_continued: Boolean,
      n_packets: Int, payload_len: Int, payload_sum: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def le64(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | u8(b, i + k); k -= 1 }
    v
  }

  /** OGG CRC-32: poly 0x04C11DB7, init 0, unreflected, no final xor. */
  private val CrcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n << 24
    var k = 0
    while (k < 8) { c = if ((c & 0x80000000) != 0) (c << 1) ^ 0x04c11db7 else c << 1; k += 1 }
    c
  }

  def crc(bytes: Array[Byte], from: Int, until: Int, zeroFrom: Int, zeroUntil: Int): Long = {
    var c = 0
    var i = from
    while (i < until) {
      val b = if (i >= zeroFrom && i < zeroUntil) 0 else u8(bytes, i)
      c = (c << 8) ^ CrcTable(((c >>> 24) ^ b) & 0xff)
      i += 1
    }
    c.toLong & 0xffffffffL
  }

  def decode(mediaId: Long, bytes: Array[Byte]): Seq[OggPage] = {
    if (bytes == null) return Seq.empty
    val out = Seq.newBuilder[OggPage]
    var i = 0
    while (i + 27 <= bytes.length) {
      val isCapture = bytes(i) == 'O' && bytes(i + 1) == 'g' &&
        bytes(i + 2) == 'g' && bytes(i + 3) == 'S'
      if (!isCapture) i += 1
      else {
        val pageOk: Option[Int] = {
          if (u8(bytes, i + 4) != 0) None // version
          else {
            val nSegs = u8(bytes, i + 26)
            val segTableEnd = i + 27 + nSegs
            if (segTableEnd > bytes.length) None
            else {
              var payloadLen = 0
              var s = 0
              while (s < nSegs) { payloadLen += u8(bytes, i + 27 + s); s += 1 }
              val pageEnd = segTableEnd + payloadLen
              if (pageEnd > bytes.length) None
              else {
                val crcRead = le32(bytes, i + 22)
                if (crc(bytes, i, pageEnd, i + 22, i + 26) != crcRead) None
                else {
                  val flags = u8(bytes, i + 5)
                  var nPackets = 0
                  var sum = 0L
                  var j = segTableEnd
                  while (j < pageEnd) { sum += u8(bytes, j); j += 1 }
                  s = 0
                  while (s < nSegs) {
                    if (u8(bytes, i + 27 + s) < 255) nPackets += 1
                    s += 1
                  }
                  out += OggPage(mediaId,
                    page_seq = le32(bytes, i + 18),
                    serial = le32(bytes, i + 14),
                    granule = le64(bytes, i + 6),
                    is_bos = (flags & 2) != 0,
                    is_eos = (flags & 4) != 0,
                    is_continued = (flags & 1) != 0,
                    n_packets = nPackets,
                    payload_len = payloadLen,
                    payload_sum = sum)
                  Some(pageEnd)
                }
              }
            }
          }
        }
        i = pageOk.getOrElse(i + 1) // bad page: resync after this capture byte
      }
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → page rows; damaged
    * pages degrade to their own loss, the walk resyncs. */
  def pages(media: DataFrame): Dataset[OggPage] = {
    implicit val enc = Encoders.product[OggPage]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(row.getLong(0), bytes)
        }
      }
  }
}
