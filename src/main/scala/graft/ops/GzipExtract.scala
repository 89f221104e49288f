package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multi-member GZIP extraction (RFC 1952) — the compression wrapper the
  * crawl world actually ships: Common Crawl WARCs are CONCATENATED gzip
  * members (one per record) so consumers can split archives on member
  * boundaries without decompressing the whole file. This op walks members:
  * header (magic 1F 8B, CM=8, FLG with the FNAME bit honored, MTIME/XFL/OS,
  * NUL-terminated name), raw-DEFLATE body via the JDK Inflater, then the
  * CRC32 + ISIZE trailer, verified against the inflated bytes. Zero codec
  * libraries — `java.util.zip` end to end (the PNG/ZIP posture).
  *
  * A member whose trailer does not match is FLAGGED (`crc_ok = false`) and
  * the walk continues at the next member — `Inflater.getBytesRead` gives
  * the exact compressed length, so one corrupt member never desyncs the
  * archive. A structurally broken member (bad magic, failed inflate,
  * truncation) stops the walk: past it there is no reliable boundary.
  *
  * Scale shape: archives decode independently row-by-row (narrow flatMap);
  * nothing shuffles until the caller aggregates.
  */
object GzipExtract {

  final case class GzipMember(
      shard_id: Long,
      member_idx: Long,
      fname: String,
      isize: Long,
      content: String,
      crc_ok: Boolean)

  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  def parse(id: Long, bytes: Array[Byte]): Seq[GzipMember] = {
    val out = Seq.newBuilder[GzipMember]
    var off = 0
    var idx = 0L
    var done = false
    val n = bytes.length
    while (!done && off + 10 <= n) {
      if ((bytes(off) & 0xff) != 0x1f || (bytes(off + 1) & 0xff) != 0x8b ||
        bytes(off + 2) != 8) { done = true }
      else {
        val flg = bytes(off + 3) & 0xff
        var p = off + 10
        // FEXTRA(4), FNAME(8), FCOMMENT(16), FHCRC(2) — only FNAME is
        // produced by the writers we target, but skip the others correctly
        if ((flg & 4) != 0) {
          // truncated FEXTRA is a structural break — falling through with an
          // unadjusted offset would misparse the rest of the stream
          if (p + 2 > n) { done = true }
          else p += 2 + ((bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8))
        }
        var fname = ""
        if ((flg & 8) != 0) {
          val start = p
          while (p < n && bytes(p) != 0) p += 1
          fname = new String(bytes, start, p - start, "ISO-8859-1")
          p += 1
        }
        if ((flg & 16) != 0) { while (p < n && bytes(p) != 0) p += 1; p += 1 }
        if ((flg & 2) != 0) p += 2
        if (done || p > n) done = true
        else {
          val inf = new java.util.zip.Inflater(true)
          try {
            inf.setInput(bytes, p, n - p)
            val buf = new java.io.ByteArrayOutputStream()
            val chunk = new Array[Byte](4096)
            var ok = true
            while (ok && !inf.finished()) {
              val got =
                try inf.inflate(chunk)
                catch { case _: java.util.zip.DataFormatException => ok = false; 0 }
              if (got > 0) buf.write(chunk, 0, got)
              else if (ok && inf.needsInput()) ok = false // truncated
            }
            if (!ok || !inf.finished()) done = true
            else {
              val content = buf.toByteArray
              val end = p + inf.getBytesRead.toInt
              if (end + 8 > n) done = true
              else {
                val crcStored = u32le(bytes, end)
                val isize = u32le(bytes, end + 4)
                val crc = new java.util.zip.CRC32
                crc.update(content)
                val okTrailer = crc.getValue == crcStored &&
                  (content.length & 0xffffffffL) == isize
                out += GzipMember(id, idx, fname, content.length.toLong,
                  new String(content, "ISO-8859-1"), okTrailer)
                idx += 1
                off = end + 8
              }
            }
          } finally inf.end()
        }
      }
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → exploded member rows. */
  def extract(archives: DataFrame): Dataset[GzipMember] = {
    implicit val enc = Encoders.product[GzipMember]
    archives.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          parse(r.getLong(0), bytes)
        }
      }
  }
}
