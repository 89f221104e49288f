package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** ZIP archive extraction (PKWARE APPNOTE layout) — the third real container
  * family after TAR (x105) and ISO-BMFF (x111), and the first whose payload
  * path is COMPRESSED: member data is either stored (method 0) or raw
  * DEFLATE (method 8), inflated with the JDK's `java.util.zip.Inflater` in
  * nowrap mode — zero external codec, the same posture as the PNG path.
  * Scraped corpora are full of zip-packaged documents; a pipeline needs
  * member enumeration + extraction + integrity without shelling out.
  *
  * Walk: locate the End-Of-Central-Directory record by scanning backward
  * for its signature (the spec's own prescribed method — a trailing
  * comment makes a fixed offset wrong), then walk the central directory,
  * and for each entry follow its local-file-header offset to the data
  * (the LFH's OWN name/extra lengths decide the data offset — they can
  * differ from the central entry's). Integrity: CRC-32 of the inflated
  * bytes against the stored crc — a mismatch flags the member
  * (`crc_ok = false`) and extraction CONTINUES; a structurally broken
  * entry (bad signature, truncated data, failed inflate) is dropped. One
  * damaged member costs one row, never the shard.
  *
  * Scale shape: archives decode independently row-by-row (narrow flatMap);
  * per-task memory is one archive. Nothing shuffles until the caller
  * aggregates.
  */
object ZipExtract {

  final case class ZipMember(
      shard_id: Long,
      name: String,
      method: Long,
      usize: Long,
      content: String,
      crc_ok: Boolean)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  private def inflate(data: Array[Byte], usize: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate
    try {
      inf.setInput(data)
      val out = new Array[Byte](usize)
      var off = 0
      while (off < usize && !inf.finished()) {
        val n = inf.inflate(out, off, usize - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off == usize) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  def parse(id: Long, bytes: Array[Byte]): Seq[ZipMember] = {
    val n = bytes.length
    // EOCD: signature 50 4B 05 06, min record 22 bytes, scan back over a
    // possible trailing comment
    var e = n - 22
    while (e >= 0 && !(bytes(e) == 0x50 && bytes(e + 1) == 0x4b &&
      bytes(e + 2) == 0x05 && bytes(e + 3) == 0x06)) e -= 1
    if (e < 0) return Seq.empty
    val count = u16(bytes, e + 10)
    var cd = u32(bytes, e + 16).toInt
    val out = Seq.newBuilder[ZipMember]
    var k = 0
    var broken = false
    while (k < count && !broken) {
      if (cd + 46 > n || u32(bytes, cd) != 0x02014b50L) broken = true
      else {
        val method = u16(bytes, cd + 10)
        val crc = u32(bytes, cd + 16)
        val csize = u32(bytes, cd + 20).toInt
        val usize = u32(bytes, cd + 24).toInt
        val nameLen = u16(bytes, cd + 28)
        val extraLen = u16(bytes, cd + 30)
        val commentLen = u16(bytes, cd + 32)
        val lfh = u32(bytes, cd + 42).toInt
        if (cd + 46 + nameLen > n) broken = true
        else {
          // ISO-8859-1 is byte-preserving (US-ASCII maps >0x7F to '?'),
          // matching GzipExtract/WarcIndex so re-binarize round-trips.
          val name = new String(bytes, cd + 46, nameLen, "ISO-8859-1")
          // follow the LFH: ITS lengths locate the data
          if (lfh + 30 <= n && u32(bytes, lfh) == 0x04034b50L) {
            val dataOff = lfh + 30 + u16(bytes, lfh + 26) + u16(bytes, lfh + 28)
            if (dataOff + csize <= n) {
              val raw = java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + csize)
              val contentOpt =
                if (method == 0) { if (csize == usize) Some(raw) else None }
                else if (method == 8) inflate(raw, usize)
                else None
              contentOpt.foreach { c =>
                val crcc = new java.util.zip.CRC32
                crcc.update(c)
                out += ZipMember(id, name, method.toLong, usize.toLong,
                  new String(c, "ISO-8859-1"), crcc.getValue == crc)
              }
            }
          }
          cd += 46 + nameLen + extraLen + commentLen
          k += 1
        }
      }
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → exploded member rows.
    * Null blobs extract to zero members. */
  def extract(archives: DataFrame): Dataset[ZipMember] = {
    implicit val enc = Encoders.product[ZipMember]
    archives.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          parse(r.getLong(0), bytes)
        }
      }
  }
}
