package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala snappy BLOCK-format decoder (the raw format of google/snappy's
  * `format_description.txt` — what parquet data pages, Kafka message sets,
  * and level-DB-style stores actually hold; the framing format is a thin
  * wrapper around it): little-endian varint preamble carrying the
  * uncompressed length, then a tag stream —
  *
  *   tag&3 = 0: literal; length = (tag>>2)+1 for ≤60, else (tag>>2)-59
  *             trailing LE bytes hold length-1 (61→1 byte, … 64→4 bytes);
  *   tag&3 = 1: copy, 1-byte offset; length = ((tag>>2)&7)+4,
  *             offset = ((tag>>5)<<8) | nextByte   (4..11 byte copies);
  *   tag&3 = 2: copy, 2-byte LE offset; length = (tag>>2)+1;
  *   tag&3 = 3: copy, 4-byte LE offset; length = (tag>>2)+1.
  *
  * Copies may OVERLAP their own output (offset < length is the snappy
  * idiom for run-length expansion) — the byte-at-a-time back-reference
  * loop below is the semantic, not an inefficiency. Implemented from the
  * public format description; [[graft.ops]] spec cross-validates against
  * snappy-java's compressor (whatever tag mix it emits must decode to the
  * original bytes).
  *
  * Any structural violation — truncated varint or tag arguments, offset
  * of zero or beyond the output written so far, output overrun or a
  * stream that ends short of the promised length — returns None: one bad
  * block in a 100 TB scan must degrade, not kill the stage.
  */
object SnappyBlock {

  final case class SnappyDecoded(
      media_id: Long, out_len: Int, n_literals: Int, n_copies: Int,
      sum_bytes: Long, wsum_bytes: Long)

  def decode(mediaId: Long, bytes: Array[Byte]): Option[SnappyDecoded] = {
    if (bytes == null || bytes.length == 0) return None
    var i = 0
    // LE varint uncompressed length (max 5 bytes for a 32-bit value)
    var outLen = 0L
    var shift = 0
    var more = true
    while (more) {
      if (i >= bytes.length || shift > 28) return None
      val b = bytes(i) & 0xff
      outLen |= (b & 0x7fL) << shift
      shift += 7
      i += 1
      more = (b & 0x80) != 0
    }
    if (outLen > (1L << 26)) return None // 64 MiB guard for one block
    val out = new Array[Byte](outLen.toInt)
    var o = 0
    var nLit = 0
    var nCopy = 0
    while (i < bytes.length && o < out.length) {
      val tag = bytes(i) & 0xff
      i += 1
      val upper = tag >> 2
      (tag & 3) match {
        case 0 =>
          var lenL = (upper + 1).toLong
          if (upper >= 60) {
            val nb = upper - 59
            if (i + nb > bytes.length) return None
            lenL = 0L
            var k = nb - 1
            while (k >= 0) { lenL = (lenL << 8) | (bytes(i + k) & 0xff); k -= 1 }
            lenL += 1
            i += nb
          }
          // Long accumulation + subtraction-form bounds: a 4-byte extension
          // can encode up to 2^32, which wraps Int and slips past an
          // additive `i + len > length` check before reaching arraycopy
          if (lenL <= 0 || lenL > bytes.length - i || lenL > out.length - o) return None
          val len = lenL.toInt
          System.arraycopy(bytes, i, out, o, len)
          i += len; o += len; nLit += 1
        case c =>
          var len = 0
          var off = 0
          if (c == 1) {
            if (i + 1 > bytes.length) return None
            len = (upper & 7) + 4
            off = ((upper >> 3) << 8) | (bytes(i) & 0xff)
            i += 1
          } else if (c == 2) {
            if (i + 2 > bytes.length) return None
            len = upper + 1
            off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
            i += 2
          } else {
            if (i + 4 > bytes.length) return None
            len = upper + 1
            off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
              ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
            i += 4
            if (off < 0) return None
          }
          if (off <= 0 || off > o || o + len > out.length) return None
          var k = 0
          while (k < len) { out(o + k) = out(o + k - off); k += 1 } // may overlap
          o += len; nCopy += 1
      }
    }
    // the block is exactly one stream: short output AND unconsumed
    // trailing input are both corruption
    if (o != out.length || i != bytes.length) return None
    var sum = 0L
    var wsum = 0L
    var j = 0
    while (j < out.length) {
      val v = out(j) & 0xff
      sum += v; wsum += v.toLong * (j + 1)
      j += 1
    }
    Some(SnappyDecoded(mediaId, out.length, nLit, nCopy, sum, wsum))
  }

  /** Raw decompressed bytes — the spec's cross-validation entry point. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] = {
    // re-run decode's walk but keep the plane; decode() is the audited
    // path, this shares it by reconstruction for test comparison only
    decode(0L, bytes).map { d =>
      val out = new Array[Byte](d.out_len)
      // second pass, same walk, now storing (structure already validated)
      var i = 0
      var shift = 0
      var more = true
      while (more) { val b = bytes(i) & 0xff; shift += 7; i += 1; more = (b & 0x80) != 0 }
      var o = 0
      var bad = false // unreachable on streams decode() validated; kept so the guards cannot diverge
      while (!bad && i < bytes.length && o < out.length) {
        val tag = bytes(i) & 0xff
        i += 1
        val upper = tag >> 2
        (tag & 3) match {
          case 0 =>
            // same Long accumulation as decode()
            var lenL = (upper + 1).toLong
            if (upper >= 60) {
              val nb = upper - 59
              lenL = 0L
              var k = nb - 1
              while (k >= 0) { lenL = (lenL << 8) | (bytes(i + k) & 0xff); k -= 1 }
              lenL += 1
              i += nb
            }
            if (lenL <= 0 || lenL > bytes.length - i || lenL > out.length - o) bad = true
            else {
              val len = lenL.toInt
              System.arraycopy(bytes, i, out, o, len)
              i += len; o += len
            }
          case c =>
            var len = 0
            var off = 0
            if (c == 1) {
              len = (upper & 7) + 4
              off = ((upper >> 3) << 8) | (bytes(i) & 0xff)
              i += 1
            } else if (c == 2) {
              len = upper + 1
              off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
              i += 2
            } else {
              len = upper + 1
              off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
                ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
              i += 4
            }
            var k = 0
            while (k < len) { out(o + k) = out(o + k - off); k += 1 }
            o += len
        }
      }
      out
    }
  }

  /** DataFrame plumbing: (media_id, media BINARY) → decoded stats rows;
    * malformed blocks degrade to no row. */
  def blocks(media: DataFrame): Dataset[SnappyDecoded] = {
    implicit val enc = Encoders.product[SnappyDecoded]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(row.getLong(0), bytes)
        }
      }
  }
}
