package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala LZ4 BLOCK-format decoder (the raw format of lz4's
  * `lz4_Block_format.md` — parquet's LZ4_RAW codec and the payload inside
  * LZ4 frames): a stream of sequences, each
  *
  *   token: high nibble = literal length (15 ⇒ extension bytes follow,
  *          each 255 continuing, the first non-255 terminating);
  *          low nibble = match length − 4 (same 15-extension rule);
  *   [literals]; 2-byte LE match offset (1..65535, 0 is invalid);
  *
  * the LAST sequence carries literals only (the stream ends after them —
  * end-of-block rule), and matches may OVERLAP their own output
  * (offset < length expands runs, same idiom as snappy's). Unlike snappy
  * there is NO length preamble: the block ends when input does.
  * Implemented from the public block format description; the spec
  * cross-validates against lz4-java's compressor (whatever sequence mix
  * it emits must decode to the original bytes).
  *
  * Structural violations — truncated token arguments or literals, a zero
  * offset or one reaching before the output start, input ending inside a
  * match — return None: one bad block degrades, not kills.
  */
object Lz4Block {

  final case class Lz4Decoded(
      media_id: Long, out_len: Int, n_sequences: Int, n_matches: Int,
      sum_bytes: Long, wsum_bytes: Long)

  private val MaxOut = 1 << 26 // 64 MiB guard for one block

  def decode(mediaId: Long, bytes: Array[Byte]): Option[Lz4Decoded] = {
    if (bytes == null || bytes.length == 0) return None
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    var nSeq = 0
    var nMatch = 0
    while (i < bytes.length) {
      val token = bytes(i) & 0xff
      i += 1
      nSeq += 1
      // literal length with 255-extensions
      var litLen = token >> 4
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          if (i >= bytes.length) return None
          b = bytes(i) & 0xff; i += 1
          litLen += b
        }
      }
      if (i + litLen > bytes.length || out.size + litLen > MaxOut) return None
      out.write(bytes, i, litLen)
      i += litLen
      if (i == bytes.length) {
        // end-of-block: last sequence is literals-only — token's match
        // nibble must be 0 per the spec's end conditions
        if ((token & 0xf) != 0) return None
      } else {
        if (i + 2 > bytes.length) return None
        val off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
        i += 2
        var mLen = (token & 0xf) + 4
        if ((token & 0xf) == 15) {
          var b = 255
          while (b == 255) {
            if (i >= bytes.length) return None
            b = bytes(i) & 0xff; i += 1
            mLen += b
          }
        }
        val o = out.size
        if (off <= 0 || off > o || o + mLen > MaxOut) return None
        val buf = out.toByteArray // o is small for gate corpora; spec sizes modest
        var k = 0
        val grow = new Array[Byte](mLen)
        while (k < mLen) {
          grow(k) = if (o - off + k < o) buf(o - off + k) else grow(o - off + k - o)
          k += 1
        }
        out.write(grow, 0, mLen)
        nMatch += 1
      }
    }
    val plane = out.toByteArray
    if (plane.isEmpty && nSeq == 0) return None
    var sum = 0L
    var wsum = 0L
    var j = 0
    while (j < plane.length) {
      val v = plane(j) & 0xff
      sum += v; wsum += v.toLong * (j + 1)
      j += 1
    }
    Some(Lz4Decoded(mediaId, plane.length, nSeq, nMatch, sum, wsum))
  }

  /** Raw decompressed bytes — the spec's cross-validation entry point. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] =
    decode(0L, bytes).map { _ =>
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < bytes.length) {
        val token = bytes(i) & 0xff; i += 1
        var litLen = token >> 4
        if (litLen == 15) {
          var b = 255
          while (b == 255) { b = bytes(i) & 0xff; i += 1; litLen += b }
        }
        out.write(bytes, i, litLen); i += litLen
        if (i < bytes.length) {
          val off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8); i += 2
          var mLen = (token & 0xf) + 4
          if ((token & 0xf) == 15) {
            var b = 255
            while (b == 255) { b = bytes(i) & 0xff; i += 1; mLen += b }
          }
          val o = out.size
          val buf = out.toByteArray
          val grow = new Array[Byte](mLen)
          var k = 0
          while (k < mLen) {
            grow(k) = if (o - off + k < o) buf(o - off + k) else grow(o - off + k - o)
            k += 1
          }
          out.write(grow, 0, mLen)
        }
      }
      out.toByteArray
    }

  /** DataFrame plumbing: (media_id, media BINARY) → decoded stats rows;
    * malformed blocks degrade to no row. */
  def blocks(media: DataFrame): Dataset[Lz4Decoded] = {
    implicit val enc = Encoders.product[Lz4Decoded]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(row.getLong(0), bytes)
        }
      }
  }
}
