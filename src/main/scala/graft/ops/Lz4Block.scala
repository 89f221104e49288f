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

  /** The single decode walk both entry points share: a growable flat
    * array with index-based back-references (O(output), not the
    * O(output²) a buffer-snapshot per match would cost on match-heavy
    * blocks), and 255-extension lengths accumulated as Long with an
    * in-loop MaxOut rejection so a malformed multi-megabyte chain can
    * never wrap Int into a negative length. Returns (plane, outLen,
    * nSeq, nMatch); None on any structural violation. */
  private def decodeRaw(bytes: Array[Byte]): Option[(Array[Byte], Int, Int, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    var out = new Array[Byte](math.min(math.max(bytes.length * 3, 64), MaxOut))
    var o = 0
    def ensure(n: Int): Unit = if (o + n > out.length) {
      var cap = out.length.toLong
      while (cap < o.toLong + n) cap = math.min(cap * 2, MaxOut.toLong)
      out = java.util.Arrays.copyOf(out, cap.toInt)
    }
    var i = 0
    var nSeq = 0
    var nMatch = 0
    while (i < bytes.length) {
      val token = bytes(i) & 0xff
      i += 1
      nSeq += 1
      // literal length with 255-extensions
      var litLen = (token >> 4).toLong
      if (litLen == 15) {
        var b = 255
        while (b == 255) {
          if (i >= bytes.length) return None
          b = bytes(i) & 0xff; i += 1
          litLen += b
          if (litLen > MaxOut) return None
        }
      }
      if (litLen > bytes.length - i || litLen > MaxOut - o) return None
      val ll = litLen.toInt
      ensure(ll)
      System.arraycopy(bytes, i, out, o, ll)
      i += ll; o += ll
      if (i == bytes.length) {
        // end-of-block: last sequence is literals-only — token's match
        // nibble must be 0 per the spec's end conditions
        if ((token & 0xf) != 0) return None
      } else {
        if (i + 2 > bytes.length) return None
        val off = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
        i += 2
        var mLen = ((token & 0xf) + 4).toLong
        if ((token & 0xf) == 15) {
          var b = 255
          while (b == 255) {
            if (i >= bytes.length) return None
            b = bytes(i) & 0xff; i += 1
            mLen += b
            if (mLen > MaxOut) return None
          }
        }
        if (off <= 0 || off > o || mLen > MaxOut - o) return None
        val ml = mLen.toInt
        ensure(ml)
        var k = 0
        while (k < ml) { out(o + k) = out(o + k - off); k += 1 } // may overlap
        o += ml
        nMatch += 1
      }
    }
    Some((out, o, nSeq, nMatch))
  }

  def decode(mediaId: Long, bytes: Array[Byte]): Option[Lz4Decoded] =
    decodeRaw(bytes).map { case (plane, outLen, nSeq, nMatch) =>
      var sum = 0L
      var wsum = 0L
      var j = 0
      while (j < outLen) {
        val v = plane(j) & 0xff
        sum += v; wsum += v.toLong * (j + 1)
        j += 1
      }
      Lz4Decoded(mediaId, outLen, nSeq, nMatch, sum, wsum)
    }

  /** Raw decompressed bytes — the spec's cross-validation entry point. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeRaw(bytes).map { case (plane, outLen, _, _) =>
      java.util.Arrays.copyOf(plane, outLen)
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
