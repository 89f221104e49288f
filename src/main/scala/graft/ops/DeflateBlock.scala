package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala DEFLATE decoder (RFC 1951) — the third hand-decoded block
  * codec next to snappy ([[SnappyBlock]]) and LZ4 ([[Lz4Block]]), and the
  * one underneath half the container formats the catalog already walks
  * (gzip members, ZIP entries, PNG IDAT, XLSX parts — all currently
  * inflated by the JDK): a sequence of blocks, each headed by BFINAL +
  * 2-bit BTYPE —
  *
  *   00 stored: align to byte, LEN + NLEN (ones' complement check), raw copy;
  *   01 fixed Huffman: the RFC's hardwired literal/length + distance trees;
  *   10 dynamic Huffman: HLIT/HDIST/HCLEN header, a code-length code (in
  *      the spec's permuted order) that itself Huffman-codes the two
  *      trees' code lengths with 16/17/18 repeat opcodes;
  *
  * symbols < 256 are literals, 256 ends the block, 257–285 are LZ77
  * lengths (base + extra bits) paired with a distance symbol 0–29 —
  * back-references may overlap their own output (same idiom as both
  * sibling codecs). Huffman codes are canonical (RFC 1951 §3.2.2) and
  * decoded by the count/first-code walk; codes fill bit positions
  * MSB-first inside an LSB-first bit stream.
  *
  * Implemented from the public RFC; the spec cross-validates against
  * `java.util.zip.Deflater` output (nowrap) across compression levels and
  * strategies — whatever mix of stored/fixed/dynamic blocks and match
  * shapes the JDK emits must decode back to the original bytes.
  *
  * Structural violations — a BTYPE of 3, LEN ≠ ~NLEN, an over-subscribed
  * code, a repeat opcode overrunning the declared lengths, a missing
  * end-of-block code, a distance reaching before the output start, or the
  * input ending mid-block — return None: one bad stream degrades, never
  * kills the task. Lengths accumulate against a 64 MiB output guard so a
  * malformed stream cannot wrap Int.
  */
object DeflateBlock {

  final case class DeflateDecoded(
      media_id: Long, out_len: Int, n_blocks: Int, n_stored: Int,
      n_fixed: Int, n_dynamic: Int, n_matches: Int,
      sum_bytes: Long, wsum_bytes: Long)

  private val MaxOut = 1 << 26 // 64 MiB guard for one stream

  // length codes 257..285: base value and extra bits (RFC 1951 §3.2.5)
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  // distance codes 0..29
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
    6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  // order in which code-length-code lengths are stored (§3.2.7)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  /** LSB-first bit reader; any read past the end latches `bad` and
    * returns 0, so callers check `bad` once per structured unit instead
    * of per bit. */
  private final class BitReader(bytes: Array[Byte]) {
    private[this] var pos = 0
    private[this] val nbits = bytes.length * 8
    var bad = false
    def bits(n: Int): Int = {
      if (bad || pos + n > nbits) { bad = true; return 0 }
      var v = 0
      var k = 0
      while (k < n) {
        v |= ((bytes(pos >> 3) >> (pos & 7)) & 1) << k
        pos += 1; k += 1
      }
      v
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7
    def byteIndex: Int = pos >> 3
    def skipBytes(n: Int): Unit = pos += n * 8
    def atEnd(slack: Int): Boolean = pos + slack > nbits
  }

  /** Canonical Huffman decoder (count/first-code walk, RFC 1951 §3.2.2):
    * built from per-symbol code lengths; construction rejects
    * over-subscribed codes (incomplete codes are legal — e.g. the
    * one-distance trees the JDK emits — and surface as decode -1 on the
    * missing codes). */
  private final class Huff(lengths: Array[Int]) {
    val count = new Array[Int](16)
    var i = 0
    while (i < lengths.length) { count(lengths(i)) += 1; i += 1 }
    count(0) = 0
    var oversubscribed = false
    private[this] var left = 1
    private[this] var l = 1
    while (l <= 15) {
      left <<= 1
      left -= count(l)
      if (left < 0) oversubscribed = true
      l += 1
    }
    private val offs = new Array[Int](16)
    private[this] var sum = 0
    l = 1
    while (l <= 15) { offs(l) = sum; sum += count(l); l += 1 }
    private val syms = new Array[Int](sum)
    private[this] val fill = offs.clone()
    i = 0
    while (i < lengths.length) {
      if (lengths(i) != 0) { syms(fill(lengths(i))) = i; fill(lengths(i)) += 1 }
      i += 1
    }
    /** -1 on invalid/absent code or exhausted input. */
    def decode(br: BitReader): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 15) {
        code |= br.bits(1)
        if (br.bad) return -1
        val c = count(len)
        if (code - first < c) return syms(index + (code - first))
        index += c
        first = (first + c) << 1
        code <<= 1
        len += 1
      }
      -1
    }
  }

  private lazy val FixedLit: Huff = {
    val ls = new Array[Int](288)
    var i = 0
    while (i < 288) {
      ls(i) = if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
      i += 1
    }
    new Huff(ls)
  }
  private lazy val FixedDist: Huff = new Huff(Array.fill(30)(5))

  /** The shared decode walk. Returns (plane, outLen, nBlocks, nStored,
    * nFixed, nDynamic, nMatches); None on any structural violation. */
  private def decodeRaw(bytes: Array[Byte])
      : Option[(Array[Byte], Int, Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    val br = new BitReader(bytes)
    var out = new Array[Byte](math.min(math.max(bytes.length * 4, 64), MaxOut))
    var o = 0
    def ensure(n: Int): Boolean = {
      if (n > MaxOut - o) return false
      if (o + n > out.length) {
        var cap = out.length.toLong
        while (cap < o.toLong + n) cap = math.min(cap * 2, MaxOut.toLong)
        out = java.util.Arrays.copyOf(out, cap.toInt)
      }
      true
    }
    var nBlocks = 0
    var nStored = 0
    var nFixed = 0
    var nDynamic = 0
    var nMatches = 0

    /** One Huffman-coded block body; false on violation. */
    def inflate(lit: Huff, dist: Huff): Boolean = {
      while (true) {
        val sym = lit.decode(br)
        if (sym < 0) return false
        if (sym < 256) {
          if (!ensure(1)) return false
          out(o) = sym.toByte; o += 1
        } else if (sym == 256) {
          return true
        } else {
          if (sym > 285) return false
          val li = sym - 257
          val len = LenBase(li) + br.bits(LenExtra(li))
          val ds = dist.decode(br)
          if (ds < 0 || ds > 29) return false
          val d = DistBase(ds) + br.bits(DistExtra(ds))
          if (br.bad || d > o) return false
          if (!ensure(len)) return false
          var k = 0
          while (k < len) { out(o + k) = out(o + k - d); k += 1 } // may overlap
          o += len
          nMatches += 1
        }
      }
      true
    }

    var fin = false
    while (!fin) {
      val bf = br.bits(1)
      val bt = br.bits(2)
      if (br.bad) return None
      fin = bf == 1
      nBlocks += 1
      bt match {
        case 0 =>
          br.alignByte()
          if (br.atEnd(32)) return None
          val len = br.bits(16)
          val nlen = br.bits(16)
          if (br.bad || (len ^ 0xffff) != nlen) return None
          if (br.atEnd(len * 8) || !ensure(len)) return None
          System.arraycopy(bytes, br.byteIndex, out, o, len)
          br.skipBytes(len)
          o += len
          nStored += 1
        case 1 =>
          if (!inflate(FixedLit, FixedDist)) return None
          nFixed += 1
        case 2 =>
          val hlit = br.bits(5) + 257
          val hdist = br.bits(5) + 1
          val hclen = br.bits(4) + 4
          if (br.bad || hlit > 286 || hdist > 30) return None
          val clLens = new Array[Int](19)
          var i = 0
          while (i < hclen) { clLens(ClOrder(i)) = br.bits(3); i += 1 }
          if (br.bad) return None
          val clTree = new Huff(clLens)
          if (clTree.oversubscribed) return None
          val lens = new Array[Int](hlit + hdist)
          var n = 0
          while (n < hlit + hdist) {
            val sym = clTree.decode(br)
            if (sym < 0) return None
            if (sym < 16) { lens(n) = sym; n += 1 }
            else {
              var rep = 0
              var v = 0
              if (sym == 16) {
                if (n == 0) return None // no previous length to repeat
                v = lens(n - 1); rep = 3 + br.bits(2)
              } else if (sym == 17) rep = 3 + br.bits(3)
              else rep = 11 + br.bits(7)
              if (br.bad || n + rep > hlit + hdist) return None
              var k = 0
              while (k < rep) { lens(n) = v; n += 1; k += 1 }
            }
          }
          if (lens(256) == 0) return None // end-of-block code must exist
          val litTree = new Huff(java.util.Arrays.copyOfRange(lens, 0, hlit))
          val distTree = new Huff(java.util.Arrays.copyOfRange(lens, hlit, hlit + hdist))
          if (litTree.oversubscribed || distTree.oversubscribed) return None
          if (!inflate(litTree, distTree)) return None
          nDynamic += 1
        case _ => return None
      }
    }
    Some((out, o, nBlocks, nStored, nFixed, nDynamic, nMatches))
  }

  def decode(mediaId: Long, bytes: Array[Byte]): Option[DeflateDecoded] =
    decodeRaw(bytes).map { case (plane, outLen, nB, nS, nF, nD, nM) =>
      var sum = 0L
      var wsum = 0L
      var j = 0
      while (j < outLen) {
        val v = plane(j) & 0xff
        sum += v; wsum += v.toLong * (j + 1)
        j += 1
      }
      DeflateDecoded(mediaId, outLen, nB, nS, nF, nD, nM, sum, wsum)
    }

  /** Raw decompressed bytes — the spec's cross-validation entry point. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeRaw(bytes).map { case (plane, outLen, _, _, _, _, _) =>
      java.util.Arrays.copyOf(plane, outLen)
    }

  /** DataFrame plumbing: (media_id, media BINARY) → decoded stats rows;
    * malformed streams degrade to no row. */
  def blocks(media: DataFrame): Dataset[DeflateDecoded] = {
    implicit val enc = Encoders.product[DeflateDecoded]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(row.getLong(0), bytes)
        }
      }
  }
}
