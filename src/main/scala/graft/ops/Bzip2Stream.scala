package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala bzip2 decoder — the fourth hand-decoded codec next to
  * snappy ([[SnappyBlock]]), LZ4 ([[Lz4Block]]) and DEFLATE
  * ([[DeflateBlock]]), and the one the public corpus dumps a training
  * pipeline actually ingests ship in (Wikipedia dumps, many archival
  * crawls are `.bz2`). Implemented from the publicly documented format
  * (the reference implementation's container layout):
  *
  *   stream header `BZh` + level digit (block size = level × 100k);
  *   per block: 48-bit magic 0x314159265359, 32-bit block CRC, the
  *   deprecated `randomized` bit (must be 0), 24-bit BWT origin pointer;
  *   a two-level 16+16-bit symbol usage map; 2–6 Huffman GROUPS with
  *   delta-coded code lengths (5-bit start, ±1 walk), selected per 50
  *   symbols by an MTF-coded unary selector list; the symbol stream is
  *   RLE2 (RUNA/RUNB bijective-base-2 zero runs) over MTF over the BWT
  *   plane; inverse BWT by counting sort from origPtr; then RLE1 (4
  *   equal bytes + count byte) back to the original; block CRCs are the
  *   MSB-first CRC-32 (poly 0x04C11DB7, init/final 0xFFFFFFFF) and the
  *   stream CRC folds each block's with a rotate-xor; 48-bit footer
  *   magic 0x177245385090.
  *
  * All bits are read MSB-first (bzip2's order — the opposite packing of
  * DEFLATE's, which is exactly why both decoders exist). Huffman codes
  * are canonical by (length, symbol) and decoded with the same
  * count/first-code walk as [[DeflateBlock]], widened to bzip2's 20-bit
  * maximum length.
  *
  * The spec cross-validates against commons-compress's compressor
  * (BZip2CompressorOutputStream, on the Spark classpath): whatever
  * group/selector/run mix it emits at any level must decode back to the
  * original bytes, CRC-verified. Structural violations — bad magics, the
  * randomized bit, an origPtr past the plane, selector/group overruns,
  * a code length walking out of 1..20, RLE1 truncated before its count
  * byte, or either CRC mismatching — return None: a corrupt member
  * degrades, never kills the task.
  */
object Bzip2Stream {

  final case class Bzip2Decoded(
      media_id: Long, out_len: Int, n_blocks: Int, level: Int,
      n_groups: Int, n_selectors: Int, sum_bytes: Long, wsum_bytes: Long)

  private val MaxOut = 1 << 26 // 64 MiB guard

  private final class BitsMsb(bytes: Array[Byte]) {
    private[this] var pos = 0
    private[this] val nbits = bytes.length * 8
    var bad = false
    def bit(): Int = {
      if (bad || pos >= nbits) { bad = true; return 0 }
      val v = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def bits(n: Int): Int = { // n ≤ 24
      var v = 0
      var k = 0
      while (k < n) { v = (v << 1) | bit(); k += 1 }
      v
    }
    def bits32(): Long = ((bits(16).toLong << 16) | bits(16).toLong) & 0xffffffffL
    def atEnd: Boolean = pos >= nbits
  }

  /** Canonical Huffman (count/first-code walk), lengths 1..20, fed
    * MSB-first bits. */
  private final class Huff20(lengths: Array[Int]) {
    private val count = new Array[Int](21)
    private val offs = new Array[Int](21)
    private val syms: Array[Int] = {
      var i = 0
      while (i < lengths.length) { count(lengths(i)) += 1; i += 1 }
      count(0) = 0
      var sum = 0
      var l = 1
      while (l <= 20) { offs(l) = sum; sum += count(l); l += 1 }
      val s = new Array[Int](sum)
      val fill = offs.clone()
      i = 0
      while (i < lengths.length) {
        if (lengths(i) != 0) { s(fill(lengths(i))) = i; fill(lengths(i)) += 1 }
        i += 1
      }
      s
    }
    def decode(br: BitsMsb): Int = {
      var code = 0
      var first = 0
      var index = 0
      var len = 1
      while (len <= 20) {
        code |= br.bit()
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

  /** bzip2's CRC-32: MSB-first, poly 0x04C11DB7, init/final 0xFFFFFFFF. */
  private def blockCrc(data: Array[Byte], from: Int, until: Int): Long = {
    var crc = 0xffffffffL
    var i = from
    while (i < until) {
      crc ^= (data(i) & 0xffL) << 24
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80000000L) != 0) ((crc << 1) ^ 0x04c11db7L) & 0xffffffffL
        else (crc << 1) & 0xffffffffL
        k += 1
      }
      i += 1
    }
    crc ^ 0xffffffffL
  }

  /** (plane bytes, out length, nBlocks, level, lastNGroups, totalSelectors). */
  private def decodeRaw(bytes: Array[Byte])
      : Option[(Array[Byte], Int, Int, Int, Int, Int)] = {
    if (bytes == null || bytes.length < 10) return None
    val br = new BitsMsb(bytes)
    if (br.bits(8) != 'B' || br.bits(8) != 'Z' || br.bits(8) != 'h') return None
    val level = br.bits(8) - '0'
    if (br.bad || level < 1 || level > 9) return None
    val blockMax = level * 100000 + 10

    var out = new Array[Byte](math.min(math.max(bytes.length * 4, 1024), MaxOut))
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
    var lastGroups = 0
    var totSelectors = 0
    var streamCrc = 0L
    val bwt = new Array[Byte](blockMax)

    var done = false
    while (!done) {
      val m1 = br.bits(24)
      val m2 = br.bits(24)
      if (br.bad) return None
      if (m1 == 0x177245 && m2 == 0x385090) {
        val footCrc = br.bits32()
        if (br.bad || footCrc != streamCrc) return None
        done = true
      } else if (m1 == 0x314159 && m2 == 0x265359) {
        nBlocks += 1
        val declaredCrc = br.bits32()
        if (br.bit() != 0) return None // randomized: deprecated, reject
        val origPtr = br.bits(24)

        // symbol usage map
        val used = new Array[Boolean](256)
        var nInUse = 0
        val rangesUsed = br.bits(16)
        var r = 0
        while (r < 16) {
          if ((rangesUsed & (0x8000 >> r)) != 0) {
            val m = br.bits(16)
            var j = 0
            while (j < 16) {
              if ((m & (0x8000 >> j)) != 0) { used(r * 16 + j) = true; nInUse += 1 }
              j += 1
            }
          }
          r += 1
        }
        if (br.bad || nInUse == 0) return None
        val seqToUnseq = new Array[Byte](nInUse)
        var si = 0
        var b = 0
        while (b < 256) { if (used(b)) { seqToUnseq(si) = b.toByte; si += 1 }; b += 1 }
        val alpha = nInUse + 2

        val nGroups = br.bits(3)
        if (br.bad || nGroups < 2 || nGroups > 6) return None
        lastGroups = nGroups
        val nSelectors = br.bits(15)
        if (br.bad || nSelectors < 1) return None
        totSelectors += nSelectors

        // selectors: unary count, MTF over group ids
        val selectors = new Array[Int](nSelectors)
        val gMtf = Array.tabulate(nGroups)(identity)
        var s = 0
        while (s < nSelectors) {
          var j = 0
          while (br.bit() == 1) { j += 1; if (j >= nGroups || br.bad) return None }
          val v = gMtf(j)
          var k = j
          while (k > 0) { gMtf(k) = gMtf(k - 1); k -= 1 }
          gMtf(0) = v
          selectors(s) = v
          s += 1
        }
        if (br.bad) return None

        // per-group delta-coded lengths → Huffman tables
        val tables = new Array[Huff20](nGroups)
        var g = 0
        while (g < nGroups) {
          val lens = new Array[Int](alpha)
          var curr = br.bits(5)
          var sy = 0
          while (sy < alpha) {
            var cont = true
            while (cont) {
              if (br.bad || curr < 1 || curr > 20) return None
              if (br.bit() == 0) cont = false
              else if (br.bit() == 1) curr -= 1
              else curr += 1
            }
            lens(sy) = curr
            sy += 1
          }
          tables(g) = new Huff20(lens)
          g += 1
        }
        if (br.bad) return None

        // symbol stream: RLE2 + MTF over the BWT plane
        val mtf = seqToUnseq.clone()
        var bl = 0 // bwt plane length
        var groupCount = 0
        var selIdx = -1
        var table: Huff20 = null
        val eob = alpha - 1
        var run = 0L
        var runBit = 0
        var finished = false
        while (!finished) {
          if (groupCount == 0) {
            selIdx += 1
            if (selIdx >= nSelectors) return None
            table = tables(selectors(selIdx))
            groupCount = 50
          }
          groupCount -= 1
          val sym = table.decode(br)
          if (sym < 0) return None
          if (sym <= 1) {
            run += (sym + 1).toLong << runBit
            runBit += 1
            if (run > blockMax) return None
          } else {
            if (run > 0) {
              if (bl + run > blockMax) return None
              val v = mtf(0)
              var k = 0L
              while (k < run) { bwt(bl) = v; bl += 1; k += 1 }
              run = 0; runBit = 0
            }
            if (sym == eob) finished = true
            else {
              val idx = sym - 1
              if (idx >= nInUse) return None
              val v = mtf(idx)
              var k = idx
              while (k > 0) { mtf(k) = mtf(k - 1); k -= 1 }
              mtf(0) = v
              if (bl + 1 > blockMax) return None
              bwt(bl) = v
              bl += 1
            }
          }
        }
        if (origPtr >= bl) return None

        // inverse BWT (counting sort next-vector, walk from origPtr)
        val cftab = new Array[Int](257)
        var i = 0
        while (i < bl) { cftab((bwt(i) & 0xff) + 1) += 1; i += 1 }
        i = 1
        while (i <= 256) { cftab(i) += cftab(i - 1); i += 1 }
        val tt = new Array[Int](bl)
        i = 0
        while (i < bl) {
          val bb = bwt(i) & 0xff
          tt(cftab(bb)) = i
          cftab(bb) += 1
          i += 1
        }
        // RLE1 inverse, streamed off the BWT walk
        val blockStart = o
        var tPos = tt(origPtr)
        var emitted = 0
        var runChar = -1
        var runLen = 0
        while (emitted < bl) {
          val ch = bwt(tPos) & 0xff
          tPos = tt(tPos)
          emitted += 1
          if (runLen == 4) {
            // this byte is the RLE1 count, not data
            if (!ensure(ch)) return None
            var k = 0
            while (k < ch) { out(o) = runChar.toByte; o += 1; k += 1 }
            runLen = 0
            runChar = -1
          } else {
            if (!ensure(1)) return None
            out(o) = ch.toByte
            o += 1
            if (ch == runChar) runLen += 1 else { runChar = ch; runLen = 1 }
          }
        }
        if (runLen == 4) return None // run promised a count byte the plane lacks
        val crc = blockCrc(out, blockStart, o)
        if (crc != declaredCrc) return None
        streamCrc = (((streamCrc << 1) | (streamCrc >>> 31)) & 0xffffffffL) ^ crc
      } else return None
    }
    Some((out, o, nBlocks, level, lastGroups, totSelectors))
  }

  def decode(mediaId: Long, bytes: Array[Byte]): Option[Bzip2Decoded] =
    decodeRaw(bytes).map { case (plane, outLen, nB, lvl, nG, nSel) =>
      var sum = 0L
      var wsum = 0L
      var j = 0
      while (j < outLen) {
        val v = plane(j) & 0xff
        sum += v; wsum += v.toLong * (j + 1)
        j += 1
      }
      Bzip2Decoded(mediaId, outLen, nB, lvl, nG, nSel, sum, wsum)
    }

  /** Raw decompressed bytes — the spec's cross-validation entry point. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] =
    decodeRaw(bytes).map { case (plane, outLen, _, _, _, _) =>
      java.util.Arrays.copyOf(plane, outLen)
    }

  /** DataFrame plumbing: (media_id, media BINARY) → decoded stats rows;
    * malformed streams degrade to no row. */
  def streams(media: DataFrame): Dataset[Bzip2Decoded] = {
    implicit val enc = Encoders.product[Bzip2Decoded]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(row.getLong(0), bytes)
        }
      }
  }

  /** Round-trip plumbing for the gate: compress each payload with
    * commons-compress (the reference compressor, on the Spark classpath)
    * at a per-row level, decode with THIS decoder, and return the stats —
    * plus `match_input`, byte equality against the original payload. The
    * differential is honest both ways: a decoder bug breaks equality/CRC;
    * a compressor change still must round-trip. */
  final case class Bzip2RoundTrip(
      media_id: Long, out_len: Int, n_blocks: Int, level: Int,
      match_input: Boolean, sum_bytes: Long, wsum_bytes: Long)

  def roundTrip(payloads: DataFrame): Dataset[Bzip2RoundTrip] = {
    implicit val enc = Encoders.product[Bzip2RoundTrip]
    payloads.select(col("media_id").cast("long"), col("media"),
        col("level").cast("int"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val data = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val level = math.max(1, math.min(9, row.getInt(2)))
          val bos = new java.io.ByteArrayOutputStream()
          val bz = new org.apache.commons.compress.compressors.bzip2
            .BZip2CompressorOutputStream(bos, level)
          bz.write(data)
          bz.close()
          decode(row.getLong(0), bos.toByteArray).map { d =>
            val back = decompress(bos.toByteArray).get
            Bzip2RoundTrip(d.media_id, d.out_len, d.n_blocks, d.level,
              java.util.Arrays.equals(back, data), d.sum_bytes, d.wsum_bytes)
          }
        }
      }
  }
}
