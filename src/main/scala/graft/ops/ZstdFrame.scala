package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Pure-Scala Zstandard decoder — the fifth hand-decoded codec (snappy
  * x171, LZ4 x172, DEFLATE x174, bzip2 x177) and the one a modern lake
  * actually standardizes on (parquet ZSTD pages, Kafka topics, .zst
  * dumps). Implemented from the public RFC 8878 specification:
  *
  *   frames: LE magic 0xFD2FB528, frame header (descriptor byte with
  *   content-size/single-segment/checksum/dictionary flags, window
  *   descriptor, content size), blocks, optional XXH64 content checksum
  *   (low 32 bits, verified HERE by the xxhash64 implemented below);
  *   skippable frames (0x184D2A5x) are skipped. Dictionaries are not
  *   supported — a nonzero dictionary id degrades.
  *
  *   blocks: 3-byte LE header (last flag, type raw/RLE/compressed);
  *   compressed blocks carry a literals section and a sequences section.
  *
  *   literals: raw/RLE/Huffman-compressed/treeless (reusing the previous
  *   table); compressed sizes from the 1-5 byte size formats; Huffman
  *   table described either by direct 4-bit weights or by an
  *   FSE-compressed weight stream with TWO interleaved states; the
  *   implied last weight completes the power of two; canonical table
  *   filled longest-codes-first; 1- or 4-stream variants (6-byte jump
  *   table), each a BACKWARD bitstream consumed to exactly zero bits.
  *
  *   sequences: count varints; per-field table modes
  *   predefined/RLE/FSE-compressed/repeat with the RFC's default
  *   distributions embedded; FSE normalized counts read by the
  *   variable-bit procedure (low-bit threshold + 1-bit rewind, 2-bit
  *   zero-repeat flags, byte realignment); the interleaved
  *   LL→OF→ML state machine over the backward bitstream, extra bits
  *   read offset→match→literals, states updated literals→match→offset;
  *   the three-slot repeat-offset history incl. the litLen=0 shift and
  *   the rep0−1 case; overlapping match copies.
  *
  * Cross-validation: whatever block/mode/stream mix zstd-jni (the
  * reference implementation bound on the Spark classpath) emits at ANY
  * level must decode byte-identically, including multi-block frames
  * with treeless/repeat reuse and checksummed frames. Structural
  * violations — bad magic, reserved block type, oversubscribed FSE or
  * Huffman tables, a bitstream that does not consume to exactly zero,
  * an offset past the produced output, a checksum mismatch — return
  * None: a corrupt frame degrades, never kills the task.
  */
object ZstdFrame {

  final case class ZstdDecoded(
      media_id: Long, out_len: Int, n_frames: Int, n_blocks: Int,
      checksum_checked: Boolean, sum_bytes: Long, wsum_bytes: Long)

  final case class ZstdRoundTrip(
      media_id: Long, out_len: Int, n_frames: Int, n_blocks: Int,
      level: Int, match_input: Boolean, sum_bytes: Long, wsum_bytes: Long)

  private val MaxOut = 1 << 26 // 64 MiB guard

  private def highBit(v: Int): Int = 31 - java.lang.Integer.numberOfLeadingZeros(v)

  /** Decode failure — control flow inside one frame decode; caught at
    * the decode() boundary and turned into None. */
  private final class Corrupt extends RuntimeException
  private def corrupt(): Nothing = throw new Corrupt

  // ---------------------------------------------------------------
  // bit readers
  // ---------------------------------------------------------------

  /** Forward little-endian bit reader (FSE table descriptions, Huffman
    * direct weights live in plain bytes read elsewhere). */
  private final class FwdBits(bytes: Array[Byte], val from: Int, val until: Int) {
    private[this] var pos = from.toLong * 8
    def bitPos: Long = pos
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        val idx = (p >> 3).toInt
        if (idx >= until) corrupt()
        v |= (((bytes(idx) >> (p & 7)) & 1) << i)
        i += 1
      }
      pos += n
      v
    }
    def rewind(n: Int): Unit = pos -= n
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def bytesConsumed: Int = (((pos + 7) >> 3) - from).toInt
  }

  /** Backward bitstream (RFC 8878 §3.1.1.4): the last byte's highest
    * set bit is the sentinel; reads move toward the front. Reads past
    * the front return zero bits and drive `offset` negative — the FSE
    * weight interleave uses that as its stop condition; everything
    * else must end at exactly zero. */
  private final class BackBits(bytes: Array[Byte], from: Int, until: Int) {
    if (until <= from) corrupt()
    private[this] val last = bytes(until - 1) & 0xFF
    if (last == 0) corrupt()
    var offset: Long = (until - from - 1).toLong * 8 + highBit(last)
    def read(n: Int): Long = {
      offset -= n
      var v = 0L
      var i = 0
      while (i < n) {
        val p = offset + i
        if (p >= 0) {
          val idx = from + (p >> 3).toInt
          v |= ((bytes(idx) >> (p & 7)) & 1).toLong << i
        }
        i += 1
      }
      v
    }
  }

  // ---------------------------------------------------------------
  // FSE
  // ---------------------------------------------------------------

  private final class FseTable(val al: Int, count: Array[Int]) {
    val size: Int = 1 << al
    val symbol = new Array[Int](size)
    val nbits = new Array[Int](size)
    val base = new Array[Int](size)
    locally {
      if (count.length > size + 1) corrupt()
      var highThreshold = size - 1
      var s = 0
      while (s < count.length) { // prob -1 cells at the high end
        if (count(s) == -1) {
          if (highThreshold < 0) corrupt()
          symbol(highThreshold) = s; highThreshold -= 1
        }
        s += 1
      }
      val step = (size >> 1) + (size >> 3) + 3
      val mask = size - 1
      var pos = 0
      s = 0
      while (s < count.length) {
        var i = 0
        while (i < count(s)) {
          symbol(pos) = s
          do pos = (pos + step) & mask while (pos > highThreshold)
          i += 1
        }
        s += 1
      }
      if (pos != 0) corrupt()
      val next = new Array[Int](count.length)
      s = 0
      while (s < count.length) { next(s) = math.max(count(s), 0); s += 1 }
      var c = 0
      while (c < size) {
        val sym = symbol(c)
        if (count(sym) == -1) { nbits(c) = al; base(c) = 0 }
        else {
          val x = next(sym); next(sym) += 1
          nbits(c) = al - highBit(x)
          base(c) = (x << nbits(c)) - size
        }
        c += 1
      }
    }
    /** RLE pseudo-table: one state, zero bits, fixed symbol. */
    def this(sym: Int) = {
      this(0, Array(1))
      symbol(0) = sym; nbits(0) = 0; base(0) = 0
    }
  }

  /** Normalized-count header (RFC 8878 §4.1.1): variable-width values
    * with the low-bits threshold + 1-bit rewind, 2-bit zero-repeat
    * flags, byte-aligned at the end. */
  private def readFseDesc(br: FwdBits, maxAl: Int, maxSymbols: Int): FseTable = {
    val al = 5 + br.read(4)
    if (al > maxAl) corrupt()
    var remaining = 1 << al
    val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (remaining > 0 && counts.length < maxSymbols) {
      val bits = highBit(remaining + 1) + 1
      var v = br.read(bits)
      val lowerMask = (1 << (bits - 1)) - 1
      val threshold = (1 << bits) - 1 - (remaining + 1)
      if ((v & lowerMask) < threshold) { br.rewind(1); v &= lowerMask }
      else if (v > lowerMask) v -= threshold
      val proba = v - 1
      if (proba < -1 || proba > remaining) corrupt()
      counts += proba
      remaining -= math.abs(proba)
      if (proba == 0) {
        var repeat = br.read(2)
        var more = true
        while (more) {
          var i = 0
          while (i < repeat && counts.length < maxSymbols) { counts += 0; i += 1 }
          if (repeat == 3) repeat = br.read(2) else more = false
        }
      }
    }
    if (remaining != 0) corrupt()
    br.alignByte()
    new FseTable(al, counts.toArray)
  }

  // ---------------------------------------------------------------
  // Huffman
  // ---------------------------------------------------------------

  private final class HufTable(weights: Array[Int]) {
    // implied last weight completes the power of two
    private val partial = weights.map(w => if (w > 0) 1 << (w - 1) else 0).sum
    if (partial <= 0) corrupt()
    val maxBits: Int = highBit(partial) + 1 // power of 2 STRICTLY above the sum
    private val total = 1 << maxBits
    private val leftover = total - partial
    if (leftover <= 0 || java.lang.Integer.bitCount(leftover) != 1) corrupt()
    private val lastWeight = highBit(leftover) + 1
    val all: Array[Int] = weights :+ lastWeight
    if (maxBits > 11) corrupt()
    val size: Int = 1 << maxBits
    val symbol = new Array[Int](size)
    val len = new Array[Int](size)
    locally {
      var pos = 0
      var w = 1
      while (w <= maxBits) { // longest codes (lowest weight) first
        var s = 0
        while (s < all.length) {
          if (all(s) == w) {
            val l = maxBits + 1 - w
            val n = 1 << (maxBits - l)
            var i = 0
            while (i < n) { symbol(pos + i) = s; len(pos + i) = l; i += 1 }
            pos += n
          }
          s += 1
        }
        w += 1
      }
      if (pos != size) corrupt()
    }
  }

  /** Huffman tree description: direct 4-bit weights (header ≥ 128) or
    * an FSE-compressed weight stream with two interleaved states
    * (header < 128 = compressed size). Returns (table, bytes consumed). */
  private def readHufTable(bytes: Array[Byte], from: Int, until: Int): (HufTable, Int) = {
    if (from >= until) corrupt()
    val h = bytes(from) & 0xFF
    if (h >= 128) {
      val n = h - 127 // number of explicit weights; last is implied
      val nb = (n + 1) / 2
      if (from + 1 + nb > until) corrupt()
      val w = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = bytes(from + 1 + i / 2) & 0xFF
        w(i) = if (i % 2 == 0) b >> 4 else b & 0xF
        if (w(i) > 11) corrupt() // weight <= Max_Number_of_Bits <= 11
        i += 1
      }
      (new HufTable(w), 1 + nb)
    } else {
      if (from + 1 + h > until) corrupt()
      val br = new FwdBits(bytes, from + 1, from + 1 + h)
      val table = readFseDesc(br, maxAl = 6, maxSymbols = 256)
      val streamFrom = from + 1 + br.bytesConsumed
      val bb = new BackBits(bytes, streamFrom, from + 1 + h)
      var s1 = bb.read(table.al).toInt
      var s2 = bb.read(table.al).toInt
      val w = scala.collection.mutable.ArrayBuffer.empty[Int]
      var done = false
      while (!done) { // two interleaved states; stop when the stream is drained
        w += table.symbol(s1)
        s1 = table.base(s1) + bb.read(table.nbits(s1)).toInt
        if (bb.offset < 0) { w += table.symbol(s2); done = true }
        else {
          w += table.symbol(s2)
          s2 = table.base(s2) + bb.read(table.nbits(s2)).toInt
          if (bb.offset < 0) { w += table.symbol(s1); done = true }
        }
        if (w.length > 256) corrupt()
      }
      if (w.exists(_ > 11)) corrupt()
      (new HufTable(w.toArray), 1 + h)
    }
  }

  private def hufDecodeStream(bytes: Array[Byte], from: Int, until: Int,
      t: HufTable, out: Array[Byte], outFrom: Int, n: Int): Unit = {
    val bb = new BackBits(bytes, from, until)
    var i = 0
    while (i < n) {
      val peek = bb.read(t.maxBits).toInt // read-then-give-back the surplus
      val idx = peek & (t.size - 1)
      val l = t.len(idx)
      bb.offset += t.maxBits - l
      if (bb.offset < 0) corrupt()
      out(outFrom + i) = t.symbol(idx).toByte
      i += 1
    }
    if (bb.offset != 0) corrupt()
  }

  // peek semantics: BackBits.read moves offset down then extracts from
  // [offset, offset+n); restoring the surplus re-positions exactly.

  // ---------------------------------------------------------------
  // sequences: predefined distributions + code value tables (RFC 8878)
  // ---------------------------------------------------------------

  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ---------------------------------------------------------------
  // frame walk
  // ---------------------------------------------------------------

  private final class Out {
    var buf = new Array[Byte](64 << 10)
    var len = 0
    def ensure(n: Int): Unit = {
      if (len + n > MaxOut) corrupt()
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, MaxOut))
      }
    }
    def add(b: Array[Byte], from: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(b, from, buf, len, n); len += n
    }
    def fill(v: Byte, n: Int): Unit = {
      ensure(n); java.util.Arrays.fill(buf, len, len + n, v); len += n
    }
    def matchCopy(offset: Int, n: Int): Unit = {
      if (offset <= 0 || offset > len) corrupt()
      ensure(n)
      var i = 0
      while (i < n) { buf(len + i) = buf(len + i - offset); i += 1 } // overlap-safe
      len += n
    }
  }

  private def le(bytes: Array[Byte], from: Int, n: Int): Long = {
    var v = 0L
    var i = 0
    while (i < n) { v |= (bytes(from + i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  /** Per-frame mutable decoding context (tables that repeat across
    * blocks within one frame). */
  private final class FrameCtx {
    var huf: HufTable = null
    var llT: FseTable = null
    var ofT: FseTable = null
    var mlT: FseTable = null
    val rep = Array(1L, 4L, 8L)
  }

  private def seqTable(mode: Int, bytes: Array[Byte], posRef: Array[Int],
      blockEnd: Int, default: Array[Int], maxAl: Int, maxSym: Int,
      prev: FseTable): FseTable = mode match {
    case 0 => new FseTable(if (default eq OfDefault) 5 else 6, default)
    case 1 =>
      if (posRef(0) >= blockEnd) corrupt()
      val sym = bytes(posRef(0)) & 0xFF; posRef(0) += 1
      if (sym >= maxSym) corrupt()
      new FseTable(sym)
    case 2 =>
      val br = new FwdBits(bytes, posRef(0), blockEnd)
      val t = readFseDesc(br, maxAl, maxSym)
      posRef(0) += br.bytesConsumed
      t
    case _ =>
      if (prev == null) corrupt()
      prev
  }

  private def decodeBlock(bytes: Array[Byte], from: Int, until: Int,
      ctx: FrameCtx, out: Out): Unit = {
    var pos = from
    // ---- literals section
    if (pos >= until) corrupt()
    val h0 = bytes(pos) & 0xFF
    val litType = h0 & 3
    val sizeFormat = (h0 >> 2) & 3
    var regen = 0
    var compSize = 0
    if (litType <= 1) { // raw / RLE
      if ((sizeFormat & 1) == 0) { regen = h0 >> 3; pos += 1 }
      else if (sizeFormat == 1) { regen = (le(bytes, pos, 2) >> 4).toInt; pos += 2 }
      else { regen = (le(bytes, pos, 3) >> 4).toInt; pos += 3 }
    } else {
      sizeFormat match {
        case 0 | 1 =>
          val v = le(bytes, pos, 3) >> 4
          regen = (v & 0x3FF).toInt; compSize = ((v >> 10) & 0x3FF).toInt; pos += 3
        case 2 =>
          val v = le(bytes, pos, 4) >> 4
          regen = (v & 0x3FFF).toInt; compSize = ((v >> 14) & 0x3FFF).toInt; pos += 4
        case _ =>
          val v = le(bytes, pos, 5) >> 4
          regen = (v & 0x3FFFF).toInt; compSize = ((v >> 18) & 0x3FFFF).toInt; pos += 5
      }
    }
    if (regen > MaxOut) corrupt()
    val fourStreams = litType >= 2 && sizeFormat != 0
    val literals = new Array[Byte](regen)
    litType match {
      case 0 =>
        if (pos + regen > until) corrupt()
        System.arraycopy(bytes, pos, literals, 0, regen); pos += regen
      case 1 =>
        if (pos + 1 > until) corrupt()
        java.util.Arrays.fill(literals, bytes(pos)); pos += 1
      case _ =>
        val litEnd = pos + compSize
        if (litEnd > until) corrupt()
        if (litType == 2) {
          val (t, used) = readHufTable(bytes, pos, litEnd)
          ctx.huf = t; pos += used
        } else if (ctx.huf == null) corrupt()
        val t = ctx.huf
        if (!fourStreams) hufDecodeStream(bytes, pos, litEnd, t, literals, 0, regen)
        else {
          if (pos + 6 > litEnd) corrupt()
          val s1 = le(bytes, pos, 2).toInt
          val s2 = le(bytes, pos + 2, 2).toInt
          val s3 = le(bytes, pos + 4, 2).toInt
          val dataFrom = pos + 6
          val s4 = litEnd - dataFrom - s1 - s2 - s3
          if (s4 <= 0) corrupt()
          val seg = (regen + 3) / 4
          val lens = Array(seg, seg, seg, regen - 3 * seg)
          if (lens(3) < 0) corrupt()
          val starts = Array(dataFrom, dataFrom + s1, dataFrom + s1 + s2,
            dataFrom + s1 + s2 + s3)
          val sizes = Array(s1, s2, s3, s4)
          var k = 0
          var o = 0
          while (k < 4) {
            hufDecodeStream(bytes, starts(k), starts(k) + sizes(k), t, literals, o, lens(k))
            o += lens(k)
            k += 1
          }
        }
        pos = litEnd
    }
    // ---- sequences section
    if (pos >= until) corrupt()
    val b0 = bytes(pos) & 0xFF
    var nSeq = 0
    if (b0 < 128) { nSeq = b0; pos += 1 }
    else if (b0 < 255) {
      if (pos + 2 > until) corrupt()
      nSeq = ((b0 - 128) << 8) + (bytes(pos + 1) & 0xFF); pos += 2
    } else {
      if (pos + 3 > until) corrupt()
      nSeq = (bytes(pos + 1) & 0xFF) + ((bytes(pos + 2) & 0xFF) << 8) + 0x7F00
      pos += 3
    }
    if (nSeq == 0) {
      if (pos != until) corrupt()
      out.add(literals, 0, regen)
      return
    }
    if (pos >= until) corrupt()
    val modes = bytes(pos) & 0xFF
    if ((modes & 3) != 0) corrupt() // reserved bits
    pos += 1
    val posRef = Array(pos)
    val llT = seqTable((modes >> 6) & 3, bytes, posRef, until, LlDefault, 9, 36, ctx.llT)
    val ofT = seqTable((modes >> 4) & 3, bytes, posRef, until, OfDefault, 8, 32, ctx.ofT)
    val mlT = seqTable((modes >> 2) & 3, bytes, posRef, until, MlDefault, 9, 53, ctx.mlT)
    ctx.llT = llT; ctx.ofT = ofT; ctx.mlT = mlT
    pos = posRef(0)
    val bb = new BackBits(bytes, pos, until)
    var llS = bb.read(llT.al).toInt
    var ofS = bb.read(ofT.al).toInt
    var mlS = bb.read(mlT.al).toInt
    var litPos = 0
    var s = 0
    while (s < nSeq) {
      val ofCode = ofT.symbol(ofS)
      val llCode = llT.symbol(llS)
      val mlCode = mlT.symbol(mlS)
      if (llCode >= 36 || mlCode >= 53 || ofCode >= 32) corrupt()
      // extra bits: offset, then match, then literals
      val ofVal = (1L << ofCode) + bb.read(ofCode)
      val ml = MlBase(mlCode) + bb.read(MlBits(mlCode)).toInt
      val ll = LlBase(llCode) + bb.read(LlBits(llCode)).toInt
      if (bb.offset < 0) corrupt()
      // repeat-offset history (RFC 8878 §3.1.1.5)
      val offset: Long =
        if (ofVal > 3) {
          val o = ofVal - 3
          ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0); ctx.rep(0) = o
          o
        } else {
          val idx = (ofVal - 1 + (if (ll == 0) 1 else 0)).toInt
          if (idx == 0) ctx.rep(0)
          else {
            val o = if (idx < 3) ctx.rep(idx) else ctx.rep(0) - 1
            if (o <= 0) corrupt()
            if (idx == 1) { ctx.rep(1) = ctx.rep(0) }
            else { ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0) }
            ctx.rep(0) = o
            o
          }
        }
      if (litPos + ll > regen) corrupt()
      out.add(literals, litPos, ll)
      litPos += ll
      if (offset > Int.MaxValue) corrupt()
      out.matchCopy(offset.toInt, ml)
      if (s != nSeq - 1) { // state updates: literals, match, offset
        llS = llT.base(llS) + bb.read(llT.nbits(llS)).toInt
        mlS = mlT.base(mlS) + bb.read(mlT.nbits(mlS)).toInt
        ofS = ofT.base(ofS) + bb.read(ofT.nbits(ofS)).toInt
        if (bb.offset < 0) corrupt()
      }
      s += 1
    }
    if (bb.offset != 0) corrupt()
    out.add(literals, litPos, regen - litPos)
  }

  /** XXH64 (public xxHash spec) — zstd's content checksum. */
  private[ops] def xxh64(bytes: Array[Byte], from: Int, until: Int, seed: Long = 0L): Long = {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    val len = until - from
    def leL(i: Int): Long = le(bytes, i, 8)
    def leI(i: Int): Long = le(bytes, i, 4)
    var h: Long = 0L
    var p = from
    if (len >= 32) {
      var v1 = seed + P1 + P2; var v2 = seed + P2; var v3 = seed; var v4 = seed - P1
      while (p + 32 <= until) {
        v1 = java.lang.Long.rotateLeft(v1 + leL(p) * P2, 31) * P1
        v2 = java.lang.Long.rotateLeft(v2 + leL(p + 8) * P2, 31) * P1
        v3 = java.lang.Long.rotateLeft(v3 + leL(p + 16) * P2, 31) * P1
        v4 = java.lang.Long.rotateLeft(v4 + leL(p + 24) * P2, 31) * P1
        p += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      def merge(acc: Long, v: Long): Long =
        (acc ^ (java.lang.Long.rotateLeft(v * P2, 31) * P1)) * P1 + P4
      h = merge(h, v1); h = merge(h, v2); h = merge(h, v3); h = merge(h, v4)
    } else h = seed + P5
    h += len
    while (p + 8 <= until) {
      h = java.lang.Long.rotateLeft(h ^ (java.lang.Long.rotateLeft(leL(p) * P2, 31) * P1), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= until) {
      h = java.lang.Long.rotateLeft(h ^ (leI(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < until) {
      h = java.lang.Long.rotateLeft(h ^ ((bytes(p) & 0xFFL) * P5), 11) * P1
      p += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  private final case class Walk(out: Out, nFrames: Int, nBlocks: Int,
      checksumChecked: Boolean)

  /** The shared frame walk; throws Corrupt on any structural violation. */
  private def walk(bytes: Array[Byte]): Walk = {
    val out = new Out
    var pos = 0
    var nFrames = 0
    var nBlocks = 0
    var checksumChecked = false
    while (pos < bytes.length) {
      if (pos + 4 > bytes.length) corrupt()
      val magic = le(bytes, pos, 4)
      pos += 4
      if ((magic & 0xFFFFFFF0L) == 0x184D2A50L) { // skippable frame
        if (pos + 4 > bytes.length) corrupt()
        val sz = le(bytes, pos, 4).toInt
        pos += 4 + sz
        if (sz < 0 || pos > bytes.length) corrupt()
      } else if (magic == 0xFD2FB528L) {
        nFrames += 1
        if (pos >= bytes.length) corrupt()
        val fhd = bytes(pos) & 0xFF; pos += 1
        if ((fhd & 0x08) != 0) corrupt() // reserved bit
        val singleSegment = (fhd & 0x20) != 0
        val checksumFlag = (fhd & 0x04) != 0
        val didSize = Array(0, 1, 2, 4)(fhd & 3)
        if (!singleSegment) pos += 1 // window descriptor (unused: MaxOut guards)
        if (didSize > 0) {
          if (pos + didSize > bytes.length) corrupt()
          if (le(bytes, pos, didSize) != 0) corrupt() // dictionaries unsupported
          pos += didSize
        }
        val fcsSize = (fhd >> 6) match {
          case 0 => if (singleSegment) 1 else 0
          case 1 => 2
          case 2 => 4
          case _ => 8
        }
        var contentSize = -1L
        if (fcsSize > 0) {
          if (pos + fcsSize > bytes.length) corrupt()
          contentSize = le(bytes, pos, fcsSize)
          if (fcsSize == 2) contentSize += 256
          pos += fcsSize
        }
        val frameStart = out.len
        val ctx = new FrameCtx
        var last = false
        while (!last) {
          if (pos + 3 > bytes.length) corrupt()
          val bh = le(bytes, pos, 3).toInt; pos += 3
          last = (bh & 1) != 0
          val btype = (bh >> 1) & 3
          val bsize = bh >> 3
          nBlocks += 1
          btype match {
            case 0 =>
              if (pos + bsize > bytes.length) corrupt()
              out.add(bytes, pos, bsize); pos += bsize
            case 1 =>
              if (pos + 1 > bytes.length) corrupt()
              out.fill(bytes(pos), bsize); pos += 1
            case 2 =>
              if (pos + bsize > bytes.length) corrupt()
              decodeBlock(bytes, pos, pos + bsize, ctx, out); pos += bsize
            case _ => corrupt()
          }
        }
        if (contentSize >= 0 && out.len - frameStart != contentSize) corrupt()
        if (checksumFlag) {
          if (pos + 4 > bytes.length) corrupt()
          val want = le(bytes, pos, 4); pos += 4
          if ((xxh64(out.buf, frameStart, out.len) & 0xFFFFFFFFL) != want) corrupt()
          checksumChecked = true
        }
      } else corrupt()
    }
    if (nFrames == 0) corrupt()
    Walk(out, nFrames, nBlocks, checksumChecked)
  }

  /** Test hook: the walk without the corrupt→None catch, so a spec can
    * see WHERE a structurally valid stream is being rejected. */
  private[ops] def walkUnsafe(bytes: Array[Byte]): (Int, Int, Int) = {
    val w = walk(bytes)
    (w.out.len, w.nFrames, w.nBlocks)
  }

  /** Decode a (possibly multi-frame) zstd stream to content stats. */
  def decode(mediaId: Long, bytes: Array[Byte]): Option[ZstdDecoded] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val w = walk(bytes)
      var sum = 0L
      var wsum = 0L
      var i = 0
      while (i < w.out.len) {
        val v = w.out.buf(i) & 0xFF
        sum += v; wsum += v.toLong * (i + 1)
        i += 1
      }
      Some(ZstdDecoded(mediaId, w.out.len, w.nFrames, w.nBlocks,
        w.checksumChecked, sum, wsum))
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }
  }

  /** Raw decompress for spec-level byte-equality checks. */
  def decompress(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null || bytes.length < 4) return None
    try {
      val w = walk(bytes)
      Some(java.util.Arrays.copyOf(w.out.buf, w.out.len))
    } catch {
      case _: Corrupt | _: ArrayIndexOutOfBoundsException |
          _: NegativeArraySizeException => None
    }
  }

  /** The x181 gate body: compress each payload with zstd-jni (the
    * reference implementation, on the Spark classpath) at a per-row
    * level — checksummed for every third row — and decode with THIS
    * decoder; match_input pins byte equality. Narrow per-row flatMap,
    * zero shuffle. */
  def roundTrip(payloads: DataFrame): Dataset[ZstdRoundTrip] = {
    implicit val enc = Encoders.product[ZstdRoundTrip]
    payloads.select(col("media_id").cast("long"), col("media"),
        col("level").cast("int"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val data = Option(row.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          val level = row.getInt(2)
          val m = row.getLong(0)
          val comp =
            if (m % 3 == 0) {
              val c = new com.github.luben.zstd.ZstdCompressCtx()
              try { c.setLevel(level); c.setChecksum(true); c.compress(data) }
              finally c.close()
            } else com.github.luben.zstd.Zstd.compress(data, level)
          decode(m, comp).map { d =>
            val back = decompress(comp).get
            ZstdRoundTrip(d.media_id, d.out_len, d.n_frames, d.n_blocks, level,
              java.util.Arrays.equals(back, data), d.sum_bytes, d.wsum_bytes)
          }
        }
      }
  }
}
