package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** REAL FLAC decode — the lossless-audio leg next to [[Mp3Frames]]/
  * [[Mp3Spectra]] (perceptual) and [[JpegDecoder]]/[[GifDecoder]]
  * (images): stream walk + frame decode for the subframe families a
  * verbatim/fixed-predictor encoder emits, per the public FLAC format
  * (RFC 9639 / xiph.org spec):
  *
  *   - "fLaC" magic, metadata blocks, STREAMINFO (sample rate, channel
  *     count, bits per sample) — other block types skipped by length;
  *   - frame header: 14-bit sync, blocking strategy, blocksize /
  *     sample-rate / channel / bps codes (incl. the
  *     read-from-STREAMINFO codes and the 8/16-bit blocksize-follows
  *     forms), UTF-8-coded frame number, CRC-8 (poly 0x07) verified;
  *   - subframes: CONSTANT, VERBATIM, FIXED orders 0–4 (the closed-form
  *     predictors with binomial coefficients), LPC orders 1–32
  *     (quantized integer coefficients at 1–15 bits + arithmetic right
  *     shift on a 64-bit accumulator — integer-exact, RFC 9639 §9.2.5),
  *     wasted-bits unary prefix; rice-coded residual partitions (4- and
  *     5-bit parameter forms, escape-to-raw, zigzag, quotient = run of
  *     0s terminated by 1 — the run polarity that cannot emulate the
  *     all-ones sync);
  *   - frame footer CRC-16 (poly 0x8005) over the whole frame, verified.
  *
  * Out-of-class routes, same contract as [[Mp3Spectra]]'s big-values:
  * reserved subframe types, the 1111 invalid LPC precision escape, a
  * negative (reserved) LPC shift, and stereo decorrelation modes
  * (left/right/mid-side) all STOP the walk and emit one `ok = false`
  * row for that frame — one unsupported frame costs the tail, never the
  * task; a CRC mismatch does the same.
  *
  * Scale shape: narrow per-row flatMap, one media blob in → frame rows
  * out, no shuffle; corrupt bytes degrade a single row.
  */
object FlacFrames {

  /** One decoded (or fake-routed) frame. `dot_s` = Σ (i+1)·s_i over the
    * frame's first-channel samples — position-weighted so a permuted or
    * shifted reconstruction cannot hash-match. */
  final case class FlacFrame(
      media_id: Long,
      frame_idx: Long,
      blocksize: Long,
      sample_rate: Long,
      subframe_type: Long, // 0 constant, 1 verbatim, 2 fixed, 3 lpc; -1 routed
      pred_order: Long,
      sum_s: Long,
      dot_s: Long,
      min_s: Long,
      max_s: Long,
      ok: Boolean)

  /** Control-flow signal for a read past the end of the byte array — a
    * frame truncated mid-subframe (header CRC-8 can still be valid on a
    * partially-downloaded file) must route() that frame, never throw an
    * ArrayIndexOutOfBoundsException out of the flatMap and kill the task. */
  private object Underflow extends RuntimeException with scala.util.control.NoStackTrace

  private final class BitReader(b: Array[Byte]) {
    var pos = 0L // bit position
    def bytePos: Int = (pos / 8).toInt
    def aligned: Boolean = pos % 8 == 0
    def remaining: Long = b.length.toLong * 8 - pos
    def bits(n: Int): Long = {
      if (pos + n > b.length.toLong * 8) throw Underflow
      var v = 0L
      var k = n
      while (k > 0) {
        val i = (pos / 8).toInt
        val off = (pos % 8).toInt
        val take = math.min(8 - off, k)
        val chunk = ((b(i) & 0xff) >>> (8 - off - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        pos += take
        k -= take
      }
      v
    }
    def signed(n: Int): Long = {
      val v = bits(n)
      if ((v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    /** Run of 0s terminated by a 1; returns the run length. */
    def unary(): Long = {
      var q = 0L
      while (bits(1) == 0L) q += 1
      q
    }
    def align(): Unit = if (pos % 8 != 0) pos += 8 - pos % 8
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= b(i) & 0xff
      var k = 0
      while (k < 8) { c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff; k += 1 }
      i += 1
    }
    c
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var c = 0
    var i = from
    while (i < until) {
      c ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) { c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff; k += 1 }
      i += 1
    }
    c
  }

  private val FixedCoef: Array[Array[Long]] = Array(
    Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L), Array(4L, -6L, 4L, -1L))

  /** Rice-partitioned residual into `out[order..blocksize)`; false on an
    * unsupported escape/method. */
  private def residual(r: BitReader, out: Array[Long], order: Int, blocksize: Int): Boolean = {
    val method = r.bits(2).toInt
    if (method > 1) return false
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val porder = r.bits(4).toInt
    val nPart = 1 << porder
    if (blocksize % nPart != 0) return false
    var idx = order
    var p = 0
    while (p < nPart) {
      val n = blocksize / nPart - (if (p == 0) order else 0)
      if (n < 0) return false
      val param = r.bits(pBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < n) { out(idx) = if (raw == 0) 0L else r.signed(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < n) {
          val q = r.unary()
          val zz = (q << param) | r.bits(param)
          out(idx) = (zz >>> 1) ^ -(zz & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    true
  }

  private val BlockSizes = Array(0, 192, 576, 1152, 2304, 4608, -8, -16, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768)
  private val Rates = Array(-1, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100, 48000, 96000, -8, -16, -160, -2)

  def decode(mediaId: Long, bytes: Array[Byte]): Seq[FlacFrame] = {
    if (bytes.length < 42) return Nil
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C')) return Nil
    var i = 4
    var last = false
    var siRate = 0L; var siCh = 0; var siBps = 0
    var sawInfo = false
    while (!last) {
      if (i + 4 > bytes.length) return Nil
      val h = bytes(i) & 0xff
      last = (h & 0x80) != 0
      val btype = h & 0x7f
      val len = ((bytes(i + 1) & 0xff) << 16) | ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
      if (i + 4 + len > bytes.length) return Nil
      if (btype == 0) {
        if (len != 34) return Nil
        val r = new BitReader(bytes)
        r.pos = (i + 4).toLong * 8 + 80 // skip min/max blocksize (2×16) + framesize (2×24)
        siRate = r.bits(20)
        siCh = r.bits(3).toInt + 1
        siBps = r.bits(5).toInt + 1
        sawInfo = true
      }
      i += 4 + len
    }
    if (!sawInfo || siRate == 0) return Nil

    val out = Seq.newBuilder[FlacFrame]
    var frameIdx = 0L
    var done = false
    while (!done && i < bytes.length) {
      val frameStart = i
      val r = new BitReader(bytes)
      r.pos = i.toLong * 8
      def route(): Unit = { out += FlacFrame(mediaId, frameIdx, 0, 0, -1, -1, 0, 0, 0, 0, ok = false); done = true }
      try {
      if (r.remaining < 40) { done = true }
      else if (r.bits(14) != 0x3ffe || r.bits(1) != 0) route()
      else {
        r.bits(1) // blocking strategy: fixed (0) expected; variable also walks
        val bsCode = r.bits(4).toInt
        val srCode = r.bits(4).toInt
        val chCode = r.bits(4).toInt
        val bpsCode = r.bits(3).toInt
        if (r.bits(1) != 0 || bsCode == 0) { route() }
        else {
          // UTF-8-coded frame/sample number (1..7 bytes)
          val b0 = r.bits(8).toInt
          var ext = if (b0 < 0x80) 0 else Integer.numberOfLeadingZeros(~(b0 << 24)) - 1
          var utf8Ok = b0 < 0x80 || (ext >= 1 && ext <= 6)
          var e = 0
          while (utf8Ok && e < ext) { if (r.bits(2) != 2) utf8Ok = false else r.bits(6); e += 1 }
          val blocksize = BlockSizes(bsCode) match {
            case -8  => r.bits(8).toInt + 1
            case -16 => r.bits(16).toInt + 1
            case v   => v
          }
          val rate = Rates(srCode) match {
            case -1   => siRate
            case -8   => r.bits(8) * 1000L
            case -16  => r.bits(16)
            case -160 => r.bits(16) * 10L
            case -2   => -1L
            case v    => v.toLong
          }
          val bps = bpsCode match {
            case 0 => siBps
            case 1 => 8
            case 2 => 12
            case 4 => 16
            case 5 => 20
            case 6 => 24
            case 7 => 32
            case _ => -1
          }
          val headerEnd = r.bytePos
          val crc8Read = r.bits(8).toInt
          val nCh = if (chCode < 8) chCode + 1 else -1 // decorrelated stereo routed
          if (!utf8Ok || rate <= 0 || bps <= 0 || nCh <= 0 || blocksize <= 0 ||
            crc8Read != crc8(bytes, frameStart, headerEnd)) { route() }
          else {
            // subframes (first channel's samples feed the output stats)
            var okFrame = true
            var first: Array[Long] = null
            var sfType = -1L
            var sfOrder = -1L
            var ch = 0
            while (okFrame && ch < nCh) {
              if (r.bits(1) != 0) okFrame = false
              else {
                val t = r.bits(6).toInt
                val wasted =
                  if (r.bits(1) == 1L) (r.unary() + 1).toInt else 0
                val effBps = bps - wasted
                val s = new Array[Long](blocksize)
                val okSf =
                  if (t == 0) { // CONSTANT
                    val c = r.signed(effBps); java.util.Arrays.fill(s, c)
                    if (ch == 0) { sfType = 0; sfOrder = 0 }
                    true
                  } else if (t == 1) { // VERBATIM
                    var k = 0
                    while (k < blocksize) { s(k) = r.signed(effBps); k += 1 }
                    if (ch == 0) { sfType = 1; sfOrder = 0 }
                    true
                  } else if (t >= 8 && t <= 12) { // FIXED order 0..4
                    val order = t - 8
                    var k = 0
                    while (k < order) { s(k) = r.signed(effBps); k += 1 }
                    if (residual(r, s, order, blocksize)) {
                      val coef = FixedCoef(order)
                      k = order
                      while (k < blocksize) {
                        var acc = s(k)
                        var j = 0
                        while (j < order) { acc += coef(j) * s(k - 1 - j); j += 1 }
                        s(k) = acc
                        k += 1
                      }
                      if (ch == 0) { sfType = 2; sfOrder = order.toLong }
                      true
                    } else false
                  } else if (t >= 32 && ((t & 0x1f) + 1) <= blocksize) { // LPC order 1..32 (type 1xxxxx)
                    val order = (t & 0x1f) + 1
                    var k = 0
                    while (k < order) { s(k) = r.signed(effBps); k += 1 }
                    val precM1 = r.bits(4).toInt
                    val shift = r.signed(5)
                    // 1111 is the spec's invalid precision escape; a
                    // negative shift is reserved (RFC 9639 §9.2.5) — route
                    if (precM1 == 15 || shift < 0) false
                    else {
                      val coef = new Array[Long](order)
                      var j = 0
                      while (j < order) { coef(j) = r.signed(precM1 + 1); j += 1 }
                      if (residual(r, s, order, blocksize)) {
                        // quantized-integer prediction: 64-bit accumulator,
                        // arithmetic right shift — integer-exact, same gate
                        // pattern as FIXED
                        k = order
                        while (k < blocksize) {
                          var acc = 0L
                          var j2 = 0
                          while (j2 < order) { acc += coef(j2) * s(k - 1 - j2); j2 += 1 }
                          s(k) += (acc >> shift)
                          k += 1
                        }
                        if (ch == 0) { sfType = 3; sfOrder = order.toLong }
                        true
                      } else false
                    }
                  } else false // reserved subframe types: routed
                if (!okSf) okFrame = false
                else {
                  if (wasted > 0) { var k = 0; while (k < blocksize) { s(k) <<= wasted; k += 1 } }
                  if (ch == 0) first = s
                }
              }
              ch += 1
            }
            if (!okFrame || r.remaining < 16) route()
            else {
              r.align()
              val footEnd = r.bytePos
              val crc16Read = r.bits(16).toInt
              if (crc16Read != crc16(bytes, frameStart, footEnd)) route()
              else {
                var sum = 0L; var dot = 0L
                var mn = Long.MaxValue; var mx = Long.MinValue
                var k = 0
                while (k < blocksize) {
                  val v = first(k)
                  sum += v; dot += (k + 1) * v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  k += 1
                }
                out += FlacFrame(mediaId, frameIdx, blocksize, rate, sfType, sfOrder,
                  sum, dot, mn, mx, ok = true)
                frameIdx += 1
                i = r.bytePos
              }
            }
          }
        }
      }
      } catch { case Underflow => route() } // truncated mid-frame: one row, walk stops
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → frame rows. */
  def frames(media: DataFrame): Dataset[FlacFrame] = {
    implicit val enc = Encoders.product[FlacFrame]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(r.getLong(0), bytes)
        }
      }
  }
}
