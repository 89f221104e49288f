package graft.ops

/** Pure-Scala baseline JPEG decoder — the entropy-coded half of the
  * multimodal surface that [[Multimodal.RealDecoder]]'s header walk stops
  * short of (its scaladoc's documented gap): canonical Huffman DC/AC
  * decoding, run-length/EOB/ZRL coefficient expansion, dequantization,
  * zigzag, full 8×8 float IDCT, level shift, and YCbCr→RGB. No external
  * codec library — everything here is the ITU-T T.81 baseline process
  * implemented directly.
  *
  * Scope (checked, not assumed): baseline sequential DCT (SOF0), 8-bit
  * precision, 1 or 3 components with sampling factors in {1,2} (grayscale,
  * 4:4:4, 4:2:2, 4:2:0), interleaved single scan, optional restart
  * intervals, 0xFF00 byte unstuffing. Progressive (SOF2), arithmetic
  * coding, 12-bit, and hierarchical modes return None — the caller routes
  * to [[Multimodal.FakeDecoder]] exactly as for any unreadable blob.
  *
  * Cross-validation: JpegDecoderSpec checks this decoder's pixel output
  * against the JDK's own ImageIO JPEG codec on round-tripped images
  * (IDCT implementations may legally differ by ±1–2 per sample, so that
  * comparison is tolerance-based) and against handcrafted DC-only streams
  * whose exact pixel values are integer arithmetic (no tolerance).
  */
object JpegDecoder {

  /** Row-major, component-interleaved 8-bit samples (1 = gray, 3 = RGB). */
  final case class Decoded(width: Int, height: Int, nComp: Int, pixels: Array[Byte])

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the mincode/maxcode/valptr form of T.81
    * §F.2.2.3 — decode walks one bit at a time, bounded at 16 bits. */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        code = (code << 1) | br.bit()
        if (maxCode(l) >= 0 && code <= maxCode(l) && code >= minCode(l))
          return symbols(valPtr(l) + code - minCode(l))
        l += 1
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
  }

  /** MSB-first bit reader over the entropy segment with 0xFF00 unstuffing;
    * stops (throws) at any non-stuffing marker so the scan loop can end on
    * truncated data instead of reading garbage. Restart markers are
    * consumed by the caller via [[restart]]. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new IllegalArgumentException("truncated entropy data")
        var b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) throw new IllegalArgumentException("truncated after 0xFF")
          val m = data(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte: the data byte IS 0xFF
          else throw new MarkerReached(m)
          b = 0xff
        }
        cur = b
        nbits = 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      if (pos + 1 >= data.length || (data(pos) & 0xff) != 0xff)
        throw new IllegalArgumentException("expected restart marker")
      val m = data(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) throw new IllegalArgumentException(f"expected RSTn, got FF$m%02X")
      pos += 2
    }
  }
  private final class MarkerReached(val marker: Int) extends RuntimeException

  /** T.81 §F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Component(
      id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  def decode(bytes: Array[Byte]): Option[Decoded] =
    try decodeOrThrow(bytes) catch { case _: Exception => None }

  private def decodeOrThrow(d: Array[Byte]): Option[Decoded] = {
    if (d.length < 4 || (d(0) & 0xff) != 0xff || (d(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var comps: Array[Component] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var p = 2

    def u16(i: Int) = ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)

    while (p + 4 <= d.length) {
      if ((d(p) & 0xff) != 0xff) return None
      val marker = d(p + 1) & 0xff
      if (marker == 0xd9) return None // EOI before any scan
      val len = u16(p + 2)
      val seg = p + 4
      marker match {
        case 0xdb => // DQT: one or more tables
          var q = seg
          while (q < seg + len - 2) {
            val pq = (d(q) & 0xff) >> 4
            val tq = d(q) & 0x0f
            if (pq != 0) return None // 16-bit tables: out of baseline-8 scope
            quant(tq) = Array.tabulate(64)(i => d(q + 1 + i) & 0xff)
            q += 65
          }
        case 0xc4 => // DHT: one or more tables
          var q = seg
          while (q < seg + len - 2) {
            val tc = (d(q) & 0xff) >> 4
            val th = d(q) & 0x0f
            val counts = Array.tabulate(16)(i => d(q + 1 + i) & 0xff)
            val n = counts.sum
            val syms = Array.tabulate(n)(i => d(q + 17 + i) & 0xff)
            val t = new Huff(counts, syms)
            if (tc == 0) dcTab(th) = t else acTab(th) = t
            q += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if ((d(seg) & 0xff) != 8) return None // 12-bit: out of scope
          height = u16(seg + 1)
          width = u16(seg + 3)
          val nc = d(seg + 5) & 0xff
          if (nc != 1 && nc != 3) return None
          comps = Array.tabulate(nc) { i =>
            val o = seg + 6 + 3 * i
            val hv = d(o + 1) & 0xff
            val c = Component(d(o) & 0xff, hv >> 4, hv & 0x0f, d(o + 2) & 0xff)
            if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) return None
            c
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // extended/progressive/arithmetic/hierarchical
        case 0xdd =>
          restartInterval = u16(seg)
        case 0xda => // SOS — decode the scan and finish
          if (comps == null) return None
          val ns = d(seg) & 0xff
          if (ns != comps.length) return None // non-interleaved multi-scan: out of scope
          var i = 0
          while (i < ns) {
            val cid = d(seg + 1 + 2 * i) & 0xff
            val tt = d(seg + 2 + 2 * i) & 0xff
            val c = comps.find(_.id == cid).getOrElse(return None)
            c.td = tt >> 4
            c.ta = tt & 0x0f
            i += 1
          }
          return decodeScan(d, p + 4 + len - 2, quant, dcTab, acTab, comps,
            width, height, restartInterval)
        case _ => // APPn / COM / anything else: skip
      }
      p += 2 + len
    }
    None
  }

  private def decodeScan(
      d: Array[Byte], start: Int,
      quant: Array[Array[Int]], dcTab: Array[Huff], acTab: Array[Huff],
      comps: Array[Component], width: Int, height: Int,
      restartInterval: Int): Option[Decoded] = {
    if (width <= 0 || height <= 0) return None
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    // per-component sample planes at the component's own resolution
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray
    val preds = new Array[Int](comps.length)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val br = new BitReader(d, start)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dc = dcTab(c.td)
        val ac = acTab(c.ta)
        val q = quant(c.tq)
        if (dc == null || ac == null || q == null) return None
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = dc.decode(br)
            preds(ci) += extend(br.receive(t), t)
            coef(0) = preds(ci) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = ac.decode(br)
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += r
                if (k > 63) return None
                coef(zigzag(k)) = extend(br.receive(s), s) * q(k)
                k += 1
              }
            }
            idct(coef, block)
            // place into the component plane, level-shifted and clamped
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                val v = math.round(block(y * 8 + x) + 128.0).toInt
                val clamped = if (v < 0) 0 else if (v > 255) 255 else v
                planes(ci)((py0 + y) * planeW(ci) + (px0 + x)) = clamped.toByte
                x += 1
              }
              y += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // assemble the output: crop planes to (width, height), upsample chroma
    // by sample replication, convert color
    val n = comps.length
    val out = new Array[Byte](width * height * n)
    if (n == 1) {
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * planeW(0), out, y * width, width)
        y += 1
      }
    } else {
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            val sx = x * c.h / hMax
            val sy = y * c.v / vMax
            planes(ci)(sy * planeW(ci) + sx) & 0xff
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(v: Double): Byte = {
            val r = math.round(v).toInt
            (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          }
          val o = (y * width + x) * 3
          out(o) = clamp(yy + 1.402 * cr)
          out(o + 1) = clamp(yy - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp(yy + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    }
    Some(Decoded(width, height, n, out))
  }

  /** Direct 2-D 8×8 inverse DCT (T.81 §A.3.3) in double precision. O(64²)
    * per block — exactness over speed is the right trade here: the decoder
    * feeds correctness gates and specs, and a fast separable/AAN IDCT
    * would trade per-sample ulps for a constant factor this path never
    * needs. */
  private val cosTab: Array[Double] =
    Array.tabulate(8, 8) { (x, u) => math.cos((2 * x + 1) * u * math.Pi / 16) }
      .flatten
  private def idct(coef: Array[Int], out: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) {
              val cu = if (u == 0) 0.7071067811865476 else 1.0
              val cv = if (v == 0) 0.7071067811865476 else 1.0
              sum += cu * cv * f * cosTab(x * 8 + u) * cosTab(y * 8 + v)
            }
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = sum / 4.0
        x += 1
      }
      y += 1
    }
  }
}
