package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Third independent construction for the FLAC decoder (x158's gate
  * builds streams in pure SQL; this spec builds them with a Scala
  * bit-writer), deliberately exercising the paths the gate does NOT:
  * FIXED order 4, the rice2 (5-bit parameter) residual method, two
  * partitions, the escape-to-raw partition form, wasted bits, two
  * independent channels, the 16-bit blocksize-follows code, a direct
  * sample-rate table code, a multi-byte UTF-8 frame number, and the
  * corrupt/LPC fake-routes.
  */
class FlacFramesSpec extends AnyFunSuite {

  private final class BW {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def bit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1); nb += 1
      if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { bit(((v >> k) & 1L).toInt); k -= 1 }
    }
    def align(): Unit = while (nb != 0) bit(0)
    def bytes: Array[Byte] = { require(nb == 0, "unaligned"); buf.toArray }
  }

  private def crc8(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= x & 0xff
      (1 to 8).foreach(_ => c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xff else (c << 1) & 0xff)
    }
    c
  }

  private def crc16(b: Array[Byte]): Int = {
    var c = 0
    b.foreach { x =>
      c ^= (x & 0xff) << 8
      (1 to 8).foreach(_ => c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xffff else (c << 1) & 0xffff)
    }
    c
  }

  private def streamInfo(rate: Int, ch: Int, bps: Int): Array[Byte] = {
    val w = new BW
    "fLaC".foreach(c => w.bits(c.toLong, 8))
    w.bits(0x80, 8); w.bits(34, 24) // last metadata block, STREAMINFO
    w.bits(16, 16); w.bits(16, 16)  // min/max blocksize
    w.bits(0, 24); w.bits(0, 24)    // min/max framesize
    w.bits(rate.toLong, 20); w.bits((ch - 1).toLong, 3); w.bits((bps - 1).toLong, 5)
    w.bits(0L, 36)                  // total samples unknown
    (1 to 16).foreach(_ => w.bits(0, 8))
    w.bytes
  }

  /** Frame with the 16-bit blocksize form (code 0111) and a DIRECT
    * sample-rate code; `body` writes the subframes. */
  private def frame(num: Seq[Int], blocksize: Int, srCode: Int, chCode: Int,
      bpsCode: Int)(body: BW => Unit): Array[Byte] = {
    val h = new BW
    h.bits(0x3ffe, 14); h.bit(0); h.bit(0)
    h.bits(7, 4) // blocksize: 16-bit value follows
    h.bits(srCode.toLong, 4)
    h.bits(chCode.toLong, 4); h.bits(bpsCode.toLong, 3); h.bit(0)
    num.foreach(b => h.bits(b.toLong, 8))
    h.bits((blocksize - 1).toLong, 16)
    val hb = h.bytes
    val w = new BW
    hb.foreach(b => w.bits(b & 0xffL, 8))
    w.bits(crc8(hb).toLong, 8)
    body(w)
    w.align()
    val fb = w.bytes
    val out = new BW
    fb.foreach(b => out.bits(b & 0xffL, 8))
    out.bits(crc16(fb).toLong, 16)
    out.bytes
  }

  private def rice(w: BW, v: Long, p: Int): Unit = {
    val zz = if (v < 0) -2 * v - 1 else 2 * v
    val q = zz >>> p
    (1L to q).foreach(_ => w.bit(0)); w.bit(1)
    w.bits(zz & ((1L << p) - 1), p)
  }

  private def signed(w: BW, v: Long, n: Int): Unit =
    w.bits(v & ((1L << n) - 1), n)

  test("fixed order 4, rice2 method, two partitions, escape-to-raw") {
    val s = Array[Long](3, -1, 4, 1, -5, 9, -2, 6, -5, 3, 5, -8)
    // order-4 residual: r = s_i - 4s_{i-1} + 6s_{i-2} - 4s_{i-3} + s_{i-4}
    val r = (4 until 12).map(i => s(i) - 4 * s(i - 1) + 6 * s(i - 2) - 4 * s(i - 3) + s(i - 4))
    val fr = frame(Seq(0), 12, 9 /* 44100 direct */, 0, 4 /* bps 16 */) { w =>
      w.bit(0); w.bits(12, 6) /* FIXED order 4 */ ; w.bit(0)
      s.take(4).foreach(v => signed(w, v, 16))
      w.bits(1, 2)  // rice2: 5-bit params
      w.bits(1, 4)  // partition order 1 -> two partitions of 6
      w.bits(3, 5)  // partition 1: param 3, residuals i=4..5
      r.take(2).foreach(v => rice(w, v, 3))
      w.bits(31, 5) // partition 2: ESCAPE
      w.bits(8, 5)  //   raw 8-bit residuals i=6..11
      r.drop(2).foreach(v => signed(w, v, 8))
    }
    val got = FlacFrames.decode(7L, streamInfo(44100, 1, 16) ++ fr)
    assert(got == Seq(FlacFrames.FlacFrame(7L, 0, 12, 44100, 2, 4, 10, 24, -8, 9, ok = true)))
  }

  test("verbatim, two independent channels, bps 8, multi-byte UTF-8 frame number") {
    val fr = frame(Seq(0xc3, 0x88), 4, 9, 1 /* 2 channels */, 1 /* bps 8 */) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0)
      Seq(10L, -20L, 30L, -40L).foreach(v => signed(w, v, 8))
      w.bit(0); w.bits(1, 6); w.bit(0)
      Seq(1L, 2L, 3L, 4L).foreach(v => signed(w, v, 8))
    }
    val got = FlacFrames.decode(1L, streamInfo(44100, 2, 8) ++ fr)
    assert(got == Seq(FlacFrames.FlacFrame(1L, 0, 4, 44100, 1, 0, -20, -100, -40, 30, ok = true)))
  }

  test("wasted bits shift the reconstruction") {
    val fr = frame(Seq(0), 4, 9, 0, 4) { w =>
      w.bit(0); w.bits(0, 6) // CONSTANT
      w.bit(1); w.bit(0); w.bit(1) // wasted flag, unary 1 -> 2 wasted bits
      signed(w, -12, 14) // bps 16 - 2
    }
    val got = FlacFrames.decode(2L, streamInfo(44100, 1, 16) ++ fr)
    assert(got == Seq(FlacFrames.FlacFrame(2L, 0, 4, 44100, 0, 0, -192, -480, -48, -48, ok = true)))
  }

  test("corrupt CRC-16 fake-routes the frame; reserved subframe type fake-routes") {
    val fr = frame(Seq(0), 4, 9, 0, 1) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0)
      Seq(1L, 2L, 3L, 4L).foreach(v => signed(w, v, 8))
    }
    val bad = streamInfo(44100, 1, 8) ++ fr
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 1).toByte
    assert(FlacFrames.decode(3L, bad) ==
      Seq(FlacFrames.FlacFrame(3L, 0, 0, 0, -1, -1, 0, 0, 0, 0, ok = false)))

    val reserved = frame(Seq(0), 4, 9, 0, 1) { w =>
      w.bit(0); w.bits(2, 6); w.bit(0) // type 000010: reserved
      w.bits(0, 32)                    // garbage the decoder must not reach
    }
    assert(FlacFrames.decode(4L, streamInfo(44100, 1, 8) ++ reserved) ==
      Seq(FlacFrames.FlacFrame(4L, 0, 0, 0, -1, -1, 0, 0, 0, 0, ok = false)))
  }

  test("LPC order 2: quantized coefficients, shift, rice residual — integer-exact") {
    val c0 = 3L; val c1 = -2L; val shift = 1
    val warm = Seq(5L, -3L)
    val res = Seq(4L, -7L, 2L, 0L, -1L, 6L)
    val lpc = frame(Seq(0), 8, 9, 0, 1) { w =>
      w.bit(0); w.bits(33, 6); w.bit(0) // LPC order 2 (type 100001)
      warm.foreach(v => signed(w, v, 8))
      w.bits(3, 4)       // precision-1 = 3 -> 4-bit coefficients
      w.bits(shift.toLong, 5)
      signed(w, c0, 4); signed(w, c1, 4)
      w.bits(0, 2)       // rice4 method
      w.bits(0, 4)       // partition order 0
      w.bits(3, 4)       // param 3
      res.foreach(v => rice(w, v, 3))
    }
    // independent reference recurrence (the decoder's is in the flatMap)
    val s = Array.ofDim[Long](8)
    s(0) = warm(0); s(1) = warm(1)
    for (k <- 2 until 8) s(k) = res(k - 2) + ((c0 * s(k - 1) + c1 * s(k - 2)) >> shift)
    val sum = s.sum
    val dot = s.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    val got = FlacFrames.decode(8L, streamInfo(44100, 1, 8) ++ lpc)
    assert(got == Seq(FlacFrames.FlacFrame(8L, 0, 8, 44100, 3, 2, sum, dot, s.min, s.max, ok = true)))
  }

  test("LPC escapes route: invalid precision 1111 and negative (reserved) shift") {
    val badPrec = frame(Seq(0), 4, 9, 0, 1) { w =>
      w.bit(0); w.bits(32, 6); w.bit(0) // LPC order 1
      signed(w, 1, 8)                    // warm-up
      w.bits(15, 4)                      // precision escape
      w.bits(0, 5); w.bits(0, 16)
    }
    assert(FlacFrames.decode(6L, streamInfo(44100, 1, 8) ++ badPrec) ==
      Seq(FlacFrames.FlacFrame(6L, 0, 0, 0, -1, -1, 0, 0, 0, 0, ok = false)))
    val negShift = frame(Seq(0), 4, 9, 0, 1) { w =>
      w.bit(0); w.bits(32, 6); w.bit(0)
      signed(w, 1, 8)
      w.bits(3, 4)
      w.bits(31, 5)                      // two's-complement -1
      w.bits(0, 16)
    }
    assert(FlacFrames.decode(7L, streamInfo(44100, 1, 8) ++ negShift) ==
      Seq(FlacFrames.FlacFrame(7L, 0, 0, 0, -1, -1, 0, 0, 0, 0, ok = false)))
  }

  test("a frame truncated mid-subframe routes the frame, never throws") {
    // header + CRC-8 intact (a partially-downloaded file), verbatim sample
    // bytes cut off: the bit reader underflows inside the subframe and the
    // decoder must emit one ok=false row instead of an
    // ArrayIndexOutOfBoundsException out of the flatMap
    val fr = frame(Seq(0), 4, 9, 0, 1) { w =>
      w.bit(0); w.bits(1, 6); w.bit(0)
      Seq(1L, 2L, 3L, 4L).foreach(v => signed(w, v, 8))
    }
    val si = streamInfo(44100, 1, 8)
    val cut = (si ++ fr).take(si.length + 10) // inside the sample bytes
    assert(FlacFrames.decode(6L, cut) ==
      Seq(FlacFrames.FlacFrame(6L, 0, 0, 0, -1, -1, 0, 0, 0, 0, ok = false)))
  }

  test("truncated and non-FLAC inputs yield no rows") {
    assert(FlacFrames.decode(5L, Array[Byte]()) == Nil)
    assert(FlacFrames.decode(5L, "fLaX1234".getBytes) == Nil)
    assert(FlacFrames.decode(5L, streamInfo(44100, 1, 16).take(20)) == Nil)
    // clean stream end: STREAMINFO only, no frames
    assert(FlacFrames.decode(5L, streamInfo(44100, 1, 16)) == Nil)
  }
}
