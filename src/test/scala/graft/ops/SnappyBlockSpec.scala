package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class SnappyBlockSpec extends AnyFunSuite {

  // ——— manual block builder (spec-side reference, independent of both the
  //     decoder's parsing and x171's SQL hex assembly) ———
  private def varint(v: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var x = v
    while (x >= 0x80) { out.write((x & 0x7f) | 0x80); x >>= 7 }
    out.write(x)
    out.toByteArray
  }
  private def literal(data: Array[Byte]): Array[Byte] = {
    val n = data.length - 1
    if (n < 60) Array((n << 2).toByte) ++ data
    else if (n < 256) Array((60 << 2).toByte, n.toByte) ++ data
    else Array((61 << 2).toByte, (n & 0xff).toByte, (n >> 8).toByte) ++ data
  }
  private def copy2(off: Int, len: Int): Array[Byte] =
    Array((((len - 1) << 2) | 2).toByte, (off & 0xff).toByte, (off >> 8).toByte)
  private def copy1(off: Int, len: Int): Array[Byte] = {
    require(len >= 4 && len <= 11 && off < 2048)
    Array((((off >> 8) << 5) | ((len - 4) << 2) | 1).toByte, (off & 0xff).toByte)
  }
  private def copy4(off: Int, len: Int): Array[Byte] =
    Array((((len - 1) << 2) | 3).toByte, (off & 0xff).toByte,
      ((off >> 8) & 0xff).toByte, ((off >> 16) & 0xff).toByte,
      ((off >> 24) & 0xff).toByte)

  test("all four tag forms, overlapping copy expands as a run") {
    val a = Array.tabulate(10)(i => (i * 11 + 1).toByte)
    // out = a ++ copy(off 3, len 8: overlap) ++ copy1(off 1, len 5: run) ++ copy4 re-read of start
    val block = varint(10 + 8 + 5 + 6) ++ literal(a) ++
      copy2(3, 8) ++ copy1(1, 5) ++ copy4(23, 6)
    val d = SnappyBlock.decode(1, block).get
    val expect = {
      val out = collection.mutable.ArrayBuffer[Byte]() ++ a
      for (_ <- 0 until 8) out += out(out.length - 3)
      for (_ <- 0 until 5) out += out(out.length - 1)
      for (_ <- 0 until 6) out += out(out.length - 23)
      out.toArray
    }
    assert(d.out_len === expect.length)
    assert(d.n_literals === 1)
    assert(d.n_copies === 3)
    assert(d.sum_bytes === expect.map(_ & 0xff).map(_.toLong).sum)
    assert(d.wsum_bytes === expect.zipWithIndex.map { case (b, i) => (b & 0xff).toLong * (i + 1) }.sum)
    assert(SnappyBlock.decompress(block).get.toSeq === expect.toSeq)
  }

  test("multi-byte literal lengths (61-form) and multi-byte varint") {
    val big = Array.tabulate(300)(i => (i % 251).toByte)
    val block = varint(300) ++ literal(big)
    val d = SnappyBlock.decode(1, block).get
    assert(d.out_len === 300)
    assert(SnappyBlock.decompress(block).get.toSeq === big.toSeq)
  }

  test("degrade routes: zero/too-far offset, short stream, output overrun, truncated varint, empty") {
    val a = Array.tabulate(8)(_.toByte)
    def blk(tail: Array[Byte], len: Int = 16) = varint(len) ++ literal(a) ++ tail
    assert(SnappyBlock.decode(1, blk(copy2(0, 8))).isEmpty) // offset 0
    assert(SnappyBlock.decode(1, blk(copy2(9, 8))).isEmpty) // beyond written
    assert(SnappyBlock.decode(1, blk(copy2(3, 8)).dropRight(1)).isEmpty) // short
    assert(SnappyBlock.decode(1, blk(copy2(3, 8) ++ copy2(3, 8))).isEmpty) // overrun
    assert(SnappyBlock.decode(1, Array(0x80.toByte)).isEmpty) // varint cut
    assert(SnappyBlock.decode(1, Array.emptyByteArray).isEmpty)
    assert(SnappyBlock.decode(1, null).isEmpty)
  }

  test("a 4-byte extended literal length that would wrap Int degrades, never throws") {
    // 0x7FFFFFFF encoded -> +1 wraps to Int.MinValue under Int accumulation,
    // and a huge positive value overflows an additive `i + len` bound; both
    // must come back None instead of reaching System.arraycopy
    val wrap = varint(16) ++ Array((63 << 2).toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0x7f.toByte) ++ Array.fill(8)(1.toByte)
    assert(SnappyBlock.decode(1, wrap).isEmpty)
    val huge = varint(16) ++ Array((63 << 2).toByte,
      0xf0.toByte, 0xff.toByte, 0xff.toByte, 0x7e.toByte)
    assert(SnappyBlock.decode(1, huge).isEmpty)
  }

  test("cross-validation: snappy-java's compressor output decodes to the original") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 17, 100, 1000, 65536)) {
      // compressible mix: runs + random so the compressor emits real copies
      val src = Array.tabulate(n) { i =>
        if ((i / 64) % 2 == 0) (i % 7).toByte else rnd.nextInt(256).toByte
      }
      val compressed = org.xerial.snappy.Snappy.compress(src)
      val d = SnappyBlock.decode(5, compressed)
      assert(d.isDefined, s"n=$n should decode")
      assert(d.get.out_len === n)
      assert(SnappyBlock.decompress(compressed).get.toSeq === src.toSeq, s"n=$n bytes")
    }
  }
}
