package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class DeflateBlockSpec extends AnyFunSuite {

  // ——— spec-side reference builders, independent of the decoder and of
  //     x174's SQL hex assembly ———
  private def deflateJdk(data: Array[Byte], level: Int,
      strategy: Int = java.util.zip.Deflater.DEFAULT_STRATEGY): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, true) // nowrap = raw RFC 1951
    d.setStrategy(strategy)
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def storedBlock(data: Array[Byte], fin: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(if (fin) 1 else 0) // 3 header bits then byte-align padding
    out.write(data.length & 0xff); out.write(data.length >> 8)
    out.write(~data.length & 0xff); out.write((~data.length >> 8) & 0xff)
    out.write(data)
    out.toByteArray
  }

  /** Final fixed-Huffman block of literals ≤ 143 (all 8-bit codes) — the
    * same construction x174's SQL performs, rebuilt here byte-for-byte
    * from first principles to pin the bit order. */
  private def fixedLitBlock(data: Array[Byte]): Array[Byte] = {
    require(data.forall(b => (b & 0xff) <= 143))
    var acc = 0L
    var nb = 0
    val out = new java.io.ByteArrayOutputStream()
    def push(value: Int, bits: Int, msbFirst: Boolean): Unit = {
      var k = 0
      while (k < bits) {
        val bit = if (msbFirst) (value >> (bits - 1 - k)) & 1 else (value >> k) & 1
        acc |= bit.toLong << nb
        nb += 1
        if (nb == 8) { out.write(acc.toInt); acc = 0; nb = 0 }
        k += 1
      }
    }
    push(1, 1, msbFirst = false) // BFINAL
    push(1, 2, msbFirst = false) // BTYPE=01
    data.foreach(b => push(0x30 + (b & 0xff), 8, msbFirst = true))
    push(0, 7, msbFirst = true) // end-of-block (code 256)
    if (nb > 0) out.write(acc.toInt)
    out.toByteArray
  }

  test("JDK Deflater round-trip across levels and strategies (dynamic + fixed + stored mixes)") {
    val rnd = new scala.util.Random(42)
    val corpora = Seq(
      Array.tabulate(10000)(i => ((i * 31 + 7) % 256).toByte), // cyclic
      Array.fill(5000)(rnd.nextInt(256).toByte), // incompressible → stored
      ("the quick brown fox " * 400).getBytes("UTF-8"), // match-heavy
      Array.tabulate(256)(_.toByte), // every byte value once
      Array.fill(65536 + 100)(7.toByte), // one symbol; > one stored block len
      Array.emptyByteArray)
    for (data <- corpora; level <- Seq(0, 1, 6, 9)) {
      val comp = deflateJdk(data, level)
      val got = DeflateBlock.decompress(comp)
      assert(got.isDefined, s"level=$level len=${data.length}")
      assert(java.util.Arrays.equals(got.get, data), s"level=$level len=${data.length}")
    }
    // HUFFMAN_ONLY forces no string matching (literal-only Huffman blocks)
    val d = ("abcabcabc" * 500).getBytes("UTF-8")
    val comp = deflateJdk(d, 9, java.util.zip.Deflater.HUFFMAN_ONLY)
    assert(java.util.Arrays.equals(DeflateBlock.decompress(comp).get, d))
  }

  test("block-type accounting: stored chain + fixed literal tail") {
    val a = Array.tabulate(30)(i => ((i * 5 + 2) % 256).toByte)
    val b = Array.tabulate(12)(i => ((i * 11 + 1) % 144).toByte)
    val stream = storedBlock(a, fin = false) ++ fixedLitBlock(b)
    val dec = DeflateBlock.decode(9, stream).get
    assert((dec.n_blocks, dec.n_stored, dec.n_fixed, dec.n_dynamic) === ((2, 1, 1, 0)))
    assert(dec.out_len === 42)
    val expect = a ++ b
    assert(dec.sum_bytes === expect.map(v => (v & 0xff).toLong).sum)
    assert(dec.wsum_bytes === expect.zipWithIndex.map { case (v, i) => (v & 0xff).toLong * (i + 1) }.sum)
    assert(DeflateBlock.decompress(stream).get.toSeq === expect.toSeq)
  }

  test("overlapping match expands runs (JDK emits them for repetitive input)") {
    val data = Array.fill(1000)('x'.toByte)
    val dec = DeflateBlock.decode(1, deflateJdk(data, 9)).get
    assert(dec.out_len === 1000)
    assert(dec.n_matches >= 1) // run compressed via self-overlapping match
    assert(dec.sum_bytes === 1000L * 'x'.toInt)
  }

  test("degrade routes return None, never throw") {
    val good = deflateJdk("hello hello hello".getBytes, 6)
    assert(DeflateBlock.decode(1, null).isEmpty)
    assert(DeflateBlock.decode(1, Array.emptyByteArray).isEmpty)
    // BTYPE=3
    assert(DeflateBlock.decode(1, Array(0x07.toByte)).isEmpty)
    // stored LEN/NLEN mismatch
    val bad = storedBlock(Array[Byte](1, 2, 3), fin = true)
    bad(3) = (bad(3) ^ 0x55).toByte
    assert(DeflateBlock.decode(1, bad).isEmpty)
    // truncations at every prefix of a real stream must degrade cleanly
    for (n <- 0 until good.length) {
      val cut = java.util.Arrays.copyOf(good, n)
      assert(DeflateBlock.decode(1, cut).isEmpty, s"prefix $n")
    }
    // distance before output start: fixed block, immediate match
    // (push length code 257, distance code 0 with no prior output)
    val m = {
      var acc = 0L; var nb = 0
      val out = new java.io.ByteArrayOutputStream()
      def push(v: Int, bits: Int, msb: Boolean): Unit = {
        var k = 0
        while (k < bits) {
          val bit = if (msb) (v >> (bits - 1 - k)) & 1 else (v >> k) & 1
          acc |= bit.toLong << nb; nb += 1
          if (nb == 8) { out.write(acc.toInt); acc = 0; nb = 0 }
          k += 1
        }
      }
      push(1, 1, msb = false); push(1, 2, msb = false)
      push(1, 7, msb = true) // code 257 (7-bit value 1)
      push(0, 5, msb = true) // distance code 0 → distance 1 > output 0
      push(0, 7, msb = true) // EOB
      if (nb > 0) out.write(acc.toInt)
      out.toByteArray
    }
    assert(DeflateBlock.decode(1, m).isEmpty)
    // dynamic header: repeat-previous (16) as the very first code-length op
    // is structurally invalid; build minimal header reaching it
    // (covered by prefix truncation + JDK fuzz below for practical cases)
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 200) {
      val junk = Array.fill(1 + rnd.nextInt(64))(rnd.nextInt(256).toByte)
      DeflateBlock.decode(1, junk) // must not throw, either route is fine
    }
  }

  test("64 MiB output guard: a malformed declared length cannot wrap Int") {
    // chain of maximal stored blocks claiming more than the guard admits
    val one = storedBlock(Array.fill(65535)(1.toByte), fin = false)
    val n = (DeflateBlock.decompress(
      Array.fill(3)(one).flatten ++ storedBlock(Array[Byte](9), fin = true)))
    assert(n.isDefined) // 3 × 64 KiB is fine
    // but a stream claiming past MaxOut degrades: 1025 × 64 KiB ≈ 67 MB
    val big = Array.fill(1025)(one).flatten ++ storedBlock(Array[Byte](9), fin = true)
    assert(DeflateBlock.decompress(big).isEmpty)
  }
}
