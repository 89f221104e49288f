package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class Bzip2StreamSpec extends AnyFunSuite {

  private def bz(data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(bos, level)
    out.write(data)
    out.close()
    bos.toByteArray
  }

  test("commons-compress round-trip across levels and corpus shapes") {
    val rnd = new scala.util.Random(99)
    val corpora = Seq(
      Array.tabulate(5000)(i => ((i * 31 + 7) % 256).toByte), // cyclic
      Array.fill(3000)(rnd.nextInt(256).toByte), // high entropy
      ("wiki dump text, the usual suspects. " * 300).getBytes("UTF-8"),
      Array.fill(2000)('a'.toByte), // long run → RLE1 count bytes
      Array.tabulate(1000)(i => if (i % 7 < 4) 'x'.toByte else (i % 251).toByte),
      "x".getBytes, // single byte
      Array.tabulate(256)(_.toByte))
    for (data <- corpora; level <- Seq(1, 5, 9)) {
      val comp = bz(data, level)
      val got = Bzip2Stream.decompress(comp)
      assert(got.isDefined, s"level=$level len=${data.length}")
      assert(java.util.Arrays.equals(got.get, data), s"level=$level len=${data.length}")
      val d = Bzip2Stream.decode(1, comp).get
      assert(d.level === level)
      assert(d.out_len === data.length)
    }
  }

  test("multi-block stream: data past one block size decodes across blocks") {
    // level 1 → ~100k blocks of POST-RLE1 data, so the corpus must be
    // run-free (a run-heavy corpus RLE1-compresses into a single block —
    // the first version of this test found that out); 250k cyclic bytes
    // with no 4-runs force 3 blocks
    val data = Array.tabulate(250000)(i => ((i * 31 + 7) % 256).toByte)
    val comp = bz(data, 1)
    val d = Bzip2Stream.decode(7, comp).get
    assert(d.n_blocks === 3)
    assert(d.out_len === 250000)
    assert(java.util.Arrays.equals(Bzip2Stream.decompress(comp).get, data))
  }

  test("degrade routes: every prefix truncation and a flipped payload bit return None") {
    val data = ("structured enough to use several groups " * 50).getBytes("UTF-8")
    val comp = bz(data, 3)
    assert(Bzip2Stream.decode(1, null).isEmpty)
    assert(Bzip2Stream.decode(1, Array.emptyByteArray).isEmpty)
    assert(Bzip2Stream.decode(1, "BZh9".getBytes).isEmpty)
    assert(Bzip2Stream.decode(1, "XZh1junkjunk".getBytes).isEmpty)
    for (n <- 0 until comp.length) {
      val cut = java.util.Arrays.copyOf(comp, n)
      assert(Bzip2Stream.decode(1, cut).isEmpty, s"prefix $n")
    }
    // a flipped bit may land in a DON'T-CARE region (e.g. the delta-coded
    // length of a Huffman symbol the block never uses), in which case the
    // decode legitimately still yields the original bytes — but no flip
    // may ever yield DIFFERENT bytes and pass both CRCs
    for (i <- 10 until comp.length - 1 by 7) {
      val mut = comp.clone()
      mut(i) = (mut(i) ^ 0x10).toByte
      val got = Bzip2Stream.decompress(mut)
      assert(got.isEmpty || java.util.Arrays.equals(got.get, data),
        s"flip at $i of ${comp.length} decoded to DIFFERENT bytes — CRC not gating")
    }
  }

  test("crc actually gates: same-length different content is rejected") {
    val data = Array.tabulate(512)(i => (i % 97).toByte)
    val comp = bz(data, 2)
    // flip one bit inside the declared block CRC field itself (bits follow
    // the 48-bit block magic at byte offset 4): decode must return None
    val mut = comp.clone()
    mut(11) = (mut(11) ^ 0x01).toByte
    assert(Bzip2Stream.decode(1, mut).isEmpty)
  }
}
