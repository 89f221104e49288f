package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class Lz4BlockSpec extends AnyFunSuite {

  // ——— manual block builder (spec-side reference, independent of both the
  //     decoder's parsing and x172's SQL hex assembly) ———
  private def lenExt(extra: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var x = extra
    while (x >= 255) { out.write(255); x -= 255 }
    out.write(x)
    out.toByteArray
  }
  private def seq(lits: Array[Byte], off: Int, mLen: Int): Array[Byte] = {
    val ln = if (lits.length < 15) lits.length else 15
    val mn = if (mLen - 4 < 15) mLen - 4 else 15
    val out = new java.io.ByteArrayOutputStream()
    out.write((ln << 4) | mn)
    if (ln == 15) out.write(lenExt(lits.length - 15))
    out.write(lits)
    out.write(off & 0xff); out.write(off >> 8)
    if (mn == 15) out.write(lenExt(mLen - 4 - 15))
    out.toByteArray
  }
  private def lastSeq(lits: Array[Byte]): Array[Byte] = {
    val ln = if (lits.length < 15) lits.length else 15
    val out = new java.io.ByteArrayOutputStream()
    out.write(ln << 4)
    if (ln == 15) out.write(lenExt(lits.length - 15))
    out.write(lits)
    out.toByteArray
  }

  test("extensions on both lengths, overlapping match, literals-only tail") {
    val a = Array.tabulate(20)(i => (i * 7 + 3).toByte) // 15+ext literal length
    val block = seq(a, 4, 25) ++ lastSeq(Array[Byte](9, 8, 7)) // 15+ext match length
    val d = Lz4Block.decode(1, block).get
    val expect = {
      val out = collection.mutable.ArrayBuffer[Byte]() ++ a
      for (_ <- 0 until 25) out += out(out.length - 4)
      out ++= Seq[Byte](9, 8, 7)
      out.toArray
    }
    assert(d.out_len === expect.length)
    assert((d.n_sequences, d.n_matches) === ((2, 1)))
    assert(d.sum_bytes === expect.map(_ & 0xff).map(_.toLong).sum)
    assert(d.wsum_bytes === expect.zipWithIndex.map { case (b, i) => (b & 0xff).toLong * (i + 1) }.sum)
    assert(Lz4Block.decompress(block).get.toSeq === expect.toSeq)
  }

  test("degrade routes: zero offset, offset before start, truncated literals/offset/extension, match nibble on last sequence") {
    val a = Array.tabulate(8)(_.toByte)
    assert(Lz4Block.decode(1, seq(a, 0, 6) ++ lastSeq(Array[Byte](1))).isEmpty)
    assert(Lz4Block.decode(1, seq(a, 9, 6) ++ lastSeq(Array[Byte](1))).isEmpty)
    assert(Lz4Block.decode(1, lastSeq(a).dropRight(2)).isEmpty) // literals cut
    assert(Lz4Block.decode(1, seq(a, 3, 6).dropRight(7)).isEmpty) // offset cut (and stream ends mid-seq)
    assert(Lz4Block.decode(1, Array((15 << 4).toByte)).isEmpty) // ext promised, absent
    // stream ending right after literals with a nonzero match nibble
    val badTail = Array[Byte](((3 << 4) | 2).toByte, 1, 2, 3)
    assert(Lz4Block.decode(1, badTail).isEmpty)
    assert(Lz4Block.decode(1, Array.emptyByteArray).isEmpty)
    assert(Lz4Block.decode(1, null).isEmpty)
  }

  test("255-chained lengths cannot wrap Int: mega-extensions degrade to None") {
    // a ~9 MB run of 255 extension bytes sums past Int.MaxValue under Int
    // accumulation; the decoder must reject at the 64 MiB guard instead
    val litChain = Array((15 << 4).toByte) ++ Array.fill(9 * 1000 * 1000)(255.toByte)
    assert(Lz4Block.decode(1, litChain).isEmpty)
    val lits = Array.tabulate(8)(_.toByte)
    val matchChain = Array(((8 << 4) | 15).toByte) ++ lits ++
      Array[Byte](4, 0) ++ Array.fill(9 * 1000 * 1000)(255.toByte)
    assert(Lz4Block.decode(1, matchChain).isEmpty)
  }

  test("match-heavy expansion: chained 64 KiB matches build a 4 MiB run correctly") {
    // 64 sequences each extending the same run — the index-based
    // back-reference walk is O(output), not O(output^2)
    val block = seq(Array(65.toByte), 1, 65535) ++
      (1 to 63).flatMap(_ => seq(Array.emptyByteArray, 1, 65535)).toArray ++
      lastSeq(Array[Byte](66))
    val d = Lz4Block.decode(1, block).get
    val n = 1 + 64 * 65535 + 1
    assert(d.out_len === n)
    assert(d.n_matches === 64)
    assert(d.sum_bytes === 65L * (n - 1) + 66L)
  }

  test("cross-validation: lz4-java's compressor output decodes to the original") {
    val rnd = new scala.util.Random(7)
    val factory = net.jpountz.lz4.LZ4Factory.fastestInstance()
    for ((n, hc) <- Seq((1, false), (40, false), (1000, false), (1000, true), (65536, true))) {
      val src = Array.tabulate(n) { i =>
        if ((i / 48) % 2 == 0) (i % 5).toByte else rnd.nextInt(256).toByte
      }
      val comp = if (hc) factory.highCompressor() else factory.fastCompressor()
      val compressed = comp.compress(src)
      val d = Lz4Block.decode(5, compressed)
      assert(d.isDefined, s"n=$n hc=$hc should decode")
      assert(d.get.out_len === n)
      assert(Lz4Block.decompress(compressed).get.toSeq === src.toSeq, s"n=$n hc=$hc bytes")
    }
  }
}
