package graft.ops

import graft.SparkSpec

/** ImageHash.dhashPpm semantics: hand-computed hash on a tiny gradient,
  * invariance to off-grid pixel noise (the perceptual point), sensitivity
  * to on-grid luminance flips, and the corrupt-blob posture. The
  * cross-engine bit-exactness of the 64-bit fold is gated by x64. */
class ImageHashSpec extends SparkSpec {

  private def ppm(w: Int, h: Int, px: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val head = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val data = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = px(x, y)
      val p = (y * w + x) * 3
      data(p) = r.toByte; data(p + 1) = g.toByte; data(p + 2) = b.toByte
    }
    head ++ data
  }

  test("monotone horizontal gradient hashes to all-ones; flat image to all-zeros") {
    // gradient: lum strictly increases left→right at every sampled column
    val grad = ppm(18, 16, (x, _) => (x * 14, x * 14, x * 14))
    assert(ImageHash.dhashPpm(grad).contains("ffffffffffffffff"))
    val flat = ppm(18, 16, (_, _) => (128, 128, 128))
    assert(ImageHash.dhashPpm(flat).contains("0000000000000000"))
  }

  test("off-grid pixel noise leaves the hash unchanged; sampled-pixel flips change it") {
    val base = ppm(18, 16, (x, y) => ((x * 29 + y * 53) % 256, (x * 71) % 256, (y * 31) % 256))
    val h0 = ImageHash.dhashPpm(base).get
    // (17, 15) is never sampled for w=18, h=16: max sx = 8*18/9 = 16, max sy = 7*16/8 = 14
    val noisy = base.clone()
    noisy(noisy.length - 1) = (noisy(noisy.length - 1) + 97).toByte
    assert(ImageHash.dhashPpm(noisy).contains(h0))
    // flipping sampled pixel (0,0) to extreme luminance flips bit 0's comparison
    val flipped = base.clone()
    val off = "P6\n18 16\n255\n".length
    flipped(off) = 255.toByte; flipped(off + 1) = 255.toByte; flipped(off + 2) = 255.toByte
    assert(ImageHash.dhashPpm(flipped).get != h0)
  }

  test("corrupt blobs yield None, truncated pixel data yields None") {
    assert(ImageHash.dhashPpm(null).isEmpty)
    assert(ImageHash.dhashPpm(Array[Byte]()).isEmpty)
    assert(ImageHash.dhashPpm("not a ppm".getBytes).isEmpty)
    val full = ppm(12, 10, (_, _) => (1, 2, 3))
    assert(ImageHash.dhashPpm(full).isDefined)
    assert(ImageHash.dhashPpm(full.dropRight(1)).isEmpty)
  }

  test("dhashes Dataset wrapper: valid flag routes corrupt rows, hashes match direct calls") {
    import spark.implicits._
    val good = ppm(11, 13, (x, y) => (x * 20, y * 17, 99))
    val rows = Seq((1L, good), (2L, "garbage".getBytes)).toDF("media_id", "media")
    val out = ImageHash.dhashes(rows).collect().sortBy(_.media_id)
    assert(out(0).valid && out(0).dhash == ImageHash.dhashPpm(good).get)
    assert(!out(1).valid && out(1).dhash.isEmpty)
  }
}
