package graft.ops

import graft.SparkSpec

class Mp4MetaSpec extends SparkSpec {

  // ——— spec-side reference writer, independent of the x111 gate's SQL ———
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload

  private def mvhd0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", new Array[Byte](4) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur)
      ++ new Array[Byte](80))
  private def mvhd1(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(ts) ++ be64(dur)
      ++ new Array[Byte](80))
  private def ftyp(brand: String): Array[Byte] =
    box("ftyp", brand.getBytes("US-ASCII") ++ be32(0x200))

  test("v0 mvhd with unknown boxes interleaved; duration_ms floors") {
    val bytes = ftyp("isom") ++ box("free", new Array[Byte](7)) ++
      box("moov", box("udta", Array[Byte](1, 2)) ++ mvhd0(600, 901)) ++
      box("mdat", Array.fill[Byte](33)('d'))
    val m = Mp4Meta.parse(5L, bytes)
    assert(m == Mp4Meta.Meta(5L, "isom", 600L, 901L, 901L * 1000 / 600, 4L, 33L, true))
  }

  test("v1 mvhd 64-bit duration and largesize mdat") {
    val payload = Array.fill[Byte](10)('x')
    val largeMdat = be32(1) ++ "mdat".getBytes("US-ASCII") ++
      be64(16L + payload.length) ++ payload
    val bytes = ftyp("mp42") ++ box("moov", mvhd1(90000, 0x1_0000_0001L)) ++ largeMdat
    val m = Mp4Meta.parse(0L, bytes)
    assert(m.timescale == 90000L && m.duration == 0x1_0000_0001L)
    assert(m.duration_ms == 0x1_0000_0001L * 1000 / 90000)
    assert(m.mdat_bytes == 10L && m.valid)
  }

  test("size==0 box extends to EOF") {
    val bytes = ftyp("isom") ++
      (be32(0) ++ "mdat".getBytes("US-ASCII") ++ Array.fill[Byte](21)('z'))
    val m = Mp4Meta.parse(0L, bytes)
    assert(m.mdat_bytes == 21L && m.n_top_boxes == 2L && m.valid)
  }

  test("malformed size and truncation flag invalid but keep parsed prefix") {
    val good = ftyp("isom") ++ box("moov", mvhd0(1000, 5000))
    val m1 = Mp4Meta.parse(0L, good ++ be32(4) ++ "free".getBytes("US-ASCII"))
    assert(m1.timescale == 1000L && m1.n_top_boxes == 2L && !m1.valid)
    val m2 = Mp4Meta.parse(0L, good ++ be32(500) ++ "mdat".getBytes("US-ASCII"))
    assert(m2.timescale == 1000L && !m2.valid) // claims 500 bytes, has 8
    val m3 = Mp4Meta.parse(0L, good.dropRight(30))
    assert(!m3.valid && m3.n_top_boxes == 1L) // moov truncated, ftyp kept
  }

  test("meta() maps rows and survives null blobs") {
    import spark.implicits._
    val bytes = ftyp("isom") ++ box("mdat", Array.fill[Byte](4)('p'))
    val df = Seq((1L, Option(bytes)), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = Mp4Meta.meta(df).collect().sortBy(_.media_id).toSeq
    assert(rows.map(r => (r.media_id, r.mdat_bytes, r.n_top_boxes, r.valid)) ==
      Seq((1L, 4L, 2L, true), (2L, 0L, 0L, true)))
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    val good = ftyp("isom") ++ box("free", new Array[Byte](7)) ++
      box("moov", box("udta", Array[Byte](1, 2)) ++ mvhd0(600, 901)) ++
      box("mdat", Array.fill[Byte](33)('d'))
    def dec(b: Array[Byte]): Any = Mp4Meta.parse(9L, b)
    def probe(tag: String)(body: => Any): Unit =
      try { body; () } catch {
        case e: Throwable =>
          fail(s"$tag threw ${e.getClass.getName}: ${e.getMessage}")
      }
    for (cut <- 0 until good.length)
      probe(s"cut=$cut")(dec(java.util.Arrays.copyOf(good, cut)))
    for (i <- good.indices) {
      val mut = good.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      probe(s"flip=$i")(dec(mut))
    }
  }
}
