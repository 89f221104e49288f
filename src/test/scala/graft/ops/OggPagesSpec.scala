package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class OggPagesSpec extends AnyFunSuite {

  // ——— manual page builder (spec-side reference, independent of both the
  //     walker's parsing and x170's SQL byte assembly) ———
  private def le(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(k => ((v >> (8 * k)) & 0xff).toByte)

  private def page(
      flags: Int, granule: Long, serial: Long, seq: Long,
      lacing: Seq[Int], payload: Array[Byte],
      version: Int = 0, corruptCrc: Boolean = false,
      truncateSegTable: Boolean = false): Array[Byte] = {
    require(lacing.map(_.toLong).sum == payload.length)
    val out = new java.io.ByteArrayOutputStream()
    out.write("OggS".getBytes("US-ASCII"))
    out.write(version); out.write(flags)
    out.write(le(granule, 8)); out.write(le(serial, 4)); out.write(le(seq, 4))
    out.write(le(0, 4)) // CRC placeholder
    out.write(lacing.size)
    lacing.foreach(out.write)
    out.write(payload)
    val b = out.toByteArray
    val c = OggPages.crc(b, 0, b.length, 22, 26)
    val withCrc = b.clone()
    le(if (corruptCrc) c ^ 0x55 else c, 4).copyToArray(withCrc, 22)
    if (truncateSegTable) withCrc.take(27 + lacing.size - 1) else withCrc
  }

  private def pay(n: Int)(f: Int => Int): Array[Byte] =
    Array.tabulate(n)(i => f(i).toByte)

  test("multi-page stream: flags, granules, lacing packet counts, payload sums") {
    val p0 = page(2, 100, 7, 0, Seq(10), pay(10)(_ + 1)) // BOS, 1 packet
    // packet spans pages: lacing 255 then continued-flag page with the rest
    val p1 = page(0, 200, 7, 1, Seq(255), pay(255)(i => i % 251))
    val p2 = page(1 | 4, 300, 7, 2, Seq(40, 0), pay(40)(_ * 3)) // continued+EOS, zero-length packet too
    val all = p0 ++ p1 ++ p2
    val pages = OggPages.decode(9, all)
    assert(pages.map(_.page_seq) === Seq(0L, 1L, 2L))
    assert(pages.map(_.is_bos) === Seq(true, false, false))
    assert(pages.map(_.is_eos) === Seq(false, false, true))
    assert(pages.map(_.is_continued) === Seq(false, false, true))
    // lacing 255 never terminates; 40 and the zero-length lacing both do
    assert(pages.map(_.n_packets) === Seq(1, 0, 2))
    assert(pages.map(_.granule) === Seq(100L, 200L, 300L))
    assert(pages(0).payload_sum === (1 to 10).sum.toLong)
    assert(pages(2).payload_len === 40)
  }

  test("a CRC-corrupt page degrades to its own loss; the walk resyncs on the next page") {
    val good0 = page(2, 1, 5, 0, Seq(8), pay(8)(_ + 2))
    val bad = page(0, 2, 5, 1, Seq(8), pay(8)(_ + 3), corruptCrc = true)
    val good2 = page(4, 3, 5, 2, Seq(8), pay(8)(_ + 4))
    val pages = OggPages.decode(1, good0 ++ bad ++ good2)
    assert(pages.map(_.page_seq) === Seq(0L, 2L))
  }

  test("degrade routes: bad version, truncated segment table, truncated payload, garbage prefix") {
    val ok = page(2, 1, 5, 0, Seq(8), pay(8)(identity))
    assert(OggPages.decode(1, page(0, 1, 5, 0, Seq(4), pay(4)(identity),
      version = 1)).isEmpty)
    assert(OggPages.decode(1, page(0, 1, 5, 0, Seq(4), pay(4)(identity),
      truncateSegTable = true)).isEmpty)
    assert(OggPages.decode(1, ok.dropRight(3)).isEmpty) // payload truncated
    val withGarbage = Array.fill[Byte](13)(0x4f) ++ ok // run of 'O's before the real page
    assert(OggPages.decode(1, withGarbage).map(_.payload_len) === Seq(8))
    assert(OggPages.decode(1, null).isEmpty)
  }

  test("64-bit granule and CRC field zeroing are both honored") {
    val g = 0x0102030405060708L
    val p = page(2, g, 42, 0, Seq(5), pay(5)(_ * 7))
    val decoded = OggPages.decode(1, p)
    assert(decoded.head.granule === g)
    assert(decoded.head.serial === 42L)
    // flipping any CRC byte must kill the page (proves the read CRC is
    // compared, not recomputed over itself)
    val flipped = p.clone(); flipped(23) = (flipped(23) ^ 1).toByte
    assert(OggPages.decode(1, flipped).isEmpty)
  }
}
