package graft.ops

import graft.SparkSpec
import java.util.zip.GZIPOutputStream

class GzipExtractSpec extends SparkSpec {

  // ——— reference writer: the JDK's OWN GZIPOutputStream — real Huffman
  //     deflate, real trailer arithmetic, no FNAME (flg=0 path) ———
  private def jdkGzip(content: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(content.getBytes("ISO-8859-1"))
    g.close()
    bos.toByteArray
  }

  test("walks concatenated JDK-written members with real deflate, trailers green") {
    val a = "alpha " * 40
    val b = "bravo"
    val bytes = jdkGzip(a) ++ jdkGzip(b)
    val ms = GzipExtract.parse(9L, bytes)
    assert(ms.map(m => (m.member_idx, m.fname, m.isize, m.content, m.crc_ok)) == Seq(
      (0L, "", a.length.toLong, a, true), (1L, "", b.length.toLong, b, true)))
    assert(ms.forall(_.shard_id == 9L))
  }

  test("a corrupted trailer flags the member and the walk resyncs to the next") {
    val bytes = jdkGzip("first") ++ jdkGzip("second")
    // flip a bit in the FIRST member's stored CRC (trailer = last 8 bytes
    // of the first member's span)
    val firstLen = jdkGzip("first").length
    bytes(firstLen - 8) = (bytes(firstLen - 8) ^ 1).toByte
    val ms = GzipExtract.parse(0L, bytes)
    assert(ms.map(m => (m.content, m.crc_ok)) ==
      Seq(("first", false), ("second", true)))
  }

  test("bad magic, truncated deflate, and empty input stop cleanly") {
    assert(GzipExtract.parse(0L, Array.emptyByteArray).isEmpty)
    assert(GzipExtract.parse(0L, "not-gzip-at-all".getBytes("US-ASCII")).isEmpty)
    val good = jdkGzip("payload")
    val truncated = good.dropRight(12) // inside deflate/trailer
    assert(GzipExtract.parse(0L, truncated).isEmpty)
    // first member intact, second truncated: first still extracts
    val mixed = good ++ good.dropRight(12)
    assert(GzipExtract.parse(0L, mixed).map(_.content) == Seq("payload"))
  }

  test("FEXTRA is skipped when whole; a truncated FEXTRA is a structural break") {
    // hand-build a FEXTRA member around a JDK deflate body: header with
    // FLG=4, 2-byte XLEN, XLEN extra bytes, then the body+trailer of a
    // JDK-written member (strip its own 10-byte header)
    val jdk = jdkGzip("extra-field")
    val body = jdk.drop(10)
    val extra = Array[Byte](1, 2, 3, 4, 5)
    val hdr = Array[Byte](0x1f, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](extra.length.toByte, 0) ++ extra
    val whole = hdr ++ body
    assert(GzipExtract.parse(0L, whole).map(m => (m.content, m.crc_ok)) ==
      Seq(("extra-field", true)))
    // truncate inside the 2-byte XLEN field: must yield zero members, not a
    // misparse at an unadjusted offset
    val truncatedXlen = Array[Byte](0x1f, 0x8b.toByte, 8, 4, 0, 0, 0, 0, 0, 0, 9)
    assert(GzipExtract.parse(0L, truncatedXlen).isEmpty)
    // a good member FOLLOWED by the truncated-FEXTRA tail keeps the good one
    val mixed2 = jdkGzip("keep") ++ truncatedXlen
    assert(GzipExtract.parse(0L, mixed2).map(_.content) == Seq("keep"))
  }

  test("extract() explodes archives and survives null blobs") {
    import spark.implicits._
    val df = Seq((1L, Option(jdkGzip("zz"))), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = GzipExtract.extract(df).collect().toSeq
    assert(rows.map(m => (m.shard_id, m.content, m.crc_ok)) == Seq((1L, "zz", true)))
  }
}
