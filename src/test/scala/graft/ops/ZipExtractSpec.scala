package graft.ops

import graft.SparkSpec
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

class ZipExtractSpec extends SparkSpec {

  // ——— reference writer: the JDK's OWN ZipOutputStream — real Huffman
  //     deflate for DEFLATED entries (not the gate's stored-block trick)
  //     and data-descriptor streaming layout, so the decoder's
  //     central-directory-driven walk is validated against an independent
  //     producer ———
  private def jdkZip(entries: (String, String, Boolean)*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content, stored) =>
      val bytes = content.getBytes("US-ASCII")
      val e = new ZipEntry(name)
      if (stored) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length.toLong)
        val c = new CRC32; c.update(bytes); e.setCrc(c.getValue)
      } else e.setMethod(ZipEntry.DEFLATED)
      z.putNextEntry(e)
      z.write(bytes)
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  test("walks a JDK-written archive: stored + really-deflated members, CRC green") {
    val text = "the quick brown fox " * 20 // compressible → real Huffman codes
    val bytes = jdkZip(("a.txt", "hello", true), ("b.bin", text, false))
    val ms = ZipExtract.parse(3L, bytes)
    assert(ms.map(m => (m.name, m.method, m.usize, m.content, m.crc_ok)) == Seq(
      ("a.txt", 0L, 5L, "hello", true),
      ("b.bin", 8L, text.length.toLong, text, true)))
    assert(ms.forall(_.shard_id == 3L))
  }

  test("a flipped content byte fails that member's CRC; the rest extract clean") {
    val bytes = jdkZip(("ok", "aaaa", true), ("bad", "bbbb", true))
    // flip one payload byte of the SECOND stored member (its LFH follows
    // the first member's 30+2+4 bytes; payload starts after its own 30+3)
    val idx = bytes.indexOfSlice("bbbb".getBytes("US-ASCII"))
    bytes(idx) = 'X'.toByte
    val ms = ZipExtract.parse(0L, bytes)
    assert(ms.map(m => (m.name, m.crc_ok)) == Seq(("ok", true), ("bad", false)))
    assert(ms(1).content == "Xbbb") // extraction still returns the bytes
  }

  test("no EOCD, truncated data, and empty input yield no members, never a throw") {
    val good = jdkZip(("m", "zzz", true))
    assert(ZipExtract.parse(0L, good.dropRight(3)).isEmpty) // EOCD destroyed
    assert(ZipExtract.parse(0L, Array.emptyByteArray).isEmpty)
    assert(ZipExtract.parse(0L, Array.fill[Byte](50)(0)).isEmpty)
  }

  test("bytes >0x7F in names and content round-trip byte-for-byte (ISO-8859-1)") {
    // US-ASCII decode mapped every byte >0x7F to '?' — lossy for real
    // scraped archives; ISO-8859-1 must preserve the bytes so a composed
    // re-binarize stage (the x121 pattern) reproduces the payload exactly
    val payload = Array[Byte]('h', 0xC3.toByte, 0xA9.toByte, 0x00, 0xFF.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    val e = new ZipEntry("hé.bin") // JDK writes the name as UTF-8 bytes
    e.setMethod(ZipEntry.STORED)
    e.setSize(payload.length.toLong)
    val c = new CRC32; c.update(payload); e.setCrc(c.getValue)
    z.putNextEntry(e); z.write(payload); z.closeEntry(); z.close()
    val ms = ZipExtract.parse(0L, bos.toByteArray)
    assert(ms.size == 1)
    // content bytes reproduce exactly; no byte collapsed to '?'
    assert(ms.head.content.getBytes("ISO-8859-1").toSeq == payload.toSeq)
    assert(ms.head.crc_ok)
    // name round-trips to the raw UTF-8 bytes the writer emitted
    assert(ms.head.name.getBytes("ISO-8859-1").toSeq ==
      "hé.bin".getBytes("UTF-8").toSeq)
  }

  test("extract() explodes archives to member rows and survives null blobs") {
    import spark.implicits._
    val bytes = jdkZip(("f", "qq", true))
    val df = Seq((1L, Option(bytes)), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = ZipExtract.extract(df).collect().toSeq
    assert(rows.map(m => (m.shard_id, m.name, m.content, m.crc_ok)) ==
      Seq((1L, "f", "qq", true)))
  }
}
