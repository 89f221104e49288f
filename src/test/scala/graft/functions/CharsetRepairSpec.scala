package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** functions/CharsetRepair: strict RFC 3629 validation edges, the cp1252
  * transcode differentially against the JDK's own windows-1252 decoder,
  * and the codegen path through a real plan. */
class CharsetRepairSpec extends SparkSpec {

  private val h = new CharsetRepairHelper

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("strict validation accepts exactly the RFC 3629 shapes") {
    assert(h.isUtf8(Array.emptyByteArray))
    assert(h.isUtf8("plain ascii".getBytes("UTF-8")))
    assert(h.isUtf8("café 가 😀".getBytes("UTF-8")))
    // boundary leads
    assert(h.isUtf8(bytes(0xc2, 0x80)))       // U+0080 shortest 2-byte
    assert(h.isUtf8(bytes(0xed, 0x9f, 0xbf))) // U+D7FF below surrogates
    assert(h.isUtf8(bytes(0xee, 0x80, 0x80))) // U+E000 above surrogates
    assert(h.isUtf8(bytes(0xf4, 0x8f, 0xbf, 0xbf))) // U+10FFFF max
  }

  test("strict validation rejects what lenient decoders let through") {
    assert(!h.isUtf8(bytes(0xc0, 0xaf)))             // overlong '/'
    assert(!h.isUtf8(bytes(0xc1, 0xbf)))             // overlong lead
    assert(!h.isUtf8(bytes(0xe0, 0x9f, 0xbf)))       // overlong 3-byte
    assert(!h.isUtf8(bytes(0xed, 0xa0, 0x80)))       // surrogate U+D800
    assert(!h.isUtf8(bytes(0xf0, 0x8f, 0xbf, 0xbf))) // overlong 4-byte
    assert(!h.isUtf8(bytes(0xf4, 0x90, 0x80, 0x80))) // > U+10FFFF
    assert(!h.isUtf8(bytes(0xf5, 0x80, 0x80, 0x80))) // illegal lead
    assert(!h.isUtf8(bytes(0x80)))                   // bare continuation
    assert(!h.isUtf8(bytes(0xc3)))                   // truncated tail
    assert(!h.isUtf8(bytes(0xe9, 0x20)))             // 1252 é + space
  }

  test("cp1252 transcode matches the JDK windows-1252 decoder for every byte") {
    // every single byte 0x80..0xFF against the JDK's table, EXCEPT the
    // five positions CP1252.TXT leaves undefined: the JDK decodes those
    // to U+FFFD while this library follows the WHATWG encoding-standard
    // index (C1 control passthrough — the web/crawl convention, and
    // information-preserving where U+FFFD is lossy)
    val undefinedCp1252 = Set(0x81, 0x8d, 0x8f, 0x90, 0x9d)
    for (x <- 0x80 to 0xff) {
      val got = h.repair(Array(x.toByte)).toString
      if (undefinedCp1252(x))
        assert(got == x.toChar.toString, f"byte 0x$x%02X: want C1 control")
      else {
        val expect = new String(Array(x.toByte), "windows-1252")
        assert(got == expect, f"byte 0x$x%02X: got $got, want $expect")
      }
    }
    // and a mixed sentence (ASCII interleaved, still invalid as UTF-8)
    val raw = bytes('c', 'a', 'f', 0xe9, ' ', 0x93, 'q', 0x94, 0x85)
    assert(h.repair(raw).toString == new String(raw.map(_.toByte), "windows-1252"))
  }

  test("valid UTF-8 passes through byte-identical") {
    val s = "café € 😀 plain"
    val b = s.getBytes("UTF-8")
    val out = h.repair(b)
    assert(out.toString == s)
    assert(out.getBytes.sameElements(b))
  }

  test("double-encoded mojibake validates as UTF-8 and trips the pair flag") {
    // UTF-8(Ã©) = C3 83 C2 A9 — valid bytes, wrong text
    val raw = bytes(0xc3, 0x83, 0xc2, 0xa9)
    assert(h.isUtf8(raw))
    val txt = h.repair(raw).toString
    assert(txt == "Ã©")
    assert(txt.matches(s".*${CharsetRepair.mojibakePairPattern}.*"))
    // while a LEGITIMATE é never trips it
    assert(!"café".matches(s".*${CharsetRepair.mojibakePairPattern}.*"))
  }

  test("fuzz: random byte strings never throw, and repair is total") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 500) {
      val b = Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte)
      val out = h.repair(b) // must not throw
      if (!h.isUtf8(b)) assert(out.numChars() == b.length) // 1252: byte ↦ char
    }
  }

  test("codegen path: the expressions run inside a real plan") {
    import spark.implicits._
    val got = Seq(
      ("utf8", "café".getBytes("UTF-8")),
      ("cp1252", Array(0x63, 0x61, 0x66, 0xe9).map(_.toByte)),
      ("moji", Array(0xc3, 0x83, 0xc2, 0xa9).map(_.toByte))
    ).toDF("name", "raw")
      .withColumn("ok", CharsetRepair.isUtf8(col("raw")))
      .withColumn("txt", CharsetRepair.repair(col("raw")))
      .collect()
      .map(r => r.getString(0) -> ((r.getBoolean(2), r.getString(3)))).toMap
    val want = Map(
      "utf8" -> ((true, "café")),
      "cp1252" -> ((false, "café")),
      "moji" -> ((true, "Ã©")))
    want.foreach { case (k, v) => assert(got(k) == v, s"$k: got ${got(k)}") }
  }
}
