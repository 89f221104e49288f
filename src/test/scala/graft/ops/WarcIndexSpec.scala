package graft.ops

import graft.SparkSpec

class WarcIndexSpec extends SparkSpec {

  // spec-side reference writer with header-case and extra-header variation
  // the x117 gate's builder does not produce
  private def rec(headers: Seq[(String, String)], payload: String,
      declaredLen: Option[Int] = None): String = {
    val cl = declaredLen.getOrElse(payload.length)
    ("WARC/1.0" +: headers.map { case (k, v) => s"$k: $v" })
      .mkString("", "\r\n", "\r\n") +
      s"Content-Length: $cl\r\n\r\n$payload\r\n\r\n"
  }

  test("walks records; header names match case-insensitively; extra headers skipped") {
    val bytes = (rec(Seq("WARC-TYPE" -> "response",
      "warc-target-uri" -> "https://a/1",
      "WARC-Record-ID" -> "<urn:uuid:x>", "X-Custom" -> "v"), "hello world") +
      rec(Seq("Warc-Type" -> "metadata"), "")).getBytes("ISO-8859-1")
    val rs = WarcIndex.parse(4L, bytes)
    assert(rs.map(r => (r.rec_idx, r.warc_type, r.target_uri, r.content_length,
      r.payload)) == Seq(
      (0L, "response", "https://a/1", 11L, "hello world"),
      (1L, "metadata", "", 0L, "")))
  }

  test("header matching is locale-independent (Turkish dotless-i)") {
    // default-locale toLowerCase maps 'I' → 'ı' under tr, so
    // 'WARC-Target-URI'/'Content-Length' keys would silently stop matching
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
    try {
      val bytes = rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "https://tr/1"), "icerik").getBytes("ISO-8859-1")
      val rs = WarcIndex.parse(0L, bytes)
      assert(rs.map(r => (r.warc_type, r.target_uri, r.content_length)) ==
        Seq(("response", "https://tr/1", 6L)))
    } finally java.util.Locale.setDefault(prev)
  }

  test("payload containing fake headers does not desync the length-driven walk") {
    val evil = "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a record"
    val bytes = (rec(Seq("WARC-Type" -> "response"), evil) +
      rec(Seq("WARC-Type" -> "request"), "tail")).getBytes("ISO-8859-1")
    val rs = WarcIndex.parse(0L, bytes)
    assert(rs.map(_.payload) == Seq(evil, "tail"))
  }

  test("a lying Content-Length fails the terminator check and stops the walk") {
    val bytes = (rec(Seq("WARC-Type" -> "response"), "good") +
      rec(Seq("WARC-Type" -> "response"), "bad!", declaredLen = Some(3)) +
      rec(Seq("WARC-Type" -> "response"), "never")).getBytes("ISO-8859-1")
    val rs = WarcIndex.parse(0L, bytes)
    assert(rs.map(_.payload) == Seq("good"))
  }

  test("missing Content-Length, bad version line, truncation, empty input stop cleanly") {
    assert(WarcIndex.parse(0L, Array.emptyByteArray).isEmpty)
    assert(WarcIndex.parse(0L, "HTTP/1.1 200 OK\r\n\r\n".getBytes("US-ASCII")).isEmpty)
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
    assert(WarcIndex.parse(0L, noLen.getBytes("US-ASCII")).isEmpty)
    val good = rec(Seq("WARC-Type" -> "response"), "abcdef")
    assert(WarcIndex.parse(0L,
      good.getBytes("ISO-8859-1").dropRight(5)).isEmpty)
  }

  test("index() explodes shards and survives null blobs") {
    import spark.implicits._
    val bytes = rec(Seq("WARC-Type" -> "response"), "qq").getBytes("ISO-8859-1")
    val df = Seq((1L, Option(bytes)), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = WarcIndex.index(df).collect().toSeq
    assert(rows.map(r => (r.shard_id, r.payload)) == Seq((1L, "qq")))
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    val good = (rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> "https://a/1"), "hello world") +
      rec(Seq("WARC-Type" -> "metadata"), "")).getBytes("ISO-8859-1")
    def dec(b: Array[Byte]): Any = WarcIndex.parse(0L, b)
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
