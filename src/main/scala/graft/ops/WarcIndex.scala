package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record indexing — the container format of web-scale
  * text corpora: Common Crawl ships crawl data as WARC files, and the
  * first stage of every web-text pipeline is walking records and pulling
  * the response payloads. A record is a `WARC/1.0` version line, CRLF
  * header lines (`Name: value`) to an empty line, `Content-Length` octets
  * of payload, and a CRLFCRLF terminator. All text + one length field —
  * pure byte arithmetic, the TAR posture.
  *
  * The walk is length-driven (Content-Length is authoritative, as the spec
  * requires — payloads are binary and may contain anything, including
  * fake headers). Each record's terminator is VERIFIED; a record whose
  * declared length does not land on CRLFCRLF is dropped and the walk
  * stops — unlike gzip members ([[GzipExtract]]) there is no second
  * length source to resync from, which is exactly why crawl archives gzip
  * each record separately. Header names match case-insensitively (the
  * spec allows any case); an unparseable version line or a record with no
  * Content-Length also stops the walk.
  *
  * Scale shape: narrow per-shard flatMap, nothing shuffles until the
  * caller aggregates.
  */
object WarcIndex {

  final case class WarcRecord(
      shard_id: Long,
      rec_idx: Long,
      warc_type: String,
      target_uri: String,
      content_length: Long,
      payload: String)

  def parse(id: Long, bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var off = 0
    var idx = 0L
    var done = false
    val n = bytes.length

    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      i
    }

    while (!done && off < n) {
      val ve = lineEnd(off)
      if (ve + 1 >= n ||
        !new String(bytes, off, ve - off, "US-ASCII").startsWith("WARC/")) done = true
      else {
        var p = ve + 2
        var wtype = ""
        var uri = ""
        var clen = -1L
        var headersOk = true
        var blank = false
        while (!blank && headersOk && p + 1 < n) {
          val he = lineEnd(p)
          if (he == p) { blank = true; p += 2 } // empty line: end of headers
          else {
            val line = new String(bytes, p, he - p, "US-ASCII")
            val colon = line.indexOf(':')
            if (colon < 0) headersOk = false
            else {
              // Locale.ROOT: a Turkish default locale lowercases 'URI' to
              // 'urı' (dotless i) and the key comparisons silently miss
              val k = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
              val v = line.substring(colon + 1).trim
              k match {
                case "warc-type"       => wtype = v
                case "warc-target-uri" => uri = v
                case "content-length"  =>
                  clen = try v.toLong catch { case _: NumberFormatException => -1L }
                case _                 => () // other headers carried, not indexed
              }
              p = he + 2
            }
          }
        }
        if (!blank || !headersOk || clen < 0 || p + clen + 4 > n) done = true
        else {
          val payload = new String(bytes, p, clen.toInt, "ISO-8859-1")
          val t = p + clen.toInt
          // terminator CRLFCRLF verified — a short/long Content-Length
          // cannot silently shift the walk
          if (bytes(t) == '\r' && bytes(t + 1) == '\n' &&
            bytes(t + 2) == '\r' && bytes(t + 3) == '\n') {
            out += WarcRecord(id, idx, wtype, uri, clen, payload)
            idx += 1
            off = t + 4
          } else done = true
        }
      }
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → exploded record rows. */
  def index(shards: DataFrame): Dataset[WarcRecord] = {
    implicit val enc = Encoders.product[WarcRecord]
    shards.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          parse(r.getLong(0), bytes)
        }
      }
  }
}
