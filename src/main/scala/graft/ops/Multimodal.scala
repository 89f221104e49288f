package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract run per partition so
  * one decoder instance amortizes over a batch of rows (the Scala analog of
  * a Pandas-UDF batch).
  *
  * Decode status, honestly: formats whose decoding is pure byte arithmetic
  * (PPM P6, uncompressed 24-bit BMP, PCM WAV) are decoded FOR REAL by
  * [[Multimodal.HeaderDecoder]] — no codec library involved, so the
  * environment's missing media libs don't block them. PNG is ALSO real
  * ([[Multimodal.Png]]): deflate/zlib ships in the JDK, so chunk CRCs,
  * inflation, and type-0 unfiltering need no external codec. Baseline JPEG
  * is now ALSO real end to end: [[JpegDecoder]] implements the T.81
  * entropy path (canonical Huffman, run-length, dequant, IDCT, color
  * convert) in pure Scala — see [[jpegPixels]]. GIF LZW ([[GifDecoder]],
  * incl. local color tables), MJPEG-in-MP4 frames ([[Mp4Samples]]), and
  * the MP3 frame/side-info structure ([[Mp3Frames]] — full frame walk,
  * Xing, bit reservoir, granule budgets, global_gain loudness) are real
  * too. The remaining entropy-coded PAYLOADS (H.264, MP3 Huffman spectral
  * data + IMDCT/synthesis PCM, progressive/arithmetic JPEG) genuinely
  * need external libraries that are not in the offline dependency budget;
  * those stay behind [[Multimodal.Decoder]] with
  * [[Multimodal.FakeDecoder]] as the deterministic stand-in, so the
  * Spark-side plumbing (schema, batching, partitioning, frame explode) is
  * real and tested either way. A production decoder implements the same
  * trait over the actual codec library.
  */
object Multimodal {

  /** Typed metadata extracted from one media blob. */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Long,
      format: String,
      width: Int,
      height: Int,
      checksum: String)

  /** One sampled frame (video path): frame index + a feature stub. */
  final case class FrameSample(media_id: Long, frame_idx: Int, feature: Array[Float])

  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte]): (String, Int, Int) // (format, width, height)
    def frameFeature(bytes: Array[Byte], frameIdx: Int): Array[Float]
  }

  /** Typed result of a REAL PNG decode; `bit_depth`/`pixel_hex` are None
    * when the blob fell back to [[FakeDecoder]] (corrupt or out of scope). */
  final case class PngMeta(
      media_id: Long,
      format: String,
      width: Long,
      height: Long,
      bit_depth: Option[Long],
      pixel_hex: Option[String])

  /** REAL PNG decoding with zero codec libraries: chunk walking, CRC-32
    * validation, and zlib inflation are all JDK built-ins
    * (`java.util.zip.{CRC32, Inflater}`), and scanline unfiltering — ALL
    * five spec filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6) — is
    * pure byte arithmetic. Scope: 8-bit greyscale (color type 0) and
    * truecolor (type 2), non-interlaced. Stored-block streams with
    * filter-0 rows are the shapes constructible in SQL on both engines
    * (x36's end-to-end gate); filtered rows are gated by x102, whose
    * oracle recomputes the reconstruction recurrence in a recursive CTE.
    * Anything else (interlace, 16-bit, palette, filter byte > 4) returns
    * None and the caller routes to [[FakeDecoder]] — same corrupt-blob
    * honesty as the other real decoders: one bad blob in a 100 TB scrape
    * must degrade, not kill the stage. */
  object Png {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be32(b: Array[Byte], i: Int): Long =
      (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

    def isPng(b: Array[Byte]): Boolean =
      b.length >= 8 && Sig.indices.forall(i => u8(b, i) == Sig(i))

    /** Full structural decode → (width, height, bitDepth, colorType,
      * unfiltered pixel bytes), or None on ANY violation: bad signature,
      * truncated/oversized chunk, CRC-32 mismatch (every chunk, ancillary
      * included), bad zlib stream or Adler-32 (the Inflater checks it),
      * inflated size ≠ h·(1+w·bpp), or a non-zero scanline filter type. */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Array[Byte])] = {
      if (!isPng(bytes)) return None
      var w = -1; var h = -1; var depth = -1; var ctype = -1
      var seenIhdr = false; var seenIend = false
      val idat = new java.io.ByteArrayOutputStream()
      val crc = new java.util.zip.CRC32
      var i = 8
      while (!seenIend) {
        if (i + 12 > bytes.length) return None
        val len = be32(bytes, i)
        if (len > bytes.length - i - 12) return None
        val n = len.toInt
        crc.reset(); crc.update(bytes, i + 4, 4 + n)
        if (crc.getValue != be32(bytes, i + 8 + n)) return None
        val tag = new String(bytes, i + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        tag match {
          case "IHDR" =>
            if (n != 13) return None
            w = be32(bytes, i + 8).toInt; h = be32(bytes, i + 12).toInt
            depth = u8(bytes, i + 16); ctype = u8(bytes, i + 17)
            // compression / filter method / interlace must all be 0
            if (u8(bytes, i + 18) != 0 || u8(bytes, i + 19) != 0 || u8(bytes, i + 20) != 0)
              return None
            seenIhdr = true
          case "IDAT" => idat.write(bytes, i + 8, n)
          case "IEND" => seenIend = true
          case _ => () // ancillary chunks: skipped, but their CRC was checked
        }
        i += 12 + n
      }
      if (!seenIhdr || w <= 0 || h <= 0 || depth != 8 || (ctype != 0 && ctype != 2))
        return None
      val bpp = if (ctype == 2) 3 else 1
      // Long arithmetic + a 64 MiB raw-size cap BEFORE any allocation: a
      // tiny valid-CRC header claiming 32768×32768 must neither overflow
      // Int (h·stride would go negative → uncatchable
      // NegativeArraySizeException) nor allocate a ~3 GiB buffer the IDAT
      // data can't possibly fill — either way one hostile blob would kill
      // the stage instead of degrading
      val strideL = 1L + w.toLong * bpp
      val rawLen = h.toLong * strideL
      if (rawLen > (1L << 26)) return None
      val stride = strideL.toInt
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new java.util.zip.Inflater() // zlib-wrapped: verifies Adler-32
      try {
        inf.setInput(idat.toByteArray)
        if (inf.inflate(raw) != raw.length || !inf.finished()) return None
      } catch { case _: java.util.zip.DataFormatException => return None }
      finally inf.end()
      // Per-spec reconstruction (RFC 2083 §6.2–6.6): a = left-of-x by one
      // pixel (bpp bytes), b = above, c = above-left, all 0 off-image; the
      // recurrence reads RECONSTRUCTED neighbors, so it must run in scan
      // order over the output buffer, mod 256.
      val rowBytes = w * bpp
      val pix = new Array[Byte](h * rowBytes)
      var r = 0
      while (r < h) {
        val ft = raw(r * stride) & 0xff
        if (ft > 4) return None // not a spec filter type
        var i = 0
        while (i < rowBytes) {
          val x = raw(r * stride + 1 + i) & 0xff
          val a = if (i >= bpp) pix(r * rowBytes + i - bpp) & 0xff else 0
          val b = if (r > 0) pix((r - 1) * rowBytes + i) & 0xff else 0
          val c = if (r > 0 && i >= bpp) pix((r - 1) * rowBytes + i - bpp) & 0xff else 0
          val recon = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + ((a + b) >> 1)
            case _ => // Paeth: nearest of a/b/c to p = a+b−c, ties a > b > c
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          }
          pix(r * rowBytes + i) = (recon & 0xff).toByte
          i += 1
        }
        r += 1
      }
      Some((w, h, depth, ctype, pix))
    }
  }

  /** (media_id, media: binary) → real PNG decode per row; fallback rows
    * carry [[FakeDecoder]] dimensions and null depth/pixels, so a caller
    * can route on `bit_depth IS NULL` exactly like the `fake-` format
    * prefix elsewhere. */
  def pngMeta(media: DataFrame): Dataset[PngMeta] = {
    implicit val enc = Encoders.product[PngMeta]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val id = r.getLong(0)
          // null blob (missing scrape) → empty bytes → fake-decoder row,
          // never an NPE that kills the task
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          Png.decode(bytes) match {
            case Some((w, h, d, ct, pix)) =>
              val fmt = if (ct == 2) "image/png-rgb" else "image/png-gray"
              PngMeta(id, fmt, w.toLong, h.toLong, Some(d.toLong),
                Some(pix.map("%02X".format(_)).mkString))
            case None =>
              val (fmt, w, h) = FakeDecoder.decode(bytes)
              PngMeta(id, fmt, w.toLong, h.toLong, None, None)
          }
        }
      }
  }

  /** Typed result of a REAL baseline-JPEG entropy decode ([[JpegDecoder]]);
    * `n_comp`/`pixel_hex` are None when the blob fell back to
    * [[FakeDecoder]] (corrupt or out of the documented baseline scope). */
  final case class JpegMeta(
      media_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_comp: Option[Long],
      pixel_hex: Option[String])

  /** (media_id, media: binary) → full entropy decode per row through
    * [[JpegDecoder]] (Huffman + run-length + dequant + IDCT + level shift
    * — the pixel path [[RealDecoder]]'s header walk stops short of).
    * Fallback rows carry [[FakeDecoder]] dimensions and null
    * n_comp/pixel_hex, mirroring [[pngMeta]]'s routing contract. */
  def jpegPixels(media: DataFrame): Dataset[JpegMeta] = {
    implicit val enc = Encoders.product[JpegMeta]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          JpegDecoder.decode(bytes) match {
            case Some(d) =>
              val fmt = if (d.nComp == 3) "image/jpeg-rgb" else "image/jpeg-gray"
              JpegMeta(id, fmt, d.width.toLong, d.height.toLong,
                Some(d.nComp.toLong), Some(d.pixels.map("%02X".format(_)).mkString))
            case None =>
              val (fmt, w, h) = FakeDecoder.decode(bytes)
              JpegMeta(id, fmt, w.toLong, h.toLong, None, None)
          }
        }
      }
  }

  /** Typed result of a REAL GIF LZW decode ([[GifDecoder]]); `n_colors`/
    * `pixel_hex` are None when the blob fell back to [[FakeDecoder]]
    * (corrupt or out of the documented scope). `pixel_hex` is the
    * color-INDEX plane — palette-indexed is the format's native raster. */
  final case class GifMeta(
      media_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_colors: Option[Long],
      pixel_hex: Option[String])

  /** (media_id, media: binary) → full LZW decode per row through
    * [[GifDecoder]] (variable-width codes, dictionary growth, KwKwK,
    * clear resets, sub-block reassembly). Fallback rows carry
    * [[FakeDecoder]] dimensions and null n_colors/pixel_hex, mirroring
    * [[pngMeta]]'s routing contract. */
  def gifPixels(media: DataFrame): Dataset[GifMeta] = {
    implicit val enc = Encoders.product[GifMeta]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          GifDecoder.decode(bytes) match {
            case Some(g) =>
              GifMeta(id, "image/gif", g.width.toLong, g.height.toLong,
                Some(g.nColors.toLong), Some(g.indexes.map("%02X".format(_)).mkString))
            case None =>
              val (fmt, w, h) = FakeDecoder.decode(bytes)
              GifMeta(id, fmt, w.toLong, h.toLong, None, None)
          }
        }
      }
  }

  /** [[GifMeta]] plus the resolved color table — the gate for LOCAL color
    * tables, where the palette CONTENT (not just the index plane) proves
    * which table the decoder resolved. `palette_hex` is RRGGBB per entry. */
  final case class GifPaletteRow(
      media_id: Long,
      format: String,
      width: Long,
      height: Long,
      n_colors: Option[Long],
      palette_hex: Option[String],
      pixel_hex: Option[String])

  /** (media_id, media: binary) → GIF decode exposing the resolved palette:
    * a local color table overrides the global, a global-less blob decodes
    * via its local table, and structural breaks (e.g. a declared table the
    * blob cannot hold) route to [[FakeDecoder]]. */
  def gifPalette(media: DataFrame): Dataset[GifPaletteRow] = {
    implicit val enc = Encoders.product[GifPaletteRow]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          GifDecoder.decode(bytes) match {
            case Some(g) =>
              GifPaletteRow(id, "image/gif", g.width.toLong, g.height.toLong,
                Some(g.nColors.toLong),
                Some(g.palette.map("%06X".format(_)).mkString),
                Some(g.indexes.map("%02X".format(_)).mkString))
            case None =>
              val (fmt, w, h) = FakeDecoder.decode(bytes)
              GifPaletteRow(id, fmt, w.toLong, h.toLong, None, None, None)
          }
        }
      }
  }

  /** Deterministic fake: derives dimensions from the first bytes and a
    * feature vector from a rolling byte hash — stable across runs/engines. */
  object FakeDecoder extends Decoder {
    def decode(bytes: Array[Byte]): (String, Int, Int) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val fmt = if (b0 % 2 == 0) "img/fake-rgb" else "img/fake-gray"
      (fmt, 16 + b0 % 64, 16 + b1 % 64)
    }
    def frameFeature(bytes: Array[Byte], frameIdx: Int): Array[Float] = {
      var h = 1125899906842597L + frameIdx
      bytes.foreach(b => h = 31 * h + (b & 0xff))
      Array.tabulate(4)(i => ((h >>> (i * 8)) & 0xff).toFloat / 255f)
    }
  }

  /** REAL decoding for the formats that need no codec library — container
    * parsing is byte arithmetic. Unknown/compressed formats fall back to
    * [[FakeDecoder]] (marked by its `fake-` format prefix, so callers can
    * route rows that genuinely need a codec).
    *
    * - PPM (P6): ASCII header `P6 <w> <h> <maxval>` + raw RGB triples.
    * - BMP: 'BM' magic; width/height little-endian at offsets 18/22
    *   (BITMAPINFOHEADER, uncompressed 24bpp assumed for features).
    * - WAV: RIFF/WAVE; fmt chunk gives channels@22, sample rate@24 —
    *   reported as (sampleRate, channels) in the (width, height) slots,
    *   which is the natural "dimensions" pair audio has.
    *
    * frameFeature: per-frame [mean, rms, min, max] over the real samples —
    * PCM s16le windows for WAV, RGB byte windows for PPM/BMP — normalized
    * to [0, 1]; fake fallback otherwise. Malformed headers (truncated,
    * absurd dims) also fall back rather than throw: a 100 TB scrape WILL
    * contain corrupt blobs and one bad row must not kill the stage.
    */
  object HeaderDecoder extends Decoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

    private def isPpm(b: Array[Byte]) =
      b.length > 10 && b(0) == 'P' && b(1) == '6' && (b(2) == ' ' || b(2) == '\n')

    private def isJpeg(b: Array[Byte]) =
      b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff

    /** (width, height, nComponents) from the first SOF0/1/2 frame header
      * via a bounds-checked marker walk — JPEG DIMENSIONS are plain
      * big-endian header fields, no entropy decoding involved, so metadata
      * extraction is real even though pixel decode stays behind the codec
      * stub. Standalone markers (RST/TEM) carry no length; EOI or SOS
      * before any SOF means no parseable frame header → None (fake
      * fallback). Only 8-bit precision is accepted — 12/16-bit JPEGs are
      * rare scan shapes the byte-window feature path could misreport. */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int, Int)] = {
      var i = 2
      while (i + 4 <= b.length) {
        if (u8(b, i) != 0xff) return None
        val m = u8(b, i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before SOF
        else {
          val len = (u8(b, i + 2) << 8) | u8(b, i + 3)
          if (len < 2 || i + 2 + len > b.length) return None
          if (m == 0xc0 || m == 0xc1 || m == 0xc2) {
            if (len < 8) return None
            val prec = u8(b, i + 4)
            val h = (u8(b, i + 5) << 8) | u8(b, i + 6)
            val w = (u8(b, i + 7) << 8) | u8(b, i + 8)
            val nc = u8(b, i + 9)
            return if (prec == 8 && w > 0 && h > 0 && nc > 0) Some((w, h, nc))
            else None
          }
          i += 2 + len
        }
      }
      None
    }

    /** Cheap magic test before the full MP3 parse: a leading ID3v2 tag or
      * an MPEG-1 Layer III frame sync. */
    private def looksMp3(b: Array[Byte]) =
      (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
        (b.length >= 4 && u8(b, 0) == 0xff && (u8(b, 1) & 0xfe) == 0xfa)

    /** MPEG-1 Layer III frame header → (sampleRate, channels, bitrateKbps,
      * frameBytes). Container metadata is byte arithmetic: the bitrate and
      * sample-rate TABLES are part of the public MPEG-1 header spec, not of
      * any entropy decoder. A leading ID3v2 tag is skipped via its
      * syncsafe 28-bit size (each size byte must have bit 7 clear).
      * Free-format (bitrate index 0), the reserved indices, and non-MPEG1
      * or non-Layer-III syncs all return None → fake fallback. */
    private def mp3Header(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      var i = 0
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
        if ((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) >= 0x80) return None
        i = 10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
      }
      if (i < 0 || i + 4 > b.length) return None
      // byte1 = 111 11 01 x : sync + MPEG-1 (11) + Layer III (01) + protection
      if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xfe) != 0xfa) return None
      val br = u8(b, i + 2) >> 4
      val sr = (u8(b, i + 2) >> 2) & 3
      val pad = (u8(b, i + 2) >> 1) & 1
      val mode = u8(b, i + 3) >> 6
      if (br == 0 || br == 15 || sr == 3) return None
      val bitrate = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(br)
      val rate = Array(44100, 48000, 32000)(sr)
      Some((rate, if (mode == 3) 1 else 2, bitrate, 144 * bitrate * 1000 / rate + pad))
    }
    /** 'BM' magic alone is NOT enough for the real path: an OS/2
      * BITMAPCOREHEADER puts dims at different offsets, and 32bpp or
      * RLE/compressed payloads would make the fixed-offset reads (and the
      * raw-byte frame windows) silently wrong. Real decode requires a
      * Windows DIB header (40/108/124), 24bpp, compression 0 — everything
      * else routes to the fake like other unsupported encodings. */
    private def isBmp(b: Array[Byte]) =
      b.length >= 54 && b(0) == 'B' && b(1) == 'M' && {
        val dib = le32(b, 14)
        (dib == 40 || dib == 108 || dib == 124) &&
          le16(b, 28) == 24 /* bpp */ && le32(b, 30) == 0 /* BI_RGB */
      }
    /** Canonical RIFF/WAVE with the fmt chunk first (offset 12) AND s16le
      * integer PCM — float/8-bit/extensible WAVs would be silently
      * misinterpreted if this only checked the RIFF magic, so they fall
      * back to the fake (callers route on the `fake-` prefix). */
    private def isPcm16Wav(b: Array[Byte]) =
      b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ' &&
        le16(b, 20) == 1 /* integer PCM */ && le16(b, 34) == 16 /* s16 */

    /** Start/end (exclusive) of the 'data' chunk payload via a bounds-checked
      * chunk walk — WAVs can carry LIST/INFO chunks before data, so a fixed
      * offset 44 is wrong in general. None on truncated/corrupt structure. */
    private def wavDataSpan(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 12L
      while (i + 8 <= b.length) {
        val sz = le32(b, i.toInt + 4).toLong & 0xffffffffL
        val payload = i + 8
        if (b(i.toInt) == 'd' && b(i.toInt + 1) == 'a' &&
            b(i.toInt + 2) == 't' && b(i.toInt + 3) == 'a') {
          val end = math.min(payload + sz, b.length.toLong)
          return if (payload < end) Some((payload.toInt, end.toInt)) else None
        }
        i = payload + sz + (sz & 1) // chunks pad to even length
      }
      None
    }

    /** PPM header ints (w, h, maxval) + offset where pixel data starts. */
    private[ops] def ppmHeader(b: Array[Byte]): Option[(Int, Int, Int)] = {
      var i = 2
      val vals = new Array[Int](3)
      var v = 0
      while (v < 3 && i < b.length) {
        while (i < b.length && (b(i) == ' ' || b(i) == '\n' || b(i) == '\t' || b(i) == '\r')) i += 1
        var x = 0
        var any = false
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { x = x * 10 + (b(i) - '0'); i += 1; any = true }
        if (!any) return None
        vals(v) = x
        v += 1
      }
      // maxval must fit one byte: a 16-bit PPM (maxval > 255) stores 2-byte
      // samples that the byte-window feature path would misread — route it
      // to the fake like any other unsupported encoding
      if (v == 3 && vals(0) > 0 && vals(1) > 0 && vals(2) > 0 && vals(2) <= 255)
        Some((vals(0), vals(1), i + 1))
      else None
    }

    /** All PCM s16le samples of a canonical WAV blob (channel-interleaved
      * when stereo), or None when the blob is not a decodable PCM16 WAV —
      * the SAME classification decode() uses, so a blob that routes to the
      * fake there never yields "real" samples here. A trailing odd byte in
      * a (corrupt) data chunk is dropped rather than misread. */
    def pcm16Samples(bytes: Array[Byte]): Option[Array[Int]] =
      if (bytes == null || !isPcm16Wav(bytes)) None
      else wavDataSpan(bytes).map { case (off, end) =>
        val n = (end - off) / 2
        val out = new Array[Int](n)
        var i = 0
        while (i < n) { out(i) = le16(bytes, off + 2 * i).toShort.toInt; i += 1 }
        out
      }

    def decode(bytes: Array[Byte]): (String, Int, Int) =
      if (Png.isPng(bytes))
        Png.decode(bytes).map { case (w, h, _, _, _) => ("image/png", w, h) }
          .getOrElse(FakeDecoder.decode(bytes))
      else if (isJpeg(bytes))
        jpegDims(bytes).map { case (w, h, _) => ("image/jpeg", w, h) }
          .getOrElse(FakeDecoder.decode(bytes))
      else if (looksMp3(bytes))
        // (sampleRate, channels) in the (width, height) slots — the same
        // "dimensions" convention the WAV branch uses
        mp3Header(bytes).map { case (rate, ch, _, _) => ("audio/mp3", rate, ch) }
          .getOrElse(FakeDecoder.decode(bytes))
      else if (isPpm(bytes))
        ppmHeader(bytes).map { case (w, h, _) => ("image/ppm", w, h) }
          .getOrElse(FakeDecoder.decode(bytes))
      else if (isBmp(bytes)) {
        val w = le32(bytes, 18)
        val h = math.abs(le32(bytes, 22)) // negative height = top-down rows
        val off = le32(bytes, 10)
        if (w > 0 && h > 0 && off >= 54 && off < bytes.length) ("image/bmp", w, h)
        else FakeDecoder.decode(bytes)
      } else if (isPcm16Wav(bytes)) {
        val channels = le16(bytes, 22)
        val sampleRate = le32(bytes, 24)
        if (channels > 0 && sampleRate > 0 && wavDataSpan(bytes).isDefined)
          ("audio/wav", sampleRate, channels)
        else FakeDecoder.decode(bytes)
      } else FakeDecoder.decode(bytes)

    private def stats(xs: Iterator[Double]): Array[Float] = {
      var n = 0L; var sum = 0.0; var sq = 0.0
      var mn = Double.MaxValue; var mx = Double.MinValue
      xs.foreach { x => n += 1; sum += x; sq += x * x; if (x < mn) mn = x; if (x > mx) mx = x }
      if (n == 0) Array(0f, 0f, 0f, 0f)
      else Array((sum / n).toFloat, math.sqrt(sq / n).toFloat, mn.toFloat, mx.toFloat)
    }

    /** All window arithmetic is in Long with an explicit payload span, so a
      * hostile/corrupt header (negative or absurd offsets) or a huge
      * frameIdx can never index out of bounds — consistent with decode():
      * a blob decode() would fall back on gets the FAKE feature here too,
      * never "real" stats over misinterpreted bytes. Past-the-end frames on
      * VALID blobs yield the zero vector (empty window). JPEG/MP3 blobs
      * take the fake path here BY DESIGN: their metadata decode is real
      * (header fields are byte arithmetic), but per-frame features would
      * need the entropy decoder that stays behind the codec stub. */
    def frameFeature(bytes: Array[Byte], frameIdx: Int): Array[Float] =
      if (Png.isPng(bytes)) Png.decode(bytes) match {
        // 256-byte windows over the UNFILTERED pixel payload — same frame
        // convention as PPM/BMP, but on post-inflate bytes
        case Some((_, _, _, _, pix)) =>
          val start = frameIdx.toLong * 256
          val end = math.min(pix.length.toLong - 1, start + 255)
          if (frameIdx < 0 || start > end) Array(0f, 0f, 0f, 0f)
          else stats((start to end).iterator.map(i => u8(pix, i.toInt) / 255.0))
        case None => FakeDecoder.frameFeature(bytes, frameIdx)
      }
      else if (isPcm16Wav(bytes)) wavDataSpan(bytes) match {
        case Some((dOff, dEnd)) =>
          // s16le PCM window of 256 samples per frame
          val start = dOff.toLong + frameIdx.toLong * 512
          val end = math.min(dEnd.toLong - 2, start + 510)
          if (frameIdx < 0 || start > end) Array(0f, 0f, 0f, 0f)
          else stats((start to end by 2).iterator.map { i =>
            (le16(bytes, i.toInt).toShort.toDouble / 32768.0 + 1.0) / 2.0 // [-1,1] → [0,1]
          })
        case None => FakeDecoder.frameFeature(bytes, frameIdx)
      }
      else if (isPpm(bytes) || isBmp(bytes)) {
        // raw byte window over the pixel payload (256 bytes per frame);
        // unparseable header → fake, mirroring decode()'s classification
        // EXACTLY — including the zero-dimension BMP rejection, so a blob
        // decode() routes to the fake never gets "real" stats here
        val off =
          if (isBmp(bytes)) {
            val o = le32(bytes, 10)
            if (o >= 54 && o < bytes.length &&
              le32(bytes, 18) > 0 && math.abs(le32(bytes, 22)) > 0) o
            else -1
          } else ppmHeader(bytes).map(_._3).getOrElse(-1)
        if (off < 0) FakeDecoder.frameFeature(bytes, frameIdx)
        else {
          val start = off.toLong + frameIdx.toLong * 256
          val end = math.min(bytes.length.toLong - 1, start + 255)
          if (frameIdx < 0 || start > end) Array(0f, 0f, 0f, 0f)
          else stats((start to end).iterator.map(i => u8(bytes, i.toInt) / 255.0))
        }
      } else FakeDecoder.frameFeature(bytes, frameIdx)
  }

  /** (media_id: Long, media: binary) → typed metadata; one decoder per
    * partition. */
  def extractMeta(media: DataFrame, decoder: Decoder = FakeDecoder): Dataset[MediaMeta] = {
    implicit val enc = Encoders.product[MediaMeta]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (fmt, w, h) = decoder.decode(bytes)
          md.reset()
          val sum = md.digest(bytes).map("%02x".format(_)).mkString
          MediaMeta(id, bytes.length.toLong, fmt, w, h, sum)
        }
      }
  }

  /** Per-clip audio features over REAL decoded PCM s16le samples. All four
    * features are INTEGER-exact (sum of squares, not RMS; peak amplitude,
    * not dB) so the numbers are bit-stable across engines and partitionings
    * — a caller wanting RMS/loudness derives it as sqrt(sum_sq/n_samples)
    * in one narrow projection. Blobs that are not decodable PCM16 WAVs
    * (per [[HeaderDecoder]]'s classification) yield `valid = false` with
    * zeroed features instead of throwing: a 100 TB scrape WILL contain
    * corrupt audio and one bad row must not kill the stage. */
  final case class PcmFeatures(
      media_id: Long,
      valid: Boolean,
      n_samples: Long,
      sum_sq: Long,
      peak: Long,
      zero_crossings: Long)

  /** (media_id: Long, media: binary) → one [[PcmFeatures]] row per blob.
    * Narrow per-row decode (zero shuffle): each clip's samples are visited
    * once in a single pass, state is O(1) per row, and clips never cross
    * partitions — the shape that holds at any corpus size. */
  def pcmFeatures(media: DataFrame): Dataset[PcmFeatures] = {
    implicit val enc = Encoders.product[PcmFeatures]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          HeaderDecoder.pcm16Samples(bytes) match {
            case Some(s) =>
              var sq = 0L; var peak = 0L; var zc = 0L
              var i = 0
              while (i < s.length) {
                val v = s(i).toLong
                sq += v * v
                val a = math.abs(v)
                if (a > peak) peak = a
                if (i > 0 && ((s(i - 1) < 0) != (v < 0))) zc += 1
                i += 1
              }
              PcmFeatures(id, valid = true, s.length.toLong, sq, peak, zc)
            case None => PcmFeatures(id, valid = false, 0L, 0L, 0L, 0L)
          }
        }
      }
  }

  /** Codegen-native frame slicing: one row per fixed-size byte window of
    * the blob — the decode-free path for frame features expressible in
    * Spark SQL itself (checksums, sizes, byte stats). Unlike the
    * decoder-based ops below this never leaves whole-stage codegen: the
    * explode and the byte slice are built-in expressions, so it is the
    * preferred shape whenever the per-frame computation doesn't need a
    * codec. Output: (media_id, frame_idx: Long, frame: binary). */
  def sliceFrames(media: DataFrame, frameBytes: Int): DataFrame = {
    require(frameBytes > 0)
    media.select(col("media_id"), col("media"))
      .withColumn("n_frames", floor(length(col("media")) / frameBytes).cast("long"))
      .filter(col("n_frames") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"),
        col("media"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(media, CAST(frame_idx * $frameBytes + 1 AS INT), $frameBytes)").as("frame"))
  }

  /** Sample every `stride`-th frame (stub: one frame per `frameBytes` bytes),
    * emitting a feature vector per frame — the explode-shaped path a video
    * pipeline needs. */
  def sampleFrames(
      media: DataFrame,
      stride: Int,
      frameBytes: Int = 100,
      decoder: Decoder = FakeDecoder): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    media.select(col("media_id").cast("long"), col("media"))
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = bytes.length / frameBytes
        (0 until nFrames by stride).map(i => FrameSample(id, i, decoder.frameFeature(bytes, i)))
      }
  }
}
