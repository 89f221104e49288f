package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** MPEG-1 Layer III frame WALK — the audio counterpart of [[TarIndex]]/
  * [[Mp4Samples]]: x46's header probe reads ONE frame header; this walks
  * the whole stream frame by frame, which is what duration/bitrate
  * statistics, CBR/VBR classification, and byte-accounting need WITHOUT a
  * PCM decode. Everything here is public MPEG-1 header arithmetic
  * (ISO/IEC 11172-3 §2.4.1.3): frame length = 144 · bitrate / sampleRate
  * (+ padding), the bitrate/sample-rate index tables, the syncsafe ID3v2
  * prefix skip, and the de-facto Xing/Info VBR header that sits after the
  * side info (32 bytes stereo / 17 mono, no-CRC) of the first frame.
  *
  * Walk contract: a valid first frame is required (else None → caller
  * fake-routes); after that, each frame advances by its computed length;
  * a malformed header or truncated frame mid-stream STOPS the walk,
  * keeping the frames parsed so far and flagging `clean_tail = false` —
  * one corrupt byte costs the tail, never the task. Trailing bytes after
  * the last frame also flag the tail (scraped MP3s carry ID3v1/garbage;
  * the flag is the honest signal). Free-format (bitrate index 0),
  * reserved indices, and non-MPEG1/non-Layer-III syncs are out of scope.
  *
  * Scale shape: narrow per-row map; one row in, one row out, no shuffle.
  */
object Mp3Frames {

  final case class Walk(
      media_id: Long,
      n_frames: Long,
      sample_rate: Long,
      channels: Long,
      is_cbr: Boolean,
      bitrate_kbps_min: Long,
      bitrate_kbps_max: Long,
      total_frame_bytes: Long,
      duration_ms: Long,
      xing_frames: Option[Long],
      clean_tail: Boolean)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private val BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRate = Array(44100, 48000, 32000)

  /** One header at `i` → (bitrateKbps, sampleRate, channels, frameBytes),
    * or None if not a valid MPEG-1 Layer III no-CRC header. */
  private def header(b: Array[Byte], i: Int): Option[(Int, Int, Int, Int)] = {
    if (i + 4 > b.length) return None
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xfe) != 0xfa) return None
    val br = u8(b, i + 2) >> 4
    val sr = (u8(b, i + 2) >> 2) & 3
    val pad = (u8(b, i + 2) >> 1) & 1
    val mode = u8(b, i + 3) >> 6
    if (br == 0 || br == 15 || sr == 3) return None
    val bitrate = BitrateKbps(br)
    val rate = SampleRate(sr)
    Some((bitrate, rate, if (mode == 3) 1 else 2,
      144 * bitrate * 1000 / rate + pad))
  }

  def parse(id: Long, bytes: Array[Byte]): Option[Walk] = {
    var i = 0
    // syncsafe ID3v2 prefix (each size byte must have bit 7 clear)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if ((u8(bytes, 6) | u8(bytes, 7) | u8(bytes, 8) | u8(bytes, 9)) >= 0x80) return None
      i = 10 + ((u8(bytes, 6) << 21) | (u8(bytes, 7) << 14) |
        (u8(bytes, 8) << 7) | u8(bytes, 9))
      if (i < 0 || i > bytes.length) return None
    }
    val first = header(bytes, i).getOrElse(return None)
    val (_, rate, channels, _) = first
    // Xing/Info after the first frame's side info (no-CRC: 32 B stereo, 17 mono)
    val xingOff = i + 4 + (if (channels == 1) 17 else 32)
    val xingFrames: Option[Long] =
      if (xingOff + 8 <= bytes.length &&
        (new String(bytes, xingOff, 4, "US-ASCII") == "Xing" ||
          new String(bytes, xingOff, 4, "US-ASCII") == "Info") &&
        (u32be(bytes, xingOff + 4) & 1L) == 1L && xingOff + 12 <= bytes.length)
        Some(u32be(bytes, xingOff + 8))
      else None
    var nFrames = 0L
    var totalBytes = 0L
    var brMin = Int.MaxValue
    var brMax = 0
    var cleanTail = true
    var done = false
    while (!done) {
      header(bytes, i) match {
        case Some((br, r, _, fb)) if r == rate && i + fb <= bytes.length =>
          nFrames += 1; totalBytes += fb
          brMin = math.min(brMin, br); brMax = math.max(brMax, br)
          i += fb
          if (i == bytes.length) done = true
        case _ =>
          // malformed header, rate switch, or truncated frame: stop, flag
          cleanTail = false; done = true
      }
    }
    Some(Walk(id, nFrames, rate.toLong, channels.toLong,
      is_cbr = brMin == brMax, brMin.toLong, brMax.toLong, totalBytes,
      nFrames * 1152L * 1000L / rate, xingFrames, cleanTail))
  }

  /** DataFrame plumbing: (media_id, media BINARY) → one walk row per blob
    * with a valid first frame; blobs with no parseable frame yield none. */
  def walk(media: DataFrame): Dataset[Walk] = {
    implicit val enc = Encoders.product[Walk]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          parse(r.getLong(0), bytes)
        }
      }
  }
}
