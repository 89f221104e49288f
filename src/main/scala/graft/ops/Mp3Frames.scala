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
    // A valid first HEADER whose frame body is truncated walks zero frames;
    // that is a fake-route (None), not a sentinel row with brMin=MaxValue.
    if (nFrames == 0) return None
    Some(Walk(id, nFrames, rate.toLong, channels.toLong,
      is_cbr = brMin == brMax, brMin.toLong, brMax.toLong, totalBytes,
      nFrames * 1152L * 1000L / rate, xingFrames, cleanTail))
  }

  // ——— Layer III side info (ISO/IEC 11172-3 §2.4.1.7) ———————————————————
  //
  // The granule structure is the entry gate of any Layer III decoder: the
  // bit reservoir back-pointer, per-granule Huffman bit budgets, and
  // global_gain (a direct loudness signal audio curation can use without
  // any PCM decode). MSB-first bit layout; no-CRC MPEG-1 side info is
  // 32 bytes stereo / 17 mono: main_data_begin(9), private(3|5),
  // scfsi(4·nch), then per granule×channel 59 bits — part2_3_length(12),
  // big_values(9), global_gain(8), scalefac_compress(4),
  // window_switching(1), 22 region/table bits, preflag(1),
  // scalefac_scale(1), count1table_select(1).

  final case class GranuleInfo(
      media_id: Long,
      frame_idx: Long,
      granule: Long,
      channel: Long,
      main_data_begin: Long,
      reservoir_ok: Boolean,
      part2_3_length: Long,
      big_values: Long,
      global_gain: Long,
      block_type: Long)

  private final class BitReader(b: Array[Byte], base: Int) {
    private var pos = 0
    def read(n: Int): Int = {
      var v = 0
      var k = 0
      while (k < n) {
        val j = pos + k
        v = (v << 1) | ((b(base + (j >> 3)) >> (7 - (j & 7))) & 1)
        k += 1
      }
      pos += n
      v
    }
    def skip(n: Int): Unit = pos += n
  }

  /** Parse the side info of every frame in the stream (same walk contract
    * as [[parse]]); `reservoir_ok` checks the main_data_begin back-pointer
    * against the bytes actually accumulated in the reservoir (capped at
    * the format's 511-byte/9-bit window). */
  def granules(id: Long, bytes: Array[Byte]): Seq[GranuleInfo] = {
    var i = 0
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      if ((u8(bytes, 6) | u8(bytes, 7) | u8(bytes, 8) | u8(bytes, 9)) >= 0x80)
        return Seq.empty
      i = 10 + ((u8(bytes, 6) << 21) | (u8(bytes, 7) << 14) |
        (u8(bytes, 8) << 7) | u8(bytes, 9))
      if (i < 0 || i > bytes.length) return Seq.empty
    }
    val out = Seq.newBuilder[GranuleInfo]
    var frameIdx = 0L
    var reservoir = 0L // main-data bytes accumulated before this frame
    var done = false
    while (!done) {
      header(bytes, i) match {
        case Some((_, _, channels, fb)) if i + fb <= bytes.length =>
          val side = if (channels == 1) 17 else 32
          if (4 + side > fb) { done = true }
          else {
            val br = new BitReader(bytes, i + 4)
            val mdb = br.read(9).toLong
            val ok = mdb <= math.min(reservoir, 511L)
            br.skip(if (channels == 1) 5 else 3) // private bits
            br.skip(4 * channels) // scfsi
            var g = 0
            while (g < 2) {
              var c = 0
              while (c < channels) {
                val p23 = br.read(12).toLong
                val big = br.read(9).toLong
                val gain = br.read(8).toLong
                br.skip(4) // scalefac_compress
                val wsf = br.read(1)
                val bt = if (wsf == 1) { val b = br.read(2); br.skip(20); b }
                  else { br.skip(22); 0 }
                br.skip(3) // preflag, scalefac_scale, count1table_select
                out += GranuleInfo(id, frameIdx, g.toLong, c.toLong,
                  mdb, ok, p23, big, gain, bt.toLong)
                c += 1
              }
              g += 1
            }
            reservoir += fb - 4 - side
            frameIdx += 1
            i += fb
            if (i == bytes.length) done = true
          }
        case _ => done = true // malformed/truncated: keep frames parsed so far
      }
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → exploded granule rows. */
  def sideInfo(media: DataFrame): Dataset[GranuleInfo] = {
    implicit val enc = Encoders.product[GranuleInfo]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          granules(r.getLong(0), bytes)
        }
      }
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
