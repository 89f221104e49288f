package graft.ops

import graft.SparkSpec

class Mp3FramesSpec extends SparkSpec {

  // ——— spec-side frame writer, independent of the walker ———
  private val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val rates = Array(44100, 48000, 32000)

  private def frameBytes(bri: Int, sri: Int, pad: Int): Int =
    144 * kbps(bri) * 1000 / rates(sri) + pad

  private def frame(bri: Int, sri: Int, pad: Int = 0, mode: Int = 0,
      body: Array[Byte] = null): Array[Byte] = {
    val fb = frameBytes(bri, sri, pad)
    val out = new Array[Byte](fb)
    out(0) = 0xff.toByte; out(1) = 0xfb.toByte
    out(2) = ((bri << 4) | (sri << 2) | (pad << 1)).toByte
    out(3) = (mode << 6).toByte
    if (body != null) System.arraycopy(body, 0, out, 4, math.min(body.length, fb - 4))
    out
  }

  private def xingBody(sideInfo: Int, frames: Long): Array[Byte] = {
    val b = new Array[Byte](sideInfo + 12)
    "Xing".getBytes("US-ASCII").copyToArray(b, sideInfo)
    b(sideInfo + 7) = 1 // flags: FRAMES present
    b(sideInfo + 8) = ((frames >> 24) & 0xff).toByte
    b(sideInfo + 9) = ((frames >> 16) & 0xff).toByte
    b(sideInfo + 10) = ((frames >> 8) & 0xff).toByte
    b(sideInfo + 11) = (frames & 0xff).toByte
    b
  }

  test("CBR walk counts frames with per-frame padding; exact duration") {
    val bytes = frame(9, 0, 0) ++ frame(9, 0, 1) ++ frame(9, 0, 0)
    val w = Mp3Frames.parse(3L, bytes).get
    assert(w.n_frames == 3 && w.is_cbr && w.bitrate_kbps_min == 128)
    assert(w.sample_rate == 44100 && w.channels == 2 && w.clean_tail)
    assert(w.total_frame_bytes == bytes.length.toLong)
    assert(w.duration_ms == 3L * 1152 * 1000 / 44100)
    assert(w.xing_frames.isEmpty)
  }

  test("VBR stream with a stereo Xing header reports min/max and the tag count") {
    val f0 = frame(9, 1, 0, body = xingBody(32, 2))
    val bytes = f0 ++ frame(14, 1, 0)
    val w = Mp3Frames.parse(0L, bytes).get
    assert(!w.is_cbr && w.bitrate_kbps_min == 128 && w.bitrate_kbps_max == 320)
    assert(w.xing_frames.contains(2L) && w.clean_tail)
  }

  test("ID3v2 prefix skips via syncsafe size; mono Xing sits after 17 side-info bytes") {
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, 37) ++
      new Array[Byte](37)
    val f0 = frame(5, 2, 0, mode = 3, body = xingBody(17, 9))
    val w = Mp3Frames.parse(0L, tag ++ f0).get
    assert(w.channels == 1 && w.sample_rate == 32000 && w.n_frames == 1)
    assert(w.xing_frames.contains(9L))
  }

  test("a truncated frame or trailing garbage flags the tail, keeping parsed frames") {
    val two = frame(9, 0, 0) ++ frame(9, 0, 0)
    val truncated = two.dropRight(10)
    val wt = Mp3Frames.parse(0L, truncated).get
    assert(wt.n_frames == 1 && !wt.clean_tail)
    val trailing = two ++ "TAGjunk".getBytes("US-ASCII")
    val wg = Mp3Frames.parse(0L, trailing).get
    assert(wg.n_frames == 2 && !wg.clean_tail)
    // a mid-stream sample-rate switch is a malformed stream: stop + flag
    val switched = frame(9, 0, 0) ++ frame(9, 1, 0)
    val ws = Mp3Frames.parse(0L, switched).get
    assert(ws.n_frames == 1 && !ws.clean_tail)
  }

  test("no valid first frame → None; walk() survives null blobs") {
    import spark.implicits._
    assert(Mp3Frames.parse(0L, Array.emptyByteArray).isEmpty)
    assert(Mp3Frames.parse(0L, "MThd not an mp3".getBytes("US-ASCII")).isEmpty)
    assert(Mp3Frames.parse(0L, Array[Byte](0xff.toByte, 0xe0.toByte, 0, 0)).isEmpty)
    val df = Seq((1L, Option(frame(9, 0, 0))), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = Mp3Frames.walk(df).collect().toSeq
    assert(rows.map(w => (w.media_id, w.n_frames, w.clean_tail)) == Seq((1L, 1L, true)))
  }
}
