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

  // ——— spec-side MSB-first bit packer for side info ———
  private def packBits(fields: Seq[(Int, Int)]): Array[Byte] = {
    val bits = fields.flatMap { case (v, w) => (w - 1 to 0 by -1).map(t => (v >> t) & 1) }
    bits.grouped(8).map(g =>
      g.padTo(8, 0).zipWithIndex.map { case (b, t) => b << (7 - t) }.sum.toByte).toArray
  }

  private def granuleChunk(p23: Int, big: Int, gain: Int, wsf: Int, bt: Int): Seq[(Int, Int)] =
    Seq((p23, 12), (big, 9), (gain, 8), (7, 4), (wsf, 1)) ++
      (if (wsf == 1) Seq((bt, 2), (0, 20)) else Seq((0, 22))) ++ Seq((5, 3))

  test("side info parses bit-exactly: stereo and mono layouts, block types, reservoir") {
    // stereo frame: mdb=200 (flagged: reservoir empty), distinct fields per gr/ch
    val side = packBits(Seq((200, 9), (0, 3), (0xA, 8)) ++
      granuleChunk(1000, 100, 90, 0, 0) ++ granuleChunk(2000, 200, 130, 1, 2) ++
      granuleChunk(3000, 150, 201, 0, 0) ++ granuleChunk(4095, 288, 255, 1, 3))
    assert(side.length == 32)
    val f0 = frame(9, 0, 0, body = side)
    // second frame mdb=100: reservoir now fb0-36 bytes (>100) → ok
    val side2 = packBits(Seq((100, 9), (0, 3), (0, 8)) ++
      Seq.fill(4)(granuleChunk(1, 2, 3, 0, 0)).flatten)
    val f1 = frame(9, 0, 0, body = side2)
    val gs = Mp3Frames.granules(7L, f0 ++ f1)
    assert(gs.size == 8)
    assert(gs.take(4).map(g => (g.part2_3_length, g.big_values, g.global_gain,
      g.block_type, g.reservoir_ok)) == Seq(
      (1000L, 100L, 90L, 0L, false), (2000L, 200L, 130L, 2L, false),
      (3000L, 150L, 201L, 0L, false), (4095L, 288L, 255L, 3L, false)))
    assert(gs.drop(4).forall(g => g.frame_idx == 1L && g.main_data_begin == 100L &&
      g.reservoir_ok))
    assert(gs.map(g => (g.granule, g.channel)).take(4) ==
      Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    // mono: 17-byte side info, 2 granules × 1 channel
    val sideM = packBits(Seq((0, 9), (0, 5), (0xF, 4)) ++
      granuleChunk(123, 45, 67, 0, 0) ++ granuleChunk(89, 10, 11, 1, 1))
    assert(sideM.length == 17)
    val gm = Mp3Frames.granules(1L, frame(9, 0, 0, mode = 3, body = sideM))
    assert(gm.map(g => (g.granule, g.channel, g.part2_3_length, g.global_gain,
      g.block_type)) == Seq((0L, 0L, 123L, 67L, 0L), (1L, 0L, 89L, 11L, 1L)))
    // truncated second frame: first frame's granules kept
    assert(Mp3Frames.granules(0L, (f0 ++ f1).dropRight(10)).size == 4)
    assert(Mp3Frames.granules(0L, Array.emptyByteArray).isEmpty)
  }

  test("no valid first frame → None; walk() survives null blobs") {
    import spark.implicits._
    assert(Mp3Frames.parse(0L, Array.emptyByteArray).isEmpty)
    assert(Mp3Frames.parse(0L, "MThd not an mp3".getBytes("US-ASCII")).isEmpty)
    assert(Mp3Frames.parse(0L, Array[Byte](0xff.toByte, 0xe0.toByte, 0, 0)).isEmpty)
    // a valid first HEADER whose frame body is truncated walks zero frames:
    // that is a fake-route (None), never a sentinel row with brMin=MaxValue
    assert(Mp3Frames.parse(0L, frame(9, 0, 0).take(10)).isEmpty)
    val df = Seq((1L, Option(frame(9, 0, 0))), (2L, Option.empty[Array[Byte]]))
      .toDF("media_id", "media")
    val rows = Mp3Frames.walk(df).collect().toSeq
    assert(rows.map(w => (w.media_id, w.n_frames, w.clean_tail)) == Seq((1L, 1L, true)))
  }
}
