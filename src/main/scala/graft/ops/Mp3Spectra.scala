package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** MPEG-1 Layer III SPECTRAL reconstruction — the decode stage below
  * [[Mp3Frames]]'s side-info walk (ISO/IEC 11172-3 §2.4.3.4): Huffman-coded
  * spectral values → requantization → alias reduction → 36-point IMDCT →
  * sin windowing → overlap-add time samples. This closes the audio leg the
  * way x101/x102 closed images: the DECODE MACHINERY is real end to end;
  * the supported bitstream class is scoped to what is verifiable without
  * the spec's tabulated big-values codebooks (Table B.7, 32 data tables):
  *
  *   - big-values-region Huffman ([[Mp3Huffman]]): `big_values` PAIRS of
  *     spectral lines decoded with the granule's selected codebook —
  *     linbits escapes and per-nonzero sign bits included — when all
  *     three regions select ONE transcribed codebook (equal selects make
  *     the Table-B.8 region boundaries irrelevant: the same book decodes
  *     either side of every boundary, so the scalefactor-band tables are
  *     not needed). Differing selects or an untranscribed book degrade
  *     that granule to ok = false with zeroed fields — the documented
  *     fake-route, never a crash.
  *   - count1-region Huffman with count1table_select = 1 — Table B, the
  *     spec's fixed-length quadruple table (code = one's complement of the
  *     4-bit (v,w,x,y) tuple, one sign bit per nonzero value, sign bit 1
  *     = negative) — following the big-values pairs, while budget remains.
  *   - Requantization: xr = sign · |v|^(4/3) · 2^((global_gain − 210)/4)
  *     with all-zero scalefactors (scalefac_compress = 0, preflag = 0,
  *     scalefac_scale = 0) — count1 values are ±1, so |v|^(4/3) = |v| and
  *     the magnitude is the pure global_gain power step.
  *   - Alias reduction: the 8 spec butterflies (Table B.9 coefficients
  *     c = −0.6, −0.535, −0.33, −0.185, −0.095, −0.041, −0.0142, −0.0037;
  *     cs = 1/√(1+c²), ca = c·cs) across every adjacent subband boundary.
  *     cs² + ca² = 1, so spectral energy is invariant — which the energy
  *     contracts below exploit.
  *   - IMDCT (block_type 0): X_t = Σ_k xr_k · cos(π/72 · (2t+1+18)(2k+1)),
  *     t = 0..35 per 18-line subband; sin window w_t = sin(π/36 (t+½));
  *     50 % overlap-add across granules per subband, with a final flush.
  *
  * Gate observables are chosen so the oracle can verify REAL float math
  * with zero cross-engine transcendental risk:
  *   - mag_q20 = xr magnitude · 2²⁰ is an exact BIGINT when global_gain ≡
  *     210 (mod 4) (the gate constructs such streams; other gains would
  *     need √2 factors — still exact IEEE, but the oracle would have to
  *     mirror the sqrt chain);
  *   - energy_pre_ok asserts Σ_t X_t² = 18 · Σ_k xr_k² and energy_win_ok
  *     asserts Σ_t (w_t X_t)² = 9 · Σ_k xr_k², both to 1e-9 relative —
  *     EXACT identities for single-line-per-subband spectra (Σ cos² over
  *     a full period is N/2; the window's cos factor sums to zero over 36
  *     points for every line index), so they hold for any line the gate
  *     picks and any decoder bug in Huffman positions, requantize gains,
  *     butterfly coefficients, IMDCT basis, or windowing breaks them.
  *
  * Scale shape: narrow per-row flatMap (one media blob in, granule rows
  * out), zero shuffle — the [[Mp3Frames]] contract.
  */
object Mp3Spectra {

  final case class GranuleSpectra(
      media_id: Long,
      frame_idx: Long,
      granule: Long,
      ok: Boolean,
      n_quads: Long,
      nonzero_line: Long,
      sign_val: Long,
      gain: Long,
      mag_q20: Long,
      bits_ok: Boolean,
      energy_pre_ok: Boolean,
      energy_win_ok: Boolean,
      total_samples: Long,
      n_pairs: Long,  // big-values pairs decoded (0 for count1-only granules)
      sum_v: Long,    // Σ signed INTEGER spectral values over the big region
      dot_v: Long)    // Σ (line+1)·value — position-weighted, pins line placement

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private val BitrateKbps =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val SampleRate = Array(44100, 48000, 32000)

  /** Spec Table B.9 alias-reduction coefficients. */
  private val AliasC =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val AliasCs = AliasC.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private val AliasCa = AliasC.indices.map(i => AliasC(i) * AliasCs(i)).toArray

  /** IMDCT basis cos(π/72 (2t+1+18)(2k+1)) and the sin window. */
  private val ImdctCos = Array.tabulate(36, 18) { (t, k) =>
    math.cos(math.Pi / 72.0 * (2 * t + 1 + 18) * (2 * k + 1))
  }
  private val SinWin = Array.tabulate(36)(t => math.sin(math.Pi / 36.0 * (t + 0.5)))

  private final class BitReader(b: Array[Byte], base: Int) {
    private val limit = (b.length - base).toLong * 8
    var pos = 0
    /** Whether n more bits exist IN THE ARRAY from the current position —
      * the caller's pre-flight for a granule's whole main-data budget
      * (part2_3_length can promise up to 4095 bits; the final frame of a
      * stream may hold fewer, and reading past the array must fake-route
      * the granule, never throw). */
    def hasBits(n: Int): Boolean = pos.toLong + n <= limit
    def read(n: Int): Int = {
      if (pos.toLong + n > limit) { pos += n; return 0 } // saturate, don't touch b
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

  private final case class Side(
      mdb: Int, p23: Int, big: Int, gain: Int, scomp: Int,
      blockType: Int, c1ts: Int, ts0: Int, ts1: Int, ts2: Int)

  /** Decode one mono no-CRC MPEG-1 Layer III stream into per-granule
    * spectral rows. Structural deviations from the supported class
    * (stereo, CRC, reservoir use, big-values data, window switching,
    * nonzero scalefactor bits) fake-route that granule (ok = false,
    * zeroed fields) and still produce a row — one odd frame never costs
    * the stream. A malformed header stops the walk ([[Mp3Frames.parse]]
    * contract). */
  def decode(id: Long, bytes: Array[Byte]): Seq[GranuleSpectra] =
    walkDecode(id, bytes, null)

  /** The reconstructed subband time samples (the overlap-add OUTPUT): one
    * 576-sample block per granule (subband-major, 18 samples each) plus
    * the final 576-sample overlap flush. Library surface + the unit
    * spec's handle on the overlap handoff (a silent granule after a loud
    * one must emit exactly the loud granule's windowed second half). */
  def emittedSamples(id: Long, bytes: Array[Byte]): Array[Double] = {
    val sink = Array.newBuilder[Double]
    walkDecode(id, bytes, sink)
    sink.result()
  }

  private def walkDecode(
      id: Long,
      bytes: Array[Byte],
      sink: scala.collection.mutable.Builder[Double, Array[Double]]): Seq[GranuleSpectra] = {
    val out = Seq.newBuilder[GranuleSpectra]
    // per-subband overlap state for the whole media stream
    val overlap = Array.ofDim[Double](32, 18)
    var totalSamples = 0L
    var pending = Seq.newBuilder[GranuleSpectra]
    var nGranules = 0
    var i = 0
    var frameIdx = 0L
    var done = false
    while (!done) {
      if (i + 4 > bytes.length) done = true
      else if (u8(bytes, i) != 0xff || (u8(bytes, i + 1) & 0xfe) != 0xfa) done = true
      else {
        val br2 = u8(bytes, i + 2) >> 4
        val sr = (u8(bytes, i + 2) >> 2) & 3
        val pad = (u8(bytes, i + 2) >> 1) & 1
        val mono = (u8(bytes, i + 3) >> 6) == 3
        if (br2 == 0 || br2 == 15 || sr == 3) done = true
        else {
          val fb = 144 * BitrateKbps(br2) * 1000 / SampleRate(sr) + pad
          if (i + fb > bytes.length || !mono || 4 + 17 > fb) done = true
          else {
            // mono side info: mdb(9) priv(5) scfsi(4) then 2×59 granule bits
            val r = new BitReader(bytes, i + 4)
            val mdb = r.read(9)
            r.skip(5 + 4)
            val sides = (0 until 2).map { _ =>
              val p23 = r.read(12)
              val big = r.read(9)
              val gain = r.read(8)
              val scomp = r.read(4)
              val wsf = r.read(1)
              var t0 = 0; var t1 = 0; var t2 = 0
              val bt = if (wsf == 1) { val b = r.read(2); r.skip(20); b }
                else {
                  // 3×5 table_select + region_address1(4) + region_address2(3)
                  t0 = r.read(5); t1 = r.read(5); t2 = r.read(5)
                  r.skip(7)
                  0
                }
              r.skip(2) // preflag, scalefac_scale
              val c1ts = r.read(1)
              Side(mdb, p23, big, gain, scomp, if (wsf == 1) bt else 0, c1ts, t0, t1, t2)
            }
            // main data (mdb must be 0 in the supported class: no reservoir)
            val md = new BitReader(bytes, i + 4 + 17)
            var g = 0
            while (g < 2) {
              val s = sides(g)
              // hasBits: a last frame whose earlier granule's p23 pushed the
              // reader to the stream tail must fake-route, not read past the
              // array (read() also saturates as a second layer). big_values
              // granules are IN CLASS when all three regions select one
              // transcribed codebook (equal selects make the Table-B.8
              // scalefactor-band region boundaries irrelevant to decoding —
              // same book either side of every boundary); differing selects
              // or an untranscribed book fake-route.
              val okStruct = s.mdb == 0 && s.blockType == 0 &&
                s.c1ts == 1 && s.scomp == 0 && md.hasBits(s.p23) &&
                (s.big == 0 || (s.ts0 == s.ts1 && s.ts1 == s.ts2 &&
                  Mp3Huffman.tables.contains(s.ts0)))
              if (!okStruct) {
                // fake route: structural deviation — consume the granule's
                // bit budget blind so granule 1 stays aligned, emit the
                // granule as SILENCE (previous overlap drains, zero stash)
                // so the output stream stays sample-continuous
                md.skip(s.p23)
                var sb0 = 0
                while (sb0 < 32) {
                  var t0 = 0
                  while (t0 < 18) {
                    if (sink != null) sink += overlap(sb0)(t0)
                    overlap(sb0)(t0) = 0.0
                    t0 += 1
                  }
                  sb0 += 1
                }
                totalSamples += 576
                pending += GranuleSpectra(id, frameIdx, g.toLong, ok = false,
                  0L, -1L, 0L, s.gain.toLong, 0L, bits_ok = false,
                  energy_pre_ok = false, energy_win_ok = false, 0L, 0L, 0L, 0L)
              } else {
                val start = md.pos
                // scalefac_compress = 0 → slen1 = slen2 = 0 → 0 scalefactor bits
                val xr = new Array[Double](576)
                var line = 0
                var nQuads = 0L
                var nzLine = -1L
                var signVal = 0L
                var magQ20 = 0L
                val q = (s.gain - 210) / 4 // gain ≡ 210 (mod 4) in-class
                val mag = java.lang.Math.scalb(1.0, q)
                // big-values region first (ISO §2.4.3.4.6): s.big PAIRS of
                // lines decoded with the selected codebook; value == max in
                // an escape book adds `linbits` raw bits; one sign bit per
                // nonzero (1 = negative); xr = sign · |v|^(4/3) · mag. The
                // integer observables (n_pairs/sum_v/dot_v) pin the Huffman
                // walk exactly; the float |v|^(4/3) leg rides the energy
                // identities like every other spectral line.
                var nPairs = 0L
                var sumV = 0L
                var dotV = 0L
                if (s.big > 0) {
                  val cb = Mp3Huffman.tables(s.ts0)
                  var pi = 0
                  while (pi < s.big && md.pos - start < s.p23 && line + 2 <= 576) {
                    val (vx, vy) =
                      Mp3Huffman.decodeValuePair(cb, () => md.read(1), n => md.read(n))
                    if (vx != 0) {
                      xr(line) = java.lang.Math.signum(vx.toDouble) *
                        math.pow(math.abs(vx.toDouble), 4.0 / 3.0) * mag
                      sumV += vx; dotV += (line + 1) * vx
                    }
                    if (vy != 0) {
                      xr(line + 1) = java.lang.Math.signum(vy.toDouble) *
                        math.pow(math.abs(vy.toDouble), 4.0 / 3.0) * mag
                      sumV += vy; dotV += (line + 2) * vy
                    }
                    line += 2
                    pi += 1
                    nPairs += 1
                  }
                }
                while (md.pos - start < s.p23 && line + 4 <= 576) {
                  // Table B: 4-bit code = ~(v,w,x,y)
                  val code = (~md.read(4)) & 0xf
                  nQuads += 1
                  var p = 0
                  while (p < 4) {
                    if ((code & (8 >> p)) != 0) {
                      val neg = md.read(1) == 1
                      xr(line + p) = if (neg) -mag else mag
                      nzLine = (line + p).toLong
                      signVal = if (neg) -1L else 1L
                      magQ20 = math.round(mag * (1L << 20).toDouble)
                    }
                    p += 1
                  }
                  line += 4
                }
                val bitsOk = md.pos - start == s.p23
                if (md.pos - start < s.p23) md.skip(s.p23 - (md.pos - start))
                val specEnergy = { var e = 0.0; var k = 0
                  while (k < 576) { e += xr(k) * xr(k); k += 1 }; e }
                // alias reduction across the 31 subband boundaries
                var sb = 1
                while (sb < 32) {
                  var bi = 0
                  while (bi < 8) {
                    val lo = 18 * sb - 1 - bi
                    val hi = 18 * sb + bi
                    val a = xr(lo); val b2 = xr(hi)
                    xr(lo) = a * AliasCs(bi) - b2 * AliasCa(bi)
                    xr(hi) = b2 * AliasCs(bi) + a * AliasCa(bi)
                    bi += 1
                  }
                  sb += 1
                }
                // IMDCT + window + overlap-add, per subband
                var ePre = 0.0
                var eWin = 0.0
                sb = 0
                while (sb < 32) {
                  val tx = new Array[Double](36)
                  var t = 0
                  while (t < 36) {
                    var acc = 0.0
                    var k = 0
                    while (k < 18) {
                      val v = xr(18 * sb + k)
                      if (v != 0.0) acc += v * ImdctCos(t)(k)
                      k += 1
                    }
                    tx(t) = acc
                    ePre += acc * acc
                    val w = acc * SinWin(t)
                    eWin += w * w
                    t += 1
                  }
                  // emit first half + previous overlap; stash second half
                  var t2 = 0
                  while (t2 < 18) {
                    val sample = overlap(sb)(t2) + tx(t2) * SinWin(t2)
                    if (sink != null) sink += sample
                    overlap(sb)(t2) = tx(t2 + 18) * SinWin(t2 + 18)
                    t2 += 1
                  }
                  sb += 1
                }
                totalSamples += 576 // 32 subbands × 18 samples emitted
                val eSpec18 = 18.0 * specEnergy
                val eSpec9 = 9.0 * specEnergy
                val preOk = math.abs(ePre - eSpec18) <= 1e-9 * (eSpec18 + 1e-30)
                val winOk = math.abs(eWin - eSpec9) <= 1e-9 * (eSpec9 + 1e-30)
                pending += GranuleSpectra(id, frameIdx, g.toLong, ok = true,
                  nQuads, nzLine, signVal, s.gain.toLong, magQ20, bitsOk,
                  preOk, winOk, 0L, nPairs, sumV, dotV)
              }
              nGranules += 1
              g += 1
            }
            frameIdx += 1
            i += fb
            if (i == bytes.length) done = true
          }
        }
      }
    }
    // final overlap flush (one granule of tail samples)
    if (nGranules > 0) {
      var sb = 0
      while (sb < 32) {
        var t = 0
        while (t < 18) {
          if (sink != null) sink += overlap(sb)(t)
          t += 1
        }
        sb += 1
      }
      totalSamples += 576
    }
    val ts = if (nGranules == 0) 0L else totalSamples
    out ++= pending.result().map(_.copy(total_samples = ts))
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) → granule spectral rows. */
  def spectra(media: DataFrame): Dataset[GranuleSpectra] = {
    implicit val enc = Encoders.product[GranuleSpectra]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          decode(r.getLong(0), bytes)
        }
      }
  }
}
