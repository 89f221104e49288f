package graft.ops

/** MPEG-1 Layer III big-values Huffman codebooks (ISO/IEC 11172-3 Table
  * B.7) and a generic canonical decoder — the machinery [[Mp3Spectra]]
  * uses for the big-values spectral region.
  *
  * The DECODER is table-driven and complete: any codebook (any x/y
  * dimensions, any linbits escape width) decodes through the same trie
  * walk, and the escape/sign conventions live in [[Mp3Spectra]] (value
  * == max ⇒ add `linbits` raw bits; one sign bit per nonzero, 1 =
  * negative). The TABLE DATA ships only for codebooks whose
  * transcription from the public spec passes two structural proofs at
  * class-init (a wrong transcription refuses to load rather than
  * silently mis-decoding):
  *
  *   - Kraft equality: Σ 2^-len over all (x, y) entries must be exactly
  *     1 — the spec's codes are COMPLETE prefix codes;
  *   - prefix-freeness: the trie build rejects any code that passes
  *     through or lands on another code's node.
  *
  * Currently transcribed: table 0 (the spec's "no Huffman data" book —
  * zero bits, always (0, 0)) and tables 1–3 (the 2×2 and 3×3 books).
  * Granules selecting an untranscribed table fake-route in
  * [[Mp3Spectra]] (ok = false, never a crash) — the same honest scoping
  * as the FLAC LPC route before round 9. The validation harness is the
  * on-ramp for the remaining books: a new transcription that loads is
  * structurally sound by construction.
  */
object Mp3Huffman {

  /** One Table-B.7 codebook. `hlen(x)(y)` / `hcod(x)(y)` are the spec's
    * code length and value for the (x, y) pair; `linbits` > 0 marks the
    * escape books where value xlen−1 carries `linbits` extension bits. */
  final class Codebook(
      val id: Int,
      val xlen: Int,
      val ylen: Int,
      val linbits: Int,
      hlen: Array[Array[Int]],
      hcod: Array[Array[Int]]) {

    // trie: index 0 is the root; child(b)(n) < 0 ⇒ unset, leaf(n) >= 0
    // ⇒ terminal carrying (x << 4 | y). Built eagerly so a malformed
    // table fails at object init, not mid-decode.
    private val cap = 2 * hlen.map(_.sum).sum + 2
    private val child = Array.fill(2, cap)(-1)
    private val leaf = Array.fill(cap)(-1)
    private var nodes = 1
    locally {
      var kraft = 0L // in units of 2^-32
      for (x <- 0 until xlen; y <- 0 until ylen) {
        val len = hlen(x)(y)
        val cod = hcod(x)(y)
        if (len > 0 || xlen * ylen > 1) {
          require(len >= 1 && len <= 19, s"table $id: bad length $len at ($x,$y)")
          require(cod >= 0 && cod < (1 << len), s"table $id: code $cod too wide at ($x,$y)")
          kraft += 1L << (32 - len)
          var n = 0
          var k = len - 1
          while (k >= 0) {
            require(leaf(n) < 0, s"table $id: ($x,$y) passes through a shorter code")
            val b = (cod >> k) & 1
            if (child(b)(n) < 0) { child(b)(n) = nodes; nodes += 1 }
            n = child(b)(n)
            k -= 1
          }
          require(leaf(n) < 0 && child(0)(n) < 0 && child(1)(n) < 0,
            s"table $id: ($x,$y) collides with another code")
          leaf(n) = (x << 4) | y
        }
      }
      if (xlen * ylen > 1)
        require(kraft == (1L << 32), s"table $id: incomplete code (Kraft != 1)")
    }

    /** Decode one (x, y) pair; `next` supplies bits most-significant
      * first. Table 0 consumes zero bits and returns (0, 0). The walk
      * always terminates: the code is complete (Kraft = 1), so every
      * path reaches a leaf. */
    def decodePair(next: () => Int): (Int, Int) = {
      if (xlen * ylen == 1) return (0, 0)
      var n = 0
      while (leaf(n) < 0) n = child(next() & 1)(n)
      (leaf(n) >> 4, leaf(n) & 15)
    }

    /** The code for (x, y) as a '0'/'1' string — what a paired
      * constructor (the x153 gate's SQL bitstream writer) embeds. */
    def code(x: Int, y: Int): String = {
      val len = hlen(x)(y)
      (len - 1 to 0 by -1).map(k => ('0' + ((hcod(x)(y) >> k) & 1)).toChar).mkString
    }
  }

  /** Decode one complete big-values pair: the trie walk, then the
    * linbits escape (value == max in an escape book carries `linbits`
    * raw extension bits) and one sign bit per NONZERO value (1 =
    * negative), in spec order — x fully resolved before y. `next`
    * supplies single bits; `readBits(n)` supplies an n-bit big-endian
    * field (the escape extension). Returns the signed integer values. */
  def decodeValuePair(cb: Codebook, next: () => Int, readBits: Int => Int): (Long, Long) = {
    val (x, y) = cb.decodePair(next)
    var vx = x.toLong
    // the escape is VALUE 15 specifically (ISO §2.4.3.4.6 "if x == 15 and
    // linbits > 0"), not the book's max index — all escape books are 16-wide
    if (cb.linbits > 0 && x == 15) vx += readBits(cb.linbits)
    if (vx != 0 && next() == 1) vx = -vx
    var vy = y.toLong
    if (cb.linbits > 0 && y == 15) vy += readBits(cb.linbits)
    if (vy != 0 && next() == 1) vy = -vy
    (vx, vy)
  }

  /** Transcribed codebooks by table id. Table 4 and 14 are unused by the
    * spec; ids absent here fake-route upstream. */
  val tables: Map[Int, Codebook] = Map(
    0 -> new Codebook(0, 1, 1, 0, Array(Array(0)), Array(Array(0))),
    1 -> new Codebook(1, 2, 2, 0,
      Array(Array(1, 3), Array(2, 3)),
      Array(Array(1, 1), Array(1, 0))),
    2 -> new Codebook(2, 3, 3, 0,
      Array(Array(1, 3, 6), Array(3, 3, 5), Array(5, 5, 6)),
      Array(Array(1, 2, 1), Array(3, 1, 1), Array(3, 2, 0))),
    3 -> new Codebook(3, 3, 3, 0,
      Array(Array(2, 2, 6), Array(3, 2, 5), Array(5, 5, 6)),
      Array(Array(3, 2, 1), Array(1, 1, 1), Array(3, 2, 0))))
}
