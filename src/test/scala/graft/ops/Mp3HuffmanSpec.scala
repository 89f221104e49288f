package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class Mp3HuffmanSpec extends AnyFunSuite {

  /** Bit source over a '0'/'1' string, tracking consumption. */
  private final class Bits(s: String) {
    var pos = 0
    def next(): Int = { val b = s.charAt(pos) - '0'; pos += 1; b }
    def read(n: Int): Int = { var v = 0; (1 to n).foreach(_ => v = (v << 1) | next()); v }
  }

  test("every transcribed table round-trips every (x,y) through its own codes") {
    for ((id, cb) <- Mp3Huffman.tables; x <- 0 until cb.xlen; y <- 0 until cb.ylen) {
      val bits = new Bits(cb.code(x, y) + "1010") // trailing noise must not be read
      val got = cb.decodePair(bits.next _)
      assert(got == ((x, y)), s"table $id ($x,$y)")
      assert(bits.pos == cb.code(x, y).length, s"table $id ($x,$y) consumed wrong bit count")
    }
  }

  test("table 0 consumes zero bits") {
    val bits = new Bits("111")
    assert(Mp3Huffman.tables(0).decodePair(bits.next _) == ((0, 0)))
    assert(bits.pos == 0)
  }

  test("decodeValuePair: signs only on nonzeros, spec order") {
    val t2 = Mp3Huffman.tables(2)
    // (2,1): code '00010', sign(x)=1 neg, sign(y)=0 pos
    val b = new Bits(t2.code(2, 1) + "1" + "0")
    assert(Mp3Huffman.decodeValuePair(t2, b.next _, b.read) == ((-2L, 1L)))
    assert(b.pos == t2.code(2, 1).length + 2)
    // (0,2): no x sign bit
    val b2 = new Bits(t2.code(0, 2) + "0")
    assert(Mp3Huffman.decodeValuePair(t2, b2.next _, b2.read) == ((0L, 2L)))
  }

  test("linbits escape machinery (synthetic 16-wide escape book)") {
    // a minimal complete 16x1 code: value v has code '1'*v terminated by
    // '0' except the deepest (15) which is '1'*15 — unary, Kraft = 1
    val hlen = Array.tabulate(16, 1)((x, _) => if (x == 15) 15 else x + 1)
    val hcod = Array.tabulate(16, 1)((x, _) => if (x == 15) (1 << 15) - 1 else ((1 << x) - 1) << 1)
    val esc = new Mp3Huffman.Codebook(99, 16, 1, 4, hlen, hcod)
    // x = 15 -> +linbits(4) extension 13 -> 28, sign 1 -> -28; y = 0
    val b = new Bits(esc.code(15, 0) + "1101" + "1")
    assert(Mp3Huffman.decodeValuePair(esc, b.next _, b.read) == ((-28L, 0L)))
    // below the escape: no extension read
    val b2 = new Bits(esc.code(14, 0) + "0")
    assert(Mp3Huffman.decodeValuePair(esc, b2.next _, b2.read) == ((14L, 0L)))
  }

  test("malformed transcriptions refuse to load") {
    // incomplete (Kraft < 1)
    intercept[IllegalArgumentException] {
      new Mp3Huffman.Codebook(98, 2, 1, 0,
        Array(Array(2), Array(2)), Array(Array(0), Array(1)))
    }
    // prefix collision
    intercept[IllegalArgumentException] {
      new Mp3Huffman.Codebook(97, 2, 2, 0,
        Array(Array(1, 2), Array(2, 2)), Array(Array(1, 1), Array(2, 3)))
    }
  }
}
