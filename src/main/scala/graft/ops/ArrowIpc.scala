package graft.ops

import scala.collection.mutable.ArrayBuffer

/** Hand-decoded Apache Arrow IPC STREAMS — the interchange format the
  * modern lake moves bytes in (Spark↔pandas, Flight, dataset exchange),
  * decoded from the public specification (Arrow columnar format +
  * Message.fbs/Schema.fbs and the flatbuffers wire format) so the decode
  * can be differentially gated against arrow-java's own writer, the
  * x194/x200/x204 discipline one format further.
  *
  * Wire shape (encapsulated message framing): each message is
  * `0xFFFFFFFF` continuation + int32 LE metadata length + a flatbuffers
  * `Message` table (padded to 8) + `bodyLength` body bytes; the stream is
  * one Schema message, then RecordBatch messages, then the end-of-stream
  * marker (continuation + zero length). The flatbuffers walk is
  * implemented directly: root table offset, signed soffset to the vtable,
  * u16 field slots, int32 relative offsets for tables/vectors/strings,
  * inline structs for FieldNode (16 B) and Buffer (16 B) vectors.
  *
  * Scope: flat schemas of Int(64, signed) / FloatingPoint(DOUBLE) /
  * Utf8 columns, uncompressed record batches (RecordBatch.compression
  * present → routed), validity bitmaps LSB-first (a zero-length validity
  * buffer means all-valid — writers omit it when null_count = 0),
  * Utf8 as int32 offsets + data. Dictionary batches, nested fields, and
  * other types degrade to `ok = false` — one bad stream costs its row,
  * never the task (the decoder-family bounds discipline).
  */
object ArrowIpc {

  /** Facts for one column across one stream's record batches. */
  final case class ColFacts(name: String, typ: String, n_values: Long,
      n_nulls: Long, sum_long: Long, sum_double: Double, sum_len: Long,
      min_long: Long, max_long: Long, ok: Boolean)

  /** Decoded stream: per-column facts plus layout facts. */
  final case class StreamDecode(n_batches: Long, cols: Seq[ColFacts], ok: Boolean)

  private val MaxValues = 1L << 26

  // ——— little-endian primitives ———
  private def i16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) |
      ((b(p + 3) & 0xff) << 24)
  private def i64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var k = 7
    while (k >= 0) { v = (v << 8) | (b(p + k) & 0xffL); k -= 1 }
    v
  }

  /** Minimal flatbuffers table reader bound to one byte range. All
    * accessors return None / -1 sentinels on any bounds violation — the
    * never-throw contract lives here. */
  private final class Fb(val b: Array[Byte], val lo: Int, val hi: Int) {
    def in(p: Int, n: Int): Boolean = p >= lo && p + n <= hi
    /** field data position for `id` in table at `t`; -1 if absent. */
    def field(t: Int, id: Int): Int = {
      if (!in(t, 4)) return -1
      val v = t - i32(b, t) // signed soffset
      if (!in(v, 4)) return -1
      val vsize = i16(b, v)
      val slot = 4 + 2 * id
      if (slot + 2 > vsize) return -1
      if (!in(v + slot, 2)) return -1
      val off = i16(b, v + slot)
      if (off == 0) return -1
      val p = t + off
      if (p < lo || p >= hi) -1 else p
    }
    def fI16(t: Int, id: Int, dflt: Int): Int = {
      val p = field(t, id); if (p < 0 || !in(p, 2)) dflt else i16(b, p)
    }
    def fI8(t: Int, id: Int, dflt: Int): Int = {
      val p = field(t, id); if (p < 0 || !in(p, 1)) dflt else b(p) & 0xff
    }
    def fI32(t: Int, id: Int, dflt: Int): Int = {
      val p = field(t, id); if (p < 0 || !in(p, 4)) dflt else i32(b, p)
    }
    def fI64(t: Int, id: Int, dflt: Long): Long = {
      val p = field(t, id); if (p < 0 || !in(p, 8)) dflt else i64(b, p)
    }
    /** offset-typed field (table / vector / string): absolute position. */
    def fOff(t: Int, id: Int): Int = {
      val p = field(t, id)
      if (p < 0 || !in(p, 4)) return -1
      val q = p + i32(b, p)
      if (q < lo || q > hi) -1 else q
    }
    def vecLen(v: Int): Int = if (!in(v, 4)) -1 else i32(b, v)
    /** element position in a vector of `width`-byte inline elements. */
    def vecElem(v: Int, i: Int, width: Int): Int = {
      val p = v + 4 + i * width
      if (in(p, width)) p else -1
    }
    /** element position in a vector of offsets (tables/strings). */
    def vecOff(v: Int, i: Int): Int = {
      val p = v + 4 + i * 4
      if (!in(p, 4)) return -1
      val q = p + i32(b, p)
      if (q < lo || q > hi) -1 else q
    }
    def str(p: Int): String = {
      if (!in(p, 4)) return null
      val n = i32(b, p)
      if (n < 0 || !in(p + 4, n)) return null
      new String(b, p + 4, n, "UTF-8")
    }
  }

  private final case class FieldDef(name: String, typ: String)

  /** Decode one IPC stream; never throws. */
  def decode(bytes: Array[Byte]): StreamDecode = {
    val bad = StreamDecode(0L, Seq.empty, ok = false)
    if (bytes == null) return bad
    try decodeInner(bytes) catch { case _: Throwable => bad }
  }

  private def decodeInner(bytes: Array[Byte]): StreamDecode = {
    val bad = StreamDecode(0L, Seq.empty, ok = false)
    var pos = 0
    var fields: Seq[FieldDef] = null
    var nBatches = 0L
    // accumulators per column
    var n: Array[Long] = null
    var nulls: Array[Long] = null
    var sumL: Array[Long] = null
    var sumD: Array[Double] = null
    var sumLen: Array[Long] = null
    var minL: Array[Long] = null
    var maxL: Array[Long] = null
    while (true) {
      if (pos + 8 > bytes.length) return bad // no EOS seen
      val cont = i32(bytes, pos)
      if (cont != -1) return bad // 0xFFFFFFFF continuation required
      val metaLen = i32(bytes, pos + 4)
      if (metaLen == 0) { // end of stream
        if (fields == null) return bad
        val cols = fields.indices.map { i =>
          ColFacts(fields(i).name, fields(i).typ, n(i), nulls(i), sumL(i),
            sumD(i), sumLen(i), minL(i), maxL(i), ok = true)
        }
        return StreamDecode(nBatches, cols, ok = true)
      }
      if (metaLen < 0 || pos + 8 + metaLen > bytes.length) return bad
      val metaLo = pos + 8
      val metaHi = metaLo + metaLen
      val fb = new Fb(bytes, metaLo, metaHi)
      if (!fb.in(metaLo, 4)) return bad
      val msg = metaLo + i32(bytes, metaLo) // root table
      // Message: version(0) headerType(1) header(2) bodyLength(3)
      val headerType = fb.fI8(msg, 1, 0)
      val header = fb.fOff(msg, 2)
      val bodyLen = fb.fI64(msg, 3, 0L)
      // each operand bounded BEFORE adding: a forged bodyLength near
      // Long.MaxValue would wrap `metaHi + bodyLen` negative and pass —
      // same overflow discipline as deltaBinaryPacked
      if (bodyLen < 0 || bodyLen > bytes.length - metaHi) return bad
      val bodyLo = metaHi
      headerType match {
        case 1 => // Schema: endianness(0) fields(1)
          if (fields != null || header < 0) return bad
          val fv = fb.fOff(header, 1)
          if (fv < 0) return bad
          val nf = fb.vecLen(fv)
          if (nf < 0 || nf > 1000) return bad
          val defs = ArrayBuffer.empty[FieldDef]
          var i = 0
          while (i < nf) {
            val ft = fb.vecOff(fv, i)
            if (ft < 0) return bad
            // Field: name(0) nullable(1) typeType(2) type(3) dict(4)
            //        children(5)
            val name = {
              val p = fb.fOff(ft, 0)
              if (p < 0) return bad
              val s = fb.str(p)
              if (s == null) return bad else s
            }
            if (fb.field(ft, 4) >= 0) return bad // dictionary: out of scope
            val ch = fb.fOff(ft, 5)
            if (ch >= 0 && fb.vecLen(ch) > 0) return bad // nested
            val tt = fb.fI8(ft, 2, 0) // Type union tag
            val tp = fb.fOff(ft, 3)
            val typ = tt match {
              case 2 => // Int: bitWidth(0) is_signed(1)
                if (tp < 0 || fb.fI32(tp, 0, 0) != 64 ||
                  fb.fI8(tp, 1, 0) != 1) return bad
                "int64"
              case 3 => // FloatingPoint: precision(0) — 2 = DOUBLE
                if (tp < 0 || fb.fI16(tp, 0, 0) != 2) return bad
                "float64"
              case 5 => "utf8"
              case _ => return bad
            }
            defs += FieldDef(name, typ)
            i += 1
          }
          fields = defs.toSeq
          val m = fields.size
          n = new Array[Long](m); nulls = new Array[Long](m)
          sumL = new Array[Long](m); sumD = new Array[Double](m)
          sumLen = new Array[Long](m)
          minL = Array.fill(m)(Long.MaxValue)
          maxL = Array.fill(m)(Long.MinValue)
        case 3 => // RecordBatch: length(0) nodes(1) buffers(2) compression(3)
          if (fields == null || header < 0) return bad
          if (fb.field(header, 3) >= 0) return bad // compression: routed
          val length = fb.fI64(header, 0, -1L)
          if (length < 0 || length > MaxValues) return bad
          val nodes = fb.fOff(header, 1)
          val bufs = fb.fOff(header, 2)
          if (nodes < 0 || bufs < 0) return bad
          if (fb.vecLen(nodes) != fields.size) return bad
          val nBufs = fb.vecLen(bufs)
          def buffer(i: Int): (Long, Long) = {
            val p = fb.vecElem(bufs, i, 16)
            if (p < 0) (-1L, -1L) else (i64(bytes, p), i64(bytes, p + 8))
          }
          var bi = 0
          var fi = 0
          while (fi < fields.size) {
            val np = fb.vecElem(nodes, fi, 16)
            if (np < 0) return bad
            val fLen = i64(bytes, np)
            val fNulls = i64(bytes, np + 8)
            if (fLen < 0 || fLen > length || fNulls < 0 || fNulls > fLen)
              return bad
            val need = if (fields(fi).typ == "utf8") 3 else 2
            if (bi + need > nBufs) return bad
            val (vOff, vLen) = buffer(bi)
            def validAt(r: Long): Boolean = {
              if (vLen == 0L) true
              else {
                val byteAt = bodyLo + vOff + (r >> 3)
                if (vOff < 0 || byteAt >= bodyLo + bodyLen ||
                  byteAt >= bytes.length) false
                else ((bytes(byteAt.toInt) >> (r & 7L).toInt) & 1) == 1
              }
            }
            // vOff is an attacker-controlled i64: bound it against bodyLen
            // before any addition (wrapped sums pass `a + b > lim` checks)
            if (vLen != 0L && (vOff < 0 || vOff > bodyLen ||
              (fLen + 7) / 8 > bodyLen - vOff))
              return bad
            var localNulls = 0L
            fields(fi).typ match {
              case "utf8" =>
                val (oOff, oLen) = buffer(bi + 1)
                val (dOff, dLen) = buffer(bi + 2)
                // offsets/lengths are raw i64s from the buffer vector:
                // bound each independently before adding, or two huge
                // values wrap negative and pass the combined check
                if (oOff < 0 || oLen < 0 || oOff > bodyLen ||
                  oLen > bodyLen - oOff || oLen < 4L * (fLen + 1) ||
                  dOff < 0 || dLen < 0 || dOff > bodyLen ||
                  dLen > bodyLen - dOff)
                  return bad
                var r = 0L
                while (r < fLen) {
                  if (validAt(r)) {
                    val s = i32(bytes, (bodyLo + oOff + 4 * r).toInt)
                    val e = i32(bytes, (bodyLo + oOff + 4 * r + 4).toInt)
                    if (s < 0 || e < s || e > dLen) return bad
                    sumLen(fi) += (e - s).toLong
                    n(fi) += 1
                  } else localNulls += 1
                  r += 1
                }
              case t =>
                val (dOff, dLen) = buffer(bi + 1)
                if (dOff < 0 || dLen < 0 || dOff > bodyLen ||
                  dLen > bodyLen - dOff || dLen < 8L * fLen)
                  return bad
                var r = 0L
                while (r < fLen) {
                  if (validAt(r)) {
                    val p = (bodyLo + dOff + 8 * r).toInt
                    if (t == "int64") {
                      val v = i64(bytes, p)
                      sumL(fi) += v
                      if (v < minL(fi)) minL(fi) = v
                      if (v > maxL(fi)) maxL(fi) = v
                    } else sumD(fi) += java.lang.Double.longBitsToDouble(i64(bytes, p))
                    n(fi) += 1
                  } else localNulls += 1
                  r += 1
                }
            }
            // the node's own null count must agree with the decoded bitmap
            if (localNulls != fNulls) return bad
            nulls(fi) += localNulls
            bi += need
            fi += 1
          }
          nBatches += 1L
        case _ => return bad // dictionary batches etc. out of scope
      }
      val padBody = (bodyLen + 7) / 8 * 8
      pos = metaHi + padBody.toInt
    }
    bad
  }
}
