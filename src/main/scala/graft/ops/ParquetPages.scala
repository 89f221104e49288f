package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hand-decoded parquet DATA PAGES — the layer underneath
  * [[ParquetFooter]]'s metadata walk: given a column chunk's byte range,
  * walk the thrift-compact `PageHeader`s, decompress each page through
  * the repo's OWN codec decoders (snappy via [[SnappyBlock]]), decode
  * the RLE/bit-packed-hybrid definition levels, and materialize PLAIN or
  * dictionary-encoded INT64 values — everything Spark's vectorized
  * reader does for a flat INT64 column, reproduced from the public
  * parquet-format specification (parquet.thrift + Encodings.md) so the
  * decode can be differentially gated against the engine itself.
  *
  * Scope (documented, routed): v1 AND v2 data pages, physical types
  * INT64 and BYTE_ARRAY, max repetition level 0 (flat column),
  * definition-level bit width ≤ 1 (required or optional); encodings
  * PLAIN / PLAIN_DICTIONARY / RLE_DICTIONARY plus the v2 family
  * DELTA_BINARY_PACKED (INT64) and DELTA_BYTE_ARRAY /
  * DELTA_LENGTH_BYTE_ARRAY (strings); codecs UNCOMPRESSED and SNAPPY —
  * everything Spark's v1 AND v2 writers emit for flat long/string
  * columns, dictionary fallback mid-chunk included. Nested paths, other
  * codecs, and any structural violation degrade to a per-chunk
  * `ok = false` row — one bad chunk costs its row, never the task (the
  * FLAC/snappy/LZ4 bounds discipline).
  */
object ParquetPages {

  /** One decoded column chunk: exact value facts (writer-independent)
    * plus layout facts (pages, dictionary use) for boolean contracts. */
  final case class Int64ChunkDecode(
      file: String, grp: Int, n_pages: Long, n_dict_pages: Long,
      n_v2_pages: Long, num_values: Long, n_nulls: Long, sum_v: Long,
      min_v: Long, max_v: Long, ok: Boolean)

  /** One decoded BYTE_ARRAY column chunk: exact value facts (counts,
    * nulls, total byte length, lexicographic min/max by unsigned byte
    * order — parquet's binary sort order) plus layout facts. */
  final case class ByteChunkDecode(
      file: String, grp: Int, n_pages: Long, n_dict_pages: Long,
      n_v2_pages: Long, num_values: Long, n_nulls: Long, sum_len: Long,
      min_v: String, max_v: String, ok: Boolean)

  /** Chunk locator parsed from the footer for one column. `maxDef`/
    * `maxRep` are the column path's level bounds from the schema walk
    * (maxDef = -1 means "derive from `required`" — the flat-column
    * constructor shape the fuzz probes use); `typeLen` is the
    * FIXED_LEN_BYTE_ARRAY width (0 otherwise). */
  private[ops] final case class ChunkLoc(grp: Int, codec: Int, physType: Int,
      numValues: Long, firstPageOffset: Long, totalCompressedSize: Long,
      required: Boolean, maxDef: Int = -1, maxRep: Int = 0, typeLen: Int = 0)

  import ParquetFooter.Compact

  /** Hard per-page value cap (64 Mi): real writers emit ~20 k values per
    * ~1 MiB page; anything above this is a forged header, routed to
    * `ok = false` before any allocation sized from it. */
  private val MaxPageValues: Long = 1L << 26

  /** Footer walk: (schema repetition of `column`, chunk locators). The
    * first page offset is min(dictionary_page_offset, data_page_offset)
    * when a dictionary page exists — the dictionary precedes the data
    * pages in the chunk's contiguous byte range. */
  private[ops] def parseChunkLocs(bytes: Array[Byte], column: String): Seq[ChunkLoc] = {
    val c = new Compact(bytes)
    var required = false
    val out = ArrayBuffer.empty[ChunkLoc]
    def readBinary(): Array[Byte] = {
      val n = c.varint()
      if (n < 0 || c.pos + n > bytes.length) { c.bad = true; Array.emptyByteArray }
      else {
        val a = java.util.Arrays.copyOfRange(bytes, c.pos, c.pos + n.toInt)
        c.pos += n.toInt; a
      }
    }
    c.struct { (id, t) =>
      (id, t) match {
        case (2, 9) => // schema: list<SchemaElement> — find the column's
          // repetition_type (0 = REQUIRED: no definition levels on page)
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            var i = 0
            while (i < n && !c.bad) {
              var rep = -1L
              var name = ""
              c.struct { (sid, st) =>
                (sid, st) match {
                  case (3, 5) => rep = c.zigzag(); true
                  case (4, 8) => name = new String(readBinary(), "UTF-8"); true
                  case _ => false
                }
              }
              if (i > 0 && name == column && rep == 0L) required = true
              i += 1
            }
            true
          }
        case (4, 9) => // row_groups
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            var gi = 0
            while (gi < n && !c.bad) {
              c.struct { (gid, gt) =>
                (gid, gt) match {
                  case (1, 9) =>
                    val (cn, cet) = c.listHeader()
                    if (cet != 12) { c.bad = true }
                    else {
                      var j = 0
                      while (j < cn && !c.bad) {
                        var isTarget = false
                        var codec = -1L
                        var physType = -1L
                        var numValues = -1L
                        var dataOff = -1L
                        var dictOff = -1L
                        var totSize = -1L
                        c.struct { (cid, ct) =>
                          (cid, ct) match {
                            case (3, 12) => // ColumnMetaData
                              c.struct { (mid, mt) =>
                                (mid, mt) match {
                                  case (1, 5) => physType = c.zigzag(); true
                                  case (3, 9) =>
                                    val (pn, pet) = c.listHeader()
                                    if (pet != 8) { c.bad = true; true }
                                    else {
                                      val parts = (0 until pn)
                                        .map(_ => new String(readBinary(), "UTF-8"))
                                      isTarget =
                                        parts.lastOption.contains(column) &&
                                          parts.size == 1
                                      true
                                    }
                                  case (4, 5) => codec = c.zigzag(); true
                                  case (5, 6) => numValues = c.zigzag(); true
                                  case (7, 6) => totSize = c.zigzag(); true
                                  case (9, 6) => dataOff = c.zigzag(); true
                                  case (11, 6) => dictOff = c.zigzag(); true
                                  case _ => false
                                }
                              }
                              true
                            case _ => false
                          }
                        }
                        if (isTarget && numValues >= 0 && dataOff >= 0 &&
                            totSize >= 0)
                          out += ChunkLoc(gi, codec.toInt, physType.toInt,
                            numValues,
                            if (dictOff >= 0 && dictOff < dataOff) dictOff
                            else dataOff,
                            totSize, required)
                        j += 1
                      }
                    }
                    true
                  case _ => false
                }
              }
              gi += 1
            }
            true
          }
        case _ => false
      }
    }
    if (c.bad) Seq.empty
    else out.toSeq.map(l => l.copy(required = required))
  }

  /** RLE/bit-packed hybrid decode of exactly `n` values at bit width `w`
    * from `b[start, end)`; None on truncation/overrun. Bit-packed groups
    * may legally overshoot `n` — the tail is discarded. */
  private[ops] def rleHybrid(b: Array[Byte], start: Int, end: Int, w: Int,
      n: Int): Option[Array[Int]] = {
    if (w < 0 || w > 31 || n < 0) return None
    val out = new Array[Int](n)
    if (w == 0) return Some(out) // all zeros, nothing on the wire
    var pos = start
    var k = 0
    val byteW = (w + 7) / 8
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 35) {
        if (pos >= end) return -1L
        val x = b(pos) & 0xff
        pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      -1L
    }
    while (k < n) {
      val h = varint()
      if (h < 0) return None
      if ((h & 1L) == 0L) { // RLE run
        val run = (h >>> 1).toInt
        if (run < 0 || pos + byteW > end) return None
        var v = 0
        var i = 0
        while (i < byteW) { v |= (b(pos + i) & 0xff) << (8 * i); i += 1 }
        pos += byteW
        var r = 0
        while (r < run && k < n) { out(k) = v; k += 1; r += 1 }
        if (r < run) return None // run claims more values than remain
      } else { // bit-packed: (h >>> 1) groups of 8 values
        // groups comes straight off a varint — all arithmetic in Long so a
        // crafted header (groups ~2^28, w=9) can't wrap nBytes negative and
        // slip past the bounds check into an out-of-range read.
        val groupsL = h >>> 1
        if (groupsL <= 0L || groupsL > (end - pos).toLong / w) return None
        val nBytes = (groupsL * w).toInt // 8 values * w bits / 8; fits: ≤ end-pos
        var bit = 0
        val total = (groupsL * 8L).min(Int.MaxValue.toLong).toInt
        var g = 0
        while (g < total && k < n) {
          var v = 0
          var got = 0
          while (got < w) {
            val by = b(pos + (bit >> 3)) & 0xff
            v |= ((by >> (bit & 7)) & 1) << got
            got += 1
            bit += 1
          }
          out(k) = v
          k += 1
          g += 1
        }
        pos += nBytes
      }
    }
    Some(out)
  }

  /** DELTA_BINARY_PACKED (parquet Encodings.md): header = block size /
    * miniblocks-per-block / total count / zigzag first value, then per
    * block a zigzag min-delta, one bit-width byte per miniblock, and
    * LSB-first bit-packed deltas. Returns exactly `n` values plus the
    * bytes consumed (the DELTA_BYTE_ARRAY chain needs the offset), or
    * None on any structural violation — all arithmetic in Long so forged
    * counts/widths can never wrap a bounds check (the rleHybrid lesson). */
  private[ops] def deltaBinaryPacked(b: Array[Byte], start: Int, end: Int,
      n: Int): Option[(Array[Long], Int)] = {
    if (n < 0) return None
    var pos = start
    var bad = false
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (shift <= 63) {
        if (pos >= end) { bad = true; return -1L }
        val x = b(pos) & 0xff
        pos += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      bad = true
      -1L
    }
    def zig(v: Long): Long = (v >>> 1) ^ -(v & 1L)
    val blockSize = varint()
    val miniblocks = varint()
    val totalCount = varint()
    val first = zig(varint())
    // blockSize is capped BEFORE the division: a forged blockSize like 2^31
    // with miniblocks=1 passes the %128/%miniblocks checks, and
    // (blockSize / miniblocks).toInt would wrap to Int.MinValue (whose %8 is
    // also 0), driving nBytes negative past the bounds check below — the
    // same overflow family as the rleHybrid groups check.
    if (bad || blockSize <= 0 || blockSize % 128 != 0 ||
      blockSize > MaxPageValues || miniblocks <= 0 ||
      blockSize % miniblocks != 0 || totalCount < 0 ||
      totalCount > MaxPageValues || totalCount < n) return None
    val perMini = (blockSize / miniblocks).toInt
    if (perMini % 8 != 0 || miniblocks > 512) return None
    val out = new Array[Long](n)
    if (n == 0) return Some((out, pos - start))
    out(0) = first
    var k = 1
    var prev = first
    while (k < n) {
      val minDelta = zig(varint())
      if (bad) return None
      val wPos = pos
      if (wPos + miniblocks > end) return None
      pos += miniblocks.toInt
      var m = 0
      while (m < miniblocks && k < n) {
        val w = b(wPos + m) & 0xff
        if (w > 64) return None
        val nBytes = perMini.toLong * w / 8
        if (pos + nBytes > end) return None
        var bit = 0
        var g = 0
        while (g < perMini && k < n) {
          var v = 0L
          var gotBits = 0
          while (gotBits < w) {
            val by = b(pos + (bit >> 3)) & 0xff
            v |= ((by >> (bit & 7)) & 1).toLong << gotBits
            gotBits += 1
            bit += 1
          }
          prev = prev + minDelta + v
          out(k) = prev
          k += 1
          g += 1
        }
        pos += nBytes.toInt
        m += 1
      }
    }
    Some((out, pos - start))
  }

  /** Unsigned lexicographic byte comparison — parquet's BINARY order. */
  private def byteCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  /** One parsed data page handed to a type-specific value decoder:
    * `page` holds the UNCOMPRESSED value bytes starting at `off`
    * (definition levels already consumed), `nonNull` values encoded with
    * `encoding`. `isV2` marks DATA_PAGE_V2 layout. */
  private final case class DataSlice(page: Array[Byte], off: Int,
      nonNull: Int, numValues: Int, nNulls: Int, encoding: Int,
      isV2: Boolean)

  /** Shared page walk for one column chunk: parses every thrift-compact
    * PageHeader (v1 DataPageHeader, v2 DataPageHeaderV2, dictionary),
    * decompresses (v1: the whole page; v2: the value section only — the
    * level bytes are stored uncompressed), decodes RLE definition levels
    * (v1: 4-byte-length-prefixed; v2: length from the header), and hands
    * each page to `onDict` / `onData`. Returns (pages, dictPages,
    * v2Pages, values, nulls) or None on any structural violation — the
    * never-throw contract lives HERE, once, for both value types. */
  private def walkPages(chunk: Array[Byte], loc: ChunkLoc)(
      onDict: (Array[Byte], Int) => Boolean)(
      onData: DataSlice => Boolean): Option[(Long, Long, Long, Long, Long)] = {
    if (loc.codec != 0 && loc.codec != 1) return None // UNCOMPRESSED/SNAPPY
    var nPages = 0L
    var nDictPages = 0L
    var nV2Pages = 0L
    var got = 0L
    var nNulls = 0L
    var pos = 0
    while (got < loc.numValues) {
      if (pos >= chunk.length) return None
      val c = new Compact(chunk)
      c.pos = pos
      var pType = -1L
      var compSize = -1L
      var uncompSize = -1L
      var dpNumValues = -1L
      var dpEncoding = -1L
      var dpDefEnc = -1L
      var dictNumValues = -1L
      var v2NumValues = -1L
      var v2NumNulls = -1L
      var v2Encoding = -1L
      var v2DefLen = -1L
      var v2RepLen = -1L
      var v2Compressed = true // thrift default for is_compressed
      c.struct { (id, t) =>
        (id, t) match {
          case (1, 5) => pType = c.zigzag(); true
          case (2, 5) => uncompSize = c.zigzag(); true
          case (3, 5) => compSize = c.zigzag(); true
          case (5, 12) => // DataPageHeader
            c.struct { (did, dt) =>
              (did, dt) match {
                case (1, 5) => dpNumValues = c.zigzag(); true
                case (2, 5) => dpEncoding = c.zigzag(); true
                case (3, 5) => dpDefEnc = c.zigzag(); true
                case _ => false
              }
            }
            true
          case (7, 12) => // DictionaryPageHeader
            c.struct { (did, dt) =>
              (did, dt) match {
                case (1, 5) => dictNumValues = c.zigzag(); true
                case _ => false
              }
            }
            true
          case (8, 12) => // DataPageHeaderV2
            c.struct { (did, dt) =>
              (did, dt) match {
                case (1, 5) => v2NumValues = c.zigzag(); true
                case (2, 5) => v2NumNulls = c.zigzag(); true
                case (4, 5) => v2Encoding = c.zigzag(); true
                case (5, 5) => v2DefLen = c.zigzag(); true
                case (6, 5) => v2RepLen = c.zigzag(); true
                // compact protocol encodes bools in the type nibble
                case (7, 1) => v2Compressed = true; true
                case (7, 2) => v2Compressed = false; true
                case _ => false
              }
            }
            true
          case _ => false
        }
      }
      if (c.bad || compSize < 0 || uncompSize < 0 ||
        c.pos + compSize > chunk.length) return None
      val rawStart = c.pos
      pos = c.pos + compSize.toInt
      def inflate(from: Int, until: Int, expect: Long): Array[Byte] = {
        if (from < 0 || until > chunk.length || from > until) return null
        val raw = java.util.Arrays.copyOfRange(chunk, from, until)
        val out = if (loc.codec == 0) raw
          else SnappyBlock.decompress(raw).orNull
        if (out == null || (expect >= 0 && out.length.toLong != expect)) null
        else out
      }
      pType match {
        case 2L => // DICTIONARY_PAGE (PLAIN-encoded entries)
          val page = inflate(rawStart, rawStart + compSize.toInt, uncompSize)
          if (page == null || dictNumValues < 0 ||
            dictNumValues > MaxPageValues) return None
          if (!onDict(page, dictNumValues.toInt)) return None
          nDictPages += 1L
          nPages += 1L
        case 0L => // DATA_PAGE v1
          // page-count fields drive allocations — bound against what the
          // chunk says remains AND a sane cap before any Array sizing
          if (dpNumValues < 0 || dpNumValues > loc.numValues - got ||
            dpNumValues > MaxPageValues) return None
          val page = inflate(rawStart, rawStart + compSize.toInt, uncompSize)
          if (page == null) return None
          var off = 0
          var nonNull = 0
          if (loc.required) nonNull = dpNumValues.toInt
          else {
            if (dpDefEnc != 3L) return None // RLE is the only legal v1 enc
            if (off + 4 > page.length) return None
            val len = (page(off) & 0xff) | ((page(off + 1) & 0xff) << 8) |
              ((page(off + 2) & 0xff) << 16) | ((page(off + 3) & 0xff) << 24)
            off += 4
            if (len < 0 || off + len > page.length) return None
            val d = rleHybrid(page, off, off + len, 1, dpNumValues.toInt)
              .getOrElse(return None)
            off += len
            d.foreach(dv => if (dv == 1) nonNull += 1)
          }
          val nulls = dpNumValues.toInt - nonNull
          nNulls += nulls
          if (!onData(DataSlice(page, off, nonNull, dpNumValues.toInt,
            nulls, dpEncoding.toInt, isV2 = false))) return None
          got += dpNumValues
          nPages += 1L
        case 3L => // DATA_PAGE_V2: levels uncompressed, values compressed
          if (v2NumValues < 0 || v2NumValues > loc.numValues - got ||
            v2NumValues > MaxPageValues) return None
          if (v2RepLen != 0L) return None // nested paths out of scope
          if (v2DefLen < 0 || v2DefLen > compSize) return None
          val lvlEnd = rawStart + v2DefLen.toInt
          val defs: Array[Int] =
            if (loc.required) null
            else rleHybrid(chunk, rawStart, lvlEnd, 1, v2NumValues.toInt)
              .getOrElse(return None)
          var nonNull = 0
          if (defs == null) nonNull = v2NumValues.toInt
          else defs.foreach(dv => if (dv == 1) nonNull += 1)
          val nulls = v2NumValues.toInt - nonNull
          // header's own null count must agree with the decoded levels
          if (v2NumNulls >= 0 && v2NumNulls != nulls.toLong) return None
          nNulls += nulls
          val data =
            if (v2Compressed)
              inflate(lvlEnd, rawStart + compSize.toInt,
                uncompSize - v2DefLen)
            else java.util.Arrays.copyOfRange(chunk, lvlEnd,
              rawStart + compSize.toInt)
          if (data == null) return None
          if (!onData(DataSlice(data, 0, nonNull, v2NumValues.toInt,
            nulls, v2Encoding.toInt, isV2 = true))) return None
          got += v2NumValues
          nV2Pages += 1L
          nPages += 1L
        case _ => return None // index pages etc. out of scope
      }
    }
    Some((nPages, nDictPages, nV2Pages, got, nNulls))
  }

  /** Decode all pages of one INT64 column chunk (v1 + v2). */
  private[ops] def decodeChunk(chunk: Array[Byte], loc: ChunkLoc,
      file: String): Int64ChunkDecode = {
    val bad = Int64ChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
      Long.MaxValue, Long.MinValue, ok = false)
    if (loc.physType != 2) return bad // INT64 only
    var dict: Array[Long] = null
    var sum = 0L
    var minV = Long.MaxValue
    var maxV = Long.MinValue
    def plainLongs(b: Array[Byte], off: Int, n: Int): Array[Long] = {
      if (off + n.toLong * 8 > b.length) return null
      val a = new Array[Long](n)
      var i = 0
      while (i < n) {
        var v = 0L
        var k = 7
        while (k >= 0) { v = (v << 8) | (b(off + i * 8 + k) & 0xffL); k -= 1 }
        a(i) = v
        i += 1
      }
      a
    }
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainLongs(page, 0, n)
      dict != null && n.toLong * 8 == page.length.toLong
    } { s =>
      val vals: Array[Long] = s.encoding match {
        case 0 => plainLongs(s.page, s.off, s.nonNull) // PLAIN
        case 5 => // DELTA_BINARY_PACKED (v2)
          deltaBinaryPacked(s.page, s.off, s.page.length, s.nonNull)
            .map(_._1).orNull
        case 2 | 8 => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
          if (dict == null || s.off >= s.page.length) null
          else {
            val w = s.page(s.off) & 0xff
            rleHybrid(s.page, s.off + 1, s.page.length, w, s.nonNull) match {
              case Some(idx) if idx.forall(ix => ix >= 0 && ix < dict.length) =>
                idx.map(dict(_))
              case _ => null
            }
          }
        case _ => null
      }
      if (vals == null) false
      else {
        vals.foreach { v =>
          sum += v
          if (v < minV) minV = v
          if (v > maxV) maxV = v
        }
        true
      }
    }
    walked match {
      case None => bad
      // A value-less (all-null) chunk keeps the Long.MaxValue/MinValue
      // identity sentinels rather than 0, so cross-chunk min(min_v)/
      // max(max_v) aggregation is never pulled toward 0 by a chunk that
      // holds no values (exclude via num_values - n_nulls = 0).
      case Some((nPages, nDict, nV2, got, nNulls)) =>
        Int64ChunkDecode(file, loc.grp, nPages, nDict, nV2, got, nNulls,
          sum, minV, maxV, ok = true)
    }
  }

  /** Decode all pages of one BYTE_ARRAY column chunk (v1 PLAIN +
    * dictionary, v2 DELTA_BYTE_ARRAY / DELTA_LENGTH_BYTE_ARRAY +
    * dictionary). */
  private[ops] def decodeChunkBytes(chunk: Array[Byte], loc: ChunkLoc,
      file: String): ByteChunkDecode = {
    val bad = ByteChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
      null, null, ok = false)
    if (loc.physType != 6) return bad // BYTE_ARRAY only
    var dict: Array[Array[Byte]] = null
    var sumLen = 0L
    var minV: Array[Byte] = null
    var maxV: Array[Byte] = null
    def see(v: Array[Byte]): Unit = {
      sumLen += v.length
      if (minV == null || byteCompare(v, minV) < 0) minV = v
      if (maxV == null || byteCompare(v, maxV) > 0) maxV = v
    }
    // PLAIN byte arrays: 4-byte LE length + payload, n entries
    def plainBytes(b: Array[Byte], off0: Int, n: Int): Array[Array[Byte]] = {
      val out = new Array[Array[Byte]](n)
      var off = off0
      var i = 0
      while (i < n) {
        if (off + 4 > b.length) return null
        val len = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
        off += 4
        if (len < 0 || off.toLong + len > b.length) return null
        out(i) = java.util.Arrays.copyOfRange(b, off, off + len)
        off += len
        i += 1
      }
      out
    }
    // DELTA_LENGTH_BYTE_ARRAY: lengths via DELTA_BINARY_PACKED, then the
    // concatenated payload. Returns (values, bytes consumed).
    def deltaLength(b: Array[Byte], off0: Int, n: Int): (Array[Array[Byte]], Int) = {
      deltaBinaryPacked(b, off0, b.length, n) match {
        case None => (null, 0)
        case Some((lens, used)) =>
          var off = off0 + used
          val out = new Array[Array[Byte]](n)
          var i = 0
          while (i < n) {
            val len = lens(i)
            if (len < 0 || off.toLong + len > b.length) return (null, 0)
            out(i) = java.util.Arrays.copyOfRange(b, off, off + len.toInt)
            off += len.toInt
            i += 1
          }
          (out, off - off0)
      }
    }
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainBytes(page, 0, n)
      dict != null
    } { s =>
      val vals: Array[Array[Byte]] = s.encoding match {
        case 0 => plainBytes(s.page, s.off, s.nonNull) // PLAIN (v1)
        case 6 => deltaLength(s.page, s.off, s.nonNull)._1 // DELTA_LENGTH
        case 7 => // DELTA_BYTE_ARRAY: prefix lengths + suffix stream
          deltaBinaryPacked(s.page, s.off, s.page.length, s.nonNull) match {
            case None => null
            case Some((prefixes, used)) =>
              val (suffixes, _) = deltaLength(s.page, s.off + used, s.nonNull)
              if (suffixes == null) null
              else {
                val out = new Array[Array[Byte]](s.nonNull)
                var ok = true
                var i = 0
                while (i < s.nonNull && ok) {
                  val p = prefixes(i)
                  if (p < 0 || (i == 0 && p != 0L) ||
                    (i > 0 && p > out(i - 1).length)) ok = false
                  else {
                    val suf = suffixes(i)
                    val v = new Array[Byte](p.toInt + suf.length)
                    if (i > 0) System.arraycopy(out(i - 1), 0, v, 0, p.toInt)
                    System.arraycopy(suf, 0, v, p.toInt, suf.length)
                    out(i) = v
                  }
                  i += 1
                }
                if (ok) out else null
              }
          }
        case 2 | 8 => // dictionary indices
          if (dict == null || s.off >= s.page.length) null
          else {
            val w = s.page(s.off) & 0xff
            rleHybrid(s.page, s.off + 1, s.page.length, w, s.nonNull) match {
              case Some(idx) if idx.forall(ix => ix >= 0 && ix < dict.length) =>
                idx.map(dict(_))
              case _ => null
            }
          }
        case _ => null
      }
      if (vals == null) false
      else { vals.foreach(see); true }
    }
    walked match {
      case None => bad
      case Some((nPages, nDict, nV2, got, nNulls)) =>
        ByteChunkDecode(file, loc.grp, nPages, nDict, nV2, got, nNulls,
          sumLen,
          if (minV == null) null else new String(minV, "UTF-8"),
          if (maxV == null) null else new String(maxV, "UTF-8"),
          ok = true)
    }
  }

  /** Per-file chunk walk shared by the two public column readers: lists
    * part files, parses footers, seeks each chunk's byte range (data
    * pages of OTHER columns never touched), and maps `decode` over the
    * chunks with `onError` covering range violations and IO failures. */
  private def chunkRows[T: scala.reflect.ClassTag](
      spark: SparkSession, path: String, column: String)(
      decode: (Array[Byte], ChunkLoc, String) => T)(
      onError: (String, ChunkLoc) => T): org.apache.spark.rdd.RDD[T] = {
    val conf0 = new org.apache.hadoop.conf.Configuration()
    val p0 = new org.apache.hadoop.fs.Path(path)
    val fs0 = p0.getFileSystem(conf0)
    val files: Seq[String] = {
      val st = fs0.getFileStatus(p0)
      if (st.isDirectory)
        fs0.listStatus(p0).toSeq
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath.toString).sorted
      else Seq(p0.toString)
    }
    spark.sparkContext.parallelize(files, math.max(1, files.size))
      .flatMap { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val p = new org.apache.hadoop.fs.Path(f)
        val fs = p.getFileSystem(conf)
        val st = fs.getFileStatus(p)
        ParquetFooter.readFooterBytes(fs, st).toSeq.flatMap { footer =>
          val locs = parseChunkLocs(footer, column)
          if (locs.isEmpty) Seq.empty
          else {
            val in = fs.open(p)
            try locs.map { loc =>
              if (loc.firstPageOffset < 0 ||
                loc.firstPageOffset + loc.totalCompressedSize > st.getLen)
                onError(f, loc)
              else {
                val chunk = new Array[Byte](loc.totalCompressedSize.toInt)
                in.readFully(loc.firstPageOffset, chunk)
                decode(chunk, loc, f)
              }
            } catch {
              case _: java.io.IOException => locs.map(l => onError(f, l))
            } finally in.close()
          }
        }
      }
  }

  /** One row per (part file, row group): the INT64 column chunk of
    * `column` hand-decoded page by page (v1 + v2 pages). */
  def int64Column(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, column)(decodeChunk) { (f, loc) =>
      Int64ChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
        Long.MaxValue, Long.MinValue, ok = false)
    }.toDF()
  }

  /** One row per (part file, row group): the BYTE_ARRAY column chunk of
    * `column` hand-decoded page by page (v1 PLAIN/dictionary + v2
    * DELTA_BYTE_ARRAY / DELTA_LENGTH_BYTE_ARRAY). */
  def byteArrayColumn(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, column)(decodeChunkBytes) { (f, loc) =>
      ByteChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L, null, null,
        ok = false)
    }.toDF()
  }
}
