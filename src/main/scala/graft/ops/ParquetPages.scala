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
  * Scope (documented, routed): v1 AND v2 data pages; physical types
  * INT64, INT32, DOUBLE, BYTE_ARRAY, and FIXED_LEN_BYTE_ARRAY (decimals
  * read as big-endian unscaled integers); flat columns with definition
  * level ≤ 1 PLUS the list leaf shape `col.list.element` (maxRep = 1,
  * maxDef = 2 — real repetition levels decoded from both v1's
  * length-prefixed and v2's header-sized level sections); encodings
  * PLAIN / PLAIN_DICTIONARY / RLE_DICTIONARY plus the v2 family
  * DELTA_BINARY_PACKED (ints) and DELTA_BYTE_ARRAY /
  * DELTA_LENGTH_BYTE_ARRAY (strings, FLBA); codecs UNCOMPRESSED and
  * SNAPPY — everything Spark's v1 AND v2 writers emit for these column
  * shapes, dictionary fallback mid-chunk included. Deeper nesting, other
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

  /** One decoded DOUBLE column chunk: exact count/null facts plus sum and
    * min/max (Double.MaxValue/MinValue identity sentinels when the chunk
    * holds no values — exclude via num_values - n_nulls = 0). */
  final case class DoubleChunkDecode(
      file: String, grp: Int, n_pages: Long, n_dict_pages: Long,
      n_v2_pages: Long, num_values: Long, n_nulls: Long, sum_v: Double,
      min_v: Double, max_v: Double, ok: Boolean)

  /** One decoded FIXED_LEN_BYTE_ARRAY column chunk read as big-endian
    * two's-complement UNSCALED integers (parquet's DECIMAL physical
    * layout): facts over the unscaled values. A value that does not fit
    * in 64 bits routes the chunk to ok = false (scope: decimals up to
    * precision 18..38 whose values fit a Long — the write-side bound for
    * this gate). */
  final case class FlbaChunkDecode(
      file: String, grp: Int, n_pages: Long, n_dict_pages: Long,
      n_v2_pages: Long, type_len: Int, num_values: Long, n_nulls: Long,
      sum_unscaled: Long, min_unscaled: Long, max_unscaled: Long, ok: Boolean)

  /** One decoded LIST-of-INT64 leaf chunk (`col.list.element`, maxRep = 1,
    * maxDef = 2 — the Spark non-null-element array shape): row facts from
    * the repetition stream (rep = 0 starts a row), presence facts from the
    * definition stream (0 = null array, 1 = empty array, 2 = element). */
  final case class ListInt64ChunkDecode(
      file: String, grp: Int, n_pages: Long, n_dict_pages: Long,
      n_v2_pages: Long, n_rows: Long, n_null_rows: Long, n_empty: Long,
      n_entries: Long, sum_v: Long, min_v: Long, max_v: Long,
      max_row_len: Long, ok: Boolean)

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

  /** Footer walk for a full column PATH (nested paths like
    * `arr.list.element` included): reconstructs the schema TREE from the
    * flat SchemaElement list via num_children, computing each leaf's max
    * definition level (+1 per OPTIONAL or REPEATED ancestor incl. self),
    * max repetition level (+1 per REPEATED), and FIXED_LEN_BYTE_ARRAY
    * type_length. The first page offset is min(dictionary_page_offset,
    * data_page_offset) when a dictionary page exists — the dictionary
    * precedes the data pages in the chunk's contiguous byte range. */
  private[ops] def parseChunkLocsPath(bytes: Array[Byte],
      path: Seq[String]): Seq[ChunkLoc] = {
    val c = new Compact(bytes)
    val pathKey = path.mkString(".")
    // flat SchemaElement list: (name, repetition, typeLength, numChildren)
    val elems = ArrayBuffer.empty[(String, Int, Int, Int)]
    var leaf: Option[(Int, Int, Int)] = None // (maxDef, maxRep, typeLen)
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
        case (2, 9) => // schema: list<SchemaElement>
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            var i = 0
            while (i < n && !c.bad) {
              var rep = -1L
              var name = ""
              var typeLen = -1L
              var nChildren = 0L
              c.struct { (sid, st) =>
                (sid, st) match {
                  case (2, 5) => typeLen = c.zigzag(); true
                  case (3, 5) => rep = c.zigzag(); true
                  case (4, 8) => name = new String(readBinary(), "UTF-8"); true
                  case (5, 5) => nChildren = c.zigzag(); true
                  case _ => false
                }
              }
              elems += ((name, rep.toInt, math.max(typeLen, 0L).toInt,
                nChildren.toInt))
              i += 1
            }
            // tree walk: elems(0) is the root (its repetition is ignored);
            // children follow their parent contiguously, depth-first
            if (!c.bad && elems.nonEmpty) {
              def walk(idx: Int, prefix: String, d: Int, r: Int): Int = {
                if (idx >= elems.length) { c.bad = true; return idx }
                val (name, rep, tl, nc) = elems(idx)
                val d2 = d + (if (rep == 1 || rep == 2) 1 else 0)
                val r2 = r + (if (rep == 2) 1 else 0)
                val p2 = if (prefix.isEmpty) name else s"$prefix.$name"
                if (nc <= 0) {
                  if (p2 == pathKey) leaf = Some((d2, r2, tl))
                  idx + 1
                } else {
                  var i2 = idx + 1
                  var k = 0
                  while (k < nc && !c.bad) { i2 = walk(i2, p2, d2, r2); k += 1 }
                  i2
                }
              }
              val rootChildren = elems(0)._4
              var i2 = 1
              var k = 0
              while (k < rootChildren && !c.bad) { i2 = walk(i2, "", 0, 0); k += 1 }
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
                                      isTarget = parts == path
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
                          // level bounds patched in from the schema walk
                          // at the end (thrift field order is not fixed)
                          out += ChunkLoc(gi, codec.toInt, physType.toInt,
                            numValues,
                            if (dictOff >= 0 && dictOff < dataOff) dictOff
                            else dataOff,
                            totSize, required = false)
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
    leaf match {
      case Some((maxDef, maxRep, typeLen)) if !c.bad =>
        out.toSeq.map(l => l.copy(required = maxDef == 0,
          maxDef = maxDef, maxRep = maxRep, typeLen = typeLen))
      case _ => Seq.empty
    }
  }

  /** Flat-column footer walk (the original single-name API). */
  private[ops] def parseChunkLocs(bytes: Array[Byte], column: String): Seq[ChunkLoc] =
    parseChunkLocsPath(bytes, Seq(column))

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
    * (repetition/definition levels already consumed), `nonNull` values
    * (entries with def == maxDef) encoded with `encoding`. `defs`/`reps`
    * are the decoded level arrays (null when the column has none on the
    * wire) for decoders that need list semantics. `isV2` marks
    * DATA_PAGE_V2 layout. */
  private final case class DataSlice(page: Array[Byte], off: Int,
      nonNull: Int, numValues: Int, nNulls: Int, encoding: Int,
      isV2: Boolean, defs: Array[Int], reps: Array[Int])

  /** Bits needed to encode levels 0..maxLevel. */
  private def levelWidth(maxLevel: Int): Int =
    32 - Integer.numberOfLeadingZeros(maxLevel)

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
    // level bounds: the path-aware footer walk supplies maxDef/maxRep; the
    // legacy flat constructor (maxDef = -1) derives maxDef from `required`
    val maxDef = if (loc.maxDef >= 0) loc.maxDef else if (loc.required) 0 else 1
    val maxRep = math.max(loc.maxRep, 0)
    val defW = levelWidth(maxDef)
    val repW = levelWidth(maxRep)
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
      var dpRepEnc = -1L
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
                case (4, 5) => dpRepEnc = c.zigzag(); true
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
          val n = dpNumValues.toInt
          var off = 0
          // v1 level sections: 4-byte LE length + RLE payload — repetition
          // levels first (present only when maxRep > 0), then definition
          def lvlSection(w: Int): Array[Int] = {
            if (off + 4 > page.length) return null
            val len = (page(off) & 0xff) | ((page(off + 1) & 0xff) << 8) |
              ((page(off + 2) & 0xff) << 16) | ((page(off + 3) & 0xff) << 24)
            off += 4
            if (len < 0 || off + len > page.length) return null
            val d = rleHybrid(page, off, off + len, w, n).orNull
            if (d != null) off += len
            d
          }
          var reps: Array[Int] = null
          if (maxRep > 0) {
            if (dpRepEnc >= 0L && dpRepEnc != 3L) return None
            reps = lvlSection(repW)
            if (reps == null) return None
          }
          var defs: Array[Int] = null
          var nonNull = n
          if (maxDef > 0) {
            if (dpDefEnc != 3L) return None // RLE is the only legal v1 enc
            defs = lvlSection(defW)
            if (defs == null) return None
            nonNull = 0
            defs.foreach(dv => if (dv == maxDef) nonNull += 1)
          }
          val nulls = n - nonNull
          nNulls += nulls
          if (!onData(DataSlice(page, off, nonNull, n,
            nulls, dpEncoding.toInt, isV2 = false, defs, reps))) return None
          got += dpNumValues
          nPages += 1L
        case 3L => // DATA_PAGE_V2: levels uncompressed, values compressed
          if (v2NumValues < 0 || v2NumValues > loc.numValues - got ||
            v2NumValues > MaxPageValues) return None
          val repLen = math.max(v2RepLen, 0L)
          if (maxRep == 0 && repLen != 0L) return None // flat: no rep bytes
          if (v2DefLen < 0 || repLen + v2DefLen > compSize) return None
          val n = v2NumValues.toInt
          // v2 level sections carry NO length prefix (lengths live in the
          // header) and are stored uncompressed: reps first, then defs
          val repEnd = rawStart + repLen.toInt
          val reps: Array[Int] =
            if (maxRep == 0) null
            else rleHybrid(chunk, rawStart, repEnd, repW, n)
              .getOrElse(return None)
          val lvlEnd = repEnd + v2DefLen.toInt
          val defs: Array[Int] =
            if (maxDef == 0) null
            else rleHybrid(chunk, repEnd, lvlEnd, defW, n)
              .getOrElse(return None)
          var nonNull = 0
          if (defs == null) nonNull = n
          else defs.foreach(dv => if (dv == maxDef) nonNull += 1)
          val nulls = n - nonNull
          // header's own null count must agree with the decoded levels
          if (v2NumNulls >= 0 && v2NumNulls != nulls.toLong) return None
          nNulls += nulls
          val data =
            if (v2Compressed)
              inflate(lvlEnd, rawStart + compSize.toInt,
                uncompSize - repLen - v2DefLen)
            else java.util.Arrays.copyOfRange(chunk, lvlEnd,
              rawStart + compSize.toInt)
          if (data == null) return None
          if (!onData(DataSlice(data, 0, nonNull, n,
            nulls, v2Encoding.toInt, isV2 = true, defs, reps))) return None
          got += v2NumValues
          nV2Pages += 1L
          nPages += 1L
        case _ => return None // index pages etc. out of scope
      }
    }
    Some((nPages, nDictPages, nV2Pages, got, nNulls))
  }

  /** PLAIN little-endian fixed-width integers as Longs: width 8 = INT64,
    * width 4 = INT32 (sign-extended). */
  private def plainInts(b: Array[Byte], off: Int, n: Int, width: Int): Array[Long] = {
    if (off + n.toLong * width > b.length) return null
    val a = new Array[Long](n)
    var i = 0
    while (i < n) {
      var v = 0L
      var k = width - 1
      while (k >= 0) { v = (v << 8) | (b(off + i * width + k) & 0xffL); k -= 1 }
      if (width == 4) v = v.toInt.toLong // sign-extend INT32
      a(i) = v
      i += 1
    }
    a
  }

  /** Decode the value section of one numeric (INT32/INT64) data page:
    * PLAIN, DELTA_BINARY_PACKED, or dictionary indices over `dict`. */
  private def numPageValues(s: DataSlice, width: Int,
      dict: Array[Long]): Array[Long] = s.encoding match {
    case 0 => plainInts(s.page, s.off, s.nonNull, width) // PLAIN
    case 5 => // DELTA_BINARY_PACKED (v2; INT32 deltas decode identically)
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

  /** Decode all pages of one flat INT64 or INT32 column chunk (v1 + v2);
    * INT32 values are sign-extended into the same Long facts. */
  private[ops] def decodeChunk(chunk: Array[Byte], loc: ChunkLoc,
      file: String): Int64ChunkDecode = {
    val bad = Int64ChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
      Long.MaxValue, Long.MinValue, ok = false)
    if (loc.physType != 2 && loc.physType != 1) return bad // INT64/INT32
    if (loc.maxRep > 0 || loc.maxDef > 1) return bad // flat columns only
    val width = if (loc.physType == 1) 4 else 8
    var dict: Array[Long] = null
    var sum = 0L
    var minV = Long.MaxValue
    var maxV = Long.MinValue
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainInts(page, 0, n, width)
      dict != null && n.toLong * width == page.length.toLong
    } { s =>
      val vals = numPageValues(s, width, dict)
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

  /** PLAIN byte arrays: 4-byte LE length + payload, n entries. */
  private def plainBytes(b: Array[Byte], off0: Int, n: Int): Array[Array[Byte]] = {
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

  /** DELTA_LENGTH_BYTE_ARRAY: lengths via DELTA_BINARY_PACKED, then the
    * concatenated payload. Returns (values, bytes consumed). */
  private def deltaLengthValues(b: Array[Byte], off0: Int,
      n: Int): (Array[Array[Byte]], Int) = {
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

  /** DELTA_BYTE_ARRAY: prefix lengths (delta-packed) + suffix stream —
    * shared by BYTE_ARRAY and FIXED_LEN_BYTE_ARRAY v2 pages. */
  private def deltaByteArrayValues(b: Array[Byte], off0: Int,
      n: Int): Array[Array[Byte]] =
    deltaBinaryPacked(b, off0, b.length, n) match {
      case None => null
      case Some((prefixes, used)) =>
        val (suffixes, _) = deltaLengthValues(b, off0 + used, n)
        if (suffixes == null) null
        else {
          val out = new Array[Array[Byte]](n)
          var ok = true
          var i = 0
          while (i < n && ok) {
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

  /** Dictionary-index decode shared by the byte-shaped value readers. */
  private def dictIndexValues(s: DataSlice,
      dict: Array[Array[Byte]]): Array[Array[Byte]] = {
    if (dict == null || s.off >= s.page.length) return null
    val w = s.page(s.off) & 0xff
    rleHybrid(s.page, s.off + 1, s.page.length, w, s.nonNull) match {
      case Some(idx) if idx.forall(ix => ix >= 0 && ix < dict.length) =>
        idx.map(dict(_))
      case _ => null
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
    if (loc.maxRep > 0 || loc.maxDef > 1) return bad // flat columns only
    var dict: Array[Array[Byte]] = null
    var sumLen = 0L
    var minV: Array[Byte] = null
    var maxV: Array[Byte] = null
    def see(v: Array[Byte]): Unit = {
      sumLen += v.length
      if (minV == null || byteCompare(v, minV) < 0) minV = v
      if (maxV == null || byteCompare(v, maxV) > 0) maxV = v
    }
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainBytes(page, 0, n)
      dict != null
    } { s =>
      val vals: Array[Array[Byte]] = s.encoding match {
        case 0 => plainBytes(s.page, s.off, s.nonNull) // PLAIN (v1)
        case 6 => deltaLengthValues(s.page, s.off, s.nonNull)._1
        case 7 => deltaByteArrayValues(s.page, s.off, s.nonNull)
        case 2 | 8 => dictIndexValues(s, dict)
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

  /** Decode all pages of one flat DOUBLE column chunk (v1 + v2: PLAIN and
    * dictionary — parquet defines no delta encoding for doubles). */
  private[ops] def decodeChunkDouble(chunk: Array[Byte], loc: ChunkLoc,
      file: String): DoubleChunkDecode = {
    val bad = DoubleChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0.0,
      Double.MaxValue, Double.MinValue, ok = false)
    if (loc.physType != 5) return bad // DOUBLE only
    if (loc.maxRep > 0 || loc.maxDef > 1) return bad // flat columns only
    var dict: Array[Long] = null // raw IEEE bits
    var sum = 0.0
    var minV = Double.MaxValue
    var maxV = Double.MinValue
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainInts(page, 0, n, 8)
      dict != null && n.toLong * 8 == page.length.toLong
    } { s =>
      val bits: Array[Long] = s.encoding match {
        case 0 => plainInts(s.page, s.off, s.nonNull, 8) // PLAIN LE bits
        case 2 | 8 =>
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
      if (bits == null) false
      else {
        bits.foreach { raw =>
          val v = java.lang.Double.longBitsToDouble(raw)
          sum += v
          if (v < minV) minV = v
          if (v > maxV) maxV = v
        }
        true
      }
    }
    walked match {
      case None => bad
      case Some((nPages, nDict, nV2, got, nNulls)) =>
        DoubleChunkDecode(file, loc.grp, nPages, nDict, nV2, got, nNulls,
          sum, minV, maxV, ok = true)
    }
  }

  /** Big-endian two's-complement of `len` bytes as a Long; null (via the
    * `fits` flag pattern) when the value needs more than 64 bits. */
  private def beSigned(b: Array[Byte], off: Int, len: Int): Option[Long] = {
    if (len <= 0 || off + len > b.length) return None
    val sign = if ((b(off) & 0x80) != 0) 0xff else 0x00
    if (len > 8) {
      var i = 0
      while (i < len - 8) {
        if ((b(off + i) & 0xff) != sign) return None
        i += 1
      }
      // the surviving 8 bytes must agree with the dropped sign fill
      if (((b(off + len - 8) & 0x80) != 0) != (sign == 0xff)) return None
    }
    var v = if (sign == 0xff) -1L else 0L
    var i = math.max(0, len - 8)
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    Some(v)
  }

  /** Decode all pages of one flat FIXED_LEN_BYTE_ARRAY column chunk (v1
    * PLAIN + dictionary, v2 DELTA_BYTE_ARRAY — parquet-mr's v2 FLBA
    * encoding), reading each value as a big-endian unscaled decimal. */
  private[ops] def decodeChunkFlba(chunk: Array[Byte], loc: ChunkLoc,
      file: String): FlbaChunkDecode = {
    val bad = FlbaChunkDecode(file, loc.grp, 0L, 0L, 0L, loc.typeLen, 0L,
      0L, 0L, Long.MaxValue, Long.MinValue, ok = false)
    if (loc.physType != 7 || loc.typeLen <= 0) return bad // FLBA only
    if (loc.maxRep > 0 || loc.maxDef > 1) return bad // flat columns only
    val tl = loc.typeLen
    var dict: Array[Array[Byte]] = null
    var sum = 0L
    var minV = Long.MaxValue
    var maxV = Long.MinValue
    // PLAIN FLBA: n consecutive typeLen-byte values, no length prefixes
    def plainFlba(b: Array[Byte], off0: Int, n: Int): Array[Array[Byte]] = {
      if (off0 + n.toLong * tl > b.length) return null
      Array.tabulate(n)(i =>
        java.util.Arrays.copyOfRange(b, off0 + i * tl, off0 + (i + 1) * tl))
    }
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainFlba(page, 0, n)
      dict != null && n.toLong * tl == page.length.toLong
    } { s =>
      val vals: Array[Array[Byte]] = s.encoding match {
        case 0 => plainFlba(s.page, s.off, s.nonNull)
        case 7 => deltaByteArrayValues(s.page, s.off, s.nonNull)
        case 2 | 8 => dictIndexValues(s, dict)
        case _ => null
      }
      if (vals == null || vals.exists(v => v == null || v.length != tl)) false
      else {
        var ok = true
        vals.foreach { v =>
          beSigned(v, 0, tl) match {
            case None => ok = false
            case Some(u) =>
              sum += u
              if (u < minV) minV = u
              if (u > maxV) maxV = u
          }
        }
        ok
      }
    }
    walked match {
      case None => bad
      case Some((nPages, nDict, nV2, got, nNulls)) =>
        FlbaChunkDecode(file, loc.grp, nPages, nDict, nV2, tl, got, nNulls,
          sum, minV, maxV, ok = true)
    }
  }

  /** Decode all pages of one LIST-of-INT64 leaf chunk
    * (`col.list.element`): repetition level 0 opens a row; definition
    * level 0 = null array, 1 = empty array, maxDef (2) = one element.
    * Scope: maxRep = 1, maxDef = 2 (Spark's non-null-element array
    * layout); element encodings PLAIN / DELTA_BINARY_PACKED /
    * dictionary. */
  private[ops] def decodeChunkList(chunk: Array[Byte], loc: ChunkLoc,
      file: String): ListInt64ChunkDecode = {
    val bad = ListInt64ChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
      0L, 0L, Long.MaxValue, Long.MinValue, 0L, ok = false)
    if (loc.physType != 2) return bad // INT64 elements only
    if (loc.maxRep != 1 || loc.maxDef != 2) return bad
    var dict: Array[Long] = null
    var nRows = 0L
    var nNullRows = 0L
    var nEmpty = 0L
    var sum = 0L
    var minV = Long.MaxValue
    var maxV = Long.MinValue
    var maxRowLen = 0L
    var runLen = 0L // current row's element count (pages are row-aligned)
    val walked = walkPages(chunk, loc) { (page, n) =>
      dict = plainInts(page, 0, n, 8)
      dict != null && n.toLong * 8 == page.length.toLong
    } { s =>
      if (s.defs == null || s.reps == null ||
        s.defs.length != s.numValues || s.reps.length != s.numValues) false
      else {
        val vals = numPageValues(s, 8, dict)
        if (vals == null) false
        else {
          var i = 0
          while (i < s.numValues) {
            val r = s.reps(i)
            val d = s.defs(i)
            if (r == 0) {
              if (runLen > maxRowLen) maxRowLen = runLen
              runLen = 0L
              nRows += 1L
              if (d == 0) nNullRows += 1L
              else if (d == 1) nEmpty += 1L
            }
            if (d == 2) runLen += 1L
            i += 1
          }
          vals.foreach { v =>
            sum += v
            if (v < minV) minV = v
            if (v > maxV) maxV = v
          }
          true
        }
      }
    }
    if (runLen > maxRowLen) maxRowLen = runLen
    walked match {
      case None => bad
      case Some((nPages, nDict, nV2, got, nNulls)) =>
        ListInt64ChunkDecode(file, loc.grp, nPages, nDict, nV2, nRows,
          nNullRows, nEmpty, got - nNulls, sum, minV, maxV, maxRowLen,
          ok = true)
    }
  }

  /** Per-file chunk walk shared by the two public column readers: lists
    * part files, parses footers, seeks each chunk's byte range (data
    * pages of OTHER columns never touched), and maps `decode` over the
    * chunks with `onError` covering range violations and IO failures. */
  private def chunkRows[T: scala.reflect.ClassTag](
      spark: SparkSession, path: String, columnPath: Seq[String])(
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
          val locs = parseChunkLocsPath(footer, columnPath)
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

  /** decodeChunk internally accepts either integer physical type (INT64
    * and INT32 share the sign-extended Long fact schema); the PUBLIC
    * typed entry points must not — int64Column silently decoding an
    * INT32 column would weaken the typed-API contract, so the expected
    * physical type is enforced here and a mismatch routes to ok=false. */
  private def decodeChunkTyped(expectPhys: Int)(
      chunk: Array[Byte], loc: ChunkLoc, file: String): Int64ChunkDecode =
    if (loc.physType != expectPhys)
      Int64ChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
        Long.MaxValue, Long.MinValue, ok = false)
    else decodeChunk(chunk, loc, file)

  /** One row per (part file, row group): the INT64 column chunk of
    * `column` hand-decoded page by page (v1 + v2 pages). */
  def int64Column(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, Seq(column))(decodeChunkTyped(2)) { (f, loc) =>
      Int64ChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
        Long.MaxValue, Long.MinValue, ok = false)
    }.toDF()
  }

  /** One row per (part file, row group): the INT32 column chunk of
    * `column` hand-decoded page by page (sign-extended into the INT64
    * fact schema — PLAIN / DELTA_BINARY_PACKED / dictionary). */
  def int32Column(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, Seq(column))(decodeChunkTyped(1)) { (f, loc) =>
      Int64ChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L,
        Long.MaxValue, Long.MinValue, ok = false)
    }.toDF()
  }

  /** One row per (part file, row group): the BYTE_ARRAY column chunk of
    * `column` hand-decoded page by page (v1 PLAIN/dictionary + v2
    * DELTA_BYTE_ARRAY / DELTA_LENGTH_BYTE_ARRAY). */
  def byteArrayColumn(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, Seq(column))(decodeChunkBytes) { (f, loc) =>
      ByteChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L, null, null,
        ok = false)
    }.toDF()
  }

  /** One row per (part file, row group): the DOUBLE column chunk of
    * `column` hand-decoded page by page (PLAIN + dictionary). */
  def doubleColumn(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, Seq(column))(decodeChunkDouble) { (f, loc) =>
      DoubleChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0.0,
        Double.MaxValue, Double.MinValue, ok = false)
    }.toDF()
  }

  /** One row per (part file, row group): the FIXED_LEN_BYTE_ARRAY column
    * chunk of `column` read as big-endian unscaled decimals (v1 PLAIN +
    * dictionary, v2 DELTA_BYTE_ARRAY). */
  def flbaColumn(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, Seq(column))(decodeChunkFlba) { (f, loc) =>
      FlbaChunkDecode(f, loc.grp, 0L, 0L, 0L, loc.typeLen, 0L, 0L, 0L,
        Long.MaxValue, Long.MinValue, ok = false)
    }.toDF()
  }

  /** One row per (part file, row group): the INT64 LEAF of an
    * array<bigint> column (`column`.list.element — Spark's standard list
    * layout), decoded with real repetition levels. */
  def listInt64Column(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
    chunkRows(spark, path, Seq(column, "list", "element"))(decodeChunkList) {
      (f, loc) =>
        ListInt64ChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
          Long.MaxValue, Long.MinValue, 0L, ok = false)
    }.toDF()
  }
}
