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
  * Scope (documented, routed): v1 data pages, physical type INT64,
  * max repetition level 0 (flat column), definition-level bit width ≤ 1
  * (required or optional), encodings PLAIN / PLAIN_DICTIONARY /
  * RLE_DICTIONARY, codecs UNCOMPRESSED and SNAPPY — exactly what
  * Spark's default v1 writer emits for a flat INT64 column, dictionary
  * fallback mid-chunk included (a dictionary page followed by PLAIN
  * data pages decodes per-page by encoding id). V2 data pages, nested
  * paths, other codecs, and any structural violation degrade to a
  * per-chunk `ok = false` row — one bad chunk costs its row, never the
  * task (the FLAC/snappy/LZ4 bounds discipline).
  */
object ParquetPages {

  /** One decoded column chunk: exact value facts (writer-independent)
    * plus layout facts (pages, dictionary use) for boolean contracts. */
  final case class Int64ChunkDecode(
      file: String, grp: Int, n_pages: Long, n_dict_pages: Long,
      num_values: Long, n_nulls: Long, sum_v: Long, min_v: Long,
      max_v: Long, ok: Boolean)

  /** Chunk locator parsed from the footer for one column. */
  private[ops] final case class ChunkLoc(grp: Int, codec: Int, physType: Int,
      numValues: Long, firstPageOffset: Long, totalCompressedSize: Long,
      required: Boolean)

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

  /** Decode all pages of one INT64 column chunk. */
  private[ops] def decodeChunk(chunk: Array[Byte], loc: ChunkLoc,
      file: String): Int64ChunkDecode = {
    val bad = Int64ChunkDecode(file, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
      ok = false)
    if (loc.physType != 2) return bad // INT64 only
    if (loc.codec != 0 && loc.codec != 1) return bad // UNCOMPRESSED/SNAPPY
    var dict: Array[Long] = null
    var nPages = 0L
    var nDictPages = 0L
    var got = 0L
    var nNulls = 0L
    var sum = 0L
    var minV = Long.MaxValue
    var maxV = Long.MinValue
    var pos = 0
    while (got < loc.numValues) {
      if (pos >= chunk.length) return bad
      // PageHeader (thrift compact)
      val c = new Compact(chunk)
      c.pos = pos
      var pType = -1L
      var compSize = -1L
      var uncompSize = -1L
      var dpNumValues = -1L
      var dpEncoding = -1L
      var dpDefEnc = -1L
      var dictNumValues = -1L
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
          case _ => false
        }
      }
      if (c.bad || compSize < 0 || uncompSize < 0 ||
        c.pos + compSize > chunk.length) return bad
      val rawStart = c.pos
      pos = c.pos + compSize.toInt
      val page: Array[Byte] =
        if (loc.codec == 0)
          java.util.Arrays.copyOfRange(chunk, rawStart, rawStart + compSize.toInt)
        else SnappyBlock.decompress(java.util.Arrays.copyOfRange(
          chunk, rawStart, rawStart + compSize.toInt)).orNull
      if (page == null || page.length != uncompSize.toInt) return bad
      pType match {
        case 2L => // DICTIONARY_PAGE: PLAIN INT64 values
          if (dictNumValues < 0 ||
            dictNumValues * 8L != page.length.toLong) return bad
          dict = new Array[Long](dictNumValues.toInt)
          var i = 0
          while (i < dict.length) {
            var v = 0L
            var k = 7
            while (k >= 0) { v = (v << 8) | (page(i * 8 + k) & 0xffL); k -= 1 }
            dict(i) = v
            i += 1
          }
          nDictPages += 1L
          nPages += 1L
        case 0L => // DATA_PAGE v1
          // dpNumValues drives allocations — bound it against what the chunk
          // says remains AND a sane per-page cap before Array.fill, so a
          // forged header can neither NegativeArraySize nor allocate GBs.
          if (dpNumValues < 0 || dpNumValues > loc.numValues - got ||
            dpNumValues > MaxPageValues) return bad
          var off = 0
          val defs: Array[Int] =
            if (loc.required) Array.fill(dpNumValues.toInt)(1)
            else {
              if (dpDefEnc != 3L) return bad // RLE is the only legal v1 enc
              if (off + 4 > page.length) return bad
              val len = (page(off) & 0xff) | ((page(off + 1) & 0xff) << 8) |
                ((page(off + 2) & 0xff) << 16) | ((page(off + 3) & 0xff) << 24)
              off += 4
              if (len < 0 || off + len > page.length) return bad
              val d = rleHybrid(page, off, off + len, 1, dpNumValues.toInt)
                .getOrElse(return bad)
              off += len
              d
            }
          var nonNull = 0
          defs.foreach(dv => if (dv == 1) nonNull += 1 else nNulls += 1)
          val vals: Array[Long] = dpEncoding match {
            case 0L => // PLAIN
              if (off + nonNull * 8 > page.length) return bad
              val a = new Array[Long](nonNull)
              var i = 0
              while (i < nonNull) {
                var v = 0L
                var k = 7
                while (k >= 0) {
                  v = (v << 8) | (page(off + i * 8 + k) & 0xffL); k -= 1
                }
                a(i) = v
                i += 1
              }
              a
            case 2L | 8L => // PLAIN_DICTIONARY / RLE_DICTIONARY indices
              if (dict == null || off >= page.length) return bad
              val w = page(off) & 0xff
              off += 1
              val idx = rleHybrid(page, off, page.length, w, nonNull)
                .getOrElse(return bad)
              val a = new Array[Long](nonNull)
              var i = 0
              while (i < nonNull) {
                val ix = idx(i)
                if (ix < 0 || ix >= dict.length) return bad
                a(i) = dict(ix)
                i += 1
              }
              a
            case _ => return bad
          }
          vals.foreach { v =>
            sum += v
            if (v < minV) minV = v
            if (v > maxV) maxV = v
          }
          got += dpNumValues
          nPages += 1L
        case _ => return bad // v2 pages / index pages out of scope
      }
    }
    // A value-less (all-null) chunk keeps the Long.MaxValue/MinValue
    // identity sentinels rather than 0, so cross-chunk min(min_v)/max(max_v)
    // aggregation is never silently pulled toward 0 by a chunk that holds no
    // values; consumers can exclude such chunks via num_values - n_nulls = 0.
    Int64ChunkDecode(file, loc.grp, nPages, nDictPages, got, nNulls, sum,
      minV, maxV, ok = true)
  }

  /** One row per (part file, row group): the column chunk of `column`
    * hand-decoded page by page. One task per part file (the chunk byte
    * ranges are read by seek, data pages of OTHER columns never touched). */
  def int64Column(spark: SparkSession, path: String, column: String): DataFrame = {
    import spark.implicits._
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
    val rows = spark.sparkContext.parallelize(files, math.max(1, files.size))
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
                Int64ChunkDecode(f, loc.grp, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
                  ok = false)
              else {
                val chunk = new Array[Byte](loc.totalCompressedSize.toInt)
                in.readFully(loc.firstPageOffset, chunk)
                decodeChunk(chunk, loc, f)
              }
            } catch {
              case _: java.io.IOException =>
                locs.map(l => Int64ChunkDecode(f, l.grp, 0L, 0L, 0L, 0L, 0L,
                  0L, 0L, ok = false))
            } finally in.close()
          }
        }
      }
    rows.toDF()
  }
}
