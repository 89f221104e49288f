package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hand-rolled parquet FOOTER parser — the metadata layer every scan
  * planner reads before touching data (row-group pruning, schema
  * negotiation, stats-based skipping all start here). Parses the thrift
  * COMPACT-protocol `FileMetaData` struct from the public parquet-format
  * definition (parquet.thrift): trailing `PAR1` magic, little-endian
  * footer length, then version (field 1, i32), schema element list
  * (field 2 — leaves are the elements that declare no children),
  * num_rows (field 3, i64), and the row-group list (field 4) with each
  * group's column-chunk count and per-group num_rows. Unknown fields —
  * stats, encodings, column orders, whatever the writer added — are
  * skipped structurally via the protocol's own type system (varint +
  * zigzag ints, length-prefixed binaries, size|type list headers,
  * recursive structs), so the parser reads footers from ANY conformant
  * writer, not just the one that wrote the fixtures.
  *
  * Scale posture: footers are read by SEEK — open, read the last 8
  * bytes, seek back over the footer, parse; the data pages are never
  * touched. That is the 100 TB discipline (a catalog sweep over a lake
  * reads kilobytes per file, not the file), and why this is a real
  * operator rather than a toy: the same walk priced against
  * `spark.read.parquet(...).count()` touches ~0.1% of the bytes.
  *
  * Structural violations (bad magic, truncated footer, over-long varint,
  * unknown compact type) degrade to a per-file None — one corrupt file
  * costs its own row, never the task.
  */
object ParquetFooter {

  final case class FooterStats(
      table: String, n_files: Int, num_rows: Long, n_groups: Long,
      n_leaf_columns: Int, n_chunks: Long, groups_rows_ok: Boolean,
      chunks_ok: Boolean, ver_ok: Boolean)

  private final case class OneFooter(
      numRows: Long, nGroups: Int, nLeaves: Int, nChunks: Long,
      groupRowsSum: Long, version: Int)

  /** Thrift compact-protocol reader over a byte array (public protocol
    * spec). Reads latch `bad` on any structural violation. */
  private[ops] final class Compact(val bytes: Array[Byte]) {
    var pos = 0
    var bad = false
    def u8(): Int = {
      if (pos >= bytes.length) { bad = true; return 0 }
      val v = bytes(pos) & 0xff; pos += 1; v
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        if (shift > 63) { bad = true; return 0 }
        b = u8()
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0 && !bad)
      v
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
    def skipBytes(n: Long): Unit = {
      if (n < 0 || pos + n > bytes.length) bad = true else pos += n.toInt
    }
    /** Skip one value of the given compact type id. */
    def skip(tpe: Int): Unit = tpe match {
      case 1 | 2 => () // bool true/false: value lives in the field header
      case 3 => u8()
      case 4 | 5 | 6 => zigzag()
      case 7 => skipBytes(8)
      case 8 => skipBytes(varint())
      case 9 | 10 =>
        val h = u8()
        var n = (h >> 4) & 0xf
        if (n == 15) n = varint().toInt
        val et = h & 0xf
        var i = 0
        while (i < n && !bad) { skip(et); i += 1 }
      case 11 =>
        val n = varint()
        if (n > 0) {
          val kv = u8()
          var i = 0L
          while (i < n && !bad) { skip((kv >> 4) & 0xf); skip(kv & 0xf); i += 1 }
        }
      case 12 => skipStruct()
      case _ => bad = true
    }
    def skipStruct(): Unit = {
      var last = 0
      var cont = true
      while (cont && !bad) {
        val h = u8()
        if (h == 0) cont = false
        else {
          val delta = (h >> 4) & 0xf
          val t = h & 0xf
          last = if (delta == 0) zigzag().toInt else last + delta
          skip(t)
        }
      }
    }
    /** Walk one struct's fields, dispatching (fieldId, type) to f (which
      * must fully consume the value); unhandled fields are skipped. */
    def struct(f: (Int, Int) => Boolean): Unit = {
      var last = 0
      var cont = true
      while (cont && !bad) {
        val h = u8()
        if (h == 0) cont = false
        else {
          val delta = (h >> 4) & 0xf
          val t = h & 0xf
          last = if (delta == 0) zigzag().toInt else last + delta
          if (!f(last, t)) skip(t)
        }
      }
    }
    /** List header: (size, elemType). */
    def listHeader(): (Int, Int) = {
      val h = u8()
      var n = (h >> 4) & 0xf
      if (n == 15) n = varint().toInt
      (n, h & 0xf)
    }
  }

  /** Parse one footer byte array (FileMetaData). */
  private def parseFooter(bytes: Array[Byte]): Option[OneFooter] = {
    val c = new Compact(bytes)
    var version = 0
    var numRows = -1L
    var nGroups = 0
    var nLeaves = 0
    var nChunks = 0L
    var groupRowsSum = 0L
    c.struct { (id, t) =>
      (id, t) match {
        case (1, 5) => version = c.zigzag().toInt; true
        case (2, 9) => // schema: list<SchemaElement>; leaf = no children
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            var i = 0
            while (i < n && !c.bad) {
              var children = 0L
              c.struct { (sid, st) =>
                if (sid == 5 && st == 5) { children = c.zigzag(); true }
                else false
              }
              if (i > 0 && children == 0) nLeaves += 1 // element 0 is the root
              i += 1
            }
            true
          }
        case (3, 6) => numRows = c.zigzag(); true
        case (4, 9) => // row_groups: list<RowGroup>
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            nGroups = n
            var i = 0
            while (i < n && !c.bad) {
              c.struct { (gid, gt) =>
                (gid, gt) match {
                  case (1, 9) => // columns: list<ColumnChunk>
                    val (cn, cet) = c.listHeader()
                    if (cet != 12) { c.bad = true }
                    else {
                      nChunks += cn
                      var j = 0
                      while (j < cn && !c.bad) { c.skipStruct(); j += 1 }
                    }
                    true
                  case (3, 6) => groupRowsSum += c.zigzag(); true
                  case _ => false
                }
              }
              i += 1
            }
            true
          }
        case _ => false
      }
    }
    if (c.bad || numRows < 0) None
    else Some(OneFooter(numRows, nGroups, nLeaves, nChunks, groupRowsSum, version))
  }

  /** Read ONLY the footer of one parquet file via seek (never the data
    * pages); None on any structural violation. */
  private def readFooter(fs: org.apache.hadoop.fs.FileSystem,
      status: org.apache.hadoop.fs.FileStatus): Option[OneFooter] = {
    val len = status.getLen
    if (len < 12) return None
    val in = fs.open(status.getPath)
    try {
      val tail = new Array[Byte](8)
      in.readFully(len - 8, tail)
      if (!(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1'))
        return None
      val fLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      if (fLen <= 0 || fLen > len - 12) return None
      val footer = new Array[Byte](fLen)
      in.readFully(len - 8 - fLen, footer)
      parseFooter(footer)
    } catch {
      case _: java.io.IOException => None
    } finally in.close()
  }

  /** One aggregated row per (table, path): footer facts summed across the
    * path's part files (a single .parquet file counts as one part), with
    * the x37-class boolean contracts pre-evaluated so the row is
    * deterministic across writer vintages (row-group COUNT varies with
    * writer settings; coverage invariants don't). */
  def describe(spark: SparkSession, tables: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val rows = spark.sparkContext.parallelize(tables, math.max(1, tables.size))
      .map { case (table, path) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(conf)
        val files: Seq[org.apache.hadoop.fs.FileStatus] = {
          val st = fs.getFileStatus(p)
          if (st.isDirectory)
            fs.listStatus(p).toSeq
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .sortBy(_.getPath.getName)
          else Seq(st)
        }
        val footers = files.flatMap(s => readFooter(fs, s))
        val numRows = footers.map(_.numRows).sum
        val nGroups = footers.map(_.nGroups.toLong).sum
        val nChunks = footers.map(_.nChunks).sum
        val leaves = footers.map(_.nLeaves).distinct
        FooterStats(
          table, footers.size, numRows, nGroups,
          if (leaves.size == 1) leaves.head else -1, nChunks,
          groups_rows_ok = footers.nonEmpty &&
            footers.forall(f => f.groupRowsSum == f.numRows),
          chunks_ok = footers.nonEmpty &&
            footers.forall(f => f.nChunks == f.nGroups.toLong * f.nLeaves),
          ver_ok = footers.nonEmpty && footers.forall(_.version >= 1))
      }
    rows.toDF()
  }

  // ——— column statistics (the layer min/max row-group pruning reads) ———

  /** One row group's statistics for one INT64 column, straight from the
    * footer's `ColumnMetaData.statistics` (parquet.thrift `Statistics`:
    * min_value field 6 / max_value field 5, plain-encoded little-endian
    * INT64 per the column's physical type). `has_stats` is false when the
    * writer omitted the struct or either bound — the pruning consumer
    * must then treat the group as unpruneable, never as empty. */
  final case class Int64GroupStats(
      file: String, grp: Int, g_rows: Long,
      min_v: Long, max_v: Long, has_stats: Boolean)

  private def leInt64(b: Array[Byte]): Option[Long] =
    if (b.length != 8) None
    else Some((0 until 8).map(i => (b(i) & 0xffL) << (8 * i)).reduce(_ | _))

  /** Parse per-group stats of `column` from one footer byte array. */
  private def parseInt64Stats(
      bytes: Array[Byte], column: String): Seq[(Int, Long, Option[(Long, Long)])] = {
    val c = new Compact(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Option[(Long, Long)])]
    def readBinary(): Array[Byte] = {
      val n = c.varint()
      if (n < 0 || c.pos + n > bytes.length) { c.bad = true; Array.emptyByteArray }
      else { val a = java.util.Arrays.copyOfRange(bytes, c.pos, c.pos + n.toInt); c.pos += n.toInt; a }
    }
    c.struct { (id, t) =>
      (id, t) match {
        case (4, 9) => // row_groups: list<RowGroup>
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            var gi = 0
            while (gi < n && !c.bad) {
              var gRows = -1L
              var stats: Option[(Long, Long)] = None
              c.struct { (gid, gt) =>
                (gid, gt) match {
                  case (3, 6) => gRows = c.zigzag(); true
                  case (1, 9) => // columns: list<ColumnChunk>
                    val (cn, cet) = c.listHeader()
                    if (cet != 12) { c.bad = true }
                    else {
                      var j = 0
                      while (j < cn && !c.bad) {
                        // ColumnChunk; meta_data is field 3
                        var isTarget = false
                        var minV: Option[Long] = None
                        var maxV: Option[Long] = None
                        var physType = -1L
                        c.struct { (cid, ct) =>
                          (cid, ct) match {
                            case (3, 12) => // ColumnMetaData
                              c.struct { (mid, mt) =>
                                (mid, mt) match {
                                  case (1, 5) => physType = c.zigzag(); true
                                  case (3, 9) => // path_in_schema: list<string>
                                    val (pn, pet) = c.listHeader()
                                    if (pet != 8) { c.bad = true; true }
                                    else {
                                      val parts = (0 until pn).map(_ => new String(readBinary(), "UTF-8"))
                                      isTarget = parts.lastOption.contains(column) && parts.size == 1
                                      true
                                    }
                                  case (12, 12) => // Statistics
                                    c.struct { (sid, st) =>
                                      (sid, st) match {
                                        case (5, 8) => maxV = leInt64(readBinary()); true
                                        case (6, 8) => minV = leInt64(readBinary()); true
                                        case _ => false
                                      }
                                    }
                                    true
                                  case _ => false
                                }
                              }
                              true
                            case _ => false
                          }
                        }
                        // physical type 2 = INT64 (parquet.thrift Type)
                        if (isTarget && physType == 2L)
                          stats = for (mn <- minV; mx <- maxV) yield (mn, mx)
                        j += 1
                      }
                    }
                    true
                  case _ => false
                }
              }
              if (!c.bad) out += ((gi, gRows, stats))
              gi += 1
            }
            true
          }
        case _ => false
      }
    }
    if (c.bad) Seq.empty else out.toSeq
  }

  /** Per-(part file, row group) min/max statistics of one INT64 column
    * under `path`, read footer-only by seek (same discipline as
    * [[describe]]): the frame a stats-based pruning decision runs on.
    * One task per part file; a structurally bad footer contributes no
    * rows (the consumer sees the file as stats-less via the outer join
    * it performs, never as empty). */
  def int64Stats(spark: SparkSession, path: String, column: String): DataFrame = {
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
        val raw = readFooterBytes(fs, fs.getFileStatus(p))
        raw.toSeq.flatMap(parseInt64Stats(_, column)).map {
          case (gi, gRows, Some((mn, mx))) => Int64GroupStats(f, gi, gRows, mn, mx, has_stats = true)
          case (gi, gRows, None)           => Int64GroupStats(f, gi, gRows, 0L, 0L, has_stats = false)
        }
      }
    rows.toDF()
  }

  // ——— page index (the layer BETWEEN row-group stats and page decode) ———

  /** One data page of one INT64 column chunk, joined across the two
    * parquet-format page-index structures a reader seek-loads to skip
    * pages WITHIN a kept row group (parquet.thrift `ColumnIndex` — per-
    * page null_pages/min_values/max_values/boundary_order/null_counts —
    * and `OffsetIndex` — per-page (offset, compressed_page_size,
    * first_row_index)). `grp_row_start` accumulates preceding groups'
    * num_rows in group order so `grp_row_start + first_row` is the
    * page's GLOBAL row index within the file. `page_rows` derives from
    * the next page's first_row_index (last page: group num_rows —
    * first_row). A null page carries 0/0 bounds with null_page = true;
    * the pruning consumer must treat it as unmatchable, not unbounded.
    * A structural violation (missing index, page-count mismatch between
    * the two structures, bad thrift) degrades to ONE ok=false row for
    * the chunk — never a lie. */
  final case class Int64PageIndex(
      file: String, grp: Int, grp_row_start: Long, g_rows: Long,
      page: Int, first_row: Long, page_rows: Long,
      min_v: Long, max_v: Long, null_page: Boolean, null_count: Long,
      boundary_order: Int, pg_offset: Long, pg_size: Long, ok: Boolean)

  /** Per-chunk index locations of `column` from one footer byte array:
    * (grp, g_rows, ci_off, ci_len, oi_off, oi_len); -1 = absent. */
  private def parseIndexLocs(bytes: Array[Byte], column: String)
      : Seq[(Int, Long, Long, Long, Long, Long)] = {
    val c = new Compact(bytes)
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Long, Long, Long, Long)]
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
        case (4, 9) => // row_groups: list<RowGroup>
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            var gi = 0
            while (gi < n && !c.bad) {
              var gRows = -1L
              var found: Option[(Long, Long, Long, Long)] = None
              c.struct { (gid, gt) =>
                (gid, gt) match {
                  case (3, 6) => gRows = c.zigzag(); true
                  case (1, 9) => // columns: list<ColumnChunk>
                    val (cn, cet) = c.listHeader()
                    if (cet != 12) { c.bad = true }
                    else {
                      var j = 0
                      while (j < cn && !c.bad) {
                        var isTarget = false
                        var physType = -1L
                        var oiOff = -1L; var oiLen = -1L
                        var ciOff = -1L; var ciLen = -1L
                        c.struct { (cid, ct) =>
                          (cid, ct) match {
                            case (3, 12) => // ColumnMetaData
                              c.struct { (mid, mt) =>
                                (mid, mt) match {
                                  case (1, 5) => physType = c.zigzag(); true
                                  case (3, 9) => // path_in_schema
                                    val (pn, pet) = c.listHeader()
                                    if (pet != 8) { c.bad = true; true }
                                    else {
                                      val parts = (0 until pn).map(_ =>
                                        new String(readBinary(), "UTF-8"))
                                      isTarget = parts.lastOption.contains(column) &&
                                        parts.size == 1
                                      true
                                    }
                                  case _ => false
                                }
                              }
                              true
                            case (4, 6) => oiOff = c.zigzag(); true
                            case (5, 5) => oiLen = c.zigzag(); true
                            case (6, 6) => ciOff = c.zigzag(); true
                            case (7, 5) => ciLen = c.zigzag(); true
                            case _ => false
                          }
                        }
                        if (isTarget && physType == 2L)
                          found = Some((ciOff, ciLen, oiOff, oiLen))
                        j += 1
                      }
                    }
                    true
                  case _ => false
                }
              }
              // emit EVERY group (absent target → -1 locations): the
              // consumer's grp_row_start accumulation must count all
              // groups' rows, not just the ones that carry the column
              if (!c.bad) {
                val (co, cl, oo, ol) = found.getOrElse((-1L, -1L, -1L, -1L))
                out += ((gi, gRows, co, cl, oo, ol))
              }
              gi += 1
            }
            true
          }
        case _ => false
      }
    }
    if (c.bad) Seq.empty else out.toSeq
  }

  /** Parse one `ColumnIndex` struct (parquet.thrift): null_pages (1),
    * min_values (2) / max_values (3) as plain LE INT64, boundary_order
    * (4), null_counts (5, optional). None on any structural violation
    * or list-length mismatch. */
  private[ops] def parseColumnIndex(bytes: Array[Byte])
      : Option[(Seq[Boolean], Seq[Option[Long]], Seq[Option[Long]], Int, Seq[Long])] = {
    val c = new Compact(bytes)
    var nullPages: Seq[Boolean] = null
    var mins: Seq[Option[Long]] = null
    var maxs: Seq[Option[Long]] = null
    var bo = -1
    var nullCounts: Seq[Long] = Seq.empty
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
        case (1, 9) => // null_pages: list<bool> (compact: one byte, 1=true 2=false)
          val (n, et) = c.listHeader()
          if (et != 1 && et != 2) { c.bad = true; true }
          else {
            nullPages = (0 until n).map { _ =>
              val v = c.u8()
              if (v != 1 && v != 2) c.bad = true
              v == 1
            }
            true
          }
        case (2, 9) =>
          val (n, et) = c.listHeader()
          if (et != 8) { c.bad = true; true }
          else { mins = (0 until n).map(_ => leInt64(readBinary())); true }
        case (3, 9) =>
          val (n, et) = c.listHeader()
          if (et != 8) { c.bad = true; true }
          else { maxs = (0 until n).map(_ => leInt64(readBinary())); true }
        case (4, 5) => bo = c.zigzag().toInt; true
        case (5, 9) =>
          val (n, et) = c.listHeader()
          if (et != 6) { c.bad = true; true }
          else { nullCounts = (0 until n).map(_ => c.zigzag()); true }
        case _ => false
      }
    }
    if (c.bad || nullPages == null || mins == null || maxs == null || bo < 0 ||
      mins.size != nullPages.size || maxs.size != nullPages.size) None
    else Some((nullPages, mins, maxs, bo, nullCounts))
  }

  /** Parse one `OffsetIndex` struct: page_locations (1) as
    * (offset, compressed_page_size, first_row_index) per page. */
  private[ops] def parseOffsetIndex(bytes: Array[Byte]): Option[Seq[(Long, Long, Long)]] = {
    val c = new Compact(bytes)
    var pages: Seq[(Long, Long, Long)] = null
    c.struct { (id, t) =>
      (id, t) match {
        case (1, 9) =>
          val (n, et) = c.listHeader()
          if (et != 12) { c.bad = true; true }
          else {
            pages = (0 until n).map { _ =>
              var off = -1L; var sz = -1L; var fr = -1L
              c.struct { (pid, pt) =>
                (pid, pt) match {
                  case (1, 6) => off = c.zigzag(); true
                  case (2, 5) => sz = c.zigzag(); true
                  case (3, 6) => fr = c.zigzag(); true
                  case _ => false
                }
              }
              (off, sz, fr)
            }
            true
          }
        case _ => false
      }
    }
    if (c.bad || pages == null ||
      pages.exists(p => p._1 < 0 || p._2 < 0 || p._3 < 0)) None
    else Some(pages)
  }

  /** Per-(part file, row group, data page) ColumnIndex ⋈ OffsetIndex
    * facts of one INT64 `column` under `path`, read by SEEK (footer +
    * two index blobs per chunk — data pages untouched: the page-skip
    * DECISION layer costs kilobytes per chunk at any scale). One task
    * per part file, [[int64Stats]]'s shape. */
  def int64PageIndex(spark: SparkSession, path: String, column: String): DataFrame = {
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
        val status = fs.getFileStatus(p)
        def bad(grp: Int, gRows: Long, rowStart: Long) = Int64PageIndex(
          f, grp, rowStart, gRows, 0, 0L, 0L, 0L, 0L,
          null_page = false, 0L, -1, 0L, 0L, ok = false)
        readFooterBytes(fs, status).toSeq.flatMap { footer =>
          val locs = parseIndexLocs(footer, column)
          if (locs.isEmpty) Seq(bad(0, 0L, 0L))
          else {
            val in = fs.open(p)
            try {
              var rowStart = 0L
              locs.flatMap { case (grp, gRows, ciOff, ciLen, oiOff, oiLen) =>
                val start = rowStart
                rowStart += gRows
                def blob(off: Long, len: Long): Option[Array[Byte]] =
                  if (off < 0 || len <= 0 || len > (1L << 24) ||
                    off > status.getLen - len) None
                  else try {
                    val a = new Array[Byte](len.toInt)
                    in.readFully(off, a)
                    Some(a)
                  } catch { case _: java.io.IOException => None }
                val parsed = for {
                  cib <- blob(ciOff, ciLen)
                  oib <- blob(oiOff, oiLen)
                  ci <- parseColumnIndex(cib)
                  oi <- parseOffsetIndex(oib)
                  if ci._1.size == oi.size && oi.nonEmpty
                } yield (ci, oi)
                parsed match {
                  case None => Seq(bad(grp, gRows, start))
                  case Some(((nulls, mins, maxs, bo, ncs), oi)) =>
                    oi.indices.map { i =>
                      val (off, sz, fr) = oi(i)
                      val pRows =
                        (if (i + 1 < oi.size) oi(i + 1)._3 else gRows) - fr
                      Int64PageIndex(
                        f, grp, start, gRows, i, fr, pRows,
                        mins(i).getOrElse(0L), maxs(i).getOrElse(0L),
                        nulls(i),
                        if (i < ncs.size) ncs(i) else -1L,
                        bo, off, sz,
                        ok = pRows > 0 &&
                          (nulls(i) || (mins(i).nonEmpty && maxs(i).nonEmpty)))
                    }
                }
              }
            } finally in.close()
          }
        }
      }
    rows.toDF()
  }

  /** The raw footer byte array of one parquet file (seek-only read). */
  private[ops] def readFooterBytes(fs: org.apache.hadoop.fs.FileSystem,
      status: org.apache.hadoop.fs.FileStatus): Option[Array[Byte]] = {
    val len = status.getLen
    if (len < 12) return None
    val in = fs.open(status.getPath)
    try {
      val tail = new Array[Byte](8)
      in.readFully(len - 8, tail)
      if (!(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' && tail(7) == '1'))
        return None
      val fLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
        ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
      if (fLen <= 0 || fLen > len - 12) return None
      val footer = new Array[Byte](fLen)
      in.readFully(len - 8 - fLen, footer)
      Some(footer)
    } catch {
      case _: java.io.IOException => None
    } finally in.close()
  }
}
