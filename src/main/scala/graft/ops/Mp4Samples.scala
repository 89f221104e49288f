package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** MP4 / ISO-BMFF sample extraction + MJPEG frame decode — the composition
  * that closes the video-payload gap: [[Mp4Meta]] stops at box METADATA;
  * this walks the sample tables (`stsz` sizes + `stco` chunk offsets,
  * ISO/IEC 14496-12 §8.7) to locate each video sample inside `mdat` and
  * runs motion-JPEG samples through the REAL baseline decoder
  * ([[JpegDecoder]] — Huffman, IDCT, restart markers). MJPEG is exactly
  * "every sample is an independent baseline JPEG", so the two existing
  * pure-Scala pieces compose with no new codec work.
  *
  * Sample-location scope (documented, checked, degrades to no rows):
  * the first `stbl` under `moov → trak → mdia → minf` that contains BOTH
  * an `stsz` and an `stco` (resolved as a pair within that one stbl, so a
  * multi-trak file can never splice sizes from one trak with offsets from
  * another); chunk layouts supported are the two degenerate-but-common ones —
  * one chunk per sample (`stco` entries == sample count) and one single
  * chunk holding consecutive samples (`stco` entries == 1, offsets by
  * cumulative size). General `stsc` interleave is out of scope. Per-SAMPLE
  * damage (offset/size outside the blob, a broken JPEG stream) flags that
  * frame (`decode_ok = false`) and the walk continues — one bad frame in a
  * 100 TB scrape costs one row, never the shard.
  *
  * Scale shape: narrow per-row flatMap (the one shape byte-decoding
  * needs); blobs parallelize perfectly, zero shuffle inside the operator.
  */
object Mp4Samples {

  final case class Frame(
      media_id: Long,
      sample_idx: Long,
      sample_offset: Long,
      sample_size: Long,
      decode_ok: Boolean,
      width: Option[Long],
      height: Option[Long],
      pixel_hex: Option[String])

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")
  private val MaxSamples = 1 << 20 // corrupt count field must not OOM a task

  /** Locate the first `stbl` box that contains BOTH an stsz and an stco and
    * resolve per-sample (offset, size). The pair is resolved WITHIN one
    * stbl — on a multi-trak file (or a trak with a corrupt stsz), taking
    * the first stsz and first stco found anywhere would mix sizes from one
    * trak with offsets from another, producing plausible-looking but
    * mismatched sample locations. Per-trak state resets; a trak whose stbl
    * lacks either table is skipped, never spliced. None = no parseable
    * complete sample table in any trak. */
  def sampleTable(bytes: Array[Byte]): Option[(Array[Long], Array[Long])] = {
    var found: Option[(Array[Long], Array[Long])] = None
    // Inside an stbl, collect this stbl's own stsz/stco payload ranges.
    def scanStbl(start: Long, end: Long): Option[(Array[Long], Array[Long])] = {
      var stsz: Option[(Int, Int)] = None // payload [start, end)
      var stco: Option[(Int, Int)] = None
      var off = start
      while (off + 8 <= end && (stsz.isEmpty || stco.isEmpty)) {
        val size32 = u32(bytes, off.toInt)
        val typ = fourcc(bytes, off.toInt + 4)
        val (size, hdr) =
          if (size32 == 1L && off + 16 <= end)
            ((u32(bytes, off.toInt + 8) << 32) | u32(bytes, off.toInt + 12), 16L)
          else if (size32 == 0L) (end - off, 8L)
          else (size32, 8L)
        if (size < hdr || off + size > end) return None // malformed stbl
        typ match {
          case "stsz" if stsz.isEmpty => stsz = Some(((off + hdr).toInt, (off + size).toInt))
          case "stco" if stco.isEmpty => stco = Some(((off + hdr).toInt, (off + size).toInt))
          case _ => ()
        }
        off += size
      }
      for {
        (szS, szE) <- stsz
        (coS, coE) <- stco
        sizes <- parseStsz(bytes, szS, szE)
        offsets <- parseStco(bytes, coS, coE, sizes)
      } yield (sizes, offsets)
    }
    def walk(start: Long, end: Long, depth: Int): Unit = {
      var off = start
      while (off + 8 <= end && found.isEmpty) {
        val size32 = u32(bytes, off.toInt)
        val typ = fourcc(bytes, off.toInt + 4)
        val (size, hdr) =
          if (size32 == 1L && off + 16 <= end)
            ((u32(bytes, off.toInt + 8) << 32) | u32(bytes, off.toInt + 12), 16L)
          else if (size32 == 0L) (end - off, 8L)
          else (size32, 8L)
        if (size < hdr || off + size > end) return // malformed: stop this level
        typ match {
          case "stbl" => found = scanStbl(off + hdr, off + size)
          case t if Containers(t) && depth < 8 => walk(off + hdr, off + size, depth + 1)
          case _ => ()
        }
        off += size
      }
    }
    walk(0L, bytes.length.toLong, 0)
    found
  }

  /** stsz payload: verflags(4) sample_size(4) count(4) [sizes]; a nonzero
    * sample_size means uniform (no table). */
  private def parseStsz(b: Array[Byte], s: Int, e: Int): Option[Array[Long]] = {
    if (s + 12 > e) return None
    val uniform = u32(b, s + 4)
    val count = u32(b, s + 8)
    if (count < 0 || count > MaxSamples) return None
    if (uniform != 0L) Some(Array.fill(count.toInt)(uniform))
    else if (s + 12 + 4L * count > e) None
    else Some(Array.tabulate(count.toInt)(i => u32(b, s + 12 + 4 * i)))
  }

  /** stco payload: verflags(4) entry_count(4) offsets(4 each). One entry
    * per sample, or one single chunk of consecutive samples. */
  private def parseStco(b: Array[Byte], s: Int, e: Int,
      sizes: Array[Long]): Option[Array[Long]] = {
    if (s + 8 > e) return None
    val entries = u32(b, s + 4)
    if (entries < 0 || entries > MaxSamples || s + 8 + 4L * entries > e) return None
    if (entries == sizes.length.toLong)
      Some(Array.tabulate(sizes.length)(i => u32(b, s + 8 + 4 * i)))
    else if (entries == 1L && sizes.nonEmpty) {
      val base = u32(b, s + 8)
      val out = new Array[Long](sizes.length)
      var acc = base
      var i = 0
      while (i < sizes.length) { out(i) = acc; acc += sizes(i); i += 1 }
      Some(out)
    } else None // general stsc interleave: out of scope
  }

  /** Decode every located sample as a baseline JPEG. A blob without a
    * parseable sample table yields zero rows; a damaged sample yields a
    * flagged row. */
  def frames(id: Long, bytes: Array[Byte]): Seq[Frame] =
    sampleTable(bytes) match {
      case None => Seq.empty
      case Some((sizes, offsets)) =>
        sizes.indices.map { i =>
          val off = offsets(i); val sz = sizes(i)
          if (off < 0 || sz <= 0 || sz > (1L << 26) || off + sz > bytes.length)
            Frame(id, i.toLong, off, sz, decode_ok = false, None, None, None)
          else {
            val slice = java.util.Arrays.copyOfRange(
              bytes, off.toInt, (off + sz).toInt)
            JpegDecoder.decode(slice) match {
              case Some(dec) =>
                Frame(id, i.toLong, off, sz, decode_ok = true,
                  Some(dec.width.toLong), Some(dec.height.toLong),
                  Some(dec.pixels.map("%02X".format(_)).mkString))
              case None =>
                Frame(id, i.toLong, off, sz, decode_ok = false, None, None, None)
            }
          }
        }
    }

  /** DataFrame plumbing: (media_id, media BINARY) → exploded frame rows.
    * Null blobs decode to zero frames. */
  def mjpegFrames(media: DataFrame): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          frames(r.getLong(0), bytes)
        }
      }
  }
}
