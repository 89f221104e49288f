package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** TAR (ustar, POSIX.1-1988) shard member indexing — the WebDataset layout:
  * large-scale multimodal training corpora ship as tar "shards" whose members
  * pair sample payloads by basename ("000123.jpg" + "000123.cls"). Training
  * loaders never unpack shards to a filesystem; they read a member INDEX
  * (name, byte offset, size) and then range-read payloads directly. This op
  * builds that index from the raw shard bytes.
  *
  * Pure byte arithmetic end to end (the header is ASCII text + octal-ASCII
  * numeric fields), so the decode is REAL with zero codec libraries — the
  * same posture as the PPM/BMP/WAV decoders in [[Multimodal]]:
  *
  *  - a header is one 512-byte block: name[100] at 0 (NUL-terminated),
  *    size[12] at 124 and chksum[8] at 148 (both octal ASCII), typeflag at
  *    156, magic "ustar" at 257;
  *  - member data follows, NUL-padded up to the next 512 boundary;
  *  - the archive ends at the first all-zero block (spec says two);
  *  - chksum is the byte sum of the header with the chksum field itself
  *    read as eight 0x20 bytes. A mismatch marks the member corrupt
  *    (`checksum_ok = false`) and the walk CONTINUES at the next header —
  *    one flipped byte in a 100 TB scrape must cost one sample, not the
  *    shard (same honesty rule as the corrupt-blob paths in [[Multimodal]]).
  *
  * Scale shape: one shard decodes independently of every other — the op is
  * a narrow per-row flatMap (shard → members), so shards parallelize
  * perfectly across executors and nothing shuffles until the caller's own
  * aggregation. Shard blobs are bounded (WebDataset convention ~100 MB-1 GB)
  * so per-task memory is the one shard being walked.
  */
object TarIndex {

  /** One archive member: byte offset of its HEADER block within the shard
    * (data begins at `offset + 512`), payload size, and checksum validity. */
  final case class TarMember(
      shard_id: Long,
      name: String,
      offset: Long,
      size: Long,
      checksum_ok: Boolean)

  /** Parse octal-ASCII: skip leading NUL/space pad, accumulate digits, stop
    * at the first non-octal byte (the spec's NUL/space terminator). */
  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var i = off
    val end = math.min(off + len, b.length)
    while (i < end && (b(i) == ' '.toByte || b(i) == 0)) i += 1
    var v = 0L
    while (i < end && b(i) >= '0'.toByte && b(i) <= '7'.toByte) {
      v = v * 8 + (b(i) - '0'.toByte); i += 1
    }
    v
  }

  /** Walk one shard's bytes into its member index. Stops at the first
    * all-zero block or at a truncated trailing header. */
  def parse(shardId: Long, bytes: Array[Byte]): Seq[TarMember] = {
    val out = Seq.newBuilder[TarMember]
    var off = 0
    var done = false
    while (!done && off + 512 <= bytes.length) {
      var allZero = true
      var i = 0
      while (allZero && i < 512) { if (bytes(off + i) != 0) allZero = false; i += 1 }
      if (allZero) done = true
      else {
        val nameEnd = {
          var j = off
          while (j < off + 100 && bytes(j) != 0) j += 1
          j
        }
        val name = new String(bytes, off, nameEnd - off, "US-ASCII")
        val size = octal(bytes, off + 124, 12)
        val stored = octal(bytes, off + 148, 8)
        var sum = 0L
        var k = 0
        while (k < 512) {
          sum += (if (k >= 148 && k < 156) 0x20 else bytes(off + k) & 0xff)
          k += 1
        }
        // A corrupt 12-digit octal size can reach ~8^12; clamp the advance
        // to the remaining bytes (Long arithmetic, no toInt overflow) so one
        // flipped byte stops the walk instead of throwing and killing the task.
        if (size < 0L || size > bytes.length.toLong - off - 512L) done = true
        else {
          out += TarMember(shardId, name, off.toLong, size, sum == stored)
          off += 512 + (((size + 511L) / 512L) * 512L).toInt
        }
      }
    }
    out.result()
  }

  /** DataFrame plumbing: (media_id, media BINARY) shards → exploded member
    * index rows. Null blobs (missing scrape) index to zero members. */
  def index(shards: DataFrame): Dataset[TarMember] = {
    implicit val enc = Encoders.product[TarMember]
    shards.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { r =>
          val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
          parse(r.getLong(0), bytes)
        }
      }
  }
}
