package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Protocol Buffers wire-format decoder, hand-parsed from the PUBLIC
  * encoding specification (protobuf.dev/programming-guides/encoding):
  * the schema-less "wire walk" a pipeline needs to ingest protobuf-framed
  * event/log payloads without compiling descriptors — the same posture as
  * [[ParquetFooter]]'s thrift compact-protocol reader, one format layer
  * down from the Avro/ORC/parquet containers the catalog already decodes.
  *
  * Covered: base-128 varints (10-byte max), the four live wire types —
  * 0 VARINT, 1 I64 (fixed64), 2 LEN (length-delimited: strings, bytes,
  * nested messages, packed repeateds), 5 I32 (fixed32) — plus the typed
  * views callers layer on top: ZigZag for sint32/64, packed-varint lists,
  * and recursive nested-message decode.
  *
  * Degrade contract (the FLAC/snappy/LZ4 lesson applied from the start):
  * a malformed buffer — truncated varint, varint longer than 10 bytes,
  * LEN length overrunning the buffer or overflowing Int, field number 0,
  * deprecated group wire types 3/4 or reserved 6/7 — returns None from
  * decode(), never throws; one bad blob costs its row, never the task.
  */
object ProtoWire {

  /** One decoded field occurrence. Exactly one of the value slots is
    * populated, by wire type: varint (type 0) and i64 (type 1) in `num`,
    * i32 (type 5) in `num` (zero-extended), LEN (type 2) in `bytes`. */
  final case class Field(fieldNo: Int, wireType: Int, num: Long,
      bytes: Array[Byte])

  /** ZigZag decode (sint32/sint64 view of a varint). */
  def zigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  /** Varint at `pos`; returns (value, bytesConsumed) or None on
    * truncation / >10-byte runaway. Value is the raw two's-complement
    * 64-bit accumulation (unsigned semantics live in the caller's view). */
  def varint(b: Array[Byte], pos: Int): Option[(Long, Int)] = {
    var v = 0L
    var shift = 0
    var i = pos
    while (i < b.length && shift <= 63) {
      val x = b(i).toLong
      v |= (x & 0x7fL) << shift
      if ((x & 0x80L) == 0L) return Some((v, i - pos + 1))
      shift += 7
      i += 1
    }
    None
  }

  /** Top-level message decode: the ordered field-occurrence list, or
    * None if any record is malformed. */
  def decode(b: Array[Byte]): Option[Seq[Field]] = {
    val out = ArrayBuffer.empty[Field]
    var i = 0
    while (i < b.length) {
      varint(b, i) match {
        case None => return None
        case Some((tag, n)) =>
          i += n
          val fieldNo = (tag >>> 3).toLong
          val wt = (tag & 7L).toInt
          if (fieldNo <= 0L || fieldNo > Int.MaxValue) return None
          wt match {
            case 0 =>
              varint(b, i) match {
                case None => return None
                case Some((v, m)) =>
                  out += Field(fieldNo.toInt, 0, v, null); i += m
              }
            case 1 =>
              if (i + 8 > b.length) return None
              var v = 0L
              var k = 7
              while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
              out += Field(fieldNo.toInt, 1, v, null); i += 8
            case 2 =>
              varint(b, i) match {
                case None => return None
                case Some((len, m)) =>
                  i += m
                  // Long accumulate, then bound: a 4-byte length encoding
                  // 0x7FFFFFFF must not wrap past the buffer check.
                  if (len < 0L || len > (b.length - i).toLong) return None
                  out += Field(fieldNo.toInt, 2, len,
                    java.util.Arrays.copyOfRange(b, i, i + len.toInt))
                  i += len.toInt
              }
            case 5 =>
              if (i + 4 > b.length) return None
              var v = 0L
              var k = 3
              while (k >= 0) { v = (v << 8) | (b(i + k) & 0xffL); k -= 1 }
              out += Field(fieldNo.toInt, 5, v, null); i += 4
            case _ => return None // groups (3/4) and reserved (6/7)
          }
      }
    }
    Some(out.toSeq)
  }

  /** Packed-repeated varint view of a LEN payload. */
  def packedVarints(b: Array[Byte]): Option[Seq[Long]] = {
    val out = ArrayBuffer.empty[Long]
    var i = 0
    while (i < b.length) {
      varint(b, i) match {
        case None => return None
        case Some((v, n)) => out += v; i += n
      }
    }
    Some(out.toSeq)
  }

  /** One field occurrence as a flat Dataset row. `path` is the dotted
    * field-number path ("1"; nested "6.1"; packed element "5#2"); for
    * LEN fields `num` is 0 and `len`/`bsum` carry the payload length and
    * unsigned byte sum, for scalar fields `num` carries the value. */
  final case class ProtoFieldRow(media_id: Long, path: String,
      wire_type: Int, num: Long, len: Long, bsum: Long)

  /** Decode each (media_id, media) blob into its field-occurrence rows.
    * LEN fields whose number is in `recurseInto` are ALSO decoded as
    * nested messages (recursively, dotted paths); numbers in
    * `packedVarintsAt` are ALSO expanded as packed varint elements. A
    * malformed blob (or nested payload / packed payload) contributes no
    * rows for the failed scope — the route contract, never a crash. */
  def fields(media: DataFrame, recurseInto: Set[Int] = Set.empty,
      packedVarintsAt: Set[Int] = Set.empty): Dataset[ProtoFieldRow] = {
    implicit val enc = Encoders.product[ProtoFieldRow]
    media.select(col("media_id").cast("long"), col("media"))
      .mapPartitions { (it: Iterator[Row]) =>
        it.flatMap { row =>
          val bytes = Option(row.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val out = ArrayBuffer.empty[ProtoFieldRow]
          def walk(b: Array[Byte], prefix: String): Boolean =
            decode(b) match {
              case None => false
              case Some(fs) =>
                fs.foreach { f =>
                  val p = prefix + f.fieldNo
                  if (f.wireType == 2) {
                    var bs = 0L
                    f.bytes.foreach(x => bs += (x & 0xff))
                    out += ProtoFieldRow(row.getLong(0), p, 2, 0L,
                      f.bytes.length.toLong, bs)
                    if (recurseInto(f.fieldNo)) walk(f.bytes, p + ".")
                    if (packedVarintsAt(f.fieldNo))
                      packedVarints(f.bytes).foreach(_.zipWithIndex.foreach {
                        case (v, k) => out += ProtoFieldRow(row.getLong(0),
                          s"$p#$k", 0, v, 0L, 0L)
                      })
                  } else out += ProtoFieldRow(row.getLong(0), p,
                    f.wireType, f.num, 0L, 0L)
                }
                true
            }
          if (walk(bytes, "")) out else Nil
        }
      }
  }
}
