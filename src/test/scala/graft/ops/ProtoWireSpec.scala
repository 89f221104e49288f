package graft.ops

import java.io.ByteArrayOutputStream

import graft.SparkSpec

// The container ships the real protobuf runtime only as orc-core's shaded
// relocation — same library, different package; used here (test-only) the
// way snappy-java/lz4-java/zstd-jni cross-validate their decoders.
import org.apache.orc.protobuf.CodedOutputStream

/** ProtoWire vs the real protobuf encoder: every wire type round-trips,
  * every malformation degrades to None (never a throw). */
class ProtoWireSpec extends SparkSpec {

  private def encode(f: CodedOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val cos = CodedOutputStream.newInstance(bos)
    f(cos)
    cos.flush()
    bos.toByteArray
  }

  test("varint fields from the real encoder, incl. 10-byte negatives") {
    val b = encode { c =>
      c.writeInt32(1, 0)
      c.writeInt32(2, 127)
      c.writeInt32(3, 128)
      c.writeInt64(4, Long.MaxValue)
      c.writeInt64(5, -1L) // 10-byte varint
      c.writeInt32(6, -5) // sign-extended to 64 bits on the wire
    }
    val fs = ProtoWire.decode(b).get
    assert(fs.map(f => (f.fieldNo, f.wireType, f.num)) == Seq(
      (1, 0, 0L), (2, 0, 127L), (3, 0, 128L), (4, 0, Long.MaxValue),
      (5, 0, -1L), (6, 0, -5L)))
  }

  test("zigzag matches the real sint encoding") {
    val b = encode { c =>
      c.writeSInt32(1, -1)
      c.writeSInt64(2, 12345)
      c.writeSInt64(3, Long.MinValue)
    }
    val fs = ProtoWire.decode(b).get
    assert(fs.map(f => ProtoWire.zigzag(f.num)) ==
      Seq(-1L, 12345L, Long.MinValue))
  }

  test("fixed32/fixed64 are little-endian") {
    val b = encode { c =>
      c.writeFixed32(1, 0x01020304)
      c.writeFixed64(2, 0x0102030405060708L)
      c.writeFixed32(3, -1) // 0xFFFFFFFF, must zero-extend in num
    }
    val fs = ProtoWire.decode(b).get
    assert(fs.map(f => (f.wireType, f.num)) == Seq(
      (5, 0x01020304L), (1, 0x0102030405060708L), (5, 0xffffffffL)))
  }

  test("strings, bytes, nested messages, packed repeateds") {
    val inner = encode(_.writeInt32(1, 77))
    val b = encode { c =>
      c.writeString(1, "doc7")
      c.writeByteArray(2, Array[Byte](0, -1, 3))
      c.writeByteArray(6, inner)
      // packed repeated uint32 [5, 300]: tag + total size + raw varints
      c.writeTag(5, 2)
      c.writeUInt32NoTag(3)
      c.writeUInt32NoTag(5)
      c.writeUInt32NoTag(300)
    }
    val fs = ProtoWire.decode(b).get
    assert(new String(fs(0).bytes, "UTF-8") == "doc7")
    assert(fs(1).bytes.toSeq == Seq[Byte](0, -1, 3))
    assert(ProtoWire.decode(fs(2).bytes).get.head.num == 77L)
    assert(ProtoWire.packedVarints(fs(3).bytes).get == Seq(5L, 300L))
  }

  test("malformed buffers return None, never throw") {
    // truncated varint value
    assert(ProtoWire.decode(Array[Byte](0x08, -1)).isEmpty)
    // truncated tag
    assert(ProtoWire.decode(Array[Byte](-1)).isEmpty)
    // LEN longer than remaining
    assert(ProtoWire.decode(Array[Byte](0x0a, 5, 1, 2)).isEmpty)
    // LEN whose 5-byte varint length overflows Int (0x7FFFFFFF + carry)
    assert(ProtoWire.decode(
      Array[Byte](0x0a, -1, -1, -1, -1, 0x1f, 0)).isEmpty)
    // deprecated group wire types 3 and 4, reserved 6 and 7
    assert(ProtoWire.decode(Array[Byte](0x0b)).isEmpty)
    assert(ProtoWire.decode(Array[Byte](0x0c)).isEmpty)
    assert(ProtoWire.decode(Array[Byte](0x0e)).isEmpty)
    assert(ProtoWire.decode(Array[Byte](0x0f)).isEmpty)
    // field number 0
    assert(ProtoWire.decode(Array[Byte](0x00, 0x01)).isEmpty)
    // fixed64/fixed32 truncated
    assert(ProtoWire.decode(Array[Byte](0x09, 1, 2)).isEmpty)
    assert(ProtoWire.decode(Array[Byte](0x0d, 1, 2)).isEmpty)
    // varint longer than 10 bytes
    assert(ProtoWire.decode(
      Array.fill[Byte](12)(-1).updated(0, 0x08.toByte)).isEmpty)
    // malformed packed payload
    assert(ProtoWire.packedVarints(Array[Byte](-1)).isEmpty)
    // empty buffer is a VALID empty message
    assert(ProtoWire.decode(Array.emptyByteArray).get.isEmpty)
  }

  test("fields() routes malformed blobs and expands nested/packed paths") {
    import spark.implicits._
    val good = encode { c =>
      c.writeInt32(1, 200)
      c.writeByteArray(6, encode(_.writeInt32(1, 9)))
      c.writeTag(5, 2)
      c.writeUInt32NoTag(2)
      c.writeUInt32NoTag(4)
      c.writeUInt32NoTag(6)
    }
    val bad = Array[Byte](0x08, -1)
    val df = Seq((1L, good), (2L, bad)).toDF("media_id", "media")
    val rows = ProtoWire.fields(df, recurseInto = Set(6),
        packedVarintsAt = Set(5))
      .collect().map(r => (r.media_id, r.path, r.num)).sortBy(_._2)
    assert(rows.forall(_._1 == 1L), "malformed blob must contribute no rows")
    assert(rows.map(_._2).toSeq == Seq("1", "5", "5#0", "5#1", "6", "6.1"))
    assert(rows.collect { case (_, "6.1", v) => v }.head == 9L)
    assert(rows.collect { case (_, p, v) if p.startsWith("5#") => v }.toSeq
      == Seq(4L, 6L))
  }
}
