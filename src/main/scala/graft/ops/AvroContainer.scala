package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col

/** Hand-parsed Avro Object Container File reader — the row-major
  * sibling of the hand-parsed parquet footer (x176) and the fifth
  * member of the hand-decoded codec/container family (snappy x171, LZ4
  * x172, DEFLATE x174, bzip2 x177). Avro OCF is what streaming
  * ingestion lands before columnar compaction, so a pipeline that
  * claims ingest coverage has to read it, not shell out to it.
  *
  * Implemented from the public Avro 1.x specification (container file
  * layout + binary encoding):
  *
  *   magic `Obj\1`; file metadata as an Avro map<string,bytes> (block
  *   count as zigzag varint — negative count means |count| entries
  *   preceded by a byte-size long — 0 terminates), carrying
  *   `avro.schema` (JSON) and `avro.codec`; a 16-byte sync marker;
  *   then data blocks: record-count varint, compressed-size varint,
  *   payload, and a per-block sync that must equal the header's.
  *
  * Binary encoding of the fixed test schema (record of `id: long`,
  * `name: string`, `score: double`, `tags: array<long>`): longs are
  * zigzag varints, strings length-prefixed UTF-8, doubles 8-byte
  * little-endian IEEE-754, arrays a series of counted blocks with a 0
  * terminator (negative count ⇒ a byte-size long precedes the items).
  *
  * Codecs route through the repo's own decoders — `deflate` is raw
  * DEFLATE via [[DeflateBlock.decompress]], `snappy` is
  * [[SnappyBlock.decompress]] plus Avro's trailing big-endian CRC-32 of
  * the UNCOMPRESSED payload, verified here.
  *
  * Cross-validation: the round-trip writes with avro-java's
  * `DataFileWriter` (the reference implementation, on the Spark
  * classpath) and decodes with THIS parser; whatever block layout,
  * metadata order, or codec framing the reference writer emits must
  * decode to the records handed in. Structural violations — bad magic,
  * a block sync that differs from the header's, a varint running past
  * the buffer, a payload that doesn't parse to exactly `count` records,
  * an unknown codec, a snappy CRC mismatch — return None: a corrupt
  * container degrades, never kills the task.
  */
object AvroContainer {

  final case class AvroRec(id: Long, name: String, score: Double, tags: Array[Long])

  final case class AvroDecoded(
      records: Vector[AvroRec], nBlocks: Int, codec: String, fieldsOk: Boolean)

  final case class AvroRoundTrip(
      media_id: Long, n_records: Int, n_blocks: Int, codec: String,
      match_input: Boolean, fields_ok: Boolean,
      sum_ids: Long, sum_name_bytes: Long, sum_tags: Long, sum_score_x64: Long)

  private val MaxLen = 1 << 26 // 64 MiB guard on any single length

  private final class ByteReader(bytes: Array[Byte], var pos: Int = 0) {
    var bad = false
    def remaining: Int = bytes.length - pos
    def u8(): Int = {
      if (bad || pos >= bytes.length) { bad = true; return 0 }
      val v = bytes(pos) & 0xFF; pos += 1; v
    }
    def take(n: Int): Array[Byte] = {
      if (bad || n < 0 || n > remaining) { bad = true; return Array.emptyByteArray }
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    /** Avro long: zigzag varint, ≤ 10 bytes. */
    def zigzag(): Long = {
      var shift = 0
      var acc = 0L
      var b = u8()
      while (!bad && (b & 0x80) != 0) {
        acc |= (b & 0x7FL) << shift
        shift += 7
        if (shift > 63) { bad = true; return 0L }
        b = u8()
      }
      if (bad) return 0L
      acc |= (b & 0x7FL) << shift
      (acc >>> 1) ^ -(acc & 1)
    }
    def doubleLe(): Double = {
      if (bad || remaining < 8) { bad = true; return 0d }
      var acc = 0L
      var i = 0
      while (i < 8) { acc |= (bytes(pos + i) & 0xFFL) << (8 * i); i += 1 }
      pos += 8
      java.lang.Double.longBitsToDouble(acc)
    }
    def lenPrefixed(): Array[Byte] = {
      val n = zigzag()
      if (bad || n < 0 || n > MaxLen) { bad = true; return Array.emptyByteArray }
      take(n.toInt)
    }
    def string(): String = new String(lenPrefixed(), java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The canonical field-order probe: the writer normalizes the schema
    * JSON, so the contract checked is ORDER (id before name before
    * score before tags in the "fields" list), not byte layout. Probes
    * the full `"name":"<field>"` declaration — a bare `"name"` probe
    * would match the record-level name key first. */
  private def fieldsInOrder(schema: String): Boolean = {
    val compact = schema.replaceAll("\\s", "")
    val names = Seq("id", "name", "score", "tags")
      .map(f => compact.indexOf(s""""name":"$f""""))
    names.forall(_ >= 0) && names == names.sorted
  }

  private def longArray(br: ByteReader): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var cnt = br.zigzag()
    while (!br.bad && cnt != 0) {
      if (cnt < 0) { cnt = -cnt; br.zigzag() } // byte-size long, unused here
      if (cnt > MaxLen) { br.bad = true; return Array.emptyLongArray }
      var i = 0L
      while (i < cnt && !br.bad) { out += br.zigzag(); i += 1 }
      cnt = br.zigzag()
    }
    out.toArray
  }

  def decode(bytes: Array[Byte]): Option[AvroDecoded] = {
    val br = new ByteReader(bytes)
    if (!java.util.Arrays.equals(br.take(4), Array[Byte]('O', 'b', 'j', 1)))
      return None
    // file metadata map<string, bytes>
    var schema: String = null
    var codec = "null"
    var cnt = br.zigzag()
    while (!br.bad && cnt != 0) {
      if (cnt < 0) { cnt = -cnt; br.zigzag() }
      if (cnt > MaxLen) return None
      var i = 0L
      while (i < cnt && !br.bad) {
        val key = br.string()
        val value = br.lenPrefixed()
        val v = new String(value, java.nio.charset.StandardCharsets.UTF_8)
        if (key == "avro.schema") schema = v
        if (key == "avro.codec") codec = v
        i += 1
      }
      cnt = br.zigzag()
    }
    if (br.bad || schema == null) return None
    val sync = br.take(16)
    if (br.bad) return None
    val records = Vector.newBuilder[AvroRec]
    var nBlocks = 0
    while (!br.bad && br.remaining > 0) {
      val nRec = br.zigzag()
      val size = br.zigzag()
      if (br.bad || nRec < 0 || nRec > MaxLen || size < 0 || size > MaxLen)
        return None
      val payload = br.take(size.toInt)
      if (br.bad) return None
      val plain: Array[Byte] = codec match {
        case "null" => payload
        case "deflate" =>
          DeflateBlock.decompress(payload).getOrElse(return None)
        case "snappy" =>
          if (payload.length < 4) return None
          val data = java.util.Arrays.copyOfRange(payload, 0, payload.length - 4)
          val out = SnappyBlock.decompress(data).getOrElse(return None)
          val crc = new java.util.zip.CRC32
          crc.update(out)
          val want = java.nio.ByteBuffer
            .wrap(payload, payload.length - 4, 4).getInt & 0xFFFFFFFFL
          if (crc.getValue != want) return None
          out
        case _ => return None
      }
      val rb = new ByteReader(plain)
      var i = 0L
      while (i < nRec && !rb.bad) {
        val id = rb.zigzag()
        val name = rb.string()
        val score = rb.doubleLe()
        val tags = longArray(rb)
        if (!rb.bad) records += AvroRec(id, name, score, tags)
        i += 1
      }
      // exactly `count` records must consume exactly the payload
      if (rb.bad || rb.remaining != 0) return None
      if (!java.util.Arrays.equals(br.take(16), sync) || br.bad) return None
      nBlocks += 1
    }
    if (br.bad) return None
    Some(AvroDecoded(records.result(), nBlocks, codec, fieldsInOrder(schema)))
  }

  /** The x178 gate body: writes each row's records with avro-java
    * (codec per row, an explicit writer.sync() every 5 records so the
    * block count is deterministic = ceil(n/5)), decodes with OUR
    * parser, and reports content equality plus content sums the oracle
    * predicts arithmetically. Scores are multiples of 1/64 so the ×64
    * sum is an exact long. Narrow per-row flatMap, zero shuffle. */
  def roundTrip(payloads: DataFrame): Dataset[AvroRoundTrip] = {
    implicit val enc = Encoders.product[AvroRoundTrip]
    payloads.select(col("media_id").cast("long"), col("n").cast("int"),
        col("codec"))
      .mapPartitions { (it: Iterator[Row]) =>
        val schema = new org.apache.avro.Schema.Parser().parse(
          """{"type":"record","name":"r","fields":[
            |{"name":"id","type":"long"},{"name":"name","type":"string"},
            |{"name":"score","type":"double"},
            |{"name":"tags","type":{"type":"array","items":"long"}}]}"""
            .stripMargin)
        it.flatMap { row =>
          val m = row.getLong(0)
          val n = row.getInt(1)
          val codecName = row.getString(2)
          val recs = (0 until n).map { i =>
            val nameLen = 1 + i % 5
            val ch = (97 + (m + i) % 26).toChar
            val k = i % 4
            AvroRec(
              m * 100 + i,
              ch.toString * nameLen,
              ((m * 7 + i * 13) % 1024 - 512) / 64.0,
              Array.tabulate(k)(j => m + i.toLong * j))
          }
          val bos = new java.io.ByteArrayOutputStream()
          val writer = new org.apache.avro.file.DataFileWriter(
            new org.apache.avro.generic.GenericDatumWriter[
              org.apache.avro.generic.GenericRecord](schema))
          writer.setCodec(codecName match {
            case "deflate" => org.apache.avro.file.CodecFactory.deflateCodec(6)
            case "snappy" => org.apache.avro.file.CodecFactory.snappyCodec()
            case _ => org.apache.avro.file.CodecFactory.nullCodec()
          })
          writer.create(schema, bos)
          recs.zipWithIndex.foreach { case (r, i) =>
            val gr = new org.apache.avro.generic.GenericData.Record(schema)
            gr.put("id", r.id)
            gr.put("name", r.name)
            gr.put("score", r.score)
            gr.put("tags", java.util.Arrays.asList(r.tags.map(Long.box): _*))
            writer.append(gr)
            if (i % 5 == 4 && i != n - 1) writer.sync()
          }
          writer.close()
          decode(bos.toByteArray).map { d =>
            val sameLen = d.records.length == recs.length
            val matches = sameLen && d.records.zip(recs).forall { case (a, b) =>
              a.id == b.id && a.name == b.name && a.score == b.score &&
                java.util.Arrays.equals(a.tags, b.tags)
            }
            AvroRoundTrip(
              m, d.records.length, d.nBlocks, d.codec, matches, d.fieldsOk,
              d.records.map(_.id).sum,
              d.records.map(r => r.name.map(_.toLong).sum).sum,
              d.records.map(_.tags.sum).sum,
              d.records.map(r => math.round(r.score * 64)).sum)
          }
        }
      }
  }
}
