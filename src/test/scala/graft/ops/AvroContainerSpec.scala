package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class AvroContainerSpec extends AnyFunSuite {

  private val schemaJson =
    """{"type":"record","name":"r","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"},
      |{"name":"score","type":"double"},
      |{"name":"tags","type":{"type":"array","items":"long"}}]}""".stripMargin

  private def write(recs: Seq[AvroContainer.AvroRec], codec: String,
      syncEvery: Int = Int.MaxValue): Array[Byte] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    val bos = new java.io.ByteArrayOutputStream()
    val writer = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[
        org.apache.avro.generic.GenericRecord](schema))
    writer.setCodec(codec match {
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
      if ((i + 1) % syncEvery == 0 && i != recs.length - 1) writer.sync()
    }
    writer.close()
    bos.toByteArray
  }

  private def mkRecs(n: Int): Seq[AvroContainer.AvroRec] =
    (0 until n).map { i =>
      AvroContainer.AvroRec(
        i * 7L - 3, // negative ids exercise zigzag sign handling
        ("abcdefgh".charAt(i % 8)).toString * (i % 6),
        (i - n / 2) / 64.0,
        Array.tabulate(i % 5)(j => j * 31L - i))
    }

  private def assertSame(a: Vector[AvroContainer.AvroRec],
      b: Seq[AvroContainer.AvroRec]): Unit = {
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.id === y.id)
      assert(x.name === y.name)
      assert(x.score === y.score)
      assert(java.util.Arrays.equals(x.tags, y.tags))
    }
  }

  test("reference-writer round-trip across codecs") {
    val recs = mkRecs(23)
    for (codec <- Seq("null", "deflate", "snappy")) {
      val bytes = write(recs, codec)
      val d = AvroContainer.decode(bytes).get
      assert(d.codec === codec)
      assert(d.fieldsOk, "schema field order probe")
      assertSame(d.records, recs)
    }
  }

  test("explicit sync every 5 records produces ceil(n/5) blocks") {
    for (n <- Seq(5, 6, 14, 20)) {
      val bytes = write(mkRecs(n), "deflate", syncEvery = 5)
      val d = AvroContainer.decode(bytes).get
      assert(d.nBlocks === (n + 4) / 5, s"n=$n")
      assert(d.records.length === n)
    }
  }

  test("empty container (zero records) decodes to zero blocks") {
    val d = AvroContainer.decode(write(Nil, "null")).get
    assert(d.records.isEmpty)
    assert(d.nBlocks === 0)
  }

  test("degrade routes: truncations, bad magic, sync mismatch, bad codec") {
    val bytes = write(mkRecs(12), "snappy", syncEvery = 5)
    assert(AvroContainer.decode(Array.emptyByteArray).isEmpty)
    assert(AvroContainer.decode("Obj".getBytes).isEmpty)
    val badMagic = bytes.clone(); badMagic(3) = 2
    assert(AvroContainer.decode(badMagic).isEmpty)
    for (n <- 0 until bytes.length by 3)
      assert(AvroContainer.decode(java.util.Arrays.copyOf(bytes, n)).isEmpty,
        s"prefix $n")
    // corrupt the trailing per-block sync (last 16 bytes) — must be caught
    val badSync = bytes.clone()
    badSync(bytes.length - 1) = (badSync(bytes.length - 1) ^ 0x40).toByte
    assert(AvroContainer.decode(badSync).isEmpty)
  }

  test("snappy CRC gates: payload bit flips never yield different records") {
    val recs = mkRecs(9)
    val bytes = write(recs, "snappy")
    for (i <- 60 until bytes.length - 17 by 5) {
      val mut = bytes.clone()
      mut(i) = (mut(i) ^ 0x08).toByte
      AvroContainer.decode(mut) match {
        case None => () // degraded, fine
        case Some(d) =>
          // a flip in a don't-care byte may still decode — but never to
          // different content with a passing CRC
          if (d.records.length == recs.length &&
              d.codec == "snappy" && d.fieldsOk)
            assertSame(d.records, recs)
      }
    }
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    // widens the every-3rd-offset truncation above to EVERY offset, plus a
    // full whole-byte flip sweep (the DecoderFuzzSpec discipline)
    val good = write(mkRecs(12), "deflate", syncEvery = 5)
    def dec(b: Array[Byte]): Any = AvroContainer.decode(b)
    def probe(tag: String)(body: => Any): Unit =
      try { body; () } catch {
        case e: Throwable =>
          fail(s"$tag threw ${e.getClass.getName}: ${e.getMessage}")
      }
    for (cut <- 0 until good.length)
      probe(s"cut=$cut")(dec(java.util.Arrays.copyOf(good, cut)))
    for (i <- good.indices) {
      val mut = good.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      probe(s"flip=$i")(dec(mut))
    }
  }
}
