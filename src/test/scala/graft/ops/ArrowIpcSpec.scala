package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** ArrowIpc vs arrow-java's OWN stream writer (the differential the
  * decoder exists for), plus the decoder-family fuzz discipline:
  * truncation at every byte offset and a byte-flip sweep must return,
  * never throw. */
class ArrowIpcSpec extends AnyFunSuite {

  private def write(
      rows: Seq[(Long, Option[Long], Option[Double], Option[String])],
      batchRows: Int): Array[Byte] = {
    System.setProperty("io.netty.tryReflectionSetAccessible", "true")
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector._
    import org.apache.arrow.vector.ipc.ArrowStreamWriter
    import org.apache.arrow.vector.types.FloatingPointPrecision
    import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}
    val schema = new Schema(java.util.Arrays.asList(
      new Field("k", FieldType.notNullable(new ArrowType.Int(64, true)), null),
      new Field("v", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("f", FieldType.nullable(
        new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)), null),
      new Field("s", FieldType.nullable(new ArrowType.Utf8()), null)))
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new java.io.ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    try {
      w.start()
      rows.grouped(math.max(batchRows, 1)).foreach { chunk =>
        root.allocateNew()
        val kv = root.getVector("k").asInstanceOf[BigIntVector]
        val vv = root.getVector("v").asInstanceOf[BigIntVector]
        val fv = root.getVector("f").asInstanceOf[Float8Vector]
        val sv = root.getVector("s").asInstanceOf[VarCharVector]
        chunk.zipWithIndex.foreach { case ((k, v, f, s), i) =>
          kv.setSafe(i, k)
          v match { case Some(x) => vv.setSafe(i, x); case None => vv.setNull(i) }
          f match { case Some(x) => fv.setSafe(i, x); case None => fv.setNull(i) }
          s match {
            case Some(x) => sv.setSafe(i, x.getBytes("UTF-8"))
            case None => sv.setNull(i)
          }
        }
        root.setRowCount(chunk.size)
        w.writeBatch()
      }
      w.end()
      bos.toByteArray
    } finally { w.close(); root.close(); alloc.close() }
  }

  private def mkRows(nr: Int) = (1 to nr).map { i =>
    val k = i.toLong
    (k,
      if (k % 7 == 0) None else Some((k * 31) % 97),
      if (k % 13 == 0) None else Some((k % 40).toDouble / 8.0),
      if (k % 9 == 0) None else Some(s"prefix-${k % 37}-value-${(k * 13) % 101}"))
  }

  test("multi-batch stream: every fact matches arrow-java's writer") {
    val rows = mkRows(2500)
    val bytes = write(rows, 700) // 4 batches, last partial
    val d = ArrowIpc.decode(bytes)
    assert(d.ok && d.n_batches == 4L)
    val byName = d.cols.map(c => c.name -> c).toMap
    assert(d.cols.map(_.name) == Seq("k", "v", "f", "s"))
    val k = byName("k")
    assert((k.typ, k.n_values, k.n_nulls, k.sum_long, k.min_long, k.max_long)
      == ("int64", 2500L, 0L, rows.map(_._1).sum, 1L, 2500L))
    val v = byName("v")
    val vs = rows.flatMap(_._2)
    assert((v.n_values, v.n_nulls, v.sum_long, v.min_long, v.max_long)
      == (vs.size.toLong, rows.size - vs.size.toLong, vs.sum, vs.min, vs.max))
    val f = byName("f")
    val fs = rows.flatMap(_._3)
    assert((f.typ, f.n_values, f.n_nulls, f.sum_double)
      == ("float64", fs.size.toLong, rows.size - fs.size.toLong, fs.sum))
    val sC = byName("s")
    val ss = rows.flatMap(_._4)
    assert((sC.typ, sC.n_values, sC.sum_len)
      == ("utf8", ss.size.toLong, ss.map(_.length.toLong).sum))
  }

  test("all-null and no-null columns decode; empty stream (schema+EOS only)") {
    val rows = (1 to 50).map(i => (i.toLong, Option.empty[Long],
      Option.empty[Double], Some("x" * i)))
    val d = ArrowIpc.decode(write(rows, 1000))
    val byName = d.cols.map(c => c.name -> c).toMap
    assert(d.ok && byName("v").n_nulls == 50L && byName("v").n_values == 0L)
    assert(byName("v").min_long == Long.MaxValue) // identity sentinels
    assert(byName("s").sum_len == (1 to 50).sum.toLong)
    val empty = ArrowIpc.decode(write(Seq.empty, 1000))
    assert(empty.ok && empty.n_batches == 0L &&
      empty.cols.forall(c => c.n_values == 0L && c.n_nulls == 0L))
  }

  test("garbage, bad magic, and missing EOS route to ok = false") {
    assert(!ArrowIpc.decode(Array.emptyByteArray).ok)
    assert(!ArrowIpc.decode("not arrow at all".getBytes).ok)
    val good = write(mkRows(100), 40)
    assert(!ArrowIpc.decode(java.util.Arrays.copyOf(good, good.length - 8)).ok)
  }

  test("fuzz: truncation at every offset and byte-flip sweep never throw") {
    val good = write(mkRows(300), 120)
    def probe(tag: String)(body: => Any): Unit =
      try { body; () } catch {
        case e: Throwable =>
          fail(s"$tag threw ${e.getClass.getName}: ${e.getMessage}")
      }
    for (cut <- 0 until good.length)
      probe(s"cut=$cut")(ArrowIpc.decode(java.util.Arrays.copyOf(good, cut)))
    for (i <- good.indices) {
      val mut = good.clone(); mut(i) = (mut(i) ^ 0xff).toByte
      probe(s"flip=$i")(ArrowIpc.decode(mut))
    }
  }
}
