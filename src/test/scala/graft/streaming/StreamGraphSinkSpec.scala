package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

class StreamGraphSinkSpec extends SparkSpec {
  import spark.implicits._

  private def edge(src: String, dst: String) = ("N", src, "N", dst, "R")

  test("streamed edges merge with MERGE dedup semantics across micro-batches") {
    val base = Files.createTempDirectory("graft-sgs").toString
    // batch files arrive over time; duplicates within and across batches
    Seq(edge("a", "b"), edge("a", "b"), edge("b", "c"))
      .toDF("src_label", "src", "dst_label", "dst", "rel")
      .write.parquet(s"$base/in/f0")
    Seq(edge("a", "b"), edge("c", "d"))
      .toDF("src_label", "src", "dst_label", "dst", "rel")
      .write.parquet(s"$base/in/f1")
    val schema = spark.read.parquet(s"$base/in/f0").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$base/in/*")
    val q = StreamGraphSink.start(src, s"$base/table", s"$base/ckpt")
    q.awaitTermination(120000)
    val table = spark.read.parquet(s"$base/table")
    assert(table.count() == 3) // a→b, b→c, c→d — all duplicates collapsed
    // re-merging the same data is a no-op (idempotent replay)
    StreamGraphSink.mergeBatch(spark,
      Seq(edge("a", "b")).toDF("src_label", "src", "dst_label", "dst", "rel"), s"$base/table")
    assert(spark.read.parquet(s"$base/table").count() == 3)
  }
}
