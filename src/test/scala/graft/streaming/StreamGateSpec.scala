package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamGateSpec extends SparkSpec {
  import spark.implicits._

  test("append replay emits every input row exactly once across micro-batches") {
    val in = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val out = StreamGate.replay(spark, in, "sgspec_append", files = 5, mode = "append")(identity)
    assert(out.count() == 100)
    assert(out.select("id").as[Long].collect().sorted.toSeq == (1L to 100L))
  }

  test("complete-mode aggregation over N batches equals the batch aggregate") {
    val in = (1L to 1000L).map(i => (i % 7, i)).toDF("k", "x")
    val out = StreamGate.replay(spark, in, "sgspec_agg", files = 4) {
      _.groupBy("k").agg(sum("x").as("s"), count(lit(1)).as("n"))
    }
    val batch = in.groupBy("k").agg(sum("x").as("s"), count(lit(1)).as("n"))
    assert(out.orderBy("k").collect().toSeq == batch.orderBy("k").collect().toSeq)
  }

  test("stateful dedup admits each key once regardless of batch placement") {
    // every id appears 3 times; replay across 6 files scatters the copies
    val in = (1L to 50L).flatMap(i => Seq.fill(3)(i)).toDF("id")
    val out = StreamGate.replay(spark, in, "sgspec_dedup", files = 6, mode = "append") {
      _.dropDuplicates("id")
    }
    assert(out.count() == 50)
  }

  test("replay leaves no residue: no temp views, staging directory deleted") {
    StreamGate.replay(spark, Seq(1L).toDF("id"), "sgspec_clean", files = 1, mode = "append")(identity)
    assert(spark.catalog.listTables().collect()
      .forall(t => !t.name.startsWith("graft_stream_sink_sgspec_clean")))
    // the result was localCheckpointed, so the per-run staging root
    // (input batches + parquet output) is gone
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    assert(!tmp.listFiles().exists(_.getName.startsWith("graft_stream_sgspec_clean_")))
  }

  test("unsafe names are rejected") {
    intercept[IllegalArgumentException] {
      StreamGate.replay(spark, Seq(1L).toDF("id"), "../evil", files = 1)(identity)
    }
  }

  test("restart recovers dedup state: keys seen before the kill stay suppressed") {
    // keys 1..20 arrive in batches 0-1 (pre-restart); batches 2-3 carry ONLY
    // duplicates of those keys. With recovered state the post-restart
    // emissions are empty; a fresh-state run 2 would re-emit all 20 keys
    // with b in {2, 3}.
    val in = (1 to 20).map(k => (k.toLong, (k % 2), (k % 2).toLong))
      .toDF("id", "stage_b", "b")
      .union((1 to 20).map(k => (k.toLong, 2 + (k % 2), (2 + (k % 2)).toLong))
        .toDF("id", "stage_b", "b"))
    val out = StreamGate.replayStagedRestart(spark, in, "sgspec_restart", "stage_b", 4, 2) {
      _.dropDuplicates("id").select(col("id"), col("b"))
    }
    val got = out.as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == (1 to 20).map(k => (k.toLong, (k % 2).toLong)))
  }

  test("restart recovers source offsets: pre-restart rows are not re-delivered") {
    // pass-through (stateless) replay: every row must arrive exactly once
    // even though the query is killed and restarted mid-stream — duplicated
    // delivery of batches 0-1 would double these counts.
    val in = (1L to 80L).map(i => (i, (i % 4).toInt)).toDF("id", "stage_b")
    val out = StreamGate.replayStagedRestart(spark, in, "sgspec_offsets", "stage_b", 4, 2)(identity)
    assert(out.count() == 80)
    assert(out.select("id").as[Long].collect().sorted.toSeq == (1L to 80L))
  }
}
