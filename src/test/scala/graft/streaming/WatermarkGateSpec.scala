package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the EXACT watermark semantics the x150/x151 oracle SQL encodes,
  * measured (not assumed) against this Spark build via staged replays:
  *
  *   M_b       = max event time over ALL rows in batches <= b,
  *               MILLISECOND-truncated (sub-ms digits do not advance it)
  *   wmEvict_b = M_{b-1} - delay   (state eviction / append emission)
  *   wmLate_b  = wmEvict_{b-1} = M_{b-2} - delay   (late-row filtering —
  *               one batch BEHIND eviction, the SPARK-40925 two-watermark
  *               model)
  *   agg:   row dropped iff window.end <= wmLate_b (boundary inclusive);
  *          window emitted iff window.end <= final wmEvict (inclusive),
  *          where the trailing no-data flush batch supplies
  *          wmEvict = M_last - delay
  *   dedup: row dropped iff ts <= wmLate_b (boundary inclusive)
  *
  * If a Spark upgrade changes any of these, this spec fails before the
  * catalog gate does.
  */
class WatermarkGateSpec extends SparkSpec {
  import spark.implicits._

  test("staged replay processes batches in batch order") {
    val rows = Seq((0, 1L), (1, 2L), (2, 3L), (3, 4L)).toDF("b", "v")
    // The distributed parquet sink guarantees the output MULTISET, not
    // arrival order — so pin processing order through an order-sensitive
    // observable: running-sum update emissions are the prefix sums of the
    // processing order, and with distinct per-batch values {1,3,6,10}
    // arises from 0,1,2,3 only (any permutation changes the multiset).
    val sums = StreamGate.replayStaged(spark, rows, "wmspec_order", "b", 4,
      "update") { s => s.groupBy().agg(sum("v").as("s")) }
    assert(sums.select("s").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 6L, 10L))
    // and an identity append replay delivers every staged row exactly once
    val app = StreamGate.replayStaged(spark, rows, "wmspec_once", "b", 4,
      "append")(identity)
    assert(app.select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("windowed agg: lagged late filter, inclusive boundaries, final flush") {
    // window 10s, delay 10s. b0: 100 -> M0=100. b1: 200 -> M1=200.
    // b2 (wmLate=90, wmEvict=190): 85 (win end 90 == wmLate -> DROPPED),
    //   95 (end 100 admitted), 75 (end 80 dropped), 295 (win [290,300)).
    // b3: 310, 305 -> final flush wmEvict = 300: [290,300) end 300 == wm
    //   -> EMITTED (inclusive eviction); [300,310) end 310 withheld.
    val rows = Seq(
      (0, 100L), (1, 200L),
      (2, 85L), (2, 95L), (2, 75L), (2, 295L),
      (3, 310L), (3, 305L)
    ).toDF("b", "sec").withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val out = StreamGate.replayStaged(spark, rows, "wmspec_agg", "b", 4, "append") { s =>
      s.withWatermark("ts", "10 seconds")
        .groupBy(window(col("ts"), "10 seconds")).agg(count(lit(1)).as("n"))
        .select((unix_micros(col("window.start")) / 1000000L)
          .cast(org.apache.spark.sql.types.LongType).as("w_s"), col("n"))
    }
    val got = out.orderBy("w_s").as[(Long, Long)].collect().toSeq
    assert(got == Seq((90L, 1L), (100L, 1L), (200L, 1L), (290L, 1L)),
      s"calibrated watermark semantics changed: $got")
  }

  test("dedup-within-watermark: late filter is lagged, inclusive, ms-truncated") {
    // delay 10s. b0: A @ 100.000500s (sub-ms digits!). b1: B @ 200.
    // b2: wmLate = ms-trunc(100.000500) - 10 = 90.000000 exactly:
    //   C @ 90.000300 > 90.000000 -> ADMITTED (proves ms truncation:
    //     an exact-microsecond watermark 90.000500 would drop it),
    //   D @ 90.000000 == wmLate -> DROPPED (inclusive boundary),
    //   E @ 85 -> dropped, Z @ 300 advances. b3: F @ 400.
    val rows = Seq(
      (0, "A", 100000500L), (1, "B", 200000000L),
      (2, "C", 90000300L), (2, "D", 90000000L), (2, "E", 85000000L),
      (2, "Z", 300000000L), (3, "F", 400000000L)
    ).toDF("b", "k", "us").withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val out = StreamGate.replayStaged(spark, rows, "wmspec_dedup", "b", 4, "append") { s =>
      s.withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark("k", "ts")
        .select(col("k"))
    }
    val got = out.as[String].collect().toSeq.sorted
    assert(got == Seq("A", "B", "C", "F", "Z"),
      s"calibrated dedup late-filter semantics changed: $got")
  }
}
