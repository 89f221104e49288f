package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinPackingSpec extends SparkSpec {

  private def pack(rows: Seq[(String, Long, Long)], cap: Long): Map[(String, Long), Long] = {
    import spark.implicits._
    val df = rows.toDF("source", "conv_id", "sz")
    BinPacking.nextFit(df, "source", "conv_id", "sz", cap)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
  }

  test("next-fit resets at capacity, per key, in order") {
    val got = pack(Seq(
      ("a", 1L, 50L), ("a", 2L, 40L), ("a", 3L, 30L), ("a", 4L, 100L), ("a", 5L, 1L),
      ("b", 1L, 99L), ("b", 2L, 2L)), cap = 100L)
    // a: 50+40=90 → bin0; 90+30>100 → bin1(30); 30+100>100 → bin2(100); → bin3(1)
    assert(got == Map(
      ("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L, ("a", 4L) -> 2L, ("a", 5L) -> 3L,
      ("b", 1L) -> 0L, ("b", 2L) -> 1L))
  }

  test("an oversize item gets its own overflowing bin; the next item opens a fresh one") {
    val got = pack(Seq(("s", 1L, 10L), ("s", 2L, 500L), ("s", 3L, 10L)), cap = 100L)
    assert(got == Map(("s", 1L) -> 0L, ("s", 2L) -> 1L, ("s", 3L) -> 2L))
  }

  test("keys are independent even when they share a partition") {
    // force everything into one partition: state must still reset per key
    import spark.implicits._
    val df = Seq(("a", 1L, 80L), ("b", 1L, 80L), ("c", 1L, 80L), ("a", 2L, 80L))
      .toDF("source", "conv_id", "sz").coalesce(1)
    val got = BinPacking.nextFit(df, "source", "conv_id", "sz", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == Map(("a", 1L) -> 0L, ("a", 2L) -> 1L, ("b", 1L) -> 0L, ("c", 1L) -> 0L))
  }
}
