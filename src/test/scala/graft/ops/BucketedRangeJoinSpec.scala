package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins [[BucketedRangeJoin]]'s multiset-equality argument empirically:
  * for random timestamp sets the bucketed join's pair multiset must be
  * IDENTICAL to the plain equi-join + residual range filter, in both
  * range directions, including boundary timestamps that land exactly on
  * bucket edges, and a LEFT join must keep its null rows exactly once. */
class BucketedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val W = 3600000000L // 1h in micros

  // deterministic pseudo-random micros, deliberately including exact
  // bucket-edge values (k * W) and near-edge offsets
  private def rows(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val base = 1700000000000000L + rnd.nextInt(8) * W
      val off = rnd.nextInt(6) match {
        case 0 => 0L // exactly on a bucket edge
        case 1 => W - 1
        case _ => (rnd.nextLong() % W).abs
      }
      (i.toLong, rnd.nextInt(3).toLong, base + off)
    }.toDF("id", "user", "us").withColumn("ts", timestamp_micros(col("us")))
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").as[(Long, Long)].collect().toSet

  test("forward range (t_b in (t_a, t_a + W]): bucketed == plain, inner") {
    val a = rows(1, 60).select(col("id").as("a_id"), col("user"), col("ts").as("a_ts"))
    val b = rows(2, 60).select(col("id").as("b_id"), col("user").as("b_user"), col("ts").as("b_ts"))
    val range = col("b_ts") > col("a_ts") &&
      col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR")
    val plain = a.join(b, col("user") === col("b_user") && range)
    val aB = a.withColumn("bkt", BucketedRangeJoin.candidateBuckets(col("a_ts"), W, dir = 1))
    val bB = b.withColumn("bkt", BucketedRangeJoin.bucketOf(col("b_ts"), W))
    val bucketed = aB.join(bB,
      col("user") === col("b_user") && aB("bkt") === bB("bkt") && range)
    assert(pairs(bucketed) == pairs(plain))
    assert(bucketed.count() == plain.count(), "a pair must meet on exactly one bucket key")
  }

  test("backward range (t_b in [t_a - W, t_a)): bucketed == plain, inner") {
    val a = rows(3, 60).select(col("id").as("a_id"), col("user"), col("ts").as("a_ts"))
    val b = rows(4, 60).select(col("id").as("b_id"), col("user").as("b_user"), col("ts").as("b_ts"))
    val range = col("b_ts") < col("a_ts") &&
      col("b_ts") >= col("a_ts") - expr("INTERVAL 1 HOUR")
    val plain = a.join(b, col("user") === col("b_user") && range)
    val aB = a.withColumn("bkt", BucketedRangeJoin.candidateBuckets(col("a_ts"), W, dir = -1))
    val bB = b.withColumn("bkt", BucketedRangeJoin.bucketOf(col("b_ts"), W))
    val bucketed = aB.join(bB,
      col("user") === col("b_user") && aB("bkt") === bB("bkt") && range)
    assert(pairs(bucketed) == pairs(plain))
    assert(bucketed.count() == plain.count())
  }

  test("left join: preserved side keeps single bucket, null rows emitted once") {
    val a = rows(5, 40).select(col("id").as("a_id"), col("user"), col("ts").as("a_ts"))
    val b = rows(6, 10).select(col("id").as("b_id"), col("user").as("b_user"), col("ts").as("b_ts"))
    val range = col("b_ts") > col("a_ts") &&
      col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR")
    val plain = a.join(b, col("user") === col("b_user") && range, "left")
      .groupBy("a_id").agg(count(col("b_id")).as("n"))
    // preserved side single-bucketed; inner side exploded backward
    val aB = a.withColumn("bkt", BucketedRangeJoin.bucketOf(col("a_ts"), W))
    val bB = b.withColumn("bkt", BucketedRangeJoin.candidateBuckets(col("b_ts"), W, dir = -1))
    val bucketed = aB.join(bB,
      col("user") === col("b_user") && aB("bkt") === bB("bkt") && range, "left")
      .groupBy("a_id").agg(count(col("b_id")).as("n"))
    val p = plain.as[(Long, Long)].collect().toMap
    val q = bucketed.as[(Long, Long)].collect().toMap
    assert(q == p)
  }

  test("invalid arguments are rejected") {
    intercept[IllegalArgumentException](BucketedRangeJoin.bucketOf(col("ts"), 0L))
    intercept[IllegalArgumentException](BucketedRangeJoin.candidateBuckets(col("ts"), W, 2))
  }
}
