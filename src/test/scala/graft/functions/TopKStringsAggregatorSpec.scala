package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKStringsAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("exact top-k of (score, string) with payload-ascending tiebreak") {
    val rows = Seq((1L, 5.0, "mid"), (1L, 9.0, "zzz"), (1L, 9.0, "aaa"),
      (1L, 1.0, "low"), (2L, 3.0, "solo")).toDF("g", "score", "tok")
    val topk = udaf(new TopKStringsAggregator(2))
    val out = rows.groupBy("g").agg(topk(col("score"), col("tok")).as("top"))
      .as[(Long, Seq[(Double, String)])].collect().toMap
    assert(out(1L) == Seq((9.0, "aaa"), (9.0, "zzz")))
    assert(out(2L) == Seq((3.0, "solo")))
  }

  test("agrees with the ranking window on a many-group frame") {
    val rows = (0 until 500).map(i => (i % 20L, (i % 7).toDouble, s"t$i"))
      .toDF("g", "score", "tok")
    val topk = udaf(new TopKStringsAggregator(3))
    val viaAgg = rows.groupBy("g").agg(topk(col("score"), col("tok")).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rn"), col("col._2").as("tok"))
      .as[(Long, Int, String)].collect().toSet
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("g").orderBy(col("score").desc, col("tok"))
      rows.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("g"), col("rn"), col("tok"))
        .as[(Long, Int, String)].collect().toSet
    }
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }
}
