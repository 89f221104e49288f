package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("exact top-k with deterministic tiebreak, bounded buffer") {
    val rows = Seq((1L, 5.0, 10L), (1L, 9.0, 11L), (1L, 9.0, 7L), (1L, 1.0, 12L),
      (2L, 3.0, 20L)).toDF("g", "score", "payload")
    val agg = new TopKAggregator(2).toColumn
    val out = rows.as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(agg.name("topk"))
      .collect().toMap
    assert(out(1L) == Seq((9.0, 7L), (9.0, 11L))) // ties break by payload asc
    assert(out(2L) == Seq((3.0, 20L)))
  }

  test("agrees with the dense_rank window on real data (q13 semantics, k without ties)") {
    val li = Tables.lineitem(spark, sf001)
    val viaAgg = li.select(col("l_suppkey"), col("l_extendedprice"), col("l_partkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(new TopKAggregator(3).toColumn.name("topk"))
      .flatMap { case (g, top) => top.map(t => (g, t._1)) }
      .collect().toSet
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc, col("l_partkey"))
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("l_suppkey"), col("l_extendedprice"))
        .as[(Long, Double)].collect().toSet
    }
    assert(viaAgg == viaWindow)
  }
}
