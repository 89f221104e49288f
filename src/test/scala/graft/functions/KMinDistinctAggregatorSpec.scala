package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class KMinDistinctAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("k smallest distinct values, ascending, duplicates and nulls ignored") {
    val rows = Seq((1L, "c"), (1L, "a"), (1L, "a"), (1L, "b"), (1L, "d"),
      (2L, "z"), (2L, null)).toDF("g", "v")
    val kmin = udaf(new KMinDistinctAggregator(3))
    val out = rows.groupBy("g").agg(kmin(col("v")).as("mins"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("a", "b", "c")) // duplicate 'a' counted once, 'd' out
    assert(out(2L) == Seq("z"))           // null never enters the sketch
  }

  test("buffer never exceeds k and merge order cannot change the result") {
    val a = new KMinDistinctAggregator(2)
    val b1 = Seq("m", "c", "x", "c", "a").foldLeft(a.zero)(a.reduce)
    assert(b1.size <= 2 && b1 == Seq("a", "c"))
    val b2 = Seq("b", "z", "b").foldLeft(a.zero)(a.reduce)
    val m12 = a.finish(a.merge(b1.clone(), b2.clone()))
    val m21 = a.finish(a.merge(b2.clone(), b1.clone()))
    assert(m12 == Seq("a", "b") && m21 == Seq("a", "b"))
  }

  test("agrees with distinct + ranking window on real data (x11 semantics)") {
    val docs = Tables.documents(spark, sf001)
    val hashed = docs
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"),
        explode(expr("transform(sequence(0, size(tk) - 2), i -> concat_ws(' ', tk[i], tk[i+1]))")).as("bg"))
      .select(col("doc_id"), md5(col("bg").cast("binary")).as("h"))
    val kmin = udaf(new KMinDistinctAggregator(3))
    val viaAgg = hashed.groupBy("doc_id").agg(kmin(col("h")).as("fps"))
      .select(col("doc_id"), posexplode(col("fps")))
      .select(col("doc_id"), (col("pos") + 1).as("rn"), col("col").as("fp"))
      .as[(Long, Int, String)].collect().toSet
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy("h")
      hashed.distinct()
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("h"))
        .as[(Long, Int, String)].collect().toSet
    }
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }
}
