package graft.functions

import graft.{SparkSpec, Tables}
import graft.ops.TextDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins TokenSetCounts' single fused scan to the per-set filter(isin)
  * composition — on the corpus and on overlap/null/empty edge cases. */
class TokenSetCountsSpec extends SparkSpec {

  private val sets = Seq(
    Seq("the", "a", "of", "and", "to"),
    Seq("der", "die", "das", "und", "ist"),
    Seq("a", "und", "zz"))  // overlaps both other sets

  test("matches the per-set filter(isin) composition on the sf0.001 corpus") {
    val tk = Tables.documents(spark, sf001)
      .select(col("doc_id"), TextDedup.tokens(col("text")).as("tk"))
    def viaLambda = tk.select(col("doc_id") +:
      sets.zipWithIndex.map { case (set, i) =>
        size(filter(col("tk"), t => t.isin(set: _*))).cast(LongType).as(s"c$i")
      }: _*)
    def viaExpr = {
      val withC = tk.withColumn("__c", TokenSetCounts.counts(col("tk"), sets))
      withC.select(col("doc_id") +:
        sets.indices.map(i => col("__c")(i).as(s"c$i")): _*)
    }
    assert(viaExpr.except(viaLambda).isEmpty && viaLambda.except(viaExpr).isEmpty)
  }

  test("overlapping sets each count a shared token; empty arrays count zero") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "und", "a", "zz")),
      (2L, Seq.empty[String]),
      (3L, Seq("nope")),
      (4L, Seq("a", null, "und"))  // null tokens count for no set
    ).toDF("id", "tk")
    val out = df.select(col("id"), TokenSetCounts.counts(col("tk"), sets).as("c"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toList).toList
    assert(out == List(List(2, 1, 4), List(0, 0, 0), List(0, 0, 0), List(1, 1, 2)))
  }
}
