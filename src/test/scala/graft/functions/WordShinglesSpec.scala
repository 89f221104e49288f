package graft.functions

import graft.{SparkSpec, Tables}
import graft.ops.TextDedup
import org.apache.spark.sql.functions._

/** Pins WordShingles' fused scan to the SQL-lambda formulation it
  * replaced, on the lambda form's guarded domain (size(tk) >= n) — the
  * real corpus plus width/edge cases — and checks the short-input
  * behavior the lambda form cannot express under ANSI mode. */
class WordShinglesSpec extends SparkSpec {

  test("matches the lambda form for widths 2, 3, 8 on the sf0.001 corpus") {
    for (n <- Seq(2, 3, 8)) {
      val tk = Tables.documents(spark, sf001)
        .select(col("doc_id"), TextDedup.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= n)
      val viaLambda = tk.select(col("doc_id"),
        expr(TextDedup.shinglesExpr(n)).as("sh"))
      val viaExpr = tk.select(col("doc_id"),
        TextDedup.shingles(col("tk"), n).as("sh"))
      assert(viaExpr.except(viaLambda).isEmpty && viaLambda.except(viaExpr).isEmpty,
        s"width $n diverged")
    }
  }

  test("exact-width and duplicate-token arrays shingle correctly") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),          // size == n: exactly one shingle
      (2L, Seq("x", "x", "x", "x")),     // duplicates
      (3L, Seq("", "a", ""))             // empty tokens survive concat_ws
    ).toDF("id", "tk")
    val out = df.select(col("id"), TextDedup.shingles(col("tk"), 3).as("sh"))
      .orderBy("id").collect().map(_.getSeq[String](1).toList).toList
    assert(out == List(List("a b c"), List("x x x", "x x x"), List(" a ")))
  }

  test("arrays shorter than the width yield an empty array (not an ANSI index error)") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b")), (2L, Seq.empty[String])).toDF("id", "tk")
    val out = df.select(col("id"), TextDedup.shingles(col("tk"), 3).as("sh"))
      .orderBy("id").collect().map(_.getSeq[String](1).size).toList
    assert(out == List(0, 0))
  }
}
