package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins BigramDiversity's fused one-pass scan (open-addressing map over
  * packed codepoint pairs) to the compositional explode + two-aggregate
  * formulation — on the real corpus AND on edge cases (empty/1-char
  * strings, runs of one character, non-BMP code points, where a UTF-16
  * surrogate-pair split would produce different bigrams than the codepoint
  * definition). */
class BigramDiversitySpec extends SparkSpec {

  /** The compositional truth: explode codepoint bigrams, count, aggregate
    * moments. Bigrams via a 1-codepoint-stride substring over the text. */
  private def viaExplode(df: DataFrame): DataFrame =
    df.select(col("id"),
        explode_outer(expr(
          "CASE WHEN length(text) >= 2 THEN " +
            "transform(sequence(1, length(text) - 1), i -> substring(text, i, 2)) " +
            "ELSE array() END")).as("bg"))
      .groupBy("id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("id")
      .agg(
        coalesce(sum(when(col("bg").isNotNull, col("c"))), lit(0L)).cast(LongType).as("n_bigrams"),
        sum(when(col("bg").isNotNull, 1L).otherwise(0L)).cast(LongType).as("n_distinct"),
        coalesce(sum(when(col("bg").isNotNull, col("c") * col("c"))), lit(0L))
          .cast(LongType).as("sum_sq"))

  private def viaExpr(df: DataFrame): DataFrame =
    df.select(col("id"), BigramDiversity.diversity(col("text")).as("bd"))
      .select(col("id"), col("bd.n_bigrams"), col("bd.n_distinct"), col("bd.sum_sq"))

  test("matches the explode composition on edge cases incl. non-BMP") {
    import spark.implicits._
    val edge = Seq(
      "", "a", "ab", "aa", "aaa", "aaaa", "abab", "aabb",
      "the quick brown fox", "  ", " a ", "!!!", "ababababab",
      "héllo wörld", "ÄÖÜÄÖÜ", "𝔘𝔴𝔘𝔴𝔘", "a𝔘b𝔘a", "日本語テキスト日本語"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val truth = viaExplode(edge).orderBy("id").collect().toSeq
    val fused = viaExpr(edge).orderBy("id").collect().toSeq
    assert(fused == truth, s"\nfused: $fused\ntruth: $truth")
  }

  test("matches the explode composition on the whole sf0.001 corpus") {
    val docs = Tables.documents(spark, sf001).select(col("doc_id").as("id"), col("text"))
    assert(viaExpr(docs).except(viaExplode(docs)).isEmpty)
    assert(viaExplode(docs).except(viaExpr(docs)).isEmpty)
  }

  test("moment invariants: n ≥ distinct, sum_sq ∈ [n, n²], effective alphabet ≤ distinct") {
    val docs = Tables.documents(spark, sf001).select(col("doc_id").as("id"), col("text"))
    val bad = viaExpr(docs)
      .filter(col("n_bigrams") > 0)
      .filter(
        col("n_distinct") > col("n_bigrams") ||
        col("sum_sq") < col("n_bigrams") ||
        col("sum_sq") > col("n_bigrams") * col("n_bigrams") ||
        // Cauchy–Schwarz: n²/Σc² ≤ distinct
        col("n_bigrams") * col("n_bigrams") > col("sum_sq") * col("n_distinct"))
    assert(bad.isEmpty)
  }

  test("null text yields a null struct") {
    import spark.implicits._
    val out = Seq((1L, "ab"), (2L, null)).toDF("id", "text")
      .select(col("id"), BigramDiversity.diversity(col("text")).as("bd"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
  }
}
