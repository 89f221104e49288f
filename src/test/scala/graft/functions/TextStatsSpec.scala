package graft.functions

import graft.{SparkSpec, Tables}
import graft.ops.{Curation, TextDedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pins TextStats' fused scan to the composable-lambda formulation it
  * replaced in Curation.withQuality — on the real corpus AND on the split
  * edge cases (leading/trailing separators, empty/blank strings, Unicode
  * incl. non-BMP code points) where Java split's limit=-1 semantics are
  * easy to get wrong. */
class TextStatsSpec extends SparkSpec {

  private val stopwords = Curation.defaultStopwords

  /** The original composed form, verbatim. */
  private def viaLambdas(df: DataFrame): DataFrame =
    df.withColumn("__tk", TextDedup.tokens(col("text")))
      .select(col("id"),
        size(col("__tk")).cast(LongType).as("n_tokens"),
        aggregate(transform(col("__tk"), t => length(t)), lit(0), (a, v) => a + v)
          .cast(LongType).as("sum_tok_len"),
        size(filter(col("__tk"), t => t.isin(stopwords: _*))).cast(LongType).as("n_stop"),
        regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast(LongType).as("n_punct"))

  private def viaExpr(df: DataFrame): DataFrame =
    df.select(col("id"), TextStats.stats(col("text"), stopwords).as("st"))
      .select(col("id"), col("st.n_tokens"), col("st.sum_tok_len"),
        col("st.n_stop"), col("st.n_punct"))

  test("matches the lambda composition on split/limit edge cases and Unicode") {
    import spark.implicits._
    val edge = Seq(
      "", " ", "  ", "\t", "\t\t", "a", "a b", "  a  b  ", "a\tb", "\ta", "a\t",
      "a\t\t", "\t a \t", "The A of and to", "THE the tHe", "a!b.c", ".", "!!!",
      "héllo, wörld!", "ünïcode ÄÖÜ",
      "𝔘nicode 𝔴ord", "a b", "mixed 123 !@# end\t"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val truth = viaLambdas(edge).orderBy("id").collect().toSeq
    val fused = viaExpr(edge).orderBy("id").collect().toSeq
    assert(fused == truth, s"\nfused: $fused\ntruth: $truth")
  }

  test("matches the lambda composition on the whole sf0.001 corpus") {
    val docs = Tables.documents(spark, sf001).select(col("doc_id").as("id"), col("text"))
    assert(viaExpr(docs).except(viaLambdas(docs)).isEmpty)
    assert(viaLambdas(docs).except(viaExpr(docs)).isEmpty)
  }

  test("null text yields a null struct (and withQuality still nulls through)") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, null)).toDF("id", "text")
    val out = df.select(col("id"), TextStats.stats(col("text"), stopwords).as("st"))
      .orderBy("id").collect()
    assert(!out(0).isNullAt(1) && out(1).isNullAt(1))
  }
}
