package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** End-to-end corpus curation — the composed form of the pipeline the
  * individual operators gate one stage at a time (quality scoring ≡ x09,
  * exact dedup ≡ x01, deterministic split ≡ x17): score → filter → dedup →
  * split, as ONE library call a training-data workflow starts from.
  *
  * Generalizes the reference's filter-then-load shape (its enrichment loop
  * drops rows by per-row predicate before writing,
  * /root/reference/main.py:365-383) to corpus-level hygiene.
  *
  * Scale posture: scoring is a narrow per-row pass (no shuffle); the dedup
  * stage is ONE exchange by content (window-min over text partitions — no
  * self-join, no second shuffle of the corpus); the split column is a
  * narrow hash expression. A 100 TB curate() is therefore scan → shuffle →
  * scan, with the quality filter applied BEFORE the shuffle so dropped
  * documents never move.
  */
object Curation {

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Appends the quality feature columns (n_tokens, avg_tok_len,
    * punct_ratio, stop_ratio, quality_score) to a documents frame. The
    * 6dp rounding + 0.4/0.3/0.2 weights are cross-engine safe: products of
    * a 6dp ratio with these weights end in an even 7th decimal digit, so
    * round(·,6) never lands on a half-tie (where Spark HALF_UP and binary
    * rounding disagree). */
  def withQuality(docs: DataFrame, stopwords: Seq[String] = defaultStopwords): DataFrame =
    docs
      .withColumn("tk", TextDedup.tokens(col("text")))
      .withColumn("n_tokens", size(col("tk")).cast(LongType))
      .withColumn("sum_len",
        aggregate(transform(col("tk"), t => length(t)), lit(0), (a, v) => a + v)
          .cast(LongType))
      .withColumn("n_stop",
        size(filter(col("tk"), t => t.isin(stopwords: _*))).cast(LongType))
      .withColumn("n_punct", regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast(LongType))
      .withColumn("avg_tok_len", round(col("sum_len") / col("n_tokens").cast(DoubleType), 6))
      .withColumn("punct_ratio", round(col("n_punct") / col("n_chars").cast(DoubleType), 6))
      .withColumn("stop_ratio", round(col("n_stop") / col("n_tokens").cast(DoubleType), 6))
      .withColumn("quality_score",
        round(lit(0.4) * col("stop_ratio")
          + lit(0.3) * (least(col("n_tokens"), lit(100L)) / lit(100.0))
          + lit(0.2) * (lit(1.0) - col("punct_ratio")), 6))
      .drop("tk", "sum_len", "n_stop", "n_punct")

  /** The composed pipeline: quality-filter → exact dedup (min-doc_id
    * survivor per identical text) → deterministic train/val split.
    * Returns one row per SURVIVING document: the input columns plus
    * quality_score and split. */
  def curate(
      docs: DataFrame,
      minQuality: Double = 0.38,
      trainFrac: Double = 0.8,
      stopwords: Seq[String] = defaultStopwords): DataFrame = {
    val byText = Window.partitionBy("text")
    withQuality(docs, stopwords)
      .filter(col("quality_score") >= minQuality)
      // survivor = min doc_id among quality-passing copies: a window-min
      // over the content partition, not a groupBy + self-join — the corpus
      // crosses the wire once
      .withColumn("keep", min(col("doc_id")).over(byText))
      .filter(col("doc_id") === col("keep"))
      .drop("keep", "n_tokens", "avg_tok_len", "punct_ratio", "stop_ratio")
      .withColumn("split", Sampling.splitColumn(col("doc_id"), "split", trainFrac))
  }
}
