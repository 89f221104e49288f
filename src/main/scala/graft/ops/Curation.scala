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
  * stage is ONE exchange keyed by md5(text) (window-min over content-hash
  * partitions — no self-join, no second shuffle of the corpus, no multi-KB
  * shuffle keys); the split column is a
  * narrow hash expression. A 100 TB curate() is therefore scan → shuffle →
  * scan, with the quality filter applied BEFORE the shuffle so dropped
  * documents never move.
  */
object Curation {

  val defaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Appends the quality feature columns (n_tokens, avg_tok_len,
    * punct_ratio, stop_ratio, quality_score) to a documents frame — these
    * five names are the op's PUBLISHED outputs; if the input already has a
    * column with one of these names its VALUES are replaced by the op's
    * recomputed ones (only the name survives). Internal scratch columns
    * carry a `__cur_` prefix so they can never silently swallow a caller
    * column.
    *
    * Required input columns: `text` (string). `n_chars` is used when
    * present (trusting the source's stored count) and derived internally
    * as `length(text)` when absent — the derived value is scratch and is
    * NOT added to the output.
    *
    * The 6dp rounding + 0.4/0.3/0.2 weights are cross-engine safe:
    * products of a 6dp ratio with these weights end in an even 7th decimal
    * digit, so round(·,6) never lands on a half-tie (where Spark HALF_UP
    * and binary rounding disagree). */
  def withQuality(docs: DataFrame, stopwords: Seq[String] = defaultStopwords): DataFrame =
    docs
      .withColumn("__cur_nc",
        (if (docs.columns.contains("n_chars")) col("n_chars")
         else length(col("text"))).cast(LongType))
      // all four statistics in ONE fused codegen pass — the composable
      // lambda form (aggregate/transform/filter) is CodegenFallback and
      // was the catalog's worst genuine cross-engine ratio at ~sf1; the
      // expression's semantics contract is pinned by TextStatsSpec
      .withColumn("__cur_st",
        graft.functions.TextStats.stats(col("text"), stopwords))
      .withColumn("n_tokens", col("__cur_st").getField("n_tokens"))
      .withColumn("__cur_sum_len", col("__cur_st").getField("sum_tok_len"))
      .withColumn("__cur_n_stop", col("__cur_st").getField("n_stop"))
      .withColumn("__cur_n_punct", col("__cur_st").getField("n_punct"))
      .withColumn("avg_tok_len",
        round(col("__cur_sum_len") / col("n_tokens").cast(DoubleType), 6))
      .withColumn("punct_ratio",
        round(col("__cur_n_punct") / col("__cur_nc").cast(DoubleType), 6))
      .withColumn("stop_ratio",
        round(col("__cur_n_stop") / col("n_tokens").cast(DoubleType), 6))
      .withColumn("quality_score",
        round(lit(0.4) * col("stop_ratio")
          + lit(0.3) * (least(col("n_tokens"), lit(100L)) / lit(100.0))
          + lit(0.2) * (lit(1.0) - col("punct_ratio")), 6))
      .drop("__cur_nc", "__cur_st", "__cur_sum_len", "__cur_n_stop", "__cur_n_punct")

  /** The composed pipeline: quality-filter → dedup (min-doc_id survivor)
    * → deterministic train/val split. Returns one row per SURVIVING
    * document: the input columns (the published names `quality_score` and
    * `split` replace same-named inputs; feature columns the caller brought
    * in keep their NAMES but carry the op's recomputed values; feature
    * columns the caller did not have are stripped back off) plus
    * quality_score and split.
    *
    * Dedup granularity: by default EXACT (identical text); pass
    * `nearDupMapping` — the (doc_id, canonical_id) frame
    * [[TextDedup.dedupMapping]] produces — to dedup by NEAR-DUP COMPONENT
    * instead: the survivor is the min doc_id among the quality-passing
    * members of each LSH component (identical texts always land in one
    * component, so near-dup mode subsumes exact mode). The mapping is
    * consumed between the filter and split stages; docs absent from it
    * dedup as singletons. */
  def curate(
      docs: DataFrame,
      minQuality: Double = 0.38,
      trainFrac: Double = 0.8,
      stopwords: Seq[String] = defaultStopwords,
      nearDupMapping: Option[DataFrame] = None): DataFrame = {
    val features = Seq("n_tokens", "avg_tok_len", "punct_ratio", "stop_ratio")
    // feature NAMES the caller brought in survive (with recomputed values);
    // only the names this call introduced are stripped back off
    val callerHad = features.filter(docs.columns.contains)
    val scored = withQuality(docs, stopwords)
      .filter(col("quality_score") >= minQuality)
    // The dedup exchange is keyed by the CONTENT HASH (or the component
    // id), never the raw text: identical text ⇒ identical md5, so survivor
    // semantics are unchanged (collisions are the same accepted risk as
    // exact dedup's hash agg), while the shuffle hashes/sorts a fixed-width
    // key instead of multi-KB document bodies — at 100 TB, raw-text keys
    // waste comparator time and skew partition sizes on boilerplate-heavy
    // corpora. The quality filter ran BEFORE this exchange, so dropped
    // documents never move.
    val keyed = nearDupMapping match {
      case Some(m) =>
        // the mapping column joins in under a scratch name so a caller
        // whose frame ALREADY carries canonical_id (the natural shape after
        // a TextDedup join) never hits an ambiguous-reference error
        scored
          .join(m.select(col("doc_id"), col("canonical_id").as("__cur_can")),
            Seq("doc_id"), "left")
          .withColumn("__cur_key",
            coalesce(col("__cur_can"), col("doc_id")).cast("string"))
          .drop("__cur_can")
      case None =>
        scored.withColumn("__cur_key", md5(col("text").cast("binary")))
    }
    keyed
      // survivor = min doc_id among quality-passing members: a window-min
      // over the key partition, not a groupBy + self-join — the corpus
      // crosses the wire once
      .withColumn("__cur_keep", min(col("doc_id")).over(Window.partitionBy("__cur_key")))
      .filter(col("doc_id") === col("__cur_keep"))
      .drop("__cur_key" +: "__cur_keep" +: features.filterNot(callerHad.contains): _*)
      .withColumn("split", Sampling.splitColumn(col("doc_id"), "split", trainFrac))
  }
}
