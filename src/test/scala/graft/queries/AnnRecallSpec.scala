package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Quality check for the IVF ANN path: its neighbors must be a high-recall
  * subset of the brute-force ranking (q21 machinery) for the same queries.
  * Not oracle-checked (recall is a metric, not a deterministic value across
  * parameter choices) — pinned here instead.
  */
class AnnRecallSpec extends SparkSpec {

  test("IVF top-3 achieves ≥ 1/3 recall vs brute force at sf0.001") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val e = graft.Tables.embeddings(spark, sf001)
    // brute-force top-3 (excluding self) for queries 1..3
    val q = e.filter(col("vec_id").isin(1L, 2L, 3L))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("c_id"))
    val brute = c.join(broadcast(q)).filter(col("c_id") =!= col("q_id"))
      .withColumn("cos", VectorFunctions.cosine(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("q_id", "c_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("x07_ann_ivf")(spark, sf001)
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.count(brute.contains).toDouble / brute.size
    info(f"IVF recall@3 = $recall%.2f")
    assert(recall >= 0.33, s"IVF recall too low: $recall (ivf=$ivf, brute=$brute)")
  }

  test("x210 ADC-scores only the probed cluster — n_cands ≪ corpus") {
    // the IVFADC contract the hash gate can't express: the candidate count
    // each query actually ADC-scored (an output column, oracle-agreed) must
    // be cluster-bounded, proving the corpus was NOT exhaustively scored.
    // nprobe = 1 over k = 8 trained clusters → worst cluster ≪ corpus/2.
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x210_ivf_pq_trained")(spark, sf001)
      .agg(max(col("n_cands")).as("mx"), count(lit(1)).as("n")).head()
    val corpus = graft.Tables.embeddings(spark, sf001).count()
    assert(out.getLong(1) > 0, "no query rows")
    info(s"max n_cands = ${out.getLong(0)} of corpus $corpus")
    assert(out.getLong(0) < corpus / 2,
      s"probed candidates ${out.getLong(0)} not cluster-bounded (corpus $corpus)")
  }
}
