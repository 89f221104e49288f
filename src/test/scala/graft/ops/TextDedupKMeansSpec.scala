package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextDedupKMeansSpec extends SparkSpec {
  import spark.implicits._

  private def cloneCorpus = {
    val doc = Tables.documents(spark, sf001)
    doc.select("doc_id", "text")
      .unionByName(doc.select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  test("lshCandidatePairs finds every exact clone pair with a full signature match") {
    val pairs = TextDedup.lshCandidatePairs(cloneCorpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, sf001).count()
    val clonePairs = pairs.filter { case (a, b, _) => b == a + 10000 }
    assert(clonePairs.length >= nDocs.toInt - 2) // all clones (minus <3-token docs)
    assert(clonePairs.forall(_._3 == 8L))
  }

  test("minhash signature arrays are seed-ordered and complete") {
    val arr = TextDedup.minhashSignatureArrays(Tables.documents(spark, sf001).select("doc_id", "text"))
    assert(arr.filter(size(col("sigs")) =!= 8).count() == 0)
  }

  test("spherical k-means improves (or maintains) mean max-cosine over init") {
    val vecs = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val init = KMeansLite.fit(vecs, k = 4, iterations = 0)
    val trained = KMeansLite.fit(vecs, k = 4, iterations = 3)
    def objective(c: org.apache.spark.sql.DataFrame): Double =
      KMeansLite.assign(vecs, c).agg(avg("cos")).first.getDouble(0)
    val before = objective(init)
    val after = objective(trained)
    info(f"mean max-cos: init=$before%.4f trained=$after%.4f")
    assert(after >= before - 1e-9)
    assert(trained.count() == 4)
  }
}
