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

  test("two-level assignment == within-cell reference, and cells are never empty") {
    val vecs = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val fine = vecs.filter(col("vec_id") % 11 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"))
    val coarse = fine.filter(col("cent_id") % 55 === 0) // every 5th fine centroid
    val twoLevel = KMeansLite.assignTwoLevel(vecs, fine, coarse)
      .select("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    // reference: coarse argmax, then exact argmax restricted to that cell,
    // computed through the single-level op (independent composition)
    val vecCell = KMeansLite.assign(vecs, coarse)
      .select(col("vec_id"), col("cent_id").as("cell"))
    val fineCell = KMeansLite.assign(
      fine.select(col("cent_id").as("vec_id"), col("c_emb").as("embedding")), coarse)
      .select(col("vec_id").as("f_id"), col("embedding").as("f_emb"), col("cent_id").as("cell"))
    val ref = vecs.join(vecCell, "vec_id").join(fineCell, "cell")
      .withColumn("cos", graft.functions.VectorFunctions.cosine(col("embedding"), col("f_emb")))
      .groupBy("vec_id")
      .agg(max_by(col("f_id"), struct(col("cos"), (-col("f_id")).as("t"))).as("cent_id"))
      .as[(Long, Long)].collect().toMap
    assert(twoLevel == ref)
    assert(twoLevel.size == vecs.count(), "every vector must land in a non-empty cell")
    // a vector that IS a fine centroid must assign to itself (cos = 1,
    // lowest-id tie-break, and its own cell contains it)
    val selfIds = fine.select("cent_id").as[Long].collect().toSet
    assert(selfIds.forall(id => twoLevel(id) == id))
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
