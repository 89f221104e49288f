package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spherical k-means over an embedding column, as pure DataFrame ops — the
  * trained-centroid upgrade for the IVF ANN path (x07 uses a deterministic
  * pseudo-sample; real IVF trains its coarse quantizer).
  *
  * Lloyd iteration: assign each vector to its max-cosine centroid
  * (broadcast centroids — k vectors, always tiny), then recompute each
  * centroid as the per-dimension mean of its members (direction is what
  * matters under cosine, so the unnormalized mean works). Each iteration is
  * one broadcast join + one groupBy — no driver-side math, scales with the
  * vector count.
  */
object KMeansLite {

  /** @param vectors DataFrame[vec_id: Long, embedding: Array[Float]]
    * @return centroids DataFrame[cent_id: Long, c_emb: Array[Float]]
    */
  def fit(vectors: DataFrame, k: Int, iterations: Int): DataFrame = {
    require(k > 0 && iterations >= 0)
    // deterministic init: k evenly-spaced existing vectors by id rank
    val wInit = Window.orderBy("vec_id")
    val n = vectors.count()
    val step = math.max(1L, n / k)
    var centroids = vectors
      .withColumn("rk", row_number().over(wInit))
      .filter((col("rk") - 1) % step === 0 && col("rk") <= step * k)
      .select(((col("rk") - 1) / step).cast("long").as("cent_id"),
        col("embedding").as("c_emb"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val assigned = assign(vectors, centroids)
      centroids = assigned
        .select(col("cent_id"), posexplode(col("embedding")))
        .groupBy("cent_id", "pos")
        .agg(avg(col("col")).as("m"))
        .groupBy("cent_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))").as("c_emb"))
        .localCheckpoint()
    }
    centroids
  }

  /** Max-cosine assignment: (vec_id, embedding, cent_id, cos). */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cent_id"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("cos", VectorFunctions.cosine(col("embedding"), col("c_emb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cent_id", "cos")
  }
}
