package graft.ops

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, Row}
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
    * @param reliable materialize per-iteration centroids via
    *   `Dataset.checkpoint` (requires `spark.sparkContext.setCheckpointDir`)
    *   instead of `localCheckpoint` — localCheckpoint blocks live on
    *   executors with no lineage, so an executor loss mid-fit is fatal;
    *   reliable checkpoints recover. Centroids are k rows, so the
    *   checkpoint write is trivially cheap — long cluster runs should
    *   always opt in.
    * @return centroids DataFrame[cent_id: Long, c_emb: Array[Float]]
    */
  def fit(vectors: DataFrame, k: Int, iterations: Int, reliable: Boolean = false): DataFrame = {
    require(k > 0 && iterations >= 0)
    val materialize: DataFrame => DataFrame =
      if (reliable) _.checkpoint(eager = true) else _.localCheckpoint(eager = true)
    // Deterministic init without a global sort: split the id RANGE into k
    // equal buckets and take each bucket's lowest-id vector via min_by — a
    // codegen'd hash aggregate (map-side partial), vs the previous
    // Window.orderBy-with-no-partition which pulled every vector through a
    // single task. Sparse id ranges can leave some buckets empty (fewer
    // than k centroids); cent_id is a label, not an index, so that's fine.
    // vec_id is cast to long (callers may have int ids); empty input yields
    // empty centroids rather than a MatchError on the null min/max.
    val bounds = vectors.agg(
      min(col("vec_id").cast("long")), max(col("vec_id").cast("long"))).head()
    if (bounds.isNullAt(0))
      return vectors.select(lit(0L).as("cent_id"), col("embedding").as("c_emb")).limit(0)
    val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
    val step = math.max(1L, (maxId - minId + 1) / k)
    var centroids = vectors
      .groupBy(least(floor((col("vec_id").cast("long") - minId) / step), lit(k - 1L))
        .cast("long").as("cent_id"))
      .agg(min_by(col("embedding"), col("vec_id")).as("c_emb"))
    centroids = materialize(centroids)
    for (_ <- 1 to iterations) {
      val assigned = assign(vectors, centroids)
      centroids = assigned
        .select(col("cent_id"), posexplode(col("embedding")))
        .groupBy("cent_id", "pos")
        .agg(avg(col("col")).as("m"))
        .groupBy("cent_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), x -> CAST(x.m AS FLOAT))").as("c_emb"))
      centroids = materialize(centroids)
    }
    centroids
  }

  /** Max-cosine assignment: (vec_id, embedding, cent_id, cos).
    *
    * `max_by` over a tie-broken ordering struct, not a ranking window: the
    * partial hash aggregate collapses the k candidate rows per vector
    * map-side, so the shuffle carries n rows — a window over the crossJoin
    * would sort and shuffle n×k rows (1000× inflation at k=1024).
    * Ties on cosine break toward the lowest cent_id (the `-cent_id` struct
    * field), matching the window's `orderBy(cos.desc, cent_id)`.
    */
  def assign(vectors: DataFrame, centroids: DataFrame): DataFrame =
    vectors.crossJoin(broadcast(centroids))
      .withColumn("cos", VectorFunctions.cosine(col("embedding"), col("c_emb")))
      .groupBy("vec_id")
      .agg(max_by(
        struct(col("embedding"), col("cent_id"), col("cos")),
        struct(col("cos"), (-col("cent_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.cent_id").as("cent_id"), col("best.cos").as("cos"))

  /** Two-level coarse→fine IVF assignment — the scale path when the FINE
    * centroid count k grows with the corpus (IVF's constant-occupancy
    * regime, k = n/target): single-level [[assign]] scores every vector
    * against every centroid, an n·k = n²/target term that dominated the
    * 100× store builds. Here each vector is routed to its best COARSE
    * centroid (|coarse| ≈ √k of the fine set), then scored only against
    * the fine centroids living in that coarse cell — n·(k/m + m) work,
    * minimized at m = √k to n·2√k.
    *
    * Semantics (the standard IVF-on-IVF approximation, and what an
    * oracle twin must mirror): the result is the best fine centroid
    * WITHIN the vector's coarse cell, each argmax breaking cosine ties
    * toward the lowest id. A vector whose true nearest fine centroid
    * sits in a neighboring cell gets that cell's best instead — the
    * accepted miss, exactly SemDeDup's cross-cluster trade.
    *
    * `coarseCentroids` must be a SUBSET of `fineCentroids` (same ids,
    * same embeddings). That guarantees every vector's cell is non-empty:
    * a vector tie-breaks to the lowest id among duplicate-embedding
    * coarse centroids, and that lowest twin assigns itself to its own
    * cell (cos = 1 is the maximum, ties again break lowest).
    *
    * Scale shape: two broadcast joins (coarse ≈ √k rows; fine-with-cell
    * k rows — model state, broadcastable far past 10⁶ centroids) and two
    * n-row max_by hash-agg shuffles; candidate inflation n·m collapses
    * map-side, never shuffled. */
  def assignTwoLevel(
      vectors: DataFrame,
      fineCentroids: DataFrame,
      coarseCentroids: DataFrame): DataFrame = {
    val fineCell = assign(
      fineCentroids.select(col("cent_id").as("vec_id"), col("c_emb").as("embedding")),
      coarseCentroids)
      .select(col("vec_id").as("f_id"), col("embedding").as("f_emb"),
        col("cent_id").as("cell"))
    val vecCell = assign(vectors, coarseCentroids)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    vecCell.join(broadcast(fineCell), Seq("cell"))
      .withColumn("cos", VectorFunctions.cosine(col("embedding"), col("f_emb")))
      .groupBy("vec_id")
      .agg(max_by(
        struct(col("embedding"), col("f_id"), col("cos")),
        struct(col("cos"), (-col("f_id")).as("tie"))).as("best"))
      .select(col("vec_id"), col("best.embedding").as("embedding"),
        col("best.f_id").as("cent_id"), col("best.cos").as("cos"))
  }
}
