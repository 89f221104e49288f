package graft.ops

import org.apache.spark.graphx.{Edge, Graph, VertexId}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** GraphX algorithms over a [[GraphTable]] — the iterative analytics the
  * ontology hierarchy implies (SURVEY.md §2.2: ancestors, components,
  * depth-to-root) expressed as Pregel/graph ops rather than unbounded
  * self-joins. Used when iteration count is data-dependent (deep/unknown
  * hierarchies); for bounded shallow expansion prefer
  * [[TransitiveClosure.expand]] (stays in Tungsten).
  *
  * Vertex ids: (label, key) → dense longs via zipWithUniqueId — exact, no
  * hash-collision risk at 100 TB (a hashed id would silently merge nodes).
  */
object GraphAlgos {

  /** Internal: (vertex id ↔ (label,key)) mapping + GraphX graph.
    *
    * The ids frame is MATERIALIZED eagerly: it feeds three consumers (src
    * join, dst join, result join), and `zipWithUniqueId` ids are only
    * guaranteed consistent across those consumers if the RDD is evaluated
    * once — a re-evaluation under a changed scan split could renumber
    * vertices between the edge build and the result join, silently
    * mis-joining. The checkpoint also cuts the 3× recompute.
    *
    * `reliable = true` routes the materialization through recoverable
    * `Dataset.checkpoint` (requires `setCheckpointDir`): the default
    * `localCheckpoint` blocks live on executors with NO lineage, so on a
    * real cluster one executor loss mid-algorithm would kill the job
    * unrecoverably — long cluster runs should opt in, exactly as with
    * [[TextDedup.dedupMapping]] / [[KMeansLite]]. */
  private def build(g: GraphTable, reliable: Boolean): (DataFrame, Graph[Unit, String]) = {
    val spark = g.nodes.sparkSession
    val idRdd = g.nodes.select("label", "key").rdd
      .zipWithUniqueId()
      .map { case (r, id) => Row(r.getString(0), r.getString(1), id) }
    val idSchema = StructType(Seq(
      StructField("label", StringType), StructField("key", StringType),
      StructField("vid", LongType)))
    val idsRaw = spark.createDataFrame(idRdd, idSchema)
    val ids =
      if (reliable) idsRaw.checkpoint(eager = true)
      else idsRaw.localCheckpoint(eager = true)
    val src = ids.select(col("label").as("src_label"), col("key").as("src"), col("vid").as("src_vid"))
    val dst = ids.select(col("label").as("dst_label"), col("key").as("dst"), col("vid").as("dst_vid"))
    val edgeRdd = g.edges
      .join(src, Seq("src_label", "src"))
      .join(dst, Seq("dst_label", "dst"))
      .select("src_vid", "dst_vid", "rel").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2)))
    val vertexRdd = ids.select("vid").rdd.map(r => (r.getLong(0): VertexId, ()))
    (ids, Graph(vertexRdd, edgeRdd))
  }

  /** Weakly connected components: (label, key, component) where component is
    * a stable representative vertex id per component. */
  def connectedComponents(g: GraphTable, reliable: Boolean = false): DataFrame = {
    val (ids, graph) = build(g, reliable)
    val spark = g.nodes.sparkSession
    val ccRdd = graph.connectedComponents().vertices
      .map { case (vid, comp) => Row(vid, comp) }
    val cc = spark.createDataFrame(ccRdd,
      StructType(Seq(StructField("vid", LongType), StructField("component", LongType))))
    ids.join(cc, "vid").select("label", "key", "component")
  }

  /** Weakly connected components straight over a long-keyed pair table —
    * the zero-translation path for workflows whose entities already carry
    * numeric ids (a dedup pair set, say: see `TextDedup.lshPairs`). The
    * node ids ARE the vertex ids, so no zipWithUniqueId renumbering exists
    * to protect and no id re-join is needed on the way out; GraphX's
    * component representative (the smallest vertex id in the component)
    * lands directly in real-id space, making `component` the min-id
    * canonical representative by construction.
    *
    * `nodes`: one LONG id column (isolated ids map to themselves);
    * `pairs`: two LONG columns (undirected edges, either orientation).
    * Output: (id, component). */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    // entity-sized graph, corpus-shaped input partitioning: the node frame
    // arrives with the corpus scan's width (a unioned corpus doubles it)
    // and every Pregel superstep then runs that many tasks per stage —
    // pure scheduling floor (the graphParts rationale below). Coalesce is
    // narrow and cannot change values: vertex ids here are the REAL ids,
    // so the component representative (min real id) is partition-invariant.
    val p = graphParts(pairs, None)
    val vertexRdd = nodes.rdd.map(r => (r.getLong(0): VertexId, ())).coalesce(p)
    val edgeRdd = pairs.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ())).coalesce(p)
    val ccRdd = Graph(vertexRdd, edgeRdd).connectedComponents().vertices
      .map { case (vid, comp) => Row(vid, comp) }
    spark.createDataFrame(ccRdd,
      StructType(Seq(StructField("id", LongType), StructField("component", LongType))))
  }

  /** Depth of each node below the root set (vertices with no incoming edge),
    * following edge direction (parent −rel→ child). Pregel min-distance;
    * unreachable nodes are absent from the output. */
  def depthFromRoots(
      g: GraphTable,
      maxIterations: Int = 64,
      reliable: Boolean = false): DataFrame = {
    val (ids, graph) = build(g, reliable)
    val spark = g.nodes.sparkSession
    val inDeg = graph.inDegrees // vertices absent here have no incoming edge
    val init = graph.outerJoinVertices(inDeg) { (_, _, deg) =>
      if (deg.isEmpty) 0L else Long.MaxValue
    }
    val result = init.pregel(Long.MaxValue, maxIterations)(
      (_, cur, msg) => math.min(cur, msg),
      triplet =>
        if (triplet.srcAttr != Long.MaxValue && triplet.srcAttr + 1 < triplet.dstAttr)
          Iterator((triplet.dstId, triplet.srcAttr + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    val depthRdd = result.vertices
      .filter { case (_, d) => d != Long.MaxValue }
      .map { case (vid, d) => Row(vid, d) }
    val depths = spark.createDataFrame(depthRdd,
      StructType(Seq(StructField("vid", LongType), StructField("depth", LongType))))
    ids.join(depths, "vid").select("label", "key", "depth")
  }

  /** Partition count for the fixed-round kernels. The edge frame arrives
    * partitioned for the CORPUS that derived it
    * (spark.sql.shuffle.partitions), but the graph is entity-sized —
    * usually orders of magnitude smaller — and every chained stage runs a
    * task per partition, so an oversized count turns a small graph into
    * pure scheduling floor (the measured q44/q45 cost at every scale).
    * Default: a quarter of the session parallelism (≥1), which still grows
    * with the cluster; callers with a genuinely edge-heavy graph pass
    * `parts` explicitly. */
  private def graphParts(edges: DataFrame, parts: Option[Int]): Int =
    parts.getOrElse(
      math.max(1, edges.sparkSession.sparkContext.defaultParallelism / 4))

  /** Fixed-round power-iteration PageRank as ONE lazily-chained job — the
    * iterative kernel behind q44. Two prior forms both paid a sequential
    * barrier per round: unrolled DataFrame rounds (a broadcast-collect
    * each) and GraphX Pregel (whose convergence check materializes
    * `messages.count()` per superstep). With a FIXED round count neither
    * barrier is needed: the rounds chain lazily over co-partitioned pair
    * RDDs and materialize once, so the whole computation is ONE job of
    * `rounds` pipelined shuffle stages. The packed adjacency is persisted
    * MEMORY_ONLY: round 1's stage builds and caches it, rounds 2..n read
    * the built blocks — without the persist every round would replay
    * groupByKey's reduce-side aggregation (hash-merge + array copies over
    * |E| boxed values), the measured per-round cost. The adjacency is
    * entity-graph-sized, not corpus-sized, so the cache is small at any
    * corpus scale; the harness sweeps it after the query.
    *
    * Cross-engine exactness is preserved by doing the per-round sum in the
    * SAME arithmetic the SQL twin declares: each edge contribution
    * rank/outdeg is one IEEE double division cast to DECIMAL(18,8) via
    * Spark's own [[Decimal]] (the identical code path `CAST(x AS
    * DECIMAL(18,8))` compiles to), carried as the UNSCALED long so the
    * reduceByKey merge is exact integer addition — commutative and
    * associative, so merge order can never show. The new rank is the one
    * shared double tree resetProb + (1−resetProb)·toDouble(sum).
    *
    * `edges`: two LONG vertex-id columns, one row per directed edge
    * (multiplicity counts toward out-degree, as in the SQL twin's
    * count(*)). Every vertex is assumed to have out-degree ≥ 1 (a
    * symmetrized graph guarantees it); rank init 1.0. Output: (vid, pr)
    * after exactly `rounds` updates of every vertex.
    *
    * `seed`: personalized-PageRank teleport predicate. When set, only seed
    * vertices receive the reset mass (non-seeds get 0 + damp·m) and ranks
    * initialize to 1.0 on seeds / 0.0 elsewhere — the seed-biased
    * relevance ranking (PPR). None = the uniform classic form. The
    * predicate is evaluated per vertex id on executors, so it must be a
    * pure function of the id (e.g. the id-encoding's type bit). */
  def pagerankRounds(
      edges: DataFrame,
      rounds: Int,
      resetProb: Double = 0.15,
      parts: Option[Int] = None,
      seed: Option[Long => Boolean] = None): DataFrame = {
    import org.apache.spark.sql.types.{Decimal, DoubleType}
    val spark = edges.sparkSession
    val part = new org.apache.spark.HashPartitioner(graphParts(edges, parts))
    // adjacency packed per vertex, shuffled + built ONCE (see scaladoc);
    // deg = adjacency length, so no separate degree frame exists
    val adj = edges.rdd.map(r => (r.getLong(0), r.getLong(1)))
      .groupByKey(part)
      .mapValues(_.toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val damp = 1.0 - resetProb
    val isSeed = seed.getOrElse((_: Long) => true)
    var ranks: org.apache.spark.rdd.RDD[(Long, Double)] =
      if (seed.isEmpty) adj.mapValues(_ => 1.0)
      else adj.mapPartitions(
        _.map { case (v, _) => (v, if (isSeed(v)) 1.0 else 0.0) },
        preservesPartitioning = true)
    for (_ <- 1 to rounds) {
      ranks = adj.join(ranks, part) // narrow: same partitioner both sides
        .flatMap { case (_, (dsts, pr)) =>
          // ONE decimal quantization per vertex, fanned out over its edges
          val contrib = Decimal(pr / dsts.length)
          contrib.changePrecision(18, 8)
          val u = contrib.toUnscaledLong
          dsts.iterator.map(d => (d, u))
        }
        // map-side combine collapses the per-edge stream to ≤|V| partials
        // per partition before the (node-sized) per-round shuffle
        .reduceByKey(part, _ + _)
        .mapPartitions(
          _.map { case (v, m) =>
            (v, (if (isSeed(v)) resetProb else 0.0) + damp *
              new java.math.BigDecimal(java.math.BigInteger.valueOf(m), 8).doubleValue)
          },
          preservesPartitioning = true)
    }
    val prRdd = ranks.map { case (vid, pr) => Row(vid, pr) }
    spark.createDataFrame(prRdd,
      StructType(Seq(StructField("vid", LongType), StructField("pr", DoubleType))))
  }

  /** Bounded-round single-source shortest path (Bellman-Ford on the
    * min-plus semiring) — q45's kernel, same one-job lazy-chain rationale
    * as [[pagerankRounds]]. All-integer, so exactness needs no discipline
    * at all. After `rounds` relaxations the result is the exact min over
    * paths of ≤ `rounds` edges. Unreached vertices are absent — the
    * distance frame only ever contains reached nodes, so early rounds
    * shuffle a frontier, not the vertex set. `edges`: (srcVid LONG,
    * dstVid LONG, w LONG). */
  def ssspRounds(
      edges: DataFrame,
      source: VertexId,
      rounds: Int,
      parts: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    val part = new org.apache.spark.HashPartitioner(graphParts(edges, parts))
    // adjacency packed per vertex as an INTERLEAVED primitive long array
    // [d0,w0,d1,w1,…], shuffled + built ONCE, cached for the rounds
    // (pagerankRounds' shape) — a boxed Array[(Long,Long)] here costs a
    // tuple dereference per edge per round, the measured round floor
    val adj = edges.rdd
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .aggregateByKey(new scala.collection.mutable.ArrayBuffer[Long](8), part)(
        (b, dw) => { b += dw._1 += dw._2; b },
        (a, b) => { a ++= b; a })
      .mapValues(_.toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    var dist = spark.sparkContext
      .parallelize(Seq((source, 0L)), 1).partitionBy(part)
    for (_ <- 1 to rounds) {
      val relaxed = adj.join(dist, part) // narrow: same partitioner both sides
        .flatMap { case (_, (arr, ds)) =>
          new Iterator[(Long, Long)] {
            private var i = 0
            def hasNext: Boolean = i < arr.length
            def next(): (Long, Long) = { val t = (arr(i), ds + arr(i + 1)); i += 2; t }
          }
        }
        // map-side combine → the per-round shuffle carries ≤|V| partials
        .reduceByKey(part, math.min(_: Long, _: Long))
      // both sides share the partitioner, so the union is partitioner-aware
      // and the min-combine stays narrow
      dist = relaxed.union(dist).reduceByKey(part, math.min(_: Long, _: Long))
    }
    val distRdd = dist.map { case (vid, d) => Row(vid, d) }
    spark.createDataFrame(distRdd,
      StructType(Seq(StructField("vid", LongType), StructField("dist", LongType))))
  }
}
