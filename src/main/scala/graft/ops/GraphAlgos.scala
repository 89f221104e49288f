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
    val vertexRdd = nodes.rdd.map(r => (r.getLong(0): VertexId, ()))
    val edgeRdd = pairs.rdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))
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
}
