package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property graph as a pair of DataFrames — the Spark-native replacement for
  * the reference's Neo4j target (SURVEY.md §2.2). All Cypher statement shapes
  * the reference emits map to the relational ops here:
  *
  *  - `MERGE (v:L {key}) ON CREATE SET …`  → [[GraphTable.upsertNodes]]
  *    (existing node keeps its properties — /root/reference/main.py:62-77)
  *  - `MATCH…MATCH…CREATE (a)-[:R]->(b)`   → [[GraphTable.addEdges]] dedup=false
  *    (duplicate edges allowed — main.py:91)
  *  - `MERGE (a)…MERGE (b)…MERGE (a)-[:R]->(b)` → dedup=true (main.py:299)
  *  - `MATCH (n:L) WHERE n.id=k SET n.p=v` → [[GraphTable.setProperty]]
  *    (main.py:352)
  *
  * Node schema: (label, key, props: map<string,string>);
  * edge schema: (src_label, src, dst_label, dst, rel).
  *
  * Scale: upserts shuffle on (label, key) — at 100 TB both sides should be
  * bucketed by key so the full-outer merge is co-located; skewed labels
  * (sheet4-style 83%-one-type) are handled by AQE skew-join splitting.
  */
final case class GraphTable(nodes: DataFrame, edges: DataFrame) {

  /** MERGE-upsert: add incoming nodes; on key collision the EXISTING node's
    * properties win (Cypher `ON CREATE SET` only sets properties when the
    * node is created). Incoming must itself be unique per (label, key) —
    * apply [[GraphTable.firstWriterWins]] upstream for within-batch dedup. */
  def upsertNodes(incoming: DataFrame): GraphTable = {
    val ex = nodes.select(col("label"), col("key"), col("props").as("ex_props"))
    val in = incoming.select(col("label"), col("key"), col("props").as("in_props"))
    val merged = ex
      .join(in, Seq("label", "key"), "full_outer")
      .select(col("label"), col("key"), coalesce(col("ex_props"), col("in_props")).as("props"))
    copy(nodes = merged)
  }

  /** Add edges. dedup=true replicates edge-MERGE (main.py:299): drop
    * duplicates within the batch and against existing edges. dedup=false
    * replicates edge-CREATE (main.py:91): keep everything. */
  def addEdges(incoming: DataFrame, dedup: Boolean): GraphTable = {
    val cols = Seq("src_label", "src", "dst_label", "dst", "rel").map(col)
    val in = incoming.select(cols: _*)
    val added =
      if (dedup)
        in.dropDuplicates("src_label", "src", "dst_label", "dst", "rel")
          .join(edges, Seq("src_label", "src", "dst_label", "dst", "rel"), "left_anti")
      else in
    copy(edges = edges.select(cols: _*).unionByName(added))
  }

  /** Point property update (R7, main.py:332-355): left-join updates on
    * (label, key) and overwrite one props entry. Misses (nodes without an
    * update) pass through untouched; updates without a matching node are the
    * caller's side-output via [[missedUpdates]]. */
  def setProperty(updates: DataFrame, prop: String): GraphTable = {
    // updates: (label, key, value)
    val upd = updates.select(col("label"), col("key"), col("value").as("upd_value"))
    val merged = nodes
      .join(upd, Seq("label", "key"), "left")
      .select(
        col("label"),
        col("key"),
        when(col("upd_value").isNotNull,
          map_concat(
            map_filter(coalesce(col("props"), map()), (k, _) => k =!= prop),
            map(lit(prop), col("upd_value"))))
          .otherwise(col("props"))
          .as("props"))
    copy(nodes = merged)
  }

  /** Updates that match no existing node (the reference prints these,
    * main.py:354-355; reconciled later by update_missed_updates). */
  def missedUpdates(updates: DataFrame): DataFrame =
    updates.join(nodes, Seq("label", "key"), "left_anti")

  /** Edges whose source endpoint has no node (referential-integrity
    * side-output; the reference never checks this — SURVEY.md §2.1 R4). */
  def orphanEdges: DataFrame = {
    val keys = nodes.select(col("label").as("src_label"), col("key").as("src"))
    edges.join(keys, Seq("src_label", "src"), "left_anti")
  }

  /** Edges with both endpoints present. */
  def validEdges: DataFrame = {
    val srcKeys = nodes.select(col("label").as("src_label"), col("key").as("src"))
    val dstKeys = nodes.select(col("label").as("dst_label"), col("key").as("dst"))
    edges
      .join(srcKeys, Seq("src_label", "src"), "left_semi")
      .join(dstKeys, Seq("dst_label", "dst"), "left_semi")
  }
}

object GraphTable {

  def empty(spark: org.apache.spark.sql.SparkSession): GraphTable = {
    import graft.model.Schemas
    GraphTable(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.node),
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schemas.edge))
  }

  /** Within-batch first-writer-wins dedup (R3: first occurrence of a `name`
    * key wins — main.py:62). Requires an explicit order column because
    * "first" is meaningless under parallel scan without one (SURVEY.md §7.4);
    * use the source row index, not monotonically_increasing_id. */
  def firstWriterWins(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Deterministic per-file row index for line-oriented sources: zipWithIndex
    * over the input order. For a single text/JSONL file this reproduces the
    * reference's sequential read order. */
  def withRowIndex(df: DataFrame, name: String = "row_idx"): DataFrame = {
    val schema = df.schema.add(name, org.apache.spark.sql.types.LongType, nullable = false)
    val rdd = df.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
