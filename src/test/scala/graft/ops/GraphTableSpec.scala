package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class GraphTableSpec extends SparkSpec {
  import spark.implicits._

  private def nodes(rows: (String, String, Map[String, String])*): DataFrame =
    rows.toDF("label", "key", "props")

  private def edges(rows: (String, String, String, String, String)*): DataFrame =
    rows.toDF("src_label", "src", "dst_label", "dst", "rel")

  test("upsert adds new nodes and keeps existing properties on collision (MERGE ON CREATE SET)") {
    val g0 = GraphTable(nodes(("Gene", "G1", Map("name" -> "old"))), edges())
    val g1 = g0.upsertNodes(nodes(("Gene", "G1", Map("name" -> "new")), ("Gene", "G2", Map("name" -> "fresh"))))
    val out = g1.nodes.orderBy("key").as[(String, String, Map[String, String])].collect().toSeq
    assert(out == Seq(("Gene", "G1", Map("name" -> "old")), ("Gene", "G2", Map("name" -> "fresh"))))
  }

  test("upsert is idempotent: merge(merge(x)) == merge(x)") {
    val inc = nodes(("L", "a", Map("p" -> "1")), ("M", "a", Map("p" -> "2")))
    val g1 = GraphTable.empty(spark).upsertNodes(inc)
    val g2 = g1.upsertNodes(inc)
    def snap(g: GraphTable) =
      g.nodes.as[(String, String, Map[String, String])].collect().toSet
    assert(snap(g2) == snap(g1) && snap(g2).size == 2)
  }

  test("same key under different labels stays distinct") {
    val g = GraphTable.empty(spark).upsertNodes(nodes(("A", "k", Map()), ("B", "k", Map())))
    assert(g.nodes.count() == 2)
  }

  test("addEdges dedup=false keeps duplicates (hierarchy CREATE, main.py:91)") {
    val e = edges(("A", "1", "B", "2", "R"), ("A", "1", "B", "2", "R"))
    assert(GraphTable.empty(spark).addEdges(e, dedup = false).edges.count() == 2)
  }

  test("addEdges dedup=true collapses within batch and against existing (sheet MERGE, main.py:299)") {
    val g1 = GraphTable.empty(spark).addEdges(edges(("A", "1", "B", "2", "R"), ("A", "1", "B", "2", "R")), dedup = true)
    assert(g1.edges.count() == 1)
    val g2 = g1.addEdges(edges(("A", "1", "B", "2", "R"), ("A", "1", "B", "3", "R")), dedup = true)
    assert(g2.edges.count() == 2)
  }

  test("setProperty overwrites one prop, preserves others, leaves misses untouched (R7)") {
    val g = GraphTable(
      nodes(("Concept", "c1", Map("cui" -> "C1")), ("Concept", "c2", Map("entity_id" -> "stale"))),
      edges())
    val updates = Seq(("Concept", "c2", "900")).toDF("label", "key", "value")
    val out = g.setProperty(updates, "entity_id").nodes.orderBy("key")
      .as[(String, String, Map[String, String])].collect().toSeq
    assert(out == Seq(
      ("Concept", "c1", Map("cui" -> "C1")),
      ("Concept", "c2", Map("entity_id" -> "900"))))
  }

  test("missedUpdates is the anti-join side output (main.py:354-355)") {
    val g = GraphTable(nodes(("Concept", "c1", Map())), edges())
    val updates = Seq(("Concept", "c1", "1"), ("Concept", "cX", "2")).toDF("label", "key", "value")
    assert(g.missedUpdates(updates).as[(String, String, String)].collect().toSeq == Seq(("Concept", "cX", "2")))
  }

  test("orphanEdges / validEdges split on endpoint presence") {
    val g = GraphTable(
      nodes(("A", "1", Map()), ("B", "2", Map())),
      edges(("A", "1", "B", "2", "R"), ("A", "9", "B", "2", "R"), ("A", "1", "B", "9", "R")))
    assert(g.orphanEdges.count() == 1) // src A/9 missing
    assert(g.validEdges.count() == 1)  // only A/1 -> B/2 fully resolves
  }

  test("firstWriterWins keeps the earliest row per key (R3 name-dedup, main.py:62)") {
    val df = Seq(("Concept", "n", "first", 0L), ("Concept", "n", "second", 1L))
      .toDF("label", "key", "v", "row_idx")
    val out = GraphTable.firstWriterWins(df, Seq("label", "key"), "row_idx")
    assert(out.select("v").as[String].collect().toSeq == Seq("first"))
  }

  test("withRowIndex numbers rows in input order") {
    val df = spark.read.parquet(s"$sf001/region.parquet")
    val idx = GraphTable.withRowIndex(df)
    assert(idx.agg(countDistinct(col("row_idx"))).first.getLong(0) == df.count())
    assert(idx.agg(min("row_idx")).first.getLong(0) == 0L)
  }
}
