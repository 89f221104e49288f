package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Sanitize.sanitize

/** Compilers from record DataFrames to Cypher upsert scripts — the three
  * statement shapes the reference emits (SURVEY.md §2.2). All are pure
  * column-expression pipelines (concat templates), so compilation is
  * distributed and codegen'd; `df.write.text` materializes the script.
  *
  * Variable naming: the reference uses `m<id>` (concepts) and random 16-char
  * names (sheets, /root/reference/main.py:290-291). Random names make output
  * nondeterministic, so the sheet compiler emits canonical `a`/`b` variables;
  * golden comparisons are on canonicalized tuples either way (SURVEY.md §5.2).
  */
object CypherCompiler {

  private def q(c: Column): Column = concat(lit("'"), c, lit("'"))

  /** R3 (main.py:52-78): concept JSONL → `MERGE (m<id>:Concept {name:'<sanitized>'})
    * ON CREATE SET m<id>.id=<id>[, optional props…]`. Optional fields are
    * emitted only when truthy after their reference-matching transform
    * (semantic_type raw; cui/search_type/property_concept sanitized). */
  def conceptStatements(concepts: DataFrame): DataFrame = {
    val v = concat(lit("m"), col("id").cast("string"))
    def opt(field: String, value: Column): Column = {
      val s = value
      when(s.isNotNull && s =!= "", concat(lit(", "), v, lit(s".$field='"), s, lit("'")))
        .otherwise(lit(""))
    }
    concepts.select(
      concat(
        lit("MERGE ("), v, lit(":Concept {name:'"), sanitize(col("name")), lit("'}) ON CREATE SET "),
        v, lit(".id="), col("id").cast("string"),
        opt("semantic_type", col("semantic_type")),
        opt("cui", sanitize(col("cui"))),
        opt("search_type", sanitize(col("search_type"))),
        opt("property_concept", sanitize(col("property_concept")))
      ).as("value"))
  }

  /** R3 structured form: concept records → graph nodes keyed by sanitized
    * name with first-writer-wins dedup (MERGE keyed on name, main.py:62). */
  def conceptNodes(concepts: DataFrame, orderCol: String): DataFrame = {
    val projected = concepts.select(
      lit("Concept").as("label"),
      sanitize(col("name")).as("key"),
      map_filter(
        map(
          lit("id"), col("id").cast("string"),
          lit("semantic_type"), col("semantic_type"),
          lit("cui"), sanitize(col("cui")),
          lit("search_type"), sanitize(col("search_type")),
          lit("property_concept"), sanitize(col("property_concept"))),
        (_, v) => v.isNotNull && v =!= "").as("props"),
      col(orderCol))
    GraphTable.firstWriterWins(projected, Seq("label", "key"), orderCol).drop(orderCol)
  }

  /** R4 (main.py:81-93): hierarchy JSONL → `MATCH (m<p> {id: <p>}) MATCH
    * (m<c> {id: <c>}) CREATE (m<p>)-[:PARENT_OF]->(m<c>)`. CREATE semantics:
    * duplicates preserved, no label on the match. */
  def hierarchyStatements(hierarchy: DataFrame): DataFrame = {
    val p = col("parent_id").cast("string")
    val c = col("child_id").cast("string")
    hierarchy.select(
      concat(
        lit("MATCH (m"), p, lit(" {id: "), p, lit("}) MATCH (m"), c, lit(" {id: "), c,
        lit("}) CREATE (m"), p, lit(")-[:PARENT_OF]->(m"), c, lit(")")).as("value"))
  }

  /** R5 row pipeline (main.py:278-301) applied to a generic sheet DataFrame
    * with positional columns `c0, c1, …` plus a `row_idx` order column:
    *  1. terminate at the first row whose first cell is null (scan-stop
    *     semantic, main.py:285-286 — implemented as a computed cutoff, the
    *     parallel-safe equivalent);
    *  2. skip the header row (row_idx 0);
    *  3. drop rows with a null node2 id (main.py:294-295);
    *  4. node1 null id becomes the literal 'None' (faithful to main.py:294's
    *     one-sided guard; see relationships_sheet4.cypher:1432).
    */
  def sheetRows(sheet: DataFrame, m: SheetMapping): DataFrame = {
    val cut = sheet.filter(col("c0").isNull).agg(min(col("row_idx")).as("cut"))
    sheet
      .join(broadcast(cut))
      .filter(col("cut").isNull || col("row_idx") < col("cut"))
      .filter(col("row_idx") > 0)
      .filter(col(s"c${m.node2.idCol}").isNotNull)
      .select(
        coalesce(col(s"c${m.node1.idCol}").cast("string"), lit("None")).as("id1"),
        col(s"c${m.node1.valueCol}").cast("string").as("value1"),
        col(s"c${m.node2.idCol}").cast("string").as("id2"),
        col(s"c${m.node2.valueCol}").cast("string").as("value2"),
        col("row_idx"))
  }

  /** R5 statement emission: triple-MERGE with canonical variable names. */
  def sheetStatements(sheet: DataFrame, m: SheetMapping): DataFrame =
    sheetRows(sheet, m).select(
      concat(
        lit(s"MERGE (a:${m.node1.label} {id: "), q(col("id1")),
        lit(s"}) ON CREATE SET a.name = "), q(col("value1")),
        lit(s", a.type = '${m.node1.label}'  MERGE (b:${m.node2.label} {id: "), q(col("id2")),
        lit(s"}) ON CREATE SET b.name = "), q(col("value2")),
        lit(s", b.type = '${m.node2.label}' MERGE (a)-[:${m.relType}]->(b)")).as("value"))

  /** R5 structured form: (nodes, edges) with MERGE dedup keys — nodes by
    * (label, id), edges by (src, dst, rel) (SURVEY.md §2.1 R5). */
  def sheetGraph(sheet: DataFrame, m: SheetMapping): (DataFrame, DataFrame) = {
    val rows = sheetRows(sheet, m)
    val n1 = rows.select(
      lit(m.node1.label).as("label"), col("id1").as("key"),
      map(lit("name"), col("value1"), lit("type"), lit(m.node1.label)).as("props"),
      col("row_idx"))
    val n2 = rows.select(
      lit(m.node2.label).as("label"), col("id2").as("key"),
      map(lit("name"), col("value2"), lit("type"), lit(m.node2.label)).as("props"),
      col("row_idx"))
    val nodes = GraphTable
      .firstWriterWins(n1.unionByName(n2), Seq("label", "key"), "row_idx")
      .drop("row_idx")
    val edges = rows
      .select(
        lit(m.node1.label).as("src_label"), col("id1").as("src"),
        lit(m.node2.label).as("dst_label"), col("id2").as("dst"),
        lit(m.relType).as("rel"))
      .dropDuplicates("src_label", "src", "dst_label", "dst", "rel")
    (nodes, edges)
  }
}
