package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for every reference-shaped entity (SURVEY.md §1.2,
  * FIXTURES.md §A). Supplied to readers rather than inferred, so ingestion is
  * stable under schema drift and partial files.
  */
object Schemas {

  /** Concept JSONL (reference `data/concept.json`; field accesses at
    * /root/reference/main.py:60-77). */
  val concept: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("semantic_type", StringType, nullable = true),
    StructField("cui", StringType, nullable = true),
    StructField("search_type", StringType, nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("property_concept", StringType, nullable = true)))

  /** Hierarchy JSONL (main.py:87-91). */
  val conceptHierarchy: StructType = StructType(Seq(
    StructField("child_id", LongType, nullable = false),
    StructField("parent_id", LongType, nullable = false)))

  /** Entity-id mapping rows (main.py:335-336 loads a str→int dict; modeled
    * relationally as a joinable two-column table). */
  val conceptIdMapping: StructType = StructType(Seq(
    StructField("concept_id", LongType, nullable = false),
    StructField("entity_id", LongType, nullable = false)))

  /** Enrichment output (data/concept_property_types.json:1). */
  val propertyTypes: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("property_types", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("node_type", StringType, nullable = true)))

  /** Graph node: label + business key + optional properties map. */
  val node: StructType = StructType(Seq(
    StructField("label", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("props", MapType(StringType, StringType, valueContainsNull = true), nullable = true)))

  /** Graph edge: (src, dst, rel), no properties (SURVEY.md §1.2). */
  val edge: StructType = StructType(Seq(
    StructField("src_label", StringType, nullable = false),
    StructField("src", StringType, nullable = false),
    StructField("dst_label", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("rel", StringType, nullable = false)))
}
