package graft.ops

import graft.SparkSpec

class EnrichmentSpec extends SparkSpec {
  import spark.implicits._
  import EnrichmentSpec.FakeClient

  private def concepts(rows: (Long, String)*) = rows.toDF("id", "semantic_type")

  test("prefix extraction + set dedup; node_type = first prefix (main.py:378-382)") {
    val out = Enrichment.enrich(concepts((1L, "Neoplasm")), () => FakeClient).collect().head
    assert(out.property_types == Seq("Disease", "Demographics"))
    assert(out.node_type.contains("Disease"))
  }

  test("empty service response yields null node_type — not the previous row's (fixes main.py:379-383)") {
    val out = Enrichment.enrich(concepts((1L, "a"), (2L, "b")), () => FakeClient)
      .collect().sortBy(_.id)
    assert(out(1).property_types.isEmpty && out(1).node_type.isEmpty)
  }

  test("Cancer-Numeric-Modifier rows are skipped (main.py:370)") {
    val out = Enrichment.enrich(
      concepts((1L, "Cancer-Numeric-Modifier"), (3L, null)), () => FakeClient).collect()
    assert(out.map(_.id).toSeq == Seq(3L))
  }
}

object EnrichmentSpec {
  // Top-level so the mapPartitions closure doesn't capture the (non-
  // serializable) suite instance.
  object FakeClient extends Enrichment.PropertyTypeClient {
    def fetch(conceptId: Long): Seq[String] = conceptId match {
      case 1L => Seq("Disease:onset", "Disease:stage", "Demographics:age")
      case 2L => Seq.empty
      case _  => Seq(s"Other:$conceptId")
    }
  }
}
