package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._

/** Service enrichment (reference R8, /root/reference/main.py:357-383): for
  * each concept, call an external info service and derive property types.
  *
  * Spark-first shape: `mapPartitions` with ONE pooled client per partition
  * (the reference did one serial HTTP POST per row — the throughput bound in
  * BASELINE.md). The transport is injected so tests (and offline envs) use a
  * deterministic fake; a production client would wrap a connection pool.
  *
  * Semantics preserved from the reference:
  *  - rows with semantic_type == 'Cancer-Numeric-Modifier' are skipped
  *    (main.py:370);
  *  - property types are the ':'-prefix of each returned entry, set-deduped
  *    (main.py:378-382);
  *  - node_type is the prefix of the FIRST returned entry.
  * Fixed (documented bug, not replicated): when the service returns nothing,
  * the reference leaked the previous row's node_type (stale variable,
  * main.py:379-383); here both fields are null.
  */
object Enrichment {

  /** Transport: concept id → raw `event_and_property_types` entries.
    * Must be Serializable (shipped to executors). */
  trait PropertyTypeClient extends Serializable {
    def fetch(conceptId: Long): Seq[String]
  }

  final case class Enriched(id: Long, property_types: Seq[String], node_type: Option[String])

  def enrich(concepts: DataFrame, clientFactory: () => PropertyTypeClient): Dataset[Enriched] = {
    val spark = concepts.sparkSession
    implicit val enc = Encoders.product[Enriched]
    concepts
      .filter(col("semantic_type").isNull || col("semantic_type") =!= "Cancer-Numeric-Modifier")
      .select(col("id").cast("long"))
      .mapPartitions { (it: Iterator[Row]) =>
        val client = clientFactory() // one client per partition, not per row
        it.map { r =>
          val id = r.getLong(0)
          val raw = client.fetch(id)
          val prefixes = raw.map(_.split(":")(0))
          if (prefixes.isEmpty) Enriched(id, Seq.empty, None)
          else Enriched(id, prefixes.distinct, Some(prefixes.head))
        }
      }
  }
}
