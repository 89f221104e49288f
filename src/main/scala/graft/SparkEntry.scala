package graft

import graft.queries.{CoreQueries, PipelineQueries, QueryDef}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory is assembled from:
  *  - CoreQueries: SURVEY.md §2.4 q-series (reference semantics generalized
  *    + analytics/graph kernels);
  *  - PipelineQueries: SURVEY.md §2.4 x01+ north-star training-data-pipeline
  *    extensions (dedup, similarity search, text analysis, multimodal
  *    decode, container walks, sampling/splits, profiling/governance).
  * The authoritative count is `catalog.size` — SURVEY.md §2.4 mirrors it.
  */
object SparkEntry {
  val catalog: Seq[QueryDef] = CoreQueries.all ++ PipelineQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
