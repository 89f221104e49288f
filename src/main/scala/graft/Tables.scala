package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loaders for the harness fixture tables (/root/repo/FIXTURES.md §B).
  *
  * All tables are single parquet files per scale factor; schemas travel in the
  * parquet footers, so no explicit StructType is imposed here. Column pruning
  * and predicate pushdown reach the scan because every query selects/filters
  * on the DataFrame before any wide transform.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Every fixture table, in FIXTURES.md order. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Loader by name, routing through the special-cased readers. */
  def apply(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events"     => events(s, d)
    case "documents"  => documents(s, d)
    case "embeddings" => embeddings(s, d)
    case other        => table(s, d, other)
  }

  /** The fixture files are single-row-group parquet, so a scan is ONE task
    * and all narrow compute before the first shuffle runs single-threaded.
    * For the compute-dense tables (per-row hashing / vector math) a cheap
    * hash repartition up to the session's parallelism fixes that. On real
    * multi-row-group/multi-file inputs (the 100 TB case) the scan is already
    * parallel and this is a no-op.
    *
    * The scan-partition probe (`df.rdd.getNumPartitions`) forces an RDD
    * conversion, so its result is memoized per (path, parallelism) — each
    * query build reuses the first probe instead of re-planning the scan. */
  private val scanParts = scala.collection.concurrent.TrieMap.empty[String, Int]
  private def parallelized(df: DataFrame, key: Column, cacheKey: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val n = scanParts.getOrElseUpdate(s"$cacheKey@$target", df.rdd.getNumPartitions)
    if (n < target) df.repartition(target, key) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read it as raw nanos (legacy conf) and truncate to micros with
    * integer division — the same truncation DuckDB applies when it reads the
    * ns column as its default µs TIMESTAMP, so oracle parity holds. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    parallelized(table(s, d, "documents"), col("doc_id"), s"$d/documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    parallelized(table(s, d, "embeddings"), col("vec_id"), s"$d/embeddings")
}
